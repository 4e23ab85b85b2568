#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir>

Reads <out>/oracle_sql.json + <out>/<name>/ parquet dumps (written by
`sbt "runMain graft.Verify <sfDir> <out>"`), registers the test tables
in DuckDB, runs each oracle, and compares: row count, column names,
and values (sorted by all columns; floats to 9 sig figs; timestamps
normalized to microseconds). Driver-side tooling only — never a
dependency of the Scala engine.
"""
import sys, os, json, math, glob
import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.9g}")
    if hasattr(v, "timestamp"):  # datetime
        return v.replace(microsecond=(v.microsecond // 1) if hasattr(v, 'microsecond') else 0).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_val(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(f"{float(v):.9g}")
    except Exception:
        pass
    return v

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main(outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        dump = os.path.join(outdir, name)
        files = glob.glob(f"{dump}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark dump")
            n_fail += 1
            continue
        try:
            r = con.execute(sql)
            ocols = [d[0] for d in r.description]
            orows = r.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        r2 = con.execute(f"SELECT * FROM '{dump}/*.parquet'")
        scols = [d[0] for d in r2.description]
        srows = r2.fetchall()
        oc, orn = norm_rows(ocols, orows)
        sc, srn = norm_rows(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1
            continue
        # Mirror the driver's hasher: it compares pandas dtypes, so a
        # DuckDB HUGEINT (-> float64) vs Spark BIGINT (-> int64) fails
        # there even when values are identical. Check dtypes explicitly.
        try:
            # LIMIT 0 wrappers: dtypes only — avoids re-executing the
            # (sometimes quadratic) oracle a second time for values
            odf = con.execute(f"SELECT * FROM ({sql}) __q LIMIT 0").df()
            sdf = con.execute(f"SELECT * FROM '{dump}/*.parquet' LIMIT 0").df()
            # Width differences (int32 vs int64) hash identically in the
            # driver; kind differences (int64 vs float64, i.e. HUGEINT)
            # do not. Compare dtype.kind only.
            dt_bad = [(c, str(sdf[c].dtype), str(odf[c].dtype))
                      for c in sorted(set(odf.columns) & set(sdf.columns))
                      if sdf[c].dtype.kind != odf[c].dtype.kind]
            if dt_bad:
                print(f"FAIL {name}: pandas dtypes differ (spark vs oracle): {dt_bad}")
                n_fail += 1
                continue
        except Exception as e:
            print(f"WARN {name}: dtype check skipped: {str(e)[:120]}")
        if len(orn) != len(srn):
            print(f"FAIL {name}: rows spark={len(srn)} oracle={len(orn)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srn, orn)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srn)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}\n  cols={sc}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srn)} rows)")
        n_pass += 1
    # queries without oracle: row-count-only report
    for d in sorted(os.listdir(outdir)):
        full = os.path.join(outdir, d)
        if os.path.isdir(full) and d not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{full}/*.parquet'").fetchone()[0]
                print(f"INFO {d}: rows-only, {n} rows")
            except Exception as e:
                print(f"WARN {d}: unreadable dump: {e}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"))
