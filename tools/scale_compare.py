#!/usr/bin/env python3
"""DuckDB-side multiset comparison of an oracle SQL result vs a Spark
parquet dump — for scale-gate evidence where outputs are too large to
pull through Python (check.py fetches all rows; a 130M-row near-dup
pair set would need ~30 GB of tuples). Equality semantics mirror
check.py: column sets must match, DOUBLE columns are normalized to 9
significant figures, and rows are compared as multisets (EXCEPT ALL in
both directions).

Usage: scale_compare.py <sf_dir> <dump_dir> <name> <sql_file|->
Prints one JSON line: {"name":…,"oracle_rows":N,"spark_rows":N,
"only_oracle":N,"only_spark":N,"pass":bool,"secs":…}
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, dump_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    sql = sys.stdin.read() if sys.argv[4] == "-" else open(sys.argv[4]).read()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    t0 = time.time()
    con.execute(f"CREATE TEMP TABLE __o AS {sql}")
    t_oracle = time.time() - t0
    con.execute(f"CREATE TEMP TABLE __s AS SELECT * FROM '{dump_dir}/*.parquet'")
    ocols = [(r[0], r[1]) for r in con.execute("DESCRIBE __o").fetchall()]
    scols = [(r[0], r[1]) for r in con.execute("DESCRIBE __s").fetchall()]
    if sorted(c for c, _ in ocols) != sorted(c for c, _ in scols):
        print(json.dumps({"name": name, "pass": False,
                          "err": f"columns differ oracle={ocols} spark={scols}"}))
        return 1

    def proj(cols):
        out = []
        for c, ty in sorted(cols):
            if ty in ("DOUBLE", "FLOAT", "REAL"):
                out.append(f"printf('%.9g', \"{c}\") AS \"{c}\"")
            else:
                out.append(f'"{c}"')
        return ", ".join(out)

    po, ps = proj(ocols), proj(scols)
    no = con.execute("SELECT count(*) FROM __o").fetchone()[0]
    ns = con.execute("SELECT count(*) FROM __s").fetchone()[0]
    d1 = con.execute(
        f"SELECT count(*) FROM (SELECT {po} FROM __o EXCEPT ALL SELECT {ps} FROM __s)").fetchone()[0]
    d2 = con.execute(
        f"SELECT count(*) FROM (SELECT {ps} FROM __s EXCEPT ALL SELECT {po} FROM __o)").fetchone()[0]
    res = {"name": name, "oracle_rows": no, "spark_rows": ns,
           "only_oracle": d1, "only_spark": d2,
           "pass": bool(no == ns and d1 == 0 and d2 == 0),
           "oracle_secs": round(t_oracle, 1), "secs": round(time.time() - t0, 1)}
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
