#!/usr/bin/env python3
"""Batched/filtered replica of check.py for partial Verify dumps:
builds <out>/oracle_sql.json from a full oracle file, restricted to
dump dirs that exist and to an include/exclude list, then delegates
to tools/check.py.

Usage: check_batch.py <outdir> <full_oracle.json> [--exclude a,b,c]
                      [--only a,b,c]
"""
import sys, os, json, subprocess

out = sys.argv[1]
# the filtered subset is written to <out>/oracle_sql.json below — if the
# caller passes that same file as the FULL oracle, one run would silently
# destroy the full set (r13 ADVICE); refuse instead
if os.path.realpath(sys.argv[2]) == os.path.realpath(os.path.join(out, "oracle_sql.json")):
    raise SystemExit("refusing: <full_oracle.json> is the output path "
                     f"{os.path.join(out, 'oracle_sql.json')} — pass the full oracle "
                     "from a different directory")
full = json.load(open(sys.argv[2]))
exclude = set()
only = None
args = sys.argv[3:]
while args:
    if args[0] == "--exclude":
        exclude = set(args[1].split(",")); args = args[2:]
    elif args[0] == "--only":
        only = set(args[1].split(",")); args = args[2:]
    else:
        raise SystemExit(f"unknown arg {args[0]}")
done = {d for d in os.listdir(out)
        if os.path.isdir(os.path.join(out, d))
        and any(f.endswith(".parquet") for f in os.listdir(os.path.join(out, d)))}
sel = {k: v for k, v in full.items()
       if k in done and k not in exclude and (only is None or k in only)}
json.dump(sel, open(os.path.join(out, "oracle_sql.json"), "w"))
print(f"checking {len(sel)} of {len(done)} completed dumps "
      f"({len(done) - len(sel)} excluded/pending)")
sys.stdout.flush()
rc = subprocess.call([sys.executable, os.path.join(os.path.dirname(__file__), "check.py"), out])
sys.exit(rc)
