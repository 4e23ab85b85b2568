#!/usr/bin/env python3
"""Per-query wall-time estimates from a Verify out-dir: each dump dir's
mtime marks that query's completion, so successive deltas bound each
query's wall time (first query's delta is measured from the out-dir's
own ctime — includes session startup, noted). Evidence helper for
scale-gate linearity claims; not a benchmark."""
import sys, os

out = sys.argv[1]
dirs = [(os.path.getmtime(os.path.join(out, d)), d) for d in os.listdir(out)
        if os.path.isdir(os.path.join(out, d))]
dirs.sort()
prev = os.path.getctime(out)
for t, d in dirs:
    print(f"{d}: {t - prev:.0f}s" + (" (incl. session startup)" if prev == os.path.getctime(out) and t == dirs[0][0] else ""))
    prev = t
