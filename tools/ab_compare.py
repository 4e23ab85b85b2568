#!/usr/bin/env python3
"""Compare the interleaved A/B/A/B drift runs (tools/ab_drift.sh):
per-side min-of-runs over the shared query set, total ratio, and the
biggest per-query movers."""
import json, sys

def load(p):
    return json.load(open(p))["queries"]

r11 = [load(f"target/ab_r11_run{i}.json") for i in (1, 2)]
r12 = [load(f"target/ab_r12_run{i}.json") for i in (1, 2)]
keys = set(r11[0]) & set(r11[1]) & set(r12[0]) & set(r12[1])
a = {k: min(r11[0][k], r11[1][k]) for k in keys}
b = {k: min(r12[0][k], r12[1][k]) for k in keys}
ta, tb = sum(a.values()), sum(b.values())
print(f"shared queries: {len(keys)}")
print(f"r11 min-of-2 total: {ta:.1f}s   r12 min-of-2 total: {tb:.1f}s   ratio r12/r11: {tb/ta:.3f}")
# per-run totals, in execution order, to show box drift over time
for i in (0, 1):
    sa = sum(r11[i][k] for k in keys); sb = sum(r12[i][k] for k in keys)
    print(f"run {i+1}: r11 {sa:.1f}s  r12 {sb:.1f}s  ratio {sb/sa:.3f}")
movers = sorted(keys, key=lambda k: b[k] / max(a[k], 1e-9), reverse=True)
print("top regressions (r12/r11, min basis):")
for k in movers[:8]:
    print(f"  {k}: {a[k]:.2f}s -> {b[k]:.2f}s  ({b[k]/max(a[k],1e-9):.2f}x)")
print("top improvements:")
for k in movers[-5:]:
    print(f"  {k}: {a[k]:.2f}s -> {b[k]:.2f}s  ({b[k]/max(a[k],1e-9):.2f}x)")
