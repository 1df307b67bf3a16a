#!/usr/bin/env python3
"""Diff two Bench JSON lines (e.g. BENCH_r1.json vs a local run): per-query
delta sorted by regression. Usage: bench_compare.py <old.json> <new.json>"""
import json, sys

def load(p):
    line = open(p).read()
    return json.loads(line[line.index("{"):])

old, new = load(sys.argv[1]), load(sys.argv[2])
oq, nq = old["queries"], new["queries"]
rows = []
for k in sorted(set(oq) | set(nq)):
    a, b = oq.get(k), nq.get(k)
    if a is None or b is None:
        rows.append((float("inf"), k, a, b, "added" if a is None else "removed"))
    elif a < 0 or b < 0:
        rows.append((float("inf"), k, a, b, "FAILED"))
    else:
        rows.append((b - a, k, a, b, f"{b - a:+.2f}s"))
rows.sort(reverse=True)
print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s")
for _, k, a, b, note in rows[:15]:
    print(f"{k:26s} {a if a is not None else '-':>8} -> {b if b is not None else '-':>8}  {note}")
