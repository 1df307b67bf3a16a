#!/usr/bin/env python3
"""Diff two Bench JSON lines (e.g. BENCH_r2.json vs a local run): per-query
delta sorted by regression. When either file carries a `spread` map
(max-min across the bench's repeated runs), a delta is only flagged as
SIGNIFICANT if it exceeds the combined spread of both measurements —
otherwise it is labeled noise. Usage: bench_compare.py <old.json> <new.json>"""
import json, sys

def load(p):
    line = open(p).read()
    return json.loads(line[line.index("{"):])

old, new = load(sys.argv[1]), load(sys.argv[2])
oq, nq = old["queries"], new["queries"]
osp, nsp = old.get("spread", {}), new.get("spread", {})
rows = []
for k in sorted(set(oq) | set(nq)):
    a, b = oq.get(k), nq.get(k)
    if a is None or b is None:
        rows.append((float("inf"), k, a, b, "added" if a is None else "removed"))
    elif a < 0 or b < 0:
        rows.append((float("inf"), k, a, b, "FAILED"))
    else:
        d = b - a
        tol = max(osp.get(k, 0.0), 0.0) + max(nsp.get(k, 0.0), 0.0)
        if osp or nsp:
            note = f"{d:+.2f}s " + ("SIGNIFICANT" if abs(d) > tol and abs(d) > 0.2 else "(noise)")
        else:
            note = f"{d:+.2f}s (no spread data)"
        rows.append((d, k, a, b, note))
rows.sort(reverse=True, key=lambda r: r[0])
print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s")
for _, k, a, b, note in rows[:20]:
    fa = f"{a:.2f}" if isinstance(a, float) else str(a)
    fb = f"{b:.2f}" if isinstance(b, float) else str(b)
    print(f"{k:26s} {fa:>8} -> {fb:>8}  {note}")
sig = [k for d, k, a, b, n in rows if "SIGNIFICANT" in n]
if sig:
    print("significant:", ", ".join(sig))
