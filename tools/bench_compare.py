#!/usr/bin/env python3
"""Diff two Bench JSON lines (e.g. BENCH_r2.json vs a local run): per-query
delta sorted by regression. When either file carries a `spread` map
(max-min across the bench's repeated runs), a delta is only flagged as
SIGNIFICANT if it exceeds the combined spread of both measurements —
otherwise it is labeled noise. Usage: bench_compare.py <old.json> <new.json>"""
import json, re, sys

def _obj_at(s, i):
    """Brace-match and parse the JSON object starting at s[i] == '{'."""
    depth = 0
    for j in range(i, len(s)):
        if s[j] == "{":
            depth += 1
        elif s[j] == "}":
            depth -= 1
            if depth == 0:
                return json.loads(s[i:j + 1])
    return None

def load(p):
    """Accept either a raw Bench stdout line or the driver's BENCH_r*.json
    wrapper, whose `tail` field holds the (possibly head-truncated) last
    chunk of that line — e.g. starting mid-token at `ries":{...`."""
    txt = open(p).read()
    try:
        d = json.loads(txt[txt.index("{"):])
    except (ValueError, json.JSONDecodeError):
        d = {}
    if "queries" in d:
        return d
    tail = d.get("tail", txt)
    out = {}
    m = re.search(r'"value"\s*:\s*([0-9.eE+-]+)', tail)
    out["value"] = float(m.group(1)) if m else float("nan")
    for key in ("queries", "spread"):
        m = re.search(r'"?%s"\s*:\s*{' % key[1:], tail)  # survives a cut prefix
        full = re.search(r'"%s"\s*:\s*{' % key, tail)
        hit = full or m
        if hit:
            obj = _obj_at(tail, tail.index("{", hit.start()))
            if obj is not None:
                out[key] = obj
    if "queries" not in out:
        # last resort: first {name: number, ...} object anywhere in tail —
        # but never the one that belongs to the "spread" key, or a cut
        # inside the queries object would silently compare spreads as
        # times
        for m in re.finditer(r'\{"[a-zA-Z0-9_]+"\s*:\s*[0-9.-]', tail):
            obj = _obj_at(tail, m.start())
            if obj and obj != out.get("spread"):
                out["queries"] = obj
                break
    if "queries" not in out or out["queries"] == out.get("spread"):
        sys.exit(f"{p}: no per-query map found (truncated bench tail?)")
    return out

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
        # absolute floor scales with the faster measurement so a 5x
        # regression on a 40ms query still flags while +-0.3s jitter on a
        # 2.5s query does not
        floor = max(0.05, 0.25 * min(a, b))
        if osp or nsp:
            note = f"{d:+.2f}s " + ("SIGNIFICANT" if abs(d) > tol and abs(d) > floor else "(noise)")
        else:
            note = f"{d:+.2f}s (no spread data)"
        rows.append((d, k, a, b, note))
rows.sort(reverse=True, key=lambda r: r[0])
def _tot(d):
    v = d.get("value", float("nan"))
    return f"{v:.1f}s" if v == v else "?"
print(f"total: {_tot(old)} -> {_tot(new)}")
for _, k, a, b, note in rows[:20]:
    fa = f"{a:.2f}" if isinstance(a, float) else "-"
    fb = f"{b:.2f}" if isinstance(b, float) else "-"
    print(f"{k:26s} {fa:>8} -> {fb:>8}  {note}")
sig = [k for d, k, a, b, n in rows if "SIGNIFICANT" in n]
if sig:
    print("significant:", ", ".join(sig))
