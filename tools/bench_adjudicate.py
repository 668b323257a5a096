#!/usr/bin/env python3
"""Adjudicate a round's bench runs against the previous round's final log.

Usage: bench_adjudicate.py PREV_LOG CUR_LOG [flag_ratio]

Protocol (judge-endorsed since r10): min-of-runs per query on the SHARED
gate set, current vs previous; report the shared-total ratio, every
query over the flag line (default 1.5x), and price NEW gates separately.
"""
import json, sys

def mins(path):
    per = {}
    for line in open(path):
        line = line.strip()
        if not line.startswith('{') or '"metric"' not in line:
            continue
        q = json.loads(line).get("queries", {})
        for k, v in q.items():
            per[k] = min(per.get(k, float("inf")), v)
    return per

prev, cur = mins(sys.argv[1]), mins(sys.argv[2])
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
shared = sorted(set(prev) & set(cur))
new = sorted(set(cur) - set(prev))
gone = sorted(set(prev) - set(cur))
pt = sum(prev[q] for q in shared)
ct = sum(cur[q] for q in shared)
print(f"shared gates: {len(shared)}  prev_total {pt:.1f}s  cur_total {ct:.1f}s  ratio {ct/pt:.3f}x")
flags = [(q, cur[q] / prev[q]) for q in shared if cur[q] > flag * prev[q] and cur[q] - prev[q] > 0.05]
if flags:
    for q, r in sorted(flags, key=lambda x: -x[1]):
        print(f"  FLAG {q}: {prev[q]:.2f}s -> {cur[q]:.2f}s = {r:.2f}x")
else:
    print(f"  zero queries over the {flag}x flag line")
if new:
    print(f"new gates ({len(new)}): total {sum(cur[q] for q in new):.2f}s")
    for q in new:
        print(f"  {q}: {cur[q]:.2f}s")
if gone:
    print(f"gates only in prev: {gone}")
top = sorted(shared, key=lambda q: -cur[q])[:5]
print("top-5 cur walls: " + "  ".join(f"{q}={cur[q]:.2f}s" for q in top))
