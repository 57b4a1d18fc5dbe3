#!/usr/bin/env python3
"""Dev tool: join two graft.Bench JSON lines (e.g. sf0.1 vs sf1) and
report per-query min-time ratios, worst first. Used to build SCALING.md's
measured-ratio table; a ratio far above the data multiplier (10x) on a
query without a documented amplification factor is a red flag.

Usage: scale_ratio.py BENCH_small.json BENCH_big.json [mult]
"""
import json
import sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
mult = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qs_s, qs_b = small["queries_min"], big["queries_min"]
rows = []
for q in sorted(qs_s):
    if q not in qs_b:
        continue
    s, b = qs_s[q], qs_b[q]
    if s <= 0 or b <= 0:
        rows.append((float("inf"), q, s, b))
        continue
    rows.append((b / s, q, s, b))
rows.sort(reverse=True)
print(f"{'query':34s} {'small_s':>8s} {'big_s':>8s} {'ratio':>7s}")
for r, q, s, b in rows:
    flag = "  <-- super-linear" if r > mult * 1.2 else ""
    print(f"{q:34s} {s:8.3f} {b:8.3f} {r:7.2f}{flag}")
tot_s = sum(v for v in qs_s.values() if v > 0)
tot_b = sum(qs_b[q] for q in qs_s if qs_b.get(q, -1) > 0)
print(f"\ntotal min-sum: {tot_s:.1f}s -> {tot_b:.1f}s  ({tot_b / tot_s:.2f}x at {mult:.0f}x data)")
print("failed small:", small.get("failed"), " failed big:", big.get("failed"))
