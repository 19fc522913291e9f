#!/usr/bin/env python3
"""Per-query scale-ratio table from two committed Bench records.

Usage: python3 tools/scale_table.py BENCH_SF1_r14.json BENCH_SF10_r14.json [scale]

Prints a markdown summary: distribution of warm ratios (hi/lo), the
top-decade exponent log_scale(t_hi/t_lo) per query for the heavy tail,
and flags any query whose exponent exceeds 1.2 (the verdict's
fix-or-bless line). Sub-second-at-both-scales queries are summarized in
aggregate (fixed-cost floor dominates; an exponent fitted on 0.2 s vs
0.4 s measures noise, not the plan).
"""
import json, math, sys

lo_p, hi_p = sys.argv[1], sys.argv[2]
scale = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

def load(p):
    with open(p) as f:
        j = json.load(f)
    return j

lo, hi = load(lo_p), load(hi_p)
wlo, whi = lo["queries_warm"], hi["queries_warm"]
common = sorted(set(wlo) & set(whi))
missing = sorted(set(wlo) ^ set(whi))
if missing:
    print(f"NOTE: {len(missing)} queries not in both records: {missing}")

rows = []
small = []
for q in common:
    a, b = wlo[q], whi[q]
    if a < 0 or b < 0:
        print(f"FAILED ({q}): lo={a} hi={b}")
        continue
    if max(a, b) < 1.0:
        small.append((q, a, b))
        continue
    ratio = b / max(a, 0.01)
    exp = math.log(max(ratio, 0.01)) / math.log(scale)
    rows.append((exp, ratio, a, b, q))

rows.sort(reverse=True)
print(f"\ncommon queries: {len(common)}; sub-1s at both scales: {len(small)} "
      f"(aggregate lo {sum(a for _,a,_ in small):.1f}s -> hi {sum(b for _,_,b in small):.1f}s)")
print(f"warm totals: lo {sum(v for v in wlo.values() if v>0):.1f}s  "
      f"hi {sum(v for v in whi.values() if v>0):.1f}s  "
      f"ratio {sum(v for v in whi.values() if v>0)/sum(v for v in wlo.values() if v>0):.2f}x at {scale:.0f}x data")
over = [r for r in rows if r[0] > 1.2]
print(f"queries with exponent > 1.2: {len(over)}\n")
print("| query | sf1 warm s | sf10 warm s | ratio | exponent |")
print("|---|---|---|---|---|")
for exp, ratio, a, b, q in rows[:40]:
    print(f"| {q} | {a:.2f} | {b:.2f} | {ratio:.2f}x | {exp:.2f} |")
if len(rows) > 40:
    rest = rows[40:]
    print(f"| ({len(rest)} more, all exponent <= {rest[0][0]:.2f}) | "
          f"{sum(r[2] for r in rest):.1f} | {sum(r[3] for r in rest):.1f} | — | — |")
