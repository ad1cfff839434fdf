#!/usr/bin/env python3
"""Compare two Bench sweeps (e.g. sf10 vs sf1): per-query scale ratios.

Usage: python3 dev/bench_ratios.py BIG.json SMALL.json [factor]
Prints queries sorted by ratio (big/small), flagging those whose growth
exceeds the data-scale factor (default 10) — the super-linear suspects.
"""
import json, sys

big = json.load(open(sys.argv[1]))["queries"]
small = json.load(open(sys.argv[2]))["queries"]
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
shared = sorted(set(big) & set(small), key=lambda q: big[q] / max(small[q], 1e-9),
                reverse=True)
missing = sorted(set(small) - set(big)) + sorted(set(big) - set(small))
print(f"{'query':34} {'big(s)':>9} {'small(s)':>9} {'ratio':>7}")
for q in shared:
    r = big[q] / max(small[q], 1e-9)
    flag = " <-- super-linear" if r > factor and big[q] > 5 else ""
    print(f"{q:34} {big[q]:9.2f} {small[q]:9.2f} {r:7.2f}{flag}")
if missing:
    print("only in one sweep:", ", ".join(missing))
tot_b = sum(big.values()); tot_s = sum(small[q] for q in set(big) & set(small))
print(f"totals: big {tot_b:.1f}s over {len(big)} queries; shared-small {tot_s:.1f}s")
