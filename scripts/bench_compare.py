#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (equal pass counts assumed): per-query
min deltas, sorted by regression ratio, with a watch-list section.

Usage: python3 scripts/bench_compare.py <base.json> <new.json> [watch,ed,list]
"""
import json, sys

base = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
watch = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()

bq, nq = base["queries"], new["queries"]
common = sorted(set(bq) & set(nq))
only_new = sorted(set(nq) - set(bq))

rows = [(n, bq[n], nq[n], nq[n] / bq[n] if bq[n] > 0 else float("inf"))
        for n in common]
tot_b = sum(bq[n] for n in common)
tot_n = sum(nq[n] for n in common)
print(f"common queries: {len(common)}  base {tot_b:.1f}s  new {tot_n:.1f}s  "
      f"ratio {tot_n/tot_b:.3f}  (runs: base {base.get('runs')}, new {new.get('runs')})")
print(f"new-only queries: {', '.join(only_new) or '-'}"
      f"  ({sum(nq[n] for n in only_new):.1f}s)")

print("\n== regressions > 1.5x AND > 0.3s ==")
for n, b, v, r in sorted(rows, key=lambda t: -t[3]):
    if r > 1.5 and v - b > 0.3:
        print(f"  {n}: {b:.2f} -> {v:.2f}  ({r:.2f}x)")

if watch:
    print("\n== watch list ==")
    for n in sorted(watch):
        if n in bq and n in nq:
            print(f"  {n}: base {bq[n]:.2f} -> new {nq[n]:.2f}  "
                  f"({nq[n]/bq[n]:.2f}x)")
        elif n in nq:
            print(f"  {n}: new-only {nq[n]:.2f}")

print("\n== top 10 improvements ==")
for n, b, v, r in sorted(rows, key=lambda t: t[3])[:10]:
    print(f"  {n}: {b:.2f} -> {v:.2f}  ({r:.2f}x)")
