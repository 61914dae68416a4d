#!/usr/bin/env python3
"""Per-entry spark-vs-oracle ratio gate (VERDICT r13 task 2).

Usage: python3 tools/ratio_gate.py <bench_detail.json> <oracle_times.json> [ratio=2.0] [floor=0.25]

Joins a Bench detail file (per-query Spark seconds) with a
time_oracle.py output (per-query DuckDB seconds) and reports every
entry whose spark/duckdb ratio exceeds `ratio`. Entries where BOTH
sides are under `floor` seconds are ignored: at sub-250 ms scale the
measurement is scheduler noise, not a plan property, and DuckDB's
near-zero costs on trivial lookups would flag entries whose absolute
cost is irrelevant at any SF. Exits 1 when violations exist, so the
round protocol can gate on it; each violation needs a fix or a
recorded justification in the round's bench notes.
"""
import sys, json

bench = json.load(open(sys.argv[1]))["queries"]
orc = json.load(open(sys.argv[2]))["queries"]
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.25

shared = sorted(set(bench) & set(orc))
missing = sorted(set(bench) ^ set(orc))
viol = []
for name in shared:
    s, d = bench[name], orc[name]
    if s < floor and d < floor:
        continue
    r = s / d if d > 0 else float("inf")
    if r > ratio:
        viol.append((name, s, d, r))

for name, s, d, r in sorted(viol, key=lambda v: -v[3]):
    print(f"VIOLATION {name:40s} spark={s:8.3f}s duckdb={d:8.3f}s "
          f"ratio={r:6.2f}x")
tot_s = sum(bench[n] for n in shared)
tot_d = sum(orc[n] for n in shared)
print(f"\n{len(shared)} entries compared "
      f"(catalog spark={tot_s:.1f}s duckdb={tot_d:.1f}s = "
      f"{tot_s / tot_d:.2f}x), {len(viol)} over {ratio}x "
      f"(sub-{floor}s-both-sides ignored)")
if missing:
    print(f"not in both files: {missing}")
sys.exit(1 if viol else 0)
