#!/usr/bin/env python3
"""Per-query DuckDB oracle wall times (VERDICT r13 task 2).

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir> [out.json] [skip1,skip2]

Runs every oracle_sql.json entry from a Verify run against the sf
tables (threads=32, same setup as check_oracle.py) and records each
query's wall seconds. NEVER run this while a Spark sweep is active —
a contaminated run once read 359 s vs 124 s clean for the same SQL.

The output JSON is the denominator for the per-entry ratio gate: pair
it with a Bench detail file via tools/ratio_gate.py and adjudicate
every entry whose spark/duckdb ratio exceeds the threshold, so a
single pathological entry can no longer hide under the catalog total
(127 s of the sf0.1 oracle total is two recursive-CTE CC oracles).
"""
import sys, json, glob, os, time
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
out_path = sys.argv[3] if len(sys.argv) > 3 else ""
skip = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set()
con = duckdb.connect()
con.execute("SET threads TO 32")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    t = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
times, errors = {}, {}
for name, sql in sorted(oracle.items()):
    if name in skip:
        continue
    t0 = time.monotonic()
    try:
        con.execute(sql).fetchall()
        times[name] = round(time.monotonic() - t0, 3)
    except Exception as e:
        errors[name] = str(e)[:200]
    print(f"{name:40s} {times.get(name, 'ERR')}", flush=True)

result = {"sf": sf_dir, "threads": 32,
          "total_sec": round(sum(times.values()), 3),
          "queries": times}
if errors:
    result["errors"] = errors
line = json.dumps(result)
if out_path:
    with open(out_path, "w") as f:
        f.write(line + "\n")
print(line[:2000])
print(f"\ntotal {result['total_sec']} s over {len(times)} oracles, "
      f"{len(errors)} errors")
