#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name>/ parquet (Spark result) and compares it to the
DuckDB result of oracle_sql.json[name] over the same sf tables:
row count, column names (sorted), and exact values (rows sorted).
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
# optional: comma-separated query names to skip (oracle-side intractable
# at large scale factors, e.g. p52's within-cell quadratic list math)
skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    t = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if name in skip:
        print(f"SKIP {name}", flush=True)
        continue
    spark_glob = f"{out_dir}/{name}/*.parquet"
    if not glob.glob(spark_glob):
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        duck = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}")
        fails += 1
        continue
    spark = con.execute(
        f"SELECT * FROM read_parquet('{spark_glob}')").fetch_arrow_table()
    scols, dcols = sorted(spark.column_names), sorted(duck.column_names)
    if scols != dcols:
        print(f"FAIL {name}: cols spark={scols} duck={dcols}")
        fails += 1
        continue
    import pandas as pd
    sdf = spark.to_pandas()[scols].sort_values(scols).reset_index(drop=True)
    ddf = duck.to_pandas()[dcols].sort_values(dcols).reset_index(drop=True)
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
        fails += 1
        continue
    # exact compare (incl dtype-insensitive numeric equality)
    bad = None
    for c in scols:
        a, b = sdf[c], ddf[c]
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            bad = (c, i, a.iloc[i], b.iloc[i])
            break
    if bad:
        c, i, va, vb = bad
        print(f"FAIL {name}: col {c} row {i}: spark={va!r} duck={vb!r}")
        fails += 1
    else:
        print(f"OK   {name} ({len(sdf)} rows)", flush=True)
print(f"\n{len(oracle) - fails - len(skip)}/{len(oracle) - len(skip)} queries match" + (f" ({len(skip)} skipped)" if skip else ""))
sys.exit(1 if fails else 0)
