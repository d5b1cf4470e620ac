#!/usr/bin/env python3
"""Local oracle check: replicate the driver's DuckDB compare.

Usage: python3 tools/check.py [verify_out_dir] [sf_dir]
Reads each <name>/ parquet under verify_out_dir, runs the matching SQL from
oracle_sql.json in DuckDB over the sf_dir parquet tables, sorts columns by
name, and compares row count, schema (column names), and values.

The driver's gate hashes values bit-exactly, so floats are compared by
repr() first; rows that only match after rounding are tagged
"(float-inexact!)" and counted as FAILURES — they would fail the driver.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "target/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

with open(os.path.join(out, "oracle_sql.json")) as f:
    oracles = json.load(f)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def norm(df, rounded):
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9)) if rounded else repr(v)
        if isinstance(v, bytes):
            return v.hex()
        return str(v)
    return [[cell(v) for v in row] for row in df.itertuples(index=False)]

names = sorted(d for d in os.listdir(out)
               if os.path.isdir(os.path.join(out, d)))
fails, rows_only = [], []
for name in names:
    files = glob.glob(os.path.join(out, name, "*.parquet"))
    if not files:
        fails.append((name, "no spark output"))
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    if name not in oracles:
        rows_only.append((name, len(sdf)))
        continue
    try:
        odf = con.execute(oracles[name]).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    if len(sdf) != len(odf):
        fails.append((name, f"rows {len(sdf)} vs {len(odf)}"))
        continue
    if sorted(sdf.columns) != sorted(odf.columns):
        fails.append((name, f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
        continue
    a, b = norm(sdf, False), norm(odf, False)
    if a == b:
        print(f"PASS {name} ({len(sdf)} rows)")
        continue
    ar, br = norm(sdf, True), norm(odf, True)
    if ar == br:
        diff = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
        fails.append((name, f"(float-inexact!) row {diff}: {a[diff]} vs {b[diff]}"))
        continue
    diff = next((i for i, (x, y) in enumerate(zip(ar, br)) if x != y), -1)
    fails.append((name, f"values differ at row {diff}: "
                        f"{ar[diff] if diff >= 0 else ''} vs {br[diff] if diff >= 0 else ''}"))

for name, n in rows_only:
    print(f"ROWS-ONLY {name} ({n} rows)")
for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(names)-len(fails)}/{len(names)} ok, {len(fails)} failed, {len(rows_only)} rows-only")
sys.exit(1 if fails else 0)
