#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same parquet
tables, sorts columns by name, and compares shapes + values (exact for
ints/strings/dates, 1e-9 relative for floats — plus reports whether the
match is bit-exact, since the driver hash-compares).
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output"); n_fail += 1; continue
        spark_tbl = pq.read_table(files[0])
        spark_df = spark_tbl.to_pandas()
        if name not in oracle:
            status = "ok" if len(spark_df) > 0 else "EMPTY"
            print(f"ROWS  {name}: rows={len(spark_df)} {status}")
            n_rows_only += 1
            if len(spark_df) == 0: n_fail += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_fail += 1; continue
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        d = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(s.columns) != list(d.columns):
            print(f"FAIL  {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL  {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1; continue
        mismatch, inexact = compare(s, d)
        if mismatch:
            print(f"FAIL  {name}: {mismatch}"); n_fail += 1
        else:
            tag = " (float-inexact!)" if inexact else ""
            print(f"PASS  {name}: rows={len(s)}{tag}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
          f"of {len(names)} queries")
    sys.exit(1 if n_fail else 0)

def compare(s, d):
    """Return (mismatch_desc|None, any_float_inexact)."""
    inexact = False
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            na, nb = a is None or (isinstance(a, float) and math.isnan(a)), \
                     b is None or (isinstance(b, float) and math.isnan(b))
            if na or nb:
                if na != nb:
                    return f"col {col} row {i}: {a!r} vs {b!r}", inexact
                continue
            if isinstance(a, float) or isinstance(b, float):
                fa, fb = float(a), float(b)
                if fa != fb:
                    if abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb)):
                        inexact = True
                    else:
                        return f"col {col} row {i}: {a!r} vs {b!r}", inexact
            else:
                if str(a) != str(b):
                    return f"col {col} row {i}: {a!r} vs {b!r}", inexact
    return None, inexact

if __name__ == "__main__":
    main()
