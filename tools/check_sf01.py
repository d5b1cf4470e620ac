#!/usr/bin/env python3
"""sf0.1 heavy-tail oracle spot-check (round-7 VERDICT item #7).

Replicates the driver's DuckDB compare (tools/check.py semantics:
column-name sort, repr-exact values, float-inexact counts as FAIL) for
a chosen query list at sf0.1, with two practical changes for the much
heavier oracle SQL at this scale:
  - DuckDB thread cap (default 12) so the check coexists with builds;
  - a per-query wall budget (default 90 min): an oracle that cannot
    finish inside it is recorded as status "oracle_budget_exceeded"
    with the elapsed time, NOT as pass/fail — that is a statement
    about single-node DuckDB cost at sf0.1, not about the engine
    (these queries are hash-exact at sf0.01 in CORRECTNESS_r06).

Writes/updates CORRECTNESS_sf01.json incrementally after every query.

Usage: python3 tools/check_sf01.py <verify_out_dir> <sf_dir> <out_json> [names...]
"""
import sys, json, glob, os, time, multiprocessing as mp

OUT = sys.argv[3]
BUDGET_S = int(os.environ.get("SF01_BUDGET_S", "5400"))
THREADS = int(os.environ.get("SF01_THREADS", "12"))


def norm(df, np, rounded=False):
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


def run_oracle(q, sf, sql, conn_out):
    """Child process: run the oracle, send the result via a pipe."""
    import duckdb
    con = duckdb.connect()
    con.execute(f"SET threads TO {THREADS}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    try:
        df = con.execute(sql).df()
        conn_out.send(("ok", df))
    except Exception as e:
        conn_out.send(("error", str(e)))


def main():
    import pandas as pd
    import numpy as np
    out_dir, sf = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sys.argv[4:] or sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT)).get("queries", {})

    def save():
        json.dump({"sf": 0.1, "budget_s": BUDGET_S, "threads": THREADS,
                   "queries": results}, open(OUT, "w"), indent=1)

    for name in names:
        if name in results:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(sdf)}
            save()
            print(f"ROWS-ONLY {name} ({len(sdf)})", flush=True)
            continue
        t0 = time.time()
        parent, child = mp.Pipe()
        proc = mp.Process(target=run_oracle,
                          args=(name, sf, oracles[name], child))
        proc.start()
        odf = None
        status = None
        if parent.poll(BUDGET_S):
            kind, payload = parent.recv()
            if kind == "ok":
                odf = payload
            else:
                status = {"status": "oracle_error", "error": payload[:500]}
        else:
            proc.terminate()
            status = {"status": "oracle_budget_exceeded",
                      "elapsed_s": round(time.time() - t0, 1)}
        proc.join()
        el = round(time.time() - t0, 1)
        if status is not None:
            status["oracle_s"] = el
            results[name] = status
            save()
            print(f"{status['status'].upper()} {name} ({el}s)", flush=True)
            continue
        rec = {"rows_spark": len(sdf), "rows_oracle": len(odf),
               "oracle_s": el}
        if len(sdf) != len(odf):
            rec["status"] = "fail_rows"
        elif sorted(sdf.columns) != sorted(odf.columns):
            rec["status"] = "fail_schema"
        elif norm(sdf, np) != norm(odf, np):
            if norm(sdf, np, True) == norm(odf, np, True):
                rec["status"] = "fail_float_inexact"
            else:
                rec["status"] = "fail_values"
        else:
            rec["status"] = "pass"
        results[name] = rec
        save()
        print(f"{rec['status'].upper()} {name} "
              f"({len(sdf)} rows, oracle {el}s)", flush=True)
    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    print(f"done: {n_pass} pass / {len(results)} total", flush=True)


if __name__ == "__main__":
    main()
