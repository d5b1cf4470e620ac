#!/usr/bin/env python3
"""Prototype: DuckDB re-derivation of Similarity.knnIvf(20, 3, cells=8,
nprobe=2, iters=3) — the SQL that, once validated against the Spark
x72 output, becomes the generated oracle in ExtShared.

Usage: python3 tools/proto_ivf_oracle.py [sf_dir] [spark_parquet_dir]
"""
import sys, glob
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark_out = sys.argv[2] if len(sys.argv) > 2 else None

NQ, K, CELLS, NPROBE, ITERS, DIM = 20, 3, 8, 2, 3, 64

def ivf_sql():
    parts = [f"""WITH qv AS MATERIALIZED (
  SELECT vec_id, i, CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS q
  FROM embeddings, range(1, {DIM + 1}) r(i)
),
cf0 AS MATERIALIZED (
  SELECT CAST(vec_id AS INT) AS cell, i AS pos, CAST(embedding[i] AS FLOAT) AS cf
  FROM embeddings, range(1, {DIM + 1}) r(i) WHERE vec_id < {CELLS}
)"""]
    prev = "cf0"
    for t in range(1, ITERS + 1):
        parts.append(f""",
qc{t - 1} AS MATERIALIZED (
  SELECT cell, pos, CAST(floor(CAST(cf AS DOUBLE) * 10000) AS BIGINT) AS qc
  FROM {prev}
),
a{t} AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
      row_number() OVER (PARTITION BY v.vec_id
        ORDER BY sum(v.q * c.qc) DESC, c.cell) AS rn
    FROM qv v JOIN qc{t - 1} c ON v.i = c.pos
    GROUP BY v.vec_id, c.cell
  ) WHERE rn = 1
),
cf{t} AS MATERIALIZED (
  SELECT a.cell, v.i AS pos,
    CAST(CAST(sum(v.q) AS DOUBLE) / 10000.0 / count(*) AS FLOAT) AS cf
  FROM a{t} a JOIN qv v ON v.vec_id = a.vec_id
  GROUP BY a.cell, v.i
)""")
        prev = f"cf{t}"
    parts.append(f""",
qcF AS MATERIALIZED (
  SELECT cell, pos, CAST(floor(CAST(cf AS DOUBLE) * 10000) AS BIGINT) AS qc
  FROM cf{ITERS}
),
aF AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
      row_number() OVER (PARTITION BY v.vec_id
        ORDER BY sum(v.q * c.qc) DESC, c.cell) AS rn
    FROM qv v JOIN qcF c ON v.i = c.pos
    GROUP BY v.vec_id, c.cell
  ) WHERE rn = 1
),
qcells AS MATERIALIZED (
  SELECT vec_id AS qid, cell FROM (
    SELECT v.vec_id, c.cell,
      row_number() OVER (PARTITION BY v.vec_id
        ORDER BY sum(v.q * c.qc) DESC, c.cell) AS rn
    FROM qv v JOIN qcF c ON v.i = c.pos
    WHERE v.vec_id < {NQ}
    GROUP BY v.vec_id, c.cell
  ) WHERE rn <= {NPROBE}
),
cand AS MATERIALIZED (
  SELECT p.qid, a.vec_id
  FROM qcells p JOIN aF a ON a.cell = p.cell
  WHERE p.qid <> a.vec_id
),
pairs AS MATERIALIZED (
  SELECT c.qid, c.vec_id, CAST(sum(vq.q * vv.q) AS BIGINT) AS dot_q
  FROM cand c
  JOIN qv vq ON vq.vec_id = c.qid
  JOIN qv vv ON vv.vec_id = c.vec_id AND vv.i = vq.i
  GROUP BY c.qid, c.vec_id
)
SELECT qid, vec_id, dot_q, CAST(rn AS BIGINT) AS rn FROM (
  SELECT qid, vec_id, dot_q,
    row_number() OVER (PARTITION BY qid ORDER BY dot_q DESC, vec_id) AS rn
  FROM pairs
) WHERE rn <= {K}
ORDER BY qid, rn""")
    return "".join(parts)

con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')")
sql = ivf_sql()
import time
t0 = time.time()
odf = con.execute(sql).df()
print(f"oracle rows: {len(odf)} in {time.time()-t0:.1f}s")
print(odf.head(12).to_string())
if spark_out:
    import pandas as pd
    files = sorted(glob.glob(f"{spark_out}/*.parquet"))
    sdf = pd.concat([pd.read_parquet(f) for f in files])
    sdf = sdf.sort_values(["qid", "rn"]).reset_index(drop=True)
    odf = odf.sort_values(["qid", "rn"]).reset_index(drop=True)
    same = sdf[["qid", "vec_id", "dot_q", "rn"]].astype("int64").equals(
        odf[["qid", "vec_id", "dot_q", "rn"]].astype("int64"))
    print("MATCH" if same else "MISMATCH")
    if not same:
        m = sdf.merge(odf, on=["qid", "rn"], suffixes=("_s", "_o"))
        print(m[(m.vec_id_s != m.vec_id_o) | (m.dot_q_s != m.dot_q_o)].head(20))
