#!/usr/bin/env python3
"""Prototype: DuckDB re-derivation of x116 semDedup(base ∪ perturbed,
cells=8, iters=3, minCosX10k=9900). Validated against the Spark dump.

Usage: python3 tools/proto_semdedup_oracle.py [sf_dir] [spark_dir]
"""
import sys, glob, time
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark_out = sys.argv[2] if len(sys.argv) > 2 else None
CELLS, ITERS, DIM, MINCOS = 8, 3, 64, 9900

def kmeans_ctes(cells, iters, dim, fit_and=""):
    out = [f"""qv AS MATERIALIZED (
  SELECT vec_id, i, CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS q
  FROM corpus, range(1, {dim + 1}) r(i)
),
cf0 AS MATERIALIZED (
  SELECT CAST(vec_id AS INT) AS cell, i AS pos, CAST(embedding[i] AS FLOAT) AS cf
  FROM corpus, range(1, {dim + 1}) r(i) WHERE vec_id < {cells}
)"""]
    for t in range(1, iters + 1):
        out.append(f""",
qc{t - 1} AS MATERIALIZED (
  SELECT cell, pos, CAST(floor(CAST(cf AS DOUBLE) * 10000) AS BIGINT) AS qc
  FROM cf{t - 1}
),
a{t} AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
      row_number() OVER (PARTITION BY v.vec_id
        ORDER BY sum(v.q * c.qc) DESC, c.cell) AS rn
    FROM qv v JOIN qc{t - 1} c ON v.i = c.pos{fit_and}
    GROUP BY v.vec_id, c.cell
  ) WHERE rn = 1
),
cf{t} AS MATERIALIZED (
  SELECT a.cell, v.i AS pos,
    CAST(CAST(sum(v.q) AS DOUBLE) / 10000.0 / count(*) AS FLOAT) AS cf
  FROM a{t} a JOIN qv v ON v.vec_id = a.vec_id
  GROUP BY a.cell, v.i
)""")
    out.append(f""",
qcF AS MATERIALIZED (
  SELECT cell, pos, CAST(floor(CAST(cf AS DOUBLE) * 10000) AS BIGINT) AS qc
  FROM cf{iters}
)""")
    return "".join(out)

SQL = f"""WITH corpus AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
    list_transform(embedding, (x, i) ->
      CAST(CAST(x AS DOUBLE) * ((9500 + (vec_id + i - 1) % 1000) / 10000.0) AS FLOAT)) AS embedding
  FROM embeddings
),
{kmeans_ctes(CELLS, ITERS, DIM)},
aF AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
      row_number() OVER (PARTITION BY v.vec_id
        ORDER BY sum(v.q * c.qc) DESC, c.cell) AS rn
    FROM qv v JOIN qcF c ON v.i = c.pos
    GROUP BY v.vec_id, c.cell
  ) WHERE rn = 1
),
qa AS MATERIALIZED (
  SELECT v.vec_id, a.cell, list(v.q ORDER BY v.i) AS qa,
    CAST(sum(v.q * v.q) AS BIGINT) AS n2
  FROM qv v JOIN aF a ON a.vec_id = v.vec_id
  GROUP BY v.vec_id, a.cell
),
victims AS MATERIALIZED (
  SELECT DISTINCT b.vec_id
  FROM qa a JOIN qa b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE CAST(floor(10000.0 *
      CAST(list_sum(list_transform(a.qa, (x, i) -> x * b.qa[i])) AS BIGINT)
      / sqrt(CAST(a.n2 AS DOUBLE) * b.n2)) AS BIGINT) >= {MINCOS}
)
SELECT q.vec_id, CAST(q.cell AS BIGINT) AS cell
FROM qa q LEFT JOIN victims v ON v.vec_id = q.vec_id
WHERE v.vec_id IS NULL
ORDER BY q.vec_id"""

con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')")
t0 = time.time()
odf = con.execute(SQL).df()
print(f"oracle rows: {len(odf)} in {time.time()-t0:.1f}s")
if spark_out:
    import pandas as pd
    files = sorted(glob.glob(f"{spark_out}/*.parquet"))
    sdf = pd.concat([pd.read_parquet(f) for f in files])
    sdf = sdf.sort_values("vec_id").reset_index(drop=True)
    odf = odf.sort_values("vec_id").reset_index(drop=True)
    cols = ["vec_id", "cell"]
    ok = len(sdf) == len(odf) and sdf[cols].astype("int64").equals(odf[cols].astype("int64"))
    print("MATCH" if ok else f"MISMATCH rows {len(sdf)} vs {len(odf)}")
    if not ok and len(sdf) == len(odf):
        m = sdf[cols].astype("int64").compare(odf[cols].astype("int64"))
        print(m.head(10))
