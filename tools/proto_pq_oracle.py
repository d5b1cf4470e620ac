#!/usr/bin/env python3
"""Prototype: DuckDB re-derivation of the PQ-family ANN tiers —
x103 knnPQ(20,3), x110 knnIvfPq(20,3), x124 residual variant.

Usage: python3 tools/proto_pq_oracle.py <pq|ivfpq|residual> [sf_dir] [spark_dir]
"""
import sys, glob, time
import duckdb

mode = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
spark_out = sys.argv[3] if len(sys.argv) > 3 else None

NQ, K, CELLS, NPROBE, M, KSUB, ITERS, REFINE, DIM = 20, 3, 8, 3, 8, 32, 3, 16, 64
SUBD = DIM // M

def coarse_kmeans():
    """qv + unrolled coarse kmeans -> cf{ITERS} (float centroids), qcF, aF."""
    out = [f"""qv AS MATERIALIZED (
  SELECT vec_id, i, CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS q
  FROM corpus, range(1, {DIM + 1}) r(i)
),
cf0 AS MATERIALIZED (
  SELECT CAST(vec_id AS INT) AS cell, i AS pos, CAST(embedding[i] AS FLOAT) AS cf
  FROM corpus, range(1, {DIM + 1}) r(i) WHERE vec_id < {CELLS}
)"""]
    for t in range(1, ITERS + 1):
        out.append(f""",
qc{t - 1} AS MATERIALIZED (
  SELECT cell, pos, CAST(floor(CAST(cf AS DOUBLE) * 10000) AS BIGINT) AS qc FROM cf{t - 1}
),
a{t} AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY sum(v.q * c.qc) DESC, c.cell) AS rn
    FROM qv v JOIN qc{t - 1} c ON v.i = c.pos GROUP BY v.vec_id, c.cell
  ) WHERE rn = 1
),
cf{t} AS MATERIALIZED (
  SELECT a.cell, v.i AS pos,
    CAST(CAST(sum(v.q) AS DOUBLE) / 10000.0 / count(*) AS FLOAT) AS cf
  FROM a{t} a JOIN qv v ON v.vec_id = a.vec_id GROUP BY a.cell, v.i
)""")
    out.append(f""",
qcF AS MATERIALIZED (
  SELECT cell, pos, CAST(floor(CAST(cf AS DOUBLE) * 10000) AS BIGINT) AS qc FROM cf{ITERS}
),
aF AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY sum(v.q * c.qc) DESC, c.cell) AS rn
    FROM qv v JOIN qcF c ON v.i = c.pos GROUP BY v.vec_id, c.cell
  ) WHERE rn = 1
)""")
    return "".join(out)

def pq_fit(src):
    """Unrolled per-subspace kmeans (l2 assignment) over `src`(vec_id, i, fv FLOAT):
    -> sv (quantized subvector elems), pqcF + pnF (final codebooks), codes."""
    out = [f""",
sv AS MATERIALIZED (
  SELECT vec_id, CAST(floor((i - 1) / {SUBD}) AS INT) AS sub,
    CAST((i - 1) % {SUBD} AS INT) + 1 AS j,
    CAST(floor(CAST(fv AS DOUBLE) * 10000) AS BIGINT) AS q
  FROM {src}
),
pcf0 AS MATERIALIZED (
  SELECT CAST(floor((i - 1) / {SUBD}) AS INT) AS sub, CAST(vec_id AS INT) AS cell,
    CAST((i - 1) % {SUBD} AS INT) + 1 AS j, CAST(fv AS FLOAT) AS cf
  FROM {src} WHERE vec_id < {KSUB}
)"""]
    for t in range(1, ITERS + 1):
        out.append(f""",
pqc{t - 1} AS MATERIALIZED (
  SELECT sub, cell, j, CAST(floor(CAST(cf AS DOUBLE) * 10000) AS BIGINT) AS qc FROM pcf{t - 1}
),
pn{t - 1} AS MATERIALIZED (
  SELECT sub, cell, CAST(sum(qc * qc) AS BIGINT) AS c_n2 FROM pqc{t - 1} GROUP BY sub, cell
),
pa{t} AS MATERIALIZED (
  SELECT vec_id, sub, cell FROM (
    SELECT d.vec_id, d.sub, d.cell,
      row_number() OVER (PARTITION BY d.vec_id, d.sub
        ORDER BY 2 * d.dot - n.c_n2 DESC, d.cell) AS rn
    FROM (SELECT v.vec_id, v.sub, c.cell, CAST(sum(v.q * c.qc) AS BIGINT) AS dot
          FROM sv v JOIN pqc{t - 1} c ON v.sub = c.sub AND v.j = c.j
          GROUP BY v.vec_id, v.sub, c.cell) d
    JOIN pn{t - 1} n ON n.sub = d.sub AND n.cell = d.cell
  ) WHERE rn = 1
),
pcf{t} AS MATERIALIZED (
  SELECT a.sub, a.cell, v.j,
    CAST(CAST(sum(v.q) AS DOUBLE) / 10000.0 / count(*) AS FLOAT) AS cf
  FROM pa{t} a JOIN sv v ON v.vec_id = a.vec_id AND v.sub = a.sub
  GROUP BY a.sub, a.cell, v.j
)""")
    out.append(f""",
pqcF AS MATERIALIZED (
  SELECT sub, cell, j, CAST(floor(CAST(cf AS DOUBLE) * 10000) AS BIGINT) AS qc FROM pcf{ITERS}
),
pnF AS MATERIALIZED (
  SELECT sub, cell, CAST(sum(qc * qc) AS BIGINT) AS c_n2 FROM pqcF GROUP BY sub, cell
),
codes AS MATERIALIZED (
  SELECT vec_id, sub, cell FROM (
    SELECT d.vec_id, d.sub, d.cell,
      row_number() OVER (PARTITION BY d.vec_id, d.sub
        ORDER BY 2 * d.dot - n.c_n2 DESC, d.cell) AS rn
    FROM (SELECT v.vec_id, v.sub, c.cell, CAST(sum(v.q * c.qc) AS BIGINT) AS dot
          FROM sv v JOIN pqcF c ON v.sub = c.sub AND v.j = c.j
          GROUP BY v.vec_id, v.sub, c.cell) d
    JOIN pnF n ON n.sub = d.sub AND n.cell = d.cell
  ) WHERE rn = 1
)""")
    return "".join(out)

# query-side: LUT of raw query subvectors vs final codebooks (plain dot)
PARTS = f""",
qsv AS MATERIALIZED (
  SELECT vec_id AS qid, CAST(floor((i - 1) / {SUBD}) AS INT) AS sub,
    CAST((i - 1) % {SUBD} AS INT) + 1 AS j,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS q
  FROM corpus, range(1, {DIM + 1}) r(i) WHERE vec_id < {NQ}
),
parts AS MATERIALIZED (
  SELECT v.qid, v.sub, c.cell, CAST(sum(v.q * c.qc) AS BIGINT) AS ps
  FROM qsv v JOIN pqcF c ON v.sub = c.sub AND v.j = c.j
  GROUP BY v.qid, v.sub, c.cell
)"""

RERANK = f""",
cand AS MATERIALIZED (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
      row_number() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id) AS rn
    FROM adc
  ) WHERE rn <= {REFINE * K}
),
rer AS MATERIALIZED (
  SELECT c.qid, c.vec_id, CAST(sum(vq.q * vv.q) AS BIGINT) AS dot_q
  FROM cand c
  JOIN qv vq ON vq.vec_id = c.qid
  JOIN qv vv ON vv.vec_id = c.vec_id AND vv.i = vq.i
  GROUP BY c.qid, c.vec_id
)
SELECT qid, vec_id, dot_q, CAST(rn AS BIGINT) AS rn FROM (
  SELECT qid, vec_id, dot_q,
    row_number() OVER (PARTITION BY qid ORDER BY dot_q DESC, vec_id) AS rn
  FROM rer
) WHERE rn <= {K}
ORDER BY qid, rn"""

RAW_SRC = f"""(SELECT vec_id, i, embedding[i] AS fv
  FROM corpus, range(1, {DIM + 1}) r(i))"""

if mode == "pq":
    # x103: PQ over raw vectors, ADC over the whole corpus, then re-rank.
    # qv is still needed for the exact re-rank dots.
    sql = f"""WITH corpus AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
qv AS MATERIALIZED (
  SELECT vec_id, i, CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS q
  FROM corpus, range(1, {DIM + 1}) r(i)
){pq_fit(RAW_SRC)}{PARTS},
adc AS MATERIALIZED (
  SELECT p.qid, c.vec_id, CAST(sum(p.ps) AS BIGINT) AS adc
  FROM codes c JOIN parts p ON p.sub = c.sub AND p.cell = c.cell
  WHERE p.qid <> c.vec_id
  GROUP BY p.qid, c.vec_id
){RERANK}"""
else:
    residual = mode == "residual"
    src = RAW_SRC if not residual else f"""(SELECT v.vec_id, v.i,
    CAST(CAST(v.fv AS DOUBLE) - CAST(cf.cf AS DOUBLE) AS FLOAT) AS fv
  FROM (SELECT vec_id, i, embedding[i] AS fv
        FROM corpus, range(1, {DIM + 1}) r(i)) v
  JOIN aF a ON a.vec_id = v.vec_id
  JOIN cf{ITERS} cf ON cf.cell = a.cell AND cf.pos = v.i)"""
    # probe: nprobe best coarse cells per query, keeping cdot
    adc_term = "CAST(sum(p.ps) + max(qc.cdot) AS BIGINT)" if residual \
        else "CAST(sum(p.ps) AS BIGINT)"
    sql = f"""WITH corpus AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
{coarse_kmeans()}{pq_fit(src)}{PARTS},
qcells AS MATERIALIZED (
  SELECT qid, cell AS ivf_cell, cdot FROM (
    SELECT v.vec_id AS qid, c.cell, CAST(sum(v.q * c.qc) AS BIGINT) AS cdot,
      row_number() OVER (PARTITION BY v.vec_id
        ORDER BY sum(v.q * c.qc) DESC, c.cell) AS rn
    FROM qv v JOIN qcF c ON v.i = c.pos
    WHERE v.vec_id < {NQ}
    GROUP BY v.vec_id, c.cell
  ) WHERE rn <= {NPROBE}
),
adc AS MATERIALIZED (
  SELECT p.qid, c.vec_id, {adc_term} AS adc
  FROM codes c
  JOIN aF a ON a.vec_id = c.vec_id
  JOIN qcells qc ON qc.ivf_cell = a.cell
  JOIN parts p ON p.qid = qc.qid AND p.sub = c.sub AND p.cell = c.cell
  WHERE p.qid <> c.vec_id
  GROUP BY p.qid, c.vec_id
){RERANK}"""

con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')")
t0 = time.time()
odf = con.execute(sql).df()
print(f"oracle rows: {len(odf)} in {time.time()-t0:.1f}s")
if spark_out:
    import pandas as pd
    files = sorted(glob.glob(f"{spark_out}/*.parquet"))
    sdf = pd.concat([pd.read_parquet(f) for f in files])
    cols = ["qid", "vec_id", "dot_q", "rn"]
    sdf = sdf.sort_values(["qid", "rn"]).reset_index(drop=True)
    odf = odf.sort_values(["qid", "rn"]).reset_index(drop=True)
    ok = len(sdf) == len(odf) and sdf[cols].astype("int64").equals(odf[cols].astype("int64"))
    print("MATCH" if ok else "MISMATCH")
    if not ok:
        m = sdf.merge(odf, on=["qid", "rn"], suffixes=("_s", "_o"))
        print(m[(m.vec_id_s != m.vec_id_o) | (m.dot_q_s != m.dot_q_o)].head(12))
