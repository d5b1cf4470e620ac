package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming
import graft.queries.ExtShared._

/** §2.8 judged queries — corpus curation: sampling, mixing, splits, packing, privacy. */
private[queries] object ExtQCuration {

  val qs: Seq[Q] = Seq(

    // deterministic content-hash train/valid/test split (~80/10/10):
    // assignment is a pure function of the key — reproducible across
    // runs, engines, and repartitionings, unlike any rand() path
    Q.df("x90_hash_split",
      (s, dir) => Sampling.hashSplit(Tables.load(s, dir, "documents"), "doc_id"),
      """SELECT doc_id,
        |  CASE WHEN h < 'cc' THEN 'train'
        |       WHEN h < 'e6' THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
        |      FROM documents) x
        |ORDER BY doc_id""".stripMargin),


    // stratified deterministic sampling: same hash rule inside every
    // stratum keeps strata proportionally represented, no coordination
    Q.df("x91_stratified_sample",
      (s, dir) => Sampling.stratifiedSample(
        Tables.load(s, dir, "documents"), "source", "doc_id", 64),
      """SELECT source, count(*) AS n_total,
        |  CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(floor(10000.0 * sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
        |                               THEN 1 ELSE 0 END) / count(*)) AS BIGINT)
        |    AS kept_x10k
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),


    // balanced per-stratum downsample: exactly n rows per stratum by
    // smallest content hash — the class-balancing step of a training
    // mix, deterministic and stable under corpus growth
    Q.df("x108_balanced_sample",
      (s, dir) => Sampling.balancedSample(
        Tables.load(s, dir, "documents"), "source", "doc_id", 5),
      """SELECT source, doc_id, h FROM (
        |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents
        |) x WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin),


    // per-group winsorization: clip event values into their type's
    // [p10, p90] band — the robust-statistics outlier treatment before
    // any mean-based downstream stat; groupwise percentiles + join-back
    // + least/greatest, all integer outputs (value is clipped cents)
    Q.sql2("x104_winsorize",
      """SELECT e.event_id, e.event_type,
        |  CAST(least(greatest(floor(e.value * 100), p.lo), p.hi) AS BIGINT)
        |    AS clipped_cents
        |FROM events e
        |JOIN (SELECT event_type,
        |        percentile_disc(0.1) WITHIN GROUP (ORDER BY floor(value * 100)) AS lo,
        |        percentile_disc(0.9) WITHIN GROUP (ORDER BY floor(value * 100)) AS hi
        |      FROM events GROUP BY event_type) p
        |  ON e.event_type = p.event_type
        |WHERE e.event_id < 3000
        |ORDER BY e.event_id""".stripMargin,
      """SELECT e.event_id, e.event_type,
        |  CAST(least(greatest(floor(e.value * 100), p.lo), p.hi) AS BIGINT)
        |    AS clipped_cents
        |FROM events e
        |JOIN (SELECT event_type,
        |        quantile_disc(floor(value * 100), 0.1) AS lo,
        |        quantile_disc(floor(value * 100), 0.9) AS hi
        |      FROM events GROUP BY event_type) p
        |  ON e.event_type = p.event_type
        |WHERE e.event_id < 3000
        |ORDER BY e.event_id""".stripMargin),


    // PII scrub: redact URLs, emails, digit runs (privacy pass before
    // training); narrow regexp_replace chain, zero shuffles
    Q.df("x94_pii_scrub",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        ev.where(col("event_id") < 2000)
          .select(col("event_id"), TextStats.scrub(col("props")).as("scrubbed"))
          .orderBy("event_id")
      },
      """SELECT event_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(props, 'https?://[^ ]+', '<URL>', 'g'),
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]+', '<N>', 'g') AS scrubbed
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin),


    // the sketch-based winsorize (x104's documented 100 TB path): clip
    // bounds read off per-group cumulative 50-cent equi-width histogram
    // bins (the mergeable one-pass sketch of x107) instead of exact
    // per-group percentile sorts; bin edges are exact integers so the
    // whole query is engine-identical and fully oracle-checked
    Q.sql("x113_winsorize_binned",
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100 / 50) AS BIGINT) AS bin, count(*) AS c
        |  FROM events GROUP BY event_type, bin
        |), cum AS (
        |  SELECT event_type, bin, c,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM b
        |), q AS (
        |  SELECT event_type,
        |    CAST(min(CASE WHEN cum >= 0.10 * n THEN bin * 50 END) AS BIGINT) AS lo,
        |    CAST(min(CASE WHEN cum >= 0.90 * n THEN bin * 50 END) AS BIGINT) AS hi
        |  FROM cum GROUP BY event_type
        |)
        |SELECT e.event_id, e.event_type,
        |  CAST(least(greatest(floor(e.value * 100), q.lo), q.hi) AS BIGINT)
        |    AS clipped_cents
        |FROM events e JOIN q ON e.event_type = q.event_type
        |WHERE e.event_id < 3000
        |ORDER BY e.event_id""".stripMargin),


    // sequence packing (concat-and-chunk pretraining prep): documents
    // routed to 16 md5 buckets, packed greedily into 256-token context
    // windows by the running token total within each bucket — the only
    // shuffle is the bucket-partitioned window, so packing parallelizes
    // by bucket (raise the bucket count at scale, ext.Pack scaladoc)
    Q.df("x115_sequence_pack",
      (s, dir) => Pack.packManifest(Tables.load(s, dir, "documents"), 256),
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(instr('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
        |      AS bucket
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, bucket, n_tok,
        |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |), p AS (
        |  SELECT doc_id, bucket, n_tok,
        |    CAST(floor((cum - n_tok) / 256.0) AS BIGINT) AS pack_id
        |  FROM c
        |)
        |SELECT bucket, pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tok,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY bucket, pack_id
        |ORDER BY bucket, pack_id""".stripMargin),


    // THE END-TO-END CURATION PIPELINE — every stage above composed as
    // one DAG and judged as one query: quality gate (x78) -> exact
    // dedup keep-min (x55 family) -> near-dup keeper (x71 pipeline) ->
    // SimHash decontamination vs the held-out src19 split (x87) ->
    // sequence packing (x115). The oracle is the same five stages
    // composed as chained CTEs. Catches inter-stage schema drift that
    // no per-stage judgment sees; PlanSpec guards the single-raw-scan
    // property (every stage reads the pinned/checkpointed boundary).
    Q.df("x123_curation_pipeline",
      (s, dir) => Curation.curateStaged(s, dir, 256),
      """WITH RECURSIVE
        |tok0 AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
        |         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
        |  FROM documents
        |),
        |st AS (
        |  SELECT doc_id, count(*) AS n_tok,
        |    CAST(floor(10000.0 * sum(CASE WHEN w IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS stop_x10k,
        |    CAST(floor(10000.0 * sum(length(w)) / count(*)) AS BIGINT) AS avglen_x10k
        |  FROM tok0 GROUP BY doc_id
        |),
        |q AS (
        |  SELECT doc_id FROM st
        |  WHERE n_tok >= 20 AND stop_x10k >= 100
        |    AND avglen_x10k BETWEEN 30000 AND 80000
        |),
        |base1 AS (
        |  SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)
        |  WHERE d.source <> 'src19'
        |),
        |ex AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM (SELECT doc_id,
        |          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |        FROM base1)
        |  GROUP BY fp
        |),
        |base2 AS (SELECT b.* FROM base1 b JOIN ex USING (doc_id)),
        |tok AS (SELECT t.* FROM tok0 t JOIN base2 USING (doc_id)),
        |sh0 AS (
        |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
        |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        |),
        |keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 2),
        |sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS i
        |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |),
        |pairs AS (
        |  SELECT d1, d2 FROM inter
        |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
        |),
        |edges AS (
        |  SELECT d1 AS src, d2 AS dst FROM pairs
        |  UNION SELECT d2, d1 FROM pairs
        |),
        |reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM base2
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
        |),
        |labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
        |base3 AS (
        |  SELECT b.* FROM base2 b JOIN labels c ON b.doc_id = c.doc_id
        |  WHERE b.doc_id = c.cluster_id
        |),
        |nib AS (
        |  SELECT doc_id, j, instr('0123456789abcdef', substr(md5(w), j, 1)) - 1 AS v
        |  FROM tok0, range(1, 5) r(j)
        |),
        |bits AS (
        |  SELECT doc_id, (j - 1) * 4 + b.b AS pos,
        |    sum(CASE WHEN (v & b.mask) > 0 THEN 1 ELSE -1 END) AS s
        |  FROM nib, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) AS b(b, mask)
        |  GROUP BY doc_id, (j - 1) * 4 + b.b
        |),
        |sk AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s >= 0 THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id
        |),
        |base4 AS (
        |  SELECT b3.* FROM base3 b3
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM sk n JOIN sk o ON n.simhash = o.simhash
        |    JOIN documents dd ON o.doc_id = dd.doc_id
        |    WHERE n.doc_id = b3.doc_id AND dd.source = 'src19')
        |),
        |t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(instr('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
        |      AS bucket
        |  FROM base4
        |),
        |c AS (
        |  SELECT doc_id, bucket, n_tok,
        |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |),
        |p AS (
        |  SELECT doc_id, bucket, n_tok,
        |    CAST(floor((cum - n_tok) / 256.0) AS BIGINT) AS pack_id
        |  FROM c
        |)
        |SELECT bucket, pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tok,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY bucket, pack_id
        |ORDER BY bucket, pack_id""".stripMargin),


    // score-ranked keep-best-n per stratum (the "best documents per
    // domain" curation cut): per-source top-3 by length via the bounded
    // -heap aggregate — the shuffle carries at most k rows per
    // (partition, source), where the window formulation (the oracle)
    // sorts every row; plan-guarded window-free
    Q.df("x120_best_per_source",
      (s, dir) => {
        val fn = graft.functions.TopKAgg.register(s, 3)
        Tables.load(s, dir, "documents")
          .groupBy("source")
          .agg(call_function(fn, col("n_chars"), col("doc_id")).as("top"))
          .select(col("source"), posexplode(col("top")).as(Seq("i", "t")))
          .select(col("source"), col("t.id").as("doc_id"),
            col("t.score").as("n_chars"),
            (col("i") + 1).cast("bigint").as("rn"))
          .orderBy("source", "rn")
      },
      """SELECT source, doc_id, n_chars, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) x
        |WHERE rn <= 3 ORDER BY source, rn""".stripMargin),


    // temperature-based source mixing (alpha = 0.5): budget shares
    // proportional to sqrt(stratum size), rows picked as the smallest
    // content hashes — integer-exact targets, reproducible selection
    // (see Sampling.temperatureMix scaladoc)
    Q.df("x130_temperature_mix",
      (s, dir) => Sampling.temperatureMix(
        Tables.load(s, dir, "documents"), "source", "doc_id", 1000L),
      """WITH c AS (SELECT source, count(*) AS n_raw
        |           FROM documents GROUP BY source),
        |w AS (SELECT source, CAST(floor(sqrt(n_raw)) AS BIGINT) AS w FROM c),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS w_tot FROM w),
        |g AS (SELECT source, (1000 * w) // w_tot AS target FROM w, t),
        |r AS (SELECT source, doc_id,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |      FROM documents)
        |SELECT r.source, r.doc_id FROM r JOIN g USING (source)
        |WHERE r.rn <= g.target
        |ORDER BY r.source, r.doc_id""".stripMargin),


    // split-and-carry sequence packing (window 64 < the longest doc,
    // so documents genuinely overflow): one row per (document, pack)
    // segment; every pack fills to exactly 64 tokens except each
    // bucket's last, every token lands in exactly one segment (see
    // Pack.packSegments; ExtSpec stitches the segments back together)
    Q.df("x155_pack_segments",
      (s, dir) => Pack.packSegments(Tables.load(s, dir, "documents"), 64),
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(instr('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
        |      AS bucket
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, bucket, n_tok,
        |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |), p AS (
        |  SELECT doc_id, bucket, n_tok,
        |    CAST(cum - n_tok AS BIGINT) AS off
        |  FROM c
        |), seg AS (
        |  SELECT bucket, doc_id, n_tok, off,
        |    unnest(generate_series(off // 64, (off + n_tok - 1) // 64))
        |      AS pack_id
        |  FROM p
        |)
        |SELECT bucket, pack_id, doc_id,
        |  pack_id - off // 64 + 1 AS seg_no,
        |  greatest(off, pack_id * 64) - off AS seg_off,
        |  least(off + n_tok, (pack_id + 1) * 64)
        |    - greatest(off, pack_id * 64) AS seg_len
        |FROM seg
        |ORDER BY bucket, pack_id, doc_id, seg_no""".stripMargin),


    // reproducible per-epoch shuffle order: epoch e ranks rows by
    // md5(e:key) — a pure function of (epoch, row), regenerable for
    // any shard on any cluster; materialized via range-partitioned
    // sort + zipWithIndex (the x132 shape), never a per-epoch
    // SinglePartition window (see Sampling.epochShuffle)
    Q.df("x164_epoch_shuffle",
      (s, dir) => Sampling.epochShuffle(
        Tables.load(s, dir, "documents"), "doc_id", 3),
      """WITH e AS (
        |  SELECT doc_id, ep.epoch
        |  FROM documents, (VALUES (0), (1), (2)) AS ep(epoch)),
        |h AS (
        |  SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
        |    md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM e)
        |SELECT epoch, doc_id,
        |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) - 1
        |    AS BIGINT) AS ord
        |FROM h ORDER BY epoch, ord""".stripMargin),


    // the curation pipeline WITH the LM perplexity stage, judged as
    // ONE DAG end-to-end: quality gate -> x151 LM gate (bigram model
    // trained on the stage-1 survivors themselves, perplexity tail
    // dropped) -> exact dedup -> near-dup keeper -> decontamination ->
    // packing. The oracle is the x123 composition with the LM stage's
    // CTEs spliced in after base1 — catching any drift between the
    // judged standalone gate and its in-pipeline composition
    Q.df("x159_curation_lm_pipeline",
      (s, dir) => Curation.curateStaged(s, dir, 256, lmGate = true),
      """WITH RECURSIVE
        |tok0 AS MATERIALIZED (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
        |         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
        |  FROM documents
        |),
        |st AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n_tok,
        |    CAST(floor(10000.0 * sum(CASE WHEN w IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS stop_x10k,
        |    CAST(floor(10000.0 * sum(length(w)) / count(*)) AS BIGINT) AS avglen_x10k
        |  FROM tok0 GROUP BY doc_id
        |),
        |q AS (
        |  SELECT doc_id FROM st
        |  WHERE n_tok >= 20 AND stop_x10k >= 100
        |    AND avglen_x10k BETWEEN 30000 AND 80000
        |),
        |base1 AS MATERIALIZED (
        |  SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)
        |  WHERE d.source <> 'src19'
        |),
        |tokb1 AS MATERIALIZED (SELECT t.* FROM tok0 t JOIN base1 USING (doc_id)),
        |lmbig AS MATERIALIZED (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM tokb1 a JOIN tokb1 b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |),
        |lmbc AS MATERIALIZED (SELECT w1, w2, count(*) AS c2 FROM lmbig GROUP BY w1, w2),
        |lmpc AS MATERIALIZED (SELECT w1, count(*) AS c1 FROM lmbig GROUP BY w1),
        |lmv AS (SELECT count(DISTINCT w) AS v FROM tokb1),
        |lmterms AS (
        |  SELECT g.doc_id,
        |    (length(bin(p.c1 + v.v)) - 1) - (length(bin(b.c2 + 1)) - 1) AS nb
        |  FROM lmbig g JOIN lmbc b ON g.w1 = b.w1 AND g.w2 = b.w2
        |               JOIN lmpc p ON g.w1 = p.w1, lmv v
        |),
        |lmsc AS MATERIALIZED (
        |  SELECT doc_id,
        |    (100 * CAST(sum(nb) AS BIGINT)) // CAST(count(*) AS BIGINT) AS ppl
        |  FROM lmterms GROUP BY doc_id
        |),
        |lmn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lmsc),
        |lmh AS (SELECT ppl, count(*) AS c FROM lmsc GROUP BY ppl),
        |lmcum AS (SELECT ppl, CAST(sum(c) OVER (ORDER BY ppl) AS BIGINT) AS cum
        |          FROM lmh),
        |lmthr AS (SELECT min(CASE WHEN cum >= (2 * n + 2) // 3 THEN ppl END)
        |            AS t2 FROM lmcum, lmn),
        |base1b AS MATERIALIZED (
        |  SELECT b.* FROM base1 b JOIN lmsc s ON b.doc_id = s.doc_id, lmthr t
        |  WHERE s.ppl <= t.t2
        |),
        |ex AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM (SELECT doc_id,
        |          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |        FROM base1b)
        |  GROUP BY fp
        |),
        |base2 AS MATERIALIZED (SELECT b.* FROM base1b b JOIN ex USING (doc_id)),
        |tok AS MATERIALIZED (SELECT t.* FROM tok0 t JOIN base2 USING (doc_id)),
        |sh0 AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
        |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        |),
        |keep AS MATERIALIZED (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 2),
        |sh AS MATERIALIZED (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
        |sz AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS MATERIALIZED (
        |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS i
        |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |),
        |pairs AS MATERIALIZED (
        |  SELECT d1, d2 FROM inter
        |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
        |),
        |edges AS MATERIALIZED (
        |  SELECT d1 AS src, d2 AS dst FROM pairs
        |  UNION SELECT d2, d1 FROM pairs
        |),
        |reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM base2
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
        |),
        |labels AS MATERIALIZED (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
        |base3 AS MATERIALIZED (
        |  SELECT b.* FROM base2 b JOIN labels c ON b.doc_id = c.doc_id
        |  WHERE b.doc_id = c.cluster_id
        |),
        |nib AS MATERIALIZED (
        |  SELECT doc_id, j, instr('0123456789abcdef', substr(md5(w), j, 1)) - 1 AS v
        |  FROM tok0, range(1, 5) r(j)
        |),
        |bits AS MATERIALIZED (
        |  SELECT doc_id, (j - 1) * 4 + b.b AS pos,
        |    sum(CASE WHEN (v & b.mask) > 0 THEN 1 ELSE -1 END) AS s
        |  FROM nib, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) AS b(b, mask)
        |  GROUP BY doc_id, (j - 1) * 4 + b.b
        |),
        |sk AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s >= 0 THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id
        |),
        |base4 AS MATERIALIZED (
        |  SELECT b3.* FROM base3 b3
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM sk n JOIN sk o ON n.simhash = o.simhash
        |    JOIN documents dd ON o.doc_id = dd.doc_id
        |    WHERE n.doc_id = b3.doc_id AND dd.source = 'src19')
        |),
        |t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(instr('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
        |      AS bucket
        |  FROM base4
        |),
        |c AS (
        |  SELECT doc_id, bucket, n_tok,
        |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |),
        |p AS (
        |  SELECT doc_id, bucket, n_tok,
        |    CAST(floor((cum - n_tok) / 256.0) AS BIGINT) AS pack_id
        |  FROM c
        |)
        |SELECT bucket, pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tok,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY bucket, pack_id
        |ORDER BY bucket, pack_id""".stripMargin),


    // leakage-safe train/valid/test split: the hash-split rule applied
    // to the near-dup CLUSTER id instead of the document id — every
    // cluster member inherits one split, so a training document's near
    // duplicates can never contaminate valid/test. Oracle: the x66
    // recursive-CTE clustering + the same md5 bucket rule.
    Q.df("x167_cluster_safe_split",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Sampling.clusterSafeSplit(
          Dedup.clusters(docs,
            Dedup.jaccardPairs(docs, 0.2, maxDocFreq = Some(2))), "doc_id")
      },
      s"""WITH RECURSIVE $duckTok, ${duckShinglesFiltered(2)}, $duckJaccardTail,
         |pairs AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
         |), edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION SELECT d2, d1 FROM pairs
         |), reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
         |), lab AS (
         |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
         |)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'cc'
         |         THEN 'train'
         |       WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'e6'
         |         THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM lab ORDER BY doc_id""".stripMargin),


    // DSIR-style importance selection: per-token whole-bit log ratio
    // of add-one unigram models (target slice vs raw pool), top
    // quartile kept via the integer histogram threshold — make the
    // corpus look like the target domain, engine-exact (x151 family)
    Q.df("x171_importance_select",
      (s, dir) => LmQuality.importanceSelect(
        Tables.load(s, dir, "documents"),
        col("source").isin("src0", "src1", "src2")),
      """WITH tok AS (
        |  SELECT doc_id, source IN ('src0', 'src1', 'src2') AS is_t,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents),
        |cr AS (SELECT w, count(*) AS cr FROM tok GROUP BY 1),
        |ct AS (SELECT w, count(*) AS ct FROM tok WHERE is_t GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nr,
        |          CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |          CAST(count(DISTINCT w) AS BIGINT) AS v FROM tok),
        |terms AS (
        |  SELECT t.doc_id,
        |    (length(bin(coalesce(c2.ct, 0) + 1)) - 1)
        |      + (length(bin(tt.nr + tt.v)) - 1)
        |      - (length(bin(c1.cr + 1)) - 1)
        |      - (length(bin(tt.nt + tt.v)) - 1) AS nb
        |  FROM tok t JOIN cr c1 ON t.w = c1.w
        |  LEFT JOIN ct c2 ON t.w = c2.w, tot tt),
        |scored AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |    CAST(sum(nb) AS BIGINT) AS wbits,
        |    (100 * CAST(sum(nb) AS BIGINT)) // CAST(count(*) AS BIGINT)
        |      AS wpt_cb
        |  FROM terms GROUP BY doc_id),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
        |hist AS (SELECT wpt_cb, count(*) AS c FROM scored GROUP BY 1),
        |cum AS (SELECT wpt_cb,
        |          CAST(sum(c) OVER (ORDER BY wpt_cb DESC) AS BIGINT) AS cum
        |        FROM hist),
        |thr AS (SELECT max(CASE WHEN cum >= (n + 3) // 4 THEN wpt_cb END)
        |          AS t FROM cum, n)
        |SELECT d.doc_id, coalesce(s.n_tok, 0) AS n_tok,
        |  coalesce(s.wbits, 0) AS wbits, s.wpt_cb AS wpt_cb,
        |  (s.wpt_cb IS NOT NULL AND s.wpt_cb >= t.t) AS keep
        |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id, thr t
        |ORDER BY d.doc_id""".stripMargin),


    // cross-source overlap matrix: the near-dup pair list rolled up to
    // an unordered source x source count — which sources re-publish
    // each other; diagonal = within-source duplication. A free
    // by-product of the dedup run's own candidate pairs.
    Q.df("x174_source_overlap",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.sourceOverlap(docs,
          Dedup.jaccardPairs(docs, 0.2, maxDocFreq = Some(2)))
      },
      s"""WITH $duckTok, ${duckShinglesFiltered(2)}, $duckJaccardTail,
         |pairs AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
         |), lab AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS source_a,
         |  greatest(a.source, b.source) AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pairs p JOIN lab a ON p.d1 = a.doc_id
         |             JOIN lab b ON p.d2 = b.doc_id
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin),


    // exact-budget proportional mix: largest-remainder apportionment
    // makes per-source quotas sum EXACTLY to the budget (independent
    // rounding drifts by one per stratum); selection by smallest
    // content hash — deterministic, growth-stable; apportionment
    // windows run over the per-source count table only
    Q.df("x177_quota_mix",
      (s, dir) => Sampling.quotaMix(
        Tables.load(s, dir, "documents"), "source", "doc_id", 100L),
      """WITH counts AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM counts),
        |q0 AS (SELECT source, c, (100 * c) // t AS q0, (100 * c) % t AS rem
        |       FROM counts, tot),
        |spare AS (SELECT CAST(100 - sum(q0) AS BIGINT) AS r FROM q0),
        |quotas AS (
        |  SELECT source,
        |    q0 + (CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
        |                    <= (SELECT r FROM spare)
        |          THEN 1 ELSE 0 END) AS q
        |  FROM q0),
        |sel AS (
        |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT s.source, s.doc_id, s.h
        |FROM sel s JOIN quotas q ON s.source = q.source
        |WHERE s.rn <= q.q ORDER BY s.source, s.doc_id""".stripMargin),


    // distribution-matched resampling: a 100-doc pool sample whose
    // LENGTH DISTRIBUTION matches the eval slice's — exact decile
    // edges (percentile_disc), budget apportioned by target bin
    // shares (largest remainder), smallest-hash fill per bin
    Q.df("x178_distribution_match",
      (s, dir) => Sampling.distributionMatch(
        Tables.load(s, dir, "documents"),
        col("source") === "src19", "n_chars", "doc_id", 100L),
      {
        val qs = (1 until 10).map(i =>
          s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY cv)")
          .mkString(", ")
        s"""WITH lab AS (
           |  SELECT doc_id, n_chars AS cv, source = 'src19' AS is_t
           |  FROM documents),
           |edges AS (SELECT [$qs] AS edges FROM lab WHERE is_t),
           |tb AS (
           |  SELECT l.doc_id,
           |    len(list_filter(e.edges, x -> l.cv > x)) AS bin
           |  FROM lab l, edges e WHERE l.is_t),
           |counts AS (SELECT bin, CAST(count(*) AS BIGINT) AS c
           |           FROM tb GROUP BY 1),
           |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM counts),
           |q0 AS (SELECT bin, (100 * c) // t AS q0, (100 * c) % t AS rem
           |       FROM counts, tot),
           |spare AS (SELECT CAST(100 - sum(q0) AS BIGINT) AS r FROM q0),
           |quotas AS (
           |  SELECT bin,
           |    q0 + (CASE WHEN row_number() OVER (ORDER BY rem DESC, bin)
           |                    <= (SELECT r FROM spare)
           |          THEN 1 ELSE 0 END) AS q
           |  FROM q0),
           |pool AS (
           |  SELECT l.doc_id, l.cv,
           |    len(list_filter(e.edges, x -> l.cv > x)) AS bin,
           |    md5(CAST(l.doc_id AS VARCHAR)) AS h
           |  FROM lab l, edges e WHERE NOT l.is_t),
           |sel AS (
           |  SELECT pool.*, row_number() OVER (PARTITION BY bin
           |    ORDER BY h, doc_id) AS rn FROM pool)
           |SELECT s.bin, s.doc_id, s.cv, s.h
           |FROM sel s JOIN quotas q ON s.bin = q.bin
           |WHERE s.rn <= q.q ORDER BY s.bin, s.doc_id""".stripMargin
      }),


    // k-anonymity by local recoding: 3-rung generalization ladder
    // (balance to 100s -> to 1000s -> segment only), each rung counted
    // over the RESIDUAL so every emitted class provably has >= k
    // members; leftovers suppressed with a flag, never dropped
    Q.df("x182_k_anonymity",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val nation = col("c_nationkey").cast("string")
        val seg = col("c_mktsegment")
        def bal(w: Int) =
          (floor(col("c_acctbal") / w).cast("long") * w).cast("string")
        Privacy.kAnonymize(c, "c_custkey",
          Seq("nation", "segment", "balance"),
          Seq(Seq(nation, seg, bal(100)),
            Seq(nation, seg, bal(1000)),
            Seq(lit("*"), seg, lit("*"))), k = 5L)
      },
      """WITH b AS (
        |  SELECT c_custkey AS id,
        |    CAST(c_nationkey AS VARCHAR) AS n, c_mktsegment AS seg,
        |    CAST(CAST(floor(c_acctbal/100) AS BIGINT)*100 AS VARCHAR)
        |      AS b100,
        |    CAST(CAST(floor(c_acctbal/1000) AS BIGINT)*1000 AS VARCHAR)
        |      AS b1000
        |  FROM customer),
        |c0 AS (SELECT n, seg, b100, count(*) AS c FROM b GROUP BY 1,2,3),
        |a0 AS (SELECT b.*, c0.c AS c0 FROM b JOIN c0 USING (n, seg, b100)),
        |r1 AS (SELECT * FROM a0 WHERE c0 < 5),
        |c1 AS (SELECT n, seg, b1000, count(*) AS c FROM r1 GROUP BY 1,2,3),
        |a1 AS (SELECT r1.*, c1.c AS c1 FROM r1
        |       JOIN c1 USING (n, seg, b1000)),
        |r2 AS (SELECT * FROM a1 WHERE c1 < 5),
        |c2 AS (SELECT seg, count(*) AS c FROM r2 GROUP BY 1),
        |a2 AS (SELECT r2.*, c2.c AS c2 FROM r2 JOIN c2 USING (seg)),
        |out AS (
        |  SELECT id, 0 AS level, n AS nation, seg AS segment,
        |    b100 AS balance FROM a0 WHERE c0 >= 5
        |  UNION ALL SELECT id, 1, n, seg, b1000 FROM a1 WHERE c1 >= 5
        |  UNION ALL SELECT id, 2, '*', seg, '*' FROM a2 WHERE c2 >= 5
        |  UNION ALL SELECT id, 3, '*', seg, '*' FROM a2 WHERE c2 < 5)
        |SELECT id, level, nation, segment, balance
        |FROM out ORDER BY id""".stripMargin),


    // weighted systematic sampling: EXACTLY 100 draws with inclusion
    // probability proportional to n_chars, deterministic (content-hash
    // order on the cumulative-weight line); heavy docs may be drawn
    // multiple times (copies column); global cumsum built from 16-way
    // bucket windows + a 16-row offset table, never one partition
    Q.df("x193_weighted_sample",
      (s, dir) => Sampling.weightedSystematic(
        Tables.load(s, dir, "documents"), "doc_id", col("n_chars"), 100L),
      """WITH b AS (
        |  SELECT doc_id AS id, n_chars AS w,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents WHERE n_chars > 0),
        |c AS (
        |  SELECT id, w, CAST(sum(w) OVER (ORDER BY h, id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS ce
        |  FROM b),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM b)
        |SELECT id AS doc_id, w,
        |  ce * 100 // tw - (ce - w) * 100 // tw AS copies
        |FROM c, t
        |WHERE ce * 100 // tw - (ce - w) * 100 // tw > 0
        |ORDER BY doc_id""".stripMargin),


    // PII inventory audit: what the scrub pass WOULD redact, counted
    // hierarchically in scrub's replacement order so each character
    // lands in one class; PII injected deterministically (the x117
    // formula-twin trick) so every class is exercised
    Q.df("x194_pii_audit",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .withColumn("t", concat(col("props"),
            when(col("event_id") % 5 === 0,
              concat(lit(" contact user"), col("user_id"),
                lit("@example.com now")))
              .when(col("event_id") % 5 === 1,
                concat(lit(" see https://host/p/"), col("event_id"),
                  lit(" next")))
              .otherwise(lit(""))))
        TextStats.piiAudit(ev, "event_type", "t")
      },
      """WITH ev AS (
        |  SELECT event_type,
        |    props || CASE
        |      WHEN event_id % 5 = 0 THEN ' contact user' ||
        |        CAST(user_id AS VARCHAR) || '@example.com now'
        |      WHEN event_id % 5 = 1 THEN ' see https://host/p/' ||
        |        CAST(event_id AS VARCHAR) || ' next'
        |      ELSE '' END AS t
        |  FROM events),
        |cl AS (
        |  SELECT event_type, t,
        |    regexp_replace(t, 'https?://[^ ]+', '<URL>', 'g') AS t1
        |  FROM ev),
        |c2 AS (
        |  SELECT event_type,
        |    CAST(len(regexp_extract_all(t, 'https?://[^ ]+')) AS BIGINT)
        |      AS u,
        |    CAST(len(regexp_extract_all(t1,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
        |      AS BIGINT) AS e,
        |    CAST(len(regexp_extract_all(regexp_replace(t1,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
        |      '<EMAIL>', 'g'), '[0-9]+')) AS BIGINT) AS n
        |  FROM cl)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN u + e + n > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS rows_with_pii,
        |  CAST(sum(u) AS BIGINT) AS urls,
        |  CAST(sum(e) AS BIGINT) AS emails,
        |  CAST(sum(n) AS BIGINT) AS numbers
        |FROM c2 GROUP BY 1 ORDER BY event_type""".stripMargin),


    // join-preserving pseudonymization: keyed deterministic surrogate
    // (md5(salt:id)) replaces the raw id; the audit proves cardinality
    // preservation (n_users == n_tokens) and pins token VALUES via min
    Q.df("x210_pseudonymize",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val raw = ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users_raw"))
        Privacy.pseudonymize(ev, "user_id", "s1")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id_token")).as("n_tokens"),
            min(col("user_id_token")).as("min_token"))
          .join(raw, Seq("event_type"))
          .select(col("event_type"), col("n_events"), col("n_users_raw"),
            col("n_tokens"),
            (col("n_users_raw") === col("n_tokens")).cast("int")
              .as("cardinality_kept"),
            col("min_token"))
          .orderBy("event_type")
      },
      """WITH t AS (
        |  SELECT event_type, user_id,
        |    md5('s1:' || CAST(user_id AS VARCHAR)) AS token
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_raw,
        |  CAST(count(DISTINCT token) AS BIGINT) AS n_tokens,
        |  CAST(CASE WHEN count(DISTINCT user_id) = count(DISTINCT token)
        |    THEN 1 ELSE 0 END AS INTEGER) AS cardinality_kept,
        |  min(token) AS min_token
        |FROM t GROUP BY 1 ORDER BY event_type""".stripMargin),


    // the dataset card: one-row corpus datasheet (docs/sources/langs,
    // exact-dup rate, token+char volume, length percentiles) in ONE
    // aggregation pass — texts enter as md5 keys, never shuffled
    Q.df("x216_dataset_card",
      (s, dir) => TextStats.datasetCard(
        Tables.load(s, dir, "documents")),
      """WITH tok AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS n_tok
        |  FROM documents)
        |SELECT
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
        |  CAST((count(*) - count(DISTINCT md5(text))) * 1000000
        |    // count(*) AS BIGINT) AS dup_doc_ppm,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST((SELECT sum(n_tok) FROM tok) AS BIGINT) AS total_tokens,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
        |    AS BIGINT) AS p50_chars,
        |  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars)
        |    AS BIGINT) AS p99_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents""".stripMargin),


    // per-source shingle novelty: share of a source's distinct
    // shingles appearing NOWHERE else — "is this source adding
    // anything", the absolute complement of the x174 overlap matrix;
    // one distinct projection + two keyed aggs, shingles never pair
    Q.df("x233_source_novelty",
      (s, dir) => Dedup.sourceNovelty(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok, $duckShingles,
         |ss AS (
         |  SELECT DISTINCT sh.shingle, d.source
         |  FROM sh JOIN documents d USING (doc_id)),
         |spread AS (
         |  SELECT shingle, CAST(count(*) AS BIGINT) AS n_sources
         |  FROM ss GROUP BY 1)
         |SELECT ss.source, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN spread.n_sources = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS unique_shingles,
         |  CAST(sum(CASE WHEN spread.n_sources = 1 THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS novelty_ppm
         |FROM ss JOIN spread USING (shingle)
         |GROUP BY ss.source ORDER BY ss.source""".stripMargin),


    // cross-source duplication audit: pairwise exact shingle-set
    // Jaccard between sources via per-shingle source-set explosion
    // (bounded by |sources|²) — never a shingle self-join; the full
    // matrix INCLUDING zero-overlap pairs, because "no overlap" is
    // the finding a mixing decision needs
    Q.df("x244_source_overlap",
      (s, dir) => Dedup.sourceOverlapMatrix(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok, $duckShingles,
         |ss AS (
         |  SELECT DISTINCT d.source, s.shingle
         |  FROM sh s JOIN documents d USING (doc_id)
         |), sz AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM ss GROUP BY 1
         |), it AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(count(*) AS BIGINT) AS inter
         |  FROM ss a JOIN ss b
         |    ON a.shingle = b.shingle AND a.source < b.source
         |  GROUP BY 1, 2
         |)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  a.n AS n_a, b.n AS n_b,
         |  CAST(coalesce(it.inter, 0) AS BIGINT) AS inter,
         |  CAST(1000000 * coalesce(it.inter, 0)
         |       // (a.n + b.n - coalesce(it.inter, 0)) AS BIGINT) AS jac_ppm
         |FROM sz a JOIN sz b ON a.source < b.source
         |LEFT JOIN it ON it.src_a = a.source AND it.src_b = b.source
         |ORDER BY src_a, src_b""".stripMargin),


    // packing-efficiency audit: split-and-carry pack count IS the LP
    // lower bound ceil(tokens/window); the audit prices what that
    // optimality costs — split docs and carried tokens (attention
    // fragmentation) — per md5 bucket, before a tokenizer job runs
    Q.df("x255_packing_audit",
      (s, dir) => Pack.packingAudit(
        Tables.load(s, dir, "documents"), 96),
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(instr('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
        |      AS BIGINT) AS bucket
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, bucket, n_tok,
        |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |), p AS (
        |  SELECT bucket, n_tok, cum - n_tok AS off FROM c
        |), sp AS (
        |  SELECT bucket, n_tok, off,
        |    CASE WHEN (off + n_tok - 1) // 96 <> off // 96
        |      THEN 1 ELSE 0 END AS split,
        |    greatest(0, off + n_tok - (off // 96 + 1) * 96) AS carried
        |  FROM p
        |), a AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tok,
        |    CAST(sum(split) AS BIGINT) AS n_split_docs,
        |    CAST(sum(carried) AS BIGINT) AS carried_tok
        |  FROM sp GROUP BY 1)
        |SELECT bucket, n_docs, n_tok,
        |  (n_tok + 95) // 96 AS n_packs,
        |  (n_tok + 95) // 96 * 96 - n_tok AS pad_last,
        |  n_split_docs, carried_tok,
        |  carried_tok * 1000000 // n_tok AS carry_ppm
        |FROM a ORDER BY bucket""".stripMargin),


    // label-noise audit by leave-one-out 5-NN consensus: probes whose
    // neighborhood plurality label disagrees with their own are
    // flagged — the mislabeling-rate estimate per label; bounded
    // top-k heap per probe, never a window over scored pairs
    Q.df("x256_label_noise",
      (s, dir) => Similarity.labelNoiseAudit(
        Tables.load(s, dir, "embeddings"), 200, 5),
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlabel
        |           FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT q.qid, q.qlabel, e.vec_id, e.label,
        |    CAST(sum(CAST(floor(CAST(qe[i] AS DOUBLE) * 10000) AS BIGINT)
        |      * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000)
        |        AS BIGINT)) AS BIGINT) AS dot_q
        |  FROM q, embeddings e, range(1, 65) r(i)
        |  WHERE e.vec_id <> q.qid
        |  GROUP BY 1, 2, 3, 4),
        |ranked AS (
        |  SELECT qid, qlabel, label, row_number() OVER (PARTITION BY qid
        |    ORDER BY dot_q DESC, vec_id) AS rn
        |  FROM pairs),
        |votes AS (
        |  SELECT qid, qlabel, label, count(*) AS votes
        |  FROM ranked WHERE rn <= 5 GROUP BY 1, 2, 3),
        |best AS (
        |  SELECT qid, qlabel, label, row_number() OVER (PARTITION BY qid
        |    ORDER BY votes DESC, label) AS vr
        |  FROM votes),
        |f AS (
        |  SELECT qid, qlabel,
        |    CASE WHEN label <> qlabel THEN 1 ELSE 0 END AS flagged
        |  FROM best WHERE vr = 1)
        |SELECT qlabel AS label, CAST(count(*) AS BIGINT) AS n_probes,
        |  CAST(sum(flagged) AS BIGINT) AS n_flagged,
        |  CAST(sum(flagged) * 1000000 // count(*) AS BIGINT) AS flag_ppm,
        |  min(CASE WHEN flagged = 1 THEN qid END) AS example_qid
        |FROM f GROUP BY 1 ORDER BY label""".stripMargin),


    // right-to-be-forgotten purge audit: victim customers
    // (c_custkey % 13 = 0) cascade through orders to lineitems, plus
    // the directly-keyed events table; per-table purge/retain counts
    // with DECIMAL(38,0) retained-key checksums — the GDPR erasure
    // ledger, computed with one broadcast victim list and one scan
    // per fact table
    Q.df("x262_purge_audit",
      (s, dir) => Privacy.purgeAudit(
        Tables.load(s, dir, "customer"), Tables.load(s, dir, "orders"),
        Tables.load(s, dir, "lineitem"), Tables.load(s, dir, "events"),
        Tables.load(s, dir, "customer")
          .where(col("c_custkey") % 13 === 0)
          .select(col("c_custkey").as("k"))),
      """WITH v AS (SELECT c_custkey AS k FROM customer
        |           WHERE c_custkey % 13 = 0),
        |po AS (SELECT o_orderkey FROM orders
        |       WHERE o_custkey IN (SELECT k FROM v))
        |SELECT * FROM (
        |  SELECT 'customer' AS tbl,
        |    CAST(sum(CASE WHEN c_custkey IN (SELECT k FROM v)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
        |    CAST(sum(CASE WHEN c_custkey IN (SELECT k FROM v)
        |      THEN 0 ELSE 1 END) AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN c_custkey IN (SELECT k FROM v)
        |      THEN 0 ELSE c_custkey END) AS BIGINT) AS retained_key_sum
        |  FROM customer
        |  UNION ALL
        |  SELECT 'orders',
        |    CAST(sum(CASE WHEN o_custkey IN (SELECT k FROM v)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(CASE WHEN o_custkey IN (SELECT k FROM v)
        |      THEN 0 ELSE 1 END) AS BIGINT),
        |    CAST(sum(CASE WHEN o_custkey IN (SELECT k FROM v)
        |      THEN 0 ELSE o_orderkey END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem',
        |    CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM po)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM po)
        |      THEN 0 ELSE 1 END) AS BIGINT),
        |    CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM po)
        |      THEN 0 ELSE l_orderkey * 7 + l_linenumber END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'events',
        |    CAST(sum(CASE WHEN user_id IN (SELECT k FROM v)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(CASE WHEN user_id IN (SELECT k FROM v)
        |      THEN 0 ELSE 1 END) AS BIGINT),
        |    CAST(sum(CASE WHEN user_id IN (SELECT k FROM v)
        |      THEN 0 ELSE event_id END) AS BIGINT)
        |  FROM events)
        |ORDER BY tbl""".stripMargin),


    // curriculum ordering: easy-first tiers (n_chars div 100),
    // deterministic md5 shuffle within tier, global position via the
    // distributed zipWithIndex shape — judged on every 97th position
    // so the oracle checks the whole ORDER, not tier totals
    Q.df("x290_curriculum_order",
      (s, dir) => Sampling.curriculumOrder(
        Tables.load(s, dir, "documents"), "doc_id",
        expr("n_chars div 100"), "42"),
      """WITH d AS (
        |  SELECT doc_id, n_chars // 100 AS tier,
        |    md5('42' || ':' || doc_id) AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, tier,
        |    row_number() OVER (ORDER BY tier, h, doc_id) AS rank
        |  FROM d)
        |SELECT CAST(rank AS BIGINT) AS rank, doc_id,
        |  CAST(tier AS BIGINT) AS tier
        |FROM r WHERE (rank - 1) % 97 = 0 ORDER BY rank""".stripMargin),


    // l-diversity audit: the homogeneity-attack check k-anonymity
    // misses — per QI class, size AND distinct sensitive values, one
    // keyed agg + 1-row rollup; k=5, l=3 on (nation, segment) with
    // the acctbal-thousands bucket as the sensitive attribute
    Q.df("x294_l_diversity",
      (s, dir) => Privacy.lDiversityAudit(
        Tables.load(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"),
        expr("CAST(floor(c_acctbal / 1000) AS BIGINT)"), 5L, 3L),
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(count(*) AS BIGINT) AS sz,
        |    CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |      AS BIGINT) AS ldiv
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS k_violating_classes,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk_k,
        |  CAST(sum(CASE WHEN ldiv < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS l_violating_classes,
        |  CAST(sum(CASE WHEN ldiv < 3 THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk_l,
        |  min(sz) AS min_class_size, min(ldiv) AS min_l
        |FROM cls""".stripMargin),


    // epoch waterfilling: closed-form capped token-budget allocation
    // over the per-source mass table, exact-integer water level +
    // largest-remainder top-up
    Q.df("x308_epoch_waterfill",
      (s, dir) => Sampling.epochWaterfill(
        Tables.load(s, dir, "documents"), "source", col("n_chars"),
        3, 17L, 10L),
      """WITH sizes AS (SELECT source AS s, CAST(sum(n_chars) AS BIGINT) AS n
        |               FROM documents GROUP BY 1),
        |caps AS (SELECT s, n, 3 * n AS cap FROM sizes),
        |tot AS (SELECT CAST(sum(n) * 17 // 10 AS BIGINT) AS bud,
        |               CAST(count(*) AS BIGINT) AS m FROM sizes),
        |st AS (SELECT s, n, cap, bud, m,
        |    CAST(row_number() OVER (ORDER BY cap, s) AS BIGINT) AS k,
        |    CAST(sum(cap) OVER (ORDER BY cap, s ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS sk
        |  FROM caps, tot),
        |flags AS (SELECT *, (sk + (m - k) * cap <= bud) AS ok FROM st),
        |kst AS (SELECT CAST(coalesce(sum(CASE WHEN ok THEN 1 END), 0)
        |      AS BIGINT) AS kstar,
        |    CAST(coalesce(max(CASE WHEN ok THEN sk END), 0) AS BIGINT)
        |      AS skstar FROM flags),
        |based AS (SELECT f.*, kstar, skstar,
        |    CASE WHEN kstar < m THEN (bud - skstar) // (m - kstar) END AS lam,
        |    CASE WHEN k <= kstar THEN cap ELSE least(cap,
        |      CASE WHEN kstar < m THEN (bud - skstar) // (m - kstar) END)
        |    END AS base
        |  FROM flags f, kst),
        |sp AS (SELECT CAST(max(bud) - sum(base) AS BIGINT) AS r FROM based),
        |bumped AS (SELECT b.*, r,
        |    (k > kstar AND cap > lam) AS eligible,
        |    CAST(sum(CASE WHEN (k > kstar AND cap > lam) THEN 1 ELSE 0 END)
        |      OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND
        |        CURRENT ROW) AS BIGINT) AS brank
        |  FROM based b, sp)
        |SELECT s AS source, n AS native_tokens, cap AS cap_tokens,
        |  CAST(base + CASE WHEN eligible AND brank <= r THEN 1 ELSE 0 END
        |    AS BIGINT) AS alloc_tokens,
        |  CAST((base + CASE WHEN eligible AND brank <= r THEN 1 ELSE 0 END)
        |    * 1000 // n AS BIGINT) AS epochs_x1000
        |FROM bumped ORDER BY source""".stripMargin),


    // inverse-frequency length-balancing sampling weights per
    // 50-char bucket
    Q.df("x318_length_balance",
      (s, dir) => Sampling.lengthBalanceWeights(
        Tables.load(s, dir, "documents")),
      """WITH b AS (SELECT CAST(n_chars // 50 AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |    CAST(count(*) AS BIGINT) AS n_buckets FROM b)
        |SELECT bucket, n_docs,
        |  n_docs * 1000000 // n_total AS share_ppm,
        |  n_total * 1000000 // (n_buckets * n_docs) AS weight_ppm
        |FROM b CROSS JOIN t ORDER BY bucket""".stripMargin),


    // class-balance audit: effective class count (inverse Simpson,
    // milli) + max/min imbalance over the embeddings labels
    Q.df("x320_class_balance",
      (s, dir) => Profile.classBalance(Tables.load(s, dir, "embeddings")),
      """WITH l AS (SELECT label, CAST(count(*) AS BIGINT) AS c
        |  FROM embeddings GROUP BY 1),
        |a AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_classes,
        |    CAST(sum(c * c) AS BIGINT) AS sumsq,
        |    CAST(max(c) AS BIGINT) AS max_n,
        |    CAST(min(c) AS BIGINT) AS min_n FROM l)
        |SELECT n_rows, n_classes,
        |  CAST(CAST(n_rows AS HUGEINT) * n_rows * 1000 // sumsq
        |    AS BIGINT) AS eff_classes_milli,
        |  max_n, min_n, max_n * 1000 // min_n AS imbalance_milli
        |FROM a""".stripMargin),


    // t-closeness of the value distribution per event_type vs global:
    // ordered EMD over the global cents grid, exact ppm
    Q.df("x324_t_closeness",
      (s, dir) => Privacy.tCloseness(Tables.load(s, dir, "events"),
        "event_type", expr("CAST(floor(value * 100) AS BIGINT)")),
      """WITH vc AS (SELECT event_type AS qi,
        |    CAST(floor(value * 100) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |gdist AS (SELECT v, CAST(sum(c) AS BIGINT) AS cg
        |  FROM vc GROUP BY 1),
        |qis AS (SELECT DISTINCT qi FROM vc),
        |grid AS (SELECT q.qi, g.v, g.cg, coalesce(vc.c, 0) AS c
        |  FROM qis q CROSS JOIN gdist g
        |  LEFT JOIN vc ON vc.qi = q.qi AND vc.v = g.v),
        |st AS (SELECT qi, v,
        |    sum(c) OVER (PARTITION BY qi ORDER BY v) AS cum_q,
        |    sum(cg) OVER (PARTITION BY qi ORDER BY v) AS cum_g
        |  FROM grid),
        |ng AS (SELECT qi, CAST(sum(c) AS BIGINT) AS n_g
        |  FROM vc GROUP BY 1),
        |tot AS (SELECT CAST(sum(cg) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS m FROM gdist)
        |SELECT st.qi AS qi, n_g AS n_rows,
        |  CAST(CAST(sum(abs(cum_q * n - cum_g * n_g)) AS HUGEINT)
        |    * 1000000 // (n_g * n * (m - 1)) AS BIGINT) AS emd_ppm
        |FROM st JOIN ng USING (qi) CROSS JOIN tot
        |GROUP BY 1, 2, n, m ORDER BY qi""".stripMargin),


    // per-user contribution bounding audit: discrete p99 clamp and
    // exactly how many rows it would drop, per event_type
    Q.df("x325_contribution_bounds",
      (s, dir) => Privacy.contributionBounds(
        Tables.load(s, dir, "events"), "event_type", "user_id"),
      """WITH cu AS (SELECT event_type AS cell, user_id AS u,
        |    CAST(count(*) AS BIGINT) AS c FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |st AS (SELECT cell, CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(max(c) AS BIGINT) AS max_rows_user,
        |    CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY c)
        |      AS BIGINT) AS p99_rows
        |  FROM cu GROUP BY 1)
        |SELECT st.cell AS cell, n_rows, n_users, max_rows_user, p99_rows,
        |  CAST(sum(greatest(c - p99_rows, 0)) AS BIGINT) AS excess_rows,
        |  CAST(sum(greatest(c - p99_rows, 0)) * 1000000 // n_rows
        |    AS BIGINT) AS excess_ppm
        |FROM cu JOIN st USING (cell)
        |GROUP BY 1, 2, 3, 4, 5 ORDER BY cell""".stripMargin),


    // coverage-floor sample: >= 2 docs per (source, lang) cell
    // guaranteed, hash-ordered top-up to 400
    Q.df("x337_coverage_floor",
      (s, dir) => Sampling.coverageFloorSample(
        Tables.load(s, dir, "documents"), 2, 400),
      """WITH b AS (SELECT doc_id, source, lang,
        |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |rn AS (SELECT b.*, row_number() OVER
        |    (PARTITION BY source, lang ORDER BY h, doc_id) AS rn
        |  FROM b),
        |fl AS (SELECT doc_id, source, lang FROM rn WHERE rn <= 2),
        |g AS (SELECT count(*) AS ng FROM fl),
        |rest AS (SELECT b.* FROM b
        |  WHERE doc_id NOT IN (SELECT doc_id FROM fl)),
        |grn AS (SELECT doc_id, source, lang, row_number() OVER
        |    (ORDER BY h, doc_id) AS rn2 FROM rest)
        |SELECT doc_id, source, lang, 'floor' AS picked_by FROM fl
        |UNION ALL
        |SELECT doc_id, source, lang, 'topup' FROM grn CROSS JOIN g
        |WHERE rn2 <= 400 - ng
        |ORDER BY doc_id""".stripMargin),


    // Neyman-optimal stratified allocation (Neyman 1934): budget seats
    // apportioned across market segments by N_h * S_h of floored
    // account balance — N_h*S_h taken EXACTLY as the corrected
    // floor-sqrt of n*Sx2 - Sx^2, seats by largest remainder,
    // within-stratum selection smallest-md5-first. The oracle
    // re-derives the exact selected set (min/max selected key pins
    // the selection order, not just the counts).
    Q.df("x407_neyman_allocation",
      (s, dir) => Sampling.neymanAllocation(
        Tables.load(s, dir, "customer"), "c_mktsegment", "c_custkey",
        floor(col("c_acctbal")), 1000L),
      """WITH m AS (
        |  SELECT c_mktsegment AS s, CAST(c_custkey AS BIGINT) AS k,
        |         CAST(floor(c_acctbal) AS BIGINT) AS x
        |  FROM customer),
        |mom AS (SELECT s, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |               sum(x*x) AS sxx FROM m GROUP BY 1),
        |w0 AS (SELECT s, n, n*sxx - sx*sx AS v,
        |       CAST(floor(sqrt(CAST(n*sxx - sx*sx AS DOUBLE))) AS BIGINT) AS s0
        |       FROM mom),
        |w1 AS (SELECT s, n, v,
        |       CASE WHEN (s0+1)*(s0+1) <= v THEN s0+1 ELSE s0 END AS s1 FROM w0),
        |w AS (SELECT s, n,
        |      CASE WHEN s1*s1 > v THEN s1-1 ELSE s1 END AS nsd FROM w1),
        |tot AS (SELECT sum(nsd) AS t FROM w),
        |q0 AS (SELECT s, n, nsd, (1000*nsd)//t AS q0, (1000*nsd)%t AS rem
        |       FROM w, tot),
        |sp AS (SELECT 1000 - sum(q0) AS r FROM q0),
        |al AS (SELECT s, n, nsd,
        |       q0 + CASE WHEN row_number() OVER (ORDER BY rem DESC, s)
        |                      <= (SELECT r FROM sp) THEN 1 ELSE 0 END AS alloc
        |       FROM q0),
        |sel AS (SELECT s, k,
        |        row_number() OVER (PARTITION BY s
        |          ORDER BY md5(CAST(k AS VARCHAR)), k) AS rk FROM m)
        |SELECT a.s AS c_mktsegment, a.n AS n_pop, a.nsd,
        |  CAST(a.alloc AS BIGINT) AS alloc,
        |  CAST(count(CASE WHEN sel.rk <= a.alloc THEN 1 END) AS BIGINT) AS n_sampled,
        |  min(CASE WHEN sel.rk <= a.alloc THEN sel.k END) AS min_key,
        |  max(CASE WHEN sel.rk <= a.alloc THEN sel.k END) AS max_key
        |FROM al a JOIN sel ON a.s = sel.s
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin),

    // Token-balanced shard manifest: serpentine assignment over the
    // (n_tok DESC, doc_id) order into 8 shards — the output-sharding
    // balance audit. doc_sum pins the exact assignment set, so a rank
    // or lap-direction bug is a hash mismatch, not a rounding blur.
    Q.df("x408_shard_balance",
      (s, dir) => Pack.shardBalance(
        Tables.load(s, dir, "documents"), 8),
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (SELECT doc_id, n_tok,
        |      CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id)
        |           AS BIGINT) - 1 AS r0
        |      FROM t),
        |a AS (SELECT doc_id, n_tok,
        |      CASE WHEN (r0 // 8) % 2 = 0 THEN r0 % 8
        |           ELSE 7 - (r0 % 8) END AS shard
        |      FROM r),
        |tot AS (SELECT sum(n_tok) AS tt FROM t)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tok,
        |  CAST(sum(n_tok) * 8 * 1000000 // (SELECT tt FROM tot) AS BIGINT)
        |    AS ppm_of_ideal,
        |  CAST(sum(doc_id) AS BIGINT) AS doc_sum,
        |  CAST(max(n_tok) AS BIGINT) AS max_doc_tok
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin)
  )
}
