package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming
import graft.queries.ExtShared._

/** §2.8 judged queries — profiling, drift, audits, distribution statistics. */
private[queries] object ExtQStats {

  val qs: Seq[Q] = Seq(

    // ---- approx sketches ------------------------------------------------
    // DuckDB's HLL differs from Spark's by design, so the raw estimate
    // can never hash-match an oracle. Since round 15 the approx tiers
    // are judged as BOUND CHECKS instead of rows-only (VERDICT r14
    // task #5): the query emits the EXACT twin (engine-identical) plus
    // a boolean "estimate inside its error envelope" computed
    // Spark-side; the oracle re-derives the exact columns and asserts
    // the boolean as literal TRUE. A sketch drifting out of spec now
    // FAILS the driver's hash compare instead of hiding in rows-only.
    Q.df("x63_approx_distinct",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        ev.groupBy("event_type")
          .agg(approx_count_distinct(col("user_id")).as("approx_users"),
            countDistinct(col("user_id")).as("exact_users"))
          // 3 standard errors of the default rsd 0.05 (the ExtSpec
          // bound, floored at ±2 for tiny groups)
          .select(col("event_type"), col("exact_users"),
            (abs(col("approx_users") - col("exact_users")).cast("double")
              <= greatest(lit(2.0), lit(0.15) * col("exact_users")))
              .as("hll_ok"))
          .orderBy("event_type")
      },
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS hll_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),


    // histogram-sketch quantile estimation: one pass builds a 1024-bin
    // equi-width histogram (mergeable, streaming-friendly — the
    // deterministic cousin of t-digest); quantiles read off the
    // cumulative bin counts. Bin edges are exact integers, so the
    // estimate is engine-identical; the exact-percentile q82 is the
    // per-group sort-based alternative this avoids at scale
    Q.sql("x107_binned_quantiles",
      """WITH bins AS (
        |  SELECT CAST(floor(l_extendedprice / 110) AS BIGINT) AS bin,
        |         count(*) AS c
        |  FROM lineitem GROUP BY 1
        |), cum AS (
        |  SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum,
        |         (SELECT count(*) FROM lineitem) AS n
        |  FROM bins
        |)
        |SELECT
        |  CAST(min(CASE WHEN cum >= 0.50 * n THEN bin * 110 END) AS BIGINT) AS p50_est,
        |  CAST(min(CASE WHEN cum >= 0.90 * n THEN bin * 110 END) AS BIGINT) AS p90_est,
        |  CAST(min(CASE WHEN cum >= 0.99 * n THEN bin * 110 END) AS BIGINT) AS p99_est
        |FROM cum""".stripMargin),


    // their source's median length (groupwise percentile + semi-join
    // back — the "filter by corpus statistic" shape)
    Q.df("x92_median_length_filter",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.createOrReplaceTempView("documents")
        s.sql(
          """SELECT d.doc_id, d.source, d.n_chars, m.med_chars
            |FROM documents d
            |JOIN (SELECT source,
            |        CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
            |          AS BIGINT) AS med_chars
            |      FROM documents GROUP BY source) m
            |  ON d.source = m.source
            |WHERE d.n_chars > m.med_chars
            |ORDER BY d.doc_id""".stripMargin)
      },
      """SELECT d.doc_id, d.source, d.n_chars, m.med_chars
        |FROM documents d
        |JOIN (SELECT source, CAST(quantile_disc(n_chars, 0.5) AS BIGINT)
        |        AS med_chars
        |      FROM documents GROUP BY source) m
        |  ON d.source = m.source
        |WHERE d.n_chars > m.med_chars
        |ORDER BY d.doc_id""".stripMargin),


    // exact distributed Pearson correlation: all accumulations are
    // order-independent BIGINT sums (quantity is integral; price floored
    // to dollars), so the per-group moments are bit-identical in every
    // engine; the final formula is a fixed IEEE double expression
    // (*, /, sqrt are correctly rounded — unlike ln, the q43 lesson)
    Q.sql("x99_grouped_corr",
      """SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST(floor(10000.0 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |       sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
        |            (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT)
        |    AS corr_x10k
        |FROM (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
        |    CAST(sum(CAST(l_quantity AS BIGINT) *
        |             CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy,
        |    CAST(sum(CAST(l_quantity AS BIGINT) *
        |             CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
        |    CAST(sum(CAST(floor(l_extendedprice) AS BIGINT) *
        |             CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy
        |  FROM lineitem GROUP BY l_returnflag
        |) t ORDER BY l_returnflag""".stripMargin),


    // single-pass column profiling (null counts + cardinalities for
    // every column in ONE scan — the new-data-drop sanity check)
    Q.df("x100_profile",
      (s, dir) => graft.ext.Profile.profile(Tables.load(s, dir, "orders")),
      """SELECT col_name, n_rows, n_null, n_distinct FROM (
        |  SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    count(DISTINCT o_orderkey) AS n_distinct FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', count(*),
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_custkey) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*),
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*),
        |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_totalprice) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', count(*),
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderdate) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*),
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderpriority) FROM orders
        |) p ORDER BY col_name""".stripMargin),


    // the approx tier of x100: the HLL profile is one scan, one
    // aggregation, NO per-column Expand replication — the wide-table
    // 100 TB profile; exact x100 stays judged alongside.
    // Judged as a bound check since round 15 (the x63 convention): the
    // exact-profile twin joins in on col_name and the HLL estimate must
    // sit inside 3 standard errors of rsd 0.05; the oracle re-derives
    // the exact profile and asserts hll_ok = TRUE. The exact leg's
    // Expand scan is oracle scaffolding, not the operator's cost —
    // profileApprox alone stays Expand-free (PlanSpec pins it).
    Q.df("x112_profile_approx",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val est = graft.ext.Profile.profileApprox(orders)
          .select(col("col_name"), col("n_distinct").as("dist_est"))
        graft.ext.Profile.profile(orders)
          .join(est, Seq("col_name"))
          .select(col("col_name"), col("n_rows"), col("n_null"),
            col("n_distinct"),
            (abs(col("dist_est") - col("n_distinct")).cast("double")
              <= greatest(lit(2.0), lit(0.15) * col("n_distinct")))
              .as("hll_ok"))
          .orderBy("col_name")
      },
      """SELECT col_name, n_rows, n_null, n_distinct, TRUE AS hll_ok FROM (
        |  SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    count(DISTINCT o_orderkey) AS n_distinct FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', count(*),
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_custkey) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*),
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*),
        |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_totalprice) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', count(*),
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderdate) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*),
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderpriority) FROM orders
        |) p ORDER BY col_name""".stripMargin),


    // Unicode text normalization (multilingual-corpus fold-in pass):
    // accents injected deterministically via translate, then stripped by
    // the native codegen'd strip_accents expression (NFD -> drop
    // combining marks -> NFC) — judged against DuckDB's utf8proc-backed
    // strip_accents on the same injected text. Narrow per-row map, zero
    // shuffles; ASCII rows skip the normalizer entirely (fast path).
    Q.df("x117_normalize",
      (s, dir) => {
        graft.functions.StripAccents.register(s)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            translate(col("text"), "aeioucn", "áéíóúçñ").as("accented"))
          .select(col("doc_id"), col("accented"),
            call_function("strip_accents", col("accented")).as("clean"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  translate(text, 'aeioucn', 'áéíóúçñ') AS accented,
        |  strip_accents(translate(text, 'aeioucn', 'áéíóúçñ')) AS clean
        |FROM documents ORDER BY doc_id""".stripMargin),


    // EXACT heavy hitters through a bounded sketch: Misra-Gries (256
    // counters) guarantees a candidate superset of every token with
    // frequency >= n/50, then one broadcast-semi-join recount makes the
    // answer exact — the two-pass trick that never shuffles the full
    // vocabulary (see functions.MisraGries scaladoc)
    Q.df("x128_heavy_hitters",
      (s, dir) => {
        val fn = graft.functions.MisraGries.register(s, 256)
        val tok = TextStats.tokens(Tables.load(s, dir, "documents"))
          .select("w")
        val cand = tok.agg(call_function(fn, col("w")).as("sk"))
          .select(explode(map_keys(col("sk"))).as("w"))
        val n = tok.agg(count(lit(1)).as("n_tok"))
        tok.join(broadcast(cand), Seq("w"), "left_semi")
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(n))
          // theta = 1/50: integer cross-multiply, no float threshold
          .where(col("cnt") * 50 >= col("n_tok"))
          .select(col("w"), col("cnt"))
          .orderBy(col("cnt").desc, col("w"))
      },
      s"""WITH $duckTok
         |SELECT w, CAST(count(*) AS BIGINT) AS cnt
         |FROM tok GROUP BY w
         |HAVING 50 * count(*) >= (SELECT count(*) FROM tok)
         |ORDER BY cnt DESC, w""".stripMargin),


    // sketch tier of the x92 median gate (same pairing as exact x104 /
    // sketch x113): percentile_approx's mergeable one-pass summary in
    // place of the exact per-group sort. Judged as a bound check since
    // round 15 (the x63 convention): accuracy 100 bounds the rank error
    // at n/100, so the estimate must land inside the exact p40..p60
    // band (the loose ExtSpec band — robust to sketch internals);
    // percentile_disc picks exact data elements, engine-identical, so
    // the band itself is oracle-exact and DuckDB asserts in_band=TRUE.
    Q.df("x129_median_gate_approx",
      (s, dir) => Tables.load(s, dir, "documents")
        .groupBy("source")
        .agg(percentile_approx(col("n_chars"), lit(0.5), lit(100))
            .cast("double").as("med_approx"),
          count(lit(1)).as("n_docs"),
          expr("CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY n_chars)" +
            " AS BIGINT)").as("p40"),
          expr("CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY n_chars)" +
            " AS BIGINT)").as("p60"))
        .select(col("source"), col("n_docs"), col("p40"), col("p60"),
          (col("med_approx") >= col("p40") &&
            col("med_approx") <= col("p60")).as("in_band"))
        .orderBy("source"),
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(quantile_disc(n_chars, 0.4) AS BIGINT) AS p40,
        |  CAST(quantile_disc(n_chars, 0.6) AS BIGINT) AS p60,
        |  TRUE AS in_band
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),


    // robust outlier detection via MAD (median absolute deviation):
    // per-source median + MAD over n_chars, outliers = |x - med| >
    // 3 * MAD — the robust-statistics twin of the winsorize family
    // (x104/x113); percentile_disc keeps every number an exact element
    // of the data, so the answer is engine-exact
    Q.sql2("x135_mad_outliers",
      """WITH med AS (
        |  SELECT source,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
        |      AS BIGINT) AS med
        |  FROM documents GROUP BY source),
        |dev AS (
        |  SELECT d.source, d.doc_id, abs(d.n_chars - m.med) AS ad, m.med
        |  FROM documents d JOIN med m ON d.source = m.source),
        |mad AS (
        |  SELECT source,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)
        |      AS BIGINT) AS mad
        |  FROM dev GROUP BY source)
        |SELECT v.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(v.med) AS med, min(a.mad) AS mad,
        |  CAST(count(*) FILTER (WHERE v.ad > 3 * a.mad) AS BIGINT)
        |    AS n_outliers
        |FROM dev v JOIN mad a ON v.source = a.source
        |GROUP BY v.source ORDER BY v.source""".stripMargin,
      """WITH med AS (
        |  SELECT source, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med
        |  FROM documents GROUP BY source),
        |dev AS (
        |  SELECT d.source, d.doc_id, abs(d.n_chars - m.med) AS ad, m.med
        |  FROM documents d JOIN med m ON d.source = m.source),
        |mad AS (
        |  SELECT source, CAST(quantile_disc(ad, 0.5) AS BIGINT) AS mad
        |  FROM dev GROUP BY source)
        |SELECT v.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(v.med) AS med, min(a.mad) AS mad,
        |  CAST(count(*) FILTER (WHERE v.ad > 3 * a.mad) AS BIGINT)
        |    AS n_outliers
        |FROM dev v JOIN mad a ON v.source = a.source
        |GROUP BY v.source ORDER BY v.source""".stripMargin),


    // per-group MODE with a deterministic tie-break (count desc, value
    // asc): two keyed aggregations; the window runs over the TINY
    // (status x priority) count table, bounded by key cardinality —
    // never over the raw rows
    Q.sql("x138_group_mode",
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |  CAST(cnt AS BIGINT) AS cnt
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |        ORDER BY cnt DESC, o_orderpriority) AS rn FROM c)
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin),


    // pairwise lexical drift: exact total-variation distance between
    // source unigram distributions (ppm), derived from the inner join
    // alone (missing-term mass recovered from the totals identity) —
    // the distribution-shift audit beside x174's document overlap
    Q.df("x195_source_drift",
      (s, dir) => TextStats.sourceDrift(
        Tables.load(s, dir, "documents")),
      s"""WITH tok AS (
         |  SELECT source AS src,
         |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
         |  FROM documents),
         |cnt AS (SELECT src, w, CAST(count(*) AS BIGINT) AS c
         |        FROM tok GROUP BY 1, 2),
         |tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS n
         |        FROM cnt GROUP BY 1),
         |cw AS (SELECT cnt.src, cnt.w, cnt.c, tot.n
         |       FROM cnt JOIN tot USING (src)),
         |sh AS (
         |  SELECT a.src AS src_a, b.src AS src_b,
         |    CAST(count(*) AS BIGINT) AS shared_terms,
         |    CAST(sum(abs(a.c * b.n - b.c * a.n)) AS BIGINT) AS sd,
         |    CAST(sum(a.c * b.n) AS BIGINT) AS s1,
         |    CAST(sum(b.c * a.n) AS BIGINT) AS s2
         |  FROM cw a JOIN cw b ON a.w = b.w AND a.src < b.src
         |  GROUP BY 1, 2)
         |SELECT sh.src_a, sh.src_b, sh.shared_terms,
         |  (sd + (t1.n * t2.n - s1) + (t1.n * t2.n - s2)) * 1000000
         |    // (2 * t1.n * t2.n) AS tv_ppm
         |FROM sh JOIN tot t1 ON sh.src_a = t1.src
         |        JOIN tot t2 ON sh.src_b = t2.src
         |ORDER BY src_a, src_b""".stripMargin),


    // data-contract expectation suite: nulls, key uniqueness, value
    // range, referential integrity — each one aggregate (or one
    // anti-join), reported as a violations ledger; (l_orderkey,
    // l_linenumber) is known non-unique in the synthetic lineitem, so
    // the suite demonstrably catches a real contract break
    Q.df("x197_data_expectations",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val ord = Tables.load(s, dir, "orders")
        Expectations.suite(Seq(
          Expectations.notNull(li, "l_shipdate"),
          Expectations.unique(ord, Seq("o_orderkey")),
          Expectations.unique(li, Seq("l_orderkey", "l_linenumber")),
          Expectations.inRange(li, "l_quantity", lit(1), lit(50)),
          Expectations.refIntegrity(li, "l_orderkey", ord, "o_orderkey")))
      },
      """WITH checks AS (
        |  SELECT 'not_null:l_shipdate' AS rule,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'unique:o_orderkey', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique:l_orderkey,l_linenumber', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |      AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range:l_quantity', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1
        |      END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'ref:l_orderkey',
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey)))
        |SELECT rule, n_rows, violations FROM checks ORDER BY rule""".stripMargin),


    // join-key skew audit: per-key count distribution (max, exact p50/
    // p99, max-over-avg ppm) for the three lineitem join keys — the
    // pre-shuffle hot-spot predictor; aggregation runs over the
    // key-cardinality count table only
    Q.df("x198_key_skew_profile",
      (s, dir) => Profile.skewProfile(
        Tables.load(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey")),
      {
        def one(c: String) =
          s"""SELECT '$c' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
             |  CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(max(c) AS BIGINT) AS max_cnt,
             |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c)
             |    AS BIGINT) AS p50_cnt,
             |  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY c)
             |    AS BIGINT) AS p99_cnt,
             |  CAST(max(c) AS BIGINT) * CAST(count(*) AS BIGINT) * 1000000
             |    // CAST(sum(c) AS BIGINT) AS skew_ppm
             |FROM (SELECT $c, CAST(count(*) AS BIGINT) AS c
             |      FROM lineitem GROUP BY 1) t""".stripMargin
        Seq("l_orderkey", "l_partkey", "l_suppkey").map(one)
          .mkString("", "\nUNION ALL\n", "\nORDER BY key_col")
      }),


    // cross-source score calibration: exact per-source decile table
    // (percentile_disc boundaries of n_chars) — the lookup that makes
    // "top 10% quality" mean the same thing in every source
    Q.df("x214_score_deciles",
      (s, dir) => Profile.scoreDeciles(
        Tables.load(s, dir, "documents"), "source", col("n_chars")),
      """SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(n_chars) AS BIGINT) AS min_score,
        |  CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d1,
        |  CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d2,
        |  CAST(percentile_disc(0.3) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d3,
        |  CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d4,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d5,
        |  CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d6,
        |  CAST(percentile_disc(0.7) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d7,
        |  CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d8,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d9,
        |  CAST(max(n_chars) AS BIGINT) AS max_score
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),


    // per-source distribution drift vs the corpus: exact total-
    // variation distance over GLOBAL decile bins (no PSI/KL log —
    // one integer rational), missing bins charged at full global
    // mass via the zero-filled grid; worst_bin = deterministic argmax
    Q.df("x217_score_drift",
      (s, dir) => Profile.scoreDrift(
        Tables.load(s, dir, "documents"), "source", col("n_chars")),
      """WITH d AS (SELECT source AS s, n_chars AS x FROM documents),
        |e AS (SELECT
        |  CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e1,
        |  CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e2,
        |  CAST(percentile_disc(0.3) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e3,
        |  CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e4,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e5,
        |  CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e6,
        |  CAST(percentile_disc(0.7) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e7,
        |  CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e8,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e9
        |  FROM d),
        |b AS (
        |  SELECT s, CASE WHEN x <= e1 THEN 1 WHEN x <= e2 THEN 2
        |    WHEN x <= e3 THEN 3 WHEN x <= e4 THEN 4 WHEN x <= e5 THEN 5
        |    WHEN x <= e6 THEN 6 WHEN x <= e7 THEN 7 WHEN x <= e8 THEN 8
        |    WHEN x <= e9 THEN 9 ELSE 10 END AS bin
        |  FROM d, e),
        |per AS (SELECT s, bin, CAST(count(*) AS BIGINT) AS n_sb
        |        FROM b GROUP BY 1, 2),
        |gb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_gb
        |         FROM b GROUP BY 1),
        |ns AS (SELECT s, CAST(sum(n_sb) AS BIGINT) AS n_s
        |       FROM per GROUP BY 1),
        |ng AS (SELECT CAST(sum(n_gb) AS BIGINT) AS n_g FROM gb),
        |grid AS (
        |  SELECT ns.s, ns.n_s, gb.bin, gb.n_gb, ng.n_g,
        |    abs(coalesce(per.n_sb, 0) * ng.n_g - gb.n_gb * ns.n_s)
        |      AS dev
        |  FROM ns CROSS JOIN gb CROSS JOIN ng
        |  LEFT JOIN per ON per.s = ns.s AND per.bin = gb.bin),
        |ranked AS (
        |  SELECT s, n_s, n_g, bin, dev,
        |    row_number() OVER (PARTITION BY s ORDER BY dev DESC, bin)
        |      AS rn
        |  FROM grid)
        |SELECT g.s AS source, CAST(max(g.n_s) AS BIGINT) AS n_docs,
        |  CAST(sum(g.dev) * 1000000 // (2 * max(g.n_s) * max(g.n_g))
        |    AS BIGINT) AS tv_ppm,
        |  CAST(max(CASE WHEN r.rn = 1 THEN r.bin END) AS INTEGER)
        |    AS worst_bin
        |FROM grid g JOIN ranked r
        |  ON r.s = g.s AND r.bin = g.bin
        |GROUP BY g.s ORDER BY source""".stripMargin),


    // per-source Gini of document length: whole-distribution
    // inequality in exact ppm via the rank formula
    // (2*S1 - (n+1)*S0) / (n*S0) — complements the Pareto top-end cut
    Q.df("x222_gini_lengths",
      (s, dir) => Profile.giniConcentration(
        Tables.load(s, dir, "documents"), "source", col("n_chars")),
      """WITH r AS (
        |  SELECT source AS s, n_chars AS x,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars)
        |      AS i
        |  FROM documents)
        |SELECT s AS source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS total,
        |  CAST(CASE WHEN sum(x) > 0
        |    THEN (2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1000000
        |         // (count(*) * sum(x))
        |    ELSE 0 END AS BIGINT) AS gini_ppm
        |FROM r GROUP BY 1 ORDER BY source""".stripMargin),


    // calibration APPLY: each doc's score becomes its exact in-source
    // rank position ppm (ties broken on id — fully deterministic);
    // "top 10%" now means the same thing in every source
    Q.df("x223_score_normalize",
      (s, dir) => Profile.scoreNormalize(
        Tables.load(s, dir, "documents"), "source", "doc_id",
        col("n_chars")),
      """SELECT source, doc_id, CAST(n_chars AS BIGINT) AS score,
        |  CAST(CASE WHEN cnt > 1
        |    THEN (rn - 1) * 1000000 // (cnt - 1)
        |    ELSE 500000 END AS BIGINT) AS pct_ppm
        |FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM documents) t
        |ORDER BY source, doc_id""".stripMargin),


    // Benford first-digit audit per event type: observed cents
    // leading-digit distribution vs the Benford ppm constants
    // (fixed integers summing to exactly 1e6 — no log anywhere),
    // scored as exact TV ppm; the fabricated/capped-amounts smell test
    Q.df("x224_benford_audit",
      (s, dir) => Profile.benfordAudit(
        Tables.load(s, dir, "events"), "event_type",
        expr("CAST(floor(value * 100) AS BIGINT)")),
      """WITH v AS (
        |  SELECT event_type AS s, CAST(floor(value * 100) AS BIGINT)
        |      AS v
        |  FROM events),
        |d AS (SELECT s, CAST(substr(CAST(v AS VARCHAR), 1, 1)
        |        AS INTEGER) AS dig
        |      FROM v WHERE v > 0),
        |per AS (SELECT s, dig, CAST(count(*) AS BIGINT) AS n_sd
        |        FROM d GROUP BY 1, 2),
        |ns AS (SELECT s, CAST(sum(n_sd) AS BIGINT) AS n
        |       FROM per GROUP BY 1),
        |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091),
        |        (3, 124939), (4, 96910), (5, 79181), (6, 66947),
        |        (7, 57992), (8, 51153), (9, 45757)) AS t(dig, exp_ppm)),
        |g AS (
        |  SELECT ns.s, ns.n, e.dig,
        |    abs(coalesce(per.n_sd, 0) * 1000000 - e.exp_ppm * ns.n)
        |      AS dev
        |  FROM ns CROSS JOIN e
        |  LEFT JOIN per ON per.s = ns.s AND per.dig = e.dig),
        |rk AS (SELECT s, dig, dev,
        |         row_number() OVER (PARTITION BY s
        |           ORDER BY dev DESC, dig) AS rn
        |       FROM g)
        |SELECT g.s AS event_type, CAST(max(g.n) AS BIGINT) AS n,
        |  CAST(sum(g.dev) // (2 * max(g.n)) AS BIGINT) AS tv_ppm,
        |  CAST(max(CASE WHEN rk.rn = 1 THEN rk.dig END) AS INTEGER)
        |    AS worst_digit
        |FROM g JOIN rk ON rk.s = g.s AND rk.dig = g.dig
        |GROUP BY g.s ORDER BY event_type""".stripMargin),


    // dedup diagnostic histogram: cluster-size distribution of the x66
    // connected components — singleton-dominated is healthy, one giant
    // cluster is a scrape accident, a fat 2-5 band is template spam
    Q.df("x228_cluster_size_histogram",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.clusterSizeHistogram(
          Dedup.clusters(docs, Dedup.jaccardPairs(docs, 0.2,
            maxDocFreq = Some(2))))
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
         |), cl AS (
         |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
         |), cs AS (
         |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM cl GROUP BY 1)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(cluster_size) AS BIGINT) AS n_docs
         |FROM cs GROUP BY 1 ORDER BY cluster_size""".stripMargin),


    // percent-of-parent drill-down: (region, nation) revenue with
    // exact basis-point shares of the parent region and of the total
    // — integer cross-multiplied, the fact table collapses to the
    // grid in one map-side-combinable agg
    Q.df("x237_hierarchy_shares",
      (s, dir) => {
        val fact = Tables.load(s, dir, "lineitem")
          .join(Tables.load(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.load(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.load(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.load(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
        Rollup.hierarchyShares(fact, "r_name", "n_name",
          expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100)" +
            " AS BIGINT)"))
      },
      """WITH per AS (
        |  SELECT r_name, n_name,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
        |      * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |l1 AS (SELECT r_name, CAST(sum(cents) AS BIGINT) AS l1_cents
        |       FROM per GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per)
        |SELECT per.r_name, per.n_name, per.cents,
        |  CAST(per.cents * 10000 // l1.l1_cents AS BIGINT)
        |    AS share_of_parent_bp,
        |  CAST(per.cents * 10000 // tot.total AS BIGINT)
        |    AS share_of_total_bp
        |FROM per JOIN l1 USING (r_name), tot
        |ORDER BY r_name, n_name""".stripMargin),


    // quality-mass concentration: which sources supply the corpus's
    // globally-top-decile (by length) documents, and what share of
    // each source's token mass that elite slice carries — exact
    // percentile edge broadcast, integer ppm shares
    Q.df("x241_top_decile_mass",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val d = docs.select(col("source"), col("n_chars"),
          size(TextStats.tokensCol(col("text"))).cast("bigint")
            .as("n_tok"))
        val edge = d.agg(expr("CAST(percentile_disc(0.9) WITHIN GROUP" +
          " (ORDER BY n_chars) AS BIGINT)").as("p90"))
        d.crossJoin(broadcast(edge))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("n_chars") > col("p90"), 1L).otherwise(0L))
              .as("n_top_docs"),
            sum("n_tok").as("tokens"),
            sum(when(col("n_chars") > col("p90"), col("n_tok"))
              .otherwise(0L)).as("top_tokens"))
          .select(col("source"), col("n_docs"), col("n_top_docs"),
            col("tokens"), col("top_tokens"),
            when(col("tokens") > 0,
              expr("top_tokens * 1000000L div tokens"))
              .otherwise(0L).as("top_mass_ppm"))
          .orderBy("source")
      },
      """WITH d AS (
        |  SELECT source, n_chars,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |e AS (SELECT CAST(percentile_disc(0.9) WITHIN GROUP
        |        (ORDER BY n_chars) AS BIGINT) AS p90 FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n_chars > e.p90 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_top_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS tokens,
        |  CAST(sum(CASE WHEN n_chars > e.p90 THEN n_tok ELSE 0 END)
        |    AS BIGINT) AS top_tokens,
        |  CAST(CASE WHEN sum(n_tok) > 0
        |    THEN sum(CASE WHEN n_chars > e.p90 THEN n_tok ELSE 0 END)
        |         * 1000000 // sum(n_tok)
        |    ELSE 0 END AS BIGINT) AS top_mass_ppm
        |FROM d, e GROUP BY source ORDER BY source""".stripMargin),


    // Tukey-fence outlier audit per event type: exact integer-cents
    // quartiles, 1.5×IQR fences, out-of-fence counts — the per-metric
    // data-quality gate; fences computed once per group then broadcast
    // back for one counting pass
    Q.df("x246_value_fences",
      (s, dir) => Profile.valueFences(
        Tables.load(s, dir, "events"), "event_type", col("value")),
      """WITH c AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), q AS (
        |  SELECT event_type,
        |    CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS q1,
        |    CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS q3
        |  FROM c GROUP BY 1
        |), f AS (
        |  SELECT event_type, q1, q3,
        |    q1 - (3 * (q3 - q1)) // 2 AS lo,
        |    q3 + (3 * (q3 - q1)) // 2 AS hi
        |  FROM q
        |)
        |SELECT c.event_type, CAST(count(*) AS BIGINT) AS n,
        |  f.q1, f.q3, f.lo, f.hi,
        |  CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_out_lo,
        |  CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_out_hi,
        |  min(cents) AS min_cents, max(cents) AS max_cents
        |FROM c JOIN f USING (event_type)
        |GROUP BY 1, f.q1, f.q3, f.lo, f.hi
        |ORDER BY event_type""".stripMargin),


    // exact two-sample Kolmogorov-Smirnov drift per source vs the rest
    // of the corpus: sup-CDF-gap as one integer rational over the
    // strata × distinct-values grid — bin-free where x217's TV needs
    // decile edges; sup attained at a pooled point, so exact
    Q.df("x251_ks_drift",
      (s, dir) => Profile.ksDrift(
        Tables.load(s, dir, "documents"), "source", col("n_chars")),
      """WITH d AS (SELECT source AS s, n_chars AS x FROM documents),
        |per AS (SELECT s, x, count(*) AS c FROM d GROUP BY 1, 2),
        |vals AS (SELECT x, count(*) AS cg FROM d GROUP BY 1),
        |ns AS (SELECT s, count(*) AS n_s FROM d GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM d),
        |gcum AS (SELECT x, sum(cg) OVER (ORDER BY x) AS cum_g FROM vals),
        |grid AS (
        |  SELECT ns.s, ns.n_s, v.x, coalesce(per.c, 0) AS c
        |  FROM ns CROSS JOIN vals v
        |  LEFT JOIN per ON per.s = ns.s AND per.x = v.x),
        |cum AS (
        |  SELECT s, n_s, x,
        |    sum(c) OVER (PARTITION BY s ORDER BY x) AS cum_s
        |  FROM grid),
        |diff AS (
        |  SELECT c.s, c.n_s, t.n - c.n_s AS n_r, c.x,
        |    abs(c.cum_s * (t.n - c.n_s) - (g.cum_g - c.cum_s) * c.n_s)
        |      AS dn
        |  FROM cum c JOIN gcum g USING (x) CROSS JOIN tot t),
        |mx AS (SELECT s, max(dn) AS mdn FROM diff GROUP BY 1)
        |SELECT d.s AS source, CAST(max(d.n_s) AS BIGINT) AS n_source,
        |  CAST(max(d.n_r) AS BIGINT) AS n_rest,
        |  CAST(max(d.dn) * 1000000 // (max(d.n_s) * max(d.n_r))
        |    AS BIGINT) AS ks_ppm,
        |  CAST(min(CASE WHEN d.dn = m.mdn THEN d.x END) AS BIGINT)
        |    AS worst_x
        |FROM diff d JOIN mx m USING (s)
        |GROUP BY d.s ORDER BY source""".stripMargin),


    // quantile normalization across sources — the batch-effect
    // correction: row r of n_s maps to the global order statistic
    // ceil(r*N/n_s); the global statistic table is built by
    // zipWithIndex (x132 machinery), never a SinglePartition window;
    // judged as the per-source rollup (equal-size sources normalize
    // to provably identical rollups)
    Q.df("x254_quantile_normalize",
      (s, dir) => Profile.quantileNormalize(
        Tables.load(s, dir, "documents"), "source", "doc_id",
        col("n_chars")),
      """WITH d AS (SELECT source AS s, doc_id AS id, n_chars AS x
        |           FROM documents),
        |r AS (SELECT s, id, x,
        |    row_number() OVER (PARTITION BY s ORDER BY x, id) AS r,
        |    count(*) OVER (PARTITION BY s) AS n_s
        |  FROM d),
        |t AS (SELECT count(*) AS n FROM d),
        |g AS (SELECT x AS x_norm,
        |    row_number() OVER (ORDER BY x, id) AS j FROM d),
        |m AS (SELECT r.s, g.x_norm
        |      FROM r CROSS JOIN t
        |      JOIN g ON g.j = (r.r * t.n + r.n_s - 1) // r.n_s)
        |SELECT s AS source, CAST(count(*) AS BIGINT) AS n,
        |  min(x_norm) AS min_norm,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY x_norm)
        |    AS BIGINT) AS med_norm,
        |  max(x_norm) AS max_norm,
        |  CAST(sum(x_norm) AS BIGINT) AS sum_norm
        |FROM m GROUP BY 1 ORDER BY source""".stripMargin),


    // quantile-sketch accuracy audit — the x235 "trust the sketch"
    // gate for the x107 binned-quantile tier: per event type, the
    // 50-cent-bin estimates beside the exact percentiles, with the
    // REALIZED rank error in ppm (integer numerators; the only
    // division is a floor'd double quotient of exact integers). The
    // number that licenses replacing per-group sorts with the
    // mergeable histogram at scale.
    Q.sql("x264_sketch_accuracy",
      """WITH c AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |tot AS (SELECT event_type, count(*) AS nn FROM c GROUP BY 1),
        |b AS (
        |  SELECT event_type, cents - (cents % 50) AS bin_lo, count(*) AS cb
        |  FROM c GROUP BY 1, 2),
        |cm AS (
        |  SELECT event_type, bin_lo, cb,
        |    sum(cb) OVER (PARTITION BY event_type ORDER BY bin_lo) AS cum
        |  FROM b),
        |est AS (
        |  SELECT cm.event_type,
        |    min(CASE WHEN cum * 100 >= 50 * tot.nn
        |      THEN bin_lo + 49 END) AS p50_est,
        |    min(CASE WHEN cum * 100 >= 90 * tot.nn
        |      THEN bin_lo + 49 END) AS p90_est,
        |    min(CASE WHEN cum * 100 >= 99 * tot.nn
        |      THEN bin_lo + 49 END) AS p99_est
        |  FROM cm JOIN tot ON cm.event_type = tot.event_type
        |  GROUP BY 1),
        |ex AS (
        |  SELECT event_type,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS p50,
        |    CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS p90,
        |    CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS p99
        |  FROM c GROUP BY 1),
        |rk AS (
        |  SELECT c.event_type, count(*) AS nn,
        |    sum(CASE WHEN c.cents <= e.p50_est THEN 1 ELSE 0 END) AS r50,
        |    sum(CASE WHEN c.cents <= e.p90_est THEN 1 ELSE 0 END) AS r90,
        |    sum(CASE WHEN c.cents <= e.p99_est THEN 1 ELSE 0 END) AS r99
        |  FROM c JOIN est e ON c.event_type = e.event_type
        |  GROUP BY 1)
        |SELECT rk.event_type, CAST(rk.nn AS BIGINT) AS n,
        |  ex.p50, e.p50_est,
        |  CAST(floor(1000000.0 * abs(r50 * 100 - 50 * rk.nn)
        |    / (100 * rk.nn)) AS BIGINT) AS p50_err_ppm,
        |  ex.p90, e.p90_est,
        |  CAST(floor(1000000.0 * abs(r90 * 100 - 90 * rk.nn)
        |    / (100 * rk.nn)) AS BIGINT) AS p90_err_ppm,
        |  ex.p99, e.p99_est,
        |  CAST(floor(1000000.0 * abs(r99 * 100 - 99 * rk.nn)
        |    / (100 * rk.nn)) AS BIGINT) AS p99_err_ppm
        |FROM rk
        |JOIN ex ON rk.event_type = ex.event_type
        |JOIN est e ON rk.event_type = e.event_type
        |ORDER BY rk.event_type""".stripMargin),


    // exact Spearman rank correlation per event type between value and
    // time — the rank-robust twin of x257's OLS slope: unique
    // (ts,id)/(cents,id) tie-breaks make ranks permutations, so
    // rho = 1 - 6*sum(d^2)/(n(n^2-1)) holds exactly in integers
    Q.df("x265_rank_correlation",
      (s, dir) => TimeSeries.rankCorrelation(
        Tables.load(s, dir, "events"),
        "event_type", "ts", "event_id", "value"),
      """WITH e AS (
        |  SELECT event_type AS g, epoch_us(ts) AS tm, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT g,
        |    row_number() OVER (PARTITION BY g ORDER BY tm, event_id)
        |      AS rx,
        |    row_number() OVER (PARTITION BY g ORDER BY cents, event_id)
        |      AS ry
        |  FROM e),
        |a AS (
        |  SELECT g, count(*) AS n,
        |    sum((rx - ry) * (rx - ry)) AS sd2
        |  FROM r GROUP BY 1),
        |f AS (
        |  SELECT g, n, n * (n * n - 1) - 6 * sd2 AS num,
        |    n * (n * n - 1) AS den
        |  FROM a)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
        |    AS BIGINT) AS rho_sign,
        |  CAST(CASE WHEN den = 0 THEN 0
        |    ELSE abs(num) * 1000000 // den END AS BIGINT) AS rho_abs_ppm
        |FROM f ORDER BY event_type""".stripMargin),


    // weighted median price per return flag, weighted by quantity —
    // "the price at which half the VOLUME trades"; exact
    // cross-multiplied threshold on the group-partitioned cumulative
    Q.df("x280_weighted_median",
      (s, dir) => Profile.weightedMedian(
        Tables.load(s, dir, "lineitem"), "l_returnflag",
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"),
        col("l_quantity"), col("l_orderkey")),
      """WITH d AS (
        |  SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(l_quantity AS BIGINT) AS w, l_orderkey AS tb
        |  FROM lineitem),
        |c AS (
        |  SELECT g, v, w,
        |    sum(w) OVER (PARTITION BY g ORDER BY v, tb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(w) OVER (PARTITION BY g) AS totw,
        |    count(*) OVER (PARTITION BY g) AS n
        |  FROM d)
        |SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(totw) AS BIGINT) AS tot_weight, min(v) AS wmedian
        |FROM c WHERE cumw * 2 >= totw
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin),


    // exact trailing 28-day active users per day: each activity pair
    // feeds <= 28 window ends, so sliding DISTINCT becomes
    // explode+dedupe+count — O(activity*window), no sketch error
    Q.df("x284_rolling_active",
      (s, dir) => TimeSeries.rollingActiveUsers(
        Tables.load(s, dir, "events"), "user_id", "ts", 28),
      """WITH act AS (
        |  SELECT DISTINCT user_id AS k,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS ep
        |  FROM events),
        |sp AS (SELECT min(ep) AS a, max(ep) AS b FROM act),
        |dau AS (SELECT ep, CAST(count(*) AS BIGINT) AS dau
        |        FROM act GROUP BY 1),
        |contrib AS (
        |  SELECT DISTINCT k, unnest(generate_series(ep,
        |    least(ep + 27, sp.b))) AS ep
        |  FROM act, sp),
        |wau AS (SELECT ep, CAST(count(*) AS BIGINT) AS wau
        |        FROM contrib GROUP BY 1),
        |cal AS (SELECT unnest(generate_series(a, b)) AS ep FROM sp)
        |SELECT CAST(cal.ep AS BIGINT) AS ep,
        |  coalesce(dau.dau, 0) AS dau, coalesce(wau.wau, 0) AS wau
        |FROM cal LEFT JOIN dau ON dau.ep = cal.ep
        |LEFT JOIN wau ON wau.ep = cal.ep
        |ORDER BY ep""".stripMargin),


    // sliding-HLL rolling actives: the approx tier beside exact x284 —
    // per-day sketches merged over the trailing window, so the window
    // slide replicates days x window SKETCHES, not activity x window
    // rows. DataSketches estimates are engine-specific; judged as a
    // bound check since round 15 (the x63 convention): the exact
    // 7-day twin joins in on the same calendar grid, every dau/wau
    // estimate must sit inside the 5% hard gate (lgK=12 -> rse ~1.6%;
    // same envelope as the ExtSpec), and DuckDB re-derives the exact
    // grid asserting dau_ok/wau_ok = TRUE.
    Q.df("x287_rolling_active_approx",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val est = TimeSeries.rollingActiveUsersApprox(ev, "user_id", "ts", 7)
        def ok(e: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) =
          abs(e - x).cast("double") <= greatest(lit(1.0), lit(0.05) * x)
        TimeSeries.rollingActiveUsers(ev, "user_id", "ts", 7)
          .join(est, Seq("ep"))
          .select(col("ep"), col("dau"), col("wau"),
            ok(col("dau_est"), col("dau")).as("dau_ok"),
            ok(col("wau_est"), col("wau")).as("wau_ok"))
          .orderBy("ep")
      },
      """WITH act AS (
        |  SELECT DISTINCT user_id AS k,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS ep
        |  FROM events),
        |sp AS (SELECT min(ep) AS a, max(ep) AS b FROM act),
        |dau AS (SELECT ep, CAST(count(*) AS BIGINT) AS dau
        |        FROM act GROUP BY 1),
        |contrib AS (
        |  SELECT DISTINCT k, unnest(generate_series(ep,
        |    least(ep + 6, sp.b))) AS ep
        |  FROM act, sp),
        |wau AS (SELECT ep, CAST(count(*) AS BIGINT) AS wau
        |        FROM contrib GROUP BY 1),
        |cal AS (SELECT unnest(generate_series(a, b)) AS ep FROM sp)
        |SELECT CAST(cal.ep AS BIGINT) AS ep,
        |  coalesce(dau.dau, 0) AS dau, coalesce(wau.wau, 0) AS wau,
        |  TRUE AS dau_ok, TRUE AS wau_ok
        |FROM cal LEFT JOIN dau ON dau.ep = cal.ep
        |LEFT JOIN wau ON wau.ep = cal.ep
        |ORDER BY ep""".stripMargin),


    // count-min calibration: every event type's exact count beside
    // its depth-4 x width-64 sketch estimate (md5-derived buckets,
    // min over rows) — est >= exact structurally; the d x w sketch is
    // the mergeable partial that ships; oracle re-derives buckets
    // with a hex fold and matches hash-exact
    Q.df("x296_countmin_calibration",
      (s, dir) => graft.ext.Rollup.countMinCalibration(
        Tables.load(s, dir, "events"), "event_type"),
      """WITH k AS (SELECT CAST(event_type AS VARCHAR) AS t FROM events),
        |b AS (
        |  SELECT t, seed,
        |    CAST(list_aggregate(list_transform(range(1, 9),
        |      i -> (strpos('0123456789abcdef',
        |              substr(md5(seed || ':' || t), CAST(i AS INTEGER), 1))
        |            - 1) * 16 ** (8 - i)), 'sum') AS BIGINT) % 64 AS bk
        |  FROM k, (SELECT unnest(generate_series(0, 3)) AS seed)),
        |sketch AS (
        |  SELECT seed, bk, CAST(count(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1, 2),
        |exact AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS exact_cnt
        |  FROM k GROUP BY 1),
        |tb AS (SELECT DISTINCT t, seed, bk FROM b)
        |SELECT tb.t AS event_type, max(e.exact_cnt) AS exact_cnt,
        |  CAST(min(sk.c) AS BIGINT) AS est_cnt
        |FROM tb JOIN sketch sk ON sk.seed = tb.seed AND sk.bk = tb.bk
        |JOIN exact e ON e.t = tb.t
        |GROUP BY 1 ORDER BY event_type""".stripMargin),


    // snapshot drift audit: schema + column-profile diff between two
    // versions (orders vs a mutated v2: rows filtered, a column
    // dropped, a column added, planted nulls) — one scan per side,
    // exact ppm null rates, -1 marks column-absent
    Q.df("x300_snapshot_drift",
      (s, dir) => {
        val v1 = Tables.load(s, dir, "orders")
        val v2 = v1.where(col("o_orderkey") % 5 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 7 === 0, lit(null).cast("double"))
              .otherwise(col("o_totalprice")))
          .drop("o_orderpriority")
          .withColumn("o_flag", (col("o_orderkey") % 3).cast("bigint"))
        Profile.snapshotDrift(v1, v2)
      },
      """WITH v2 AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderkey % 3 AS o_flag
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |p1 AS (
        |  SELECT 'o_orderkey' AS c, count(*) AS r,
        |    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn,
        |    count(DISTINCT o_orderkey) AS d FROM orders
        |  UNION ALL SELECT 'o_custkey', count(*),
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_custkey) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', count(*),
        |    sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL SELECT 'o_totalprice', count(*),
        |    sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_totalprice) FROM orders
        |  UNION ALL SELECT 'o_orderdate', count(*),
        |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_orderdate) FROM orders
        |  UNION ALL SELECT 'o_orderpriority', count(*),
        |    sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_orderpriority) FROM orders),
        |p2 AS (
        |  SELECT 'o_orderkey' AS c, count(*) AS r,
        |    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn,
        |    count(DISTINCT o_orderkey) AS d FROM v2
        |  UNION ALL SELECT 'o_custkey', count(*),
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_custkey) FROM v2
        |  UNION ALL SELECT 'o_orderstatus', count(*),
        |    sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_orderstatus) FROM v2
        |  UNION ALL SELECT 'o_totalprice', count(*),
        |    sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_totalprice) FROM v2
        |  UNION ALL SELECT 'o_orderdate', count(*),
        |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_orderdate) FROM v2
        |  UNION ALL SELECT 'o_flag', count(*),
        |    sum(CASE WHEN o_flag IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_flag) FROM v2)
        |SELECT coalesce(p1.c, p2.c) AS col_name,
        |  CASE WHEN p1.c IS NULL THEN 'added'
        |    WHEN p2.c IS NULL THEN 'removed'
        |    ELSE 'common' END AS status,
        |  CAST(coalesce(p1.r, -1) AS BIGINT) AS rows_v1,
        |  CAST(coalesce(p2.r, -1) AS BIGINT) AS rows_v2,
        |  CAST(coalesce(CASE WHEN p1.r = 0 THEN 0
        |    ELSE p1.nn * 1000000 // p1.r END, -1) AS BIGINT)
        |    AS null_ppm_v1,
        |  CAST(coalesce(CASE WHEN p2.r = 0 THEN 0
        |    ELSE p2.nn * 1000000 // p2.r END, -1) AS BIGINT)
        |    AS null_ppm_v2,
        |  CAST(coalesce(p1.d, -1) AS BIGINT) AS dist_v1,
        |  CAST(coalesce(p2.d, -1) AS BIGINT) AS dist_v2
        |FROM p1 FULL OUTER JOIN p2 ON p1.c = p2.c
        |ORDER BY col_name""".stripMargin),


    // MAD robust outliers: discrete-median absolute deviation, the
    // 50%-breakdown twin of the IQR fences (x224's percentile_disc
    // parity rule, verified n=1..12 both engines)
    Q.df("x304_mad_outliers",
      (s, dir) => Profile.madOutliers(
        Tables.load(s, dir, "events"), "event_type", col("value")),
      """WITH c AS (SELECT event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |med AS (SELECT event_type,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS med_cents FROM c GROUP BY 1),
        |dev AS (SELECT c.event_type, cents, med_cents,
        |    abs(cents - med_cents) AS d FROM c JOIN med USING (event_type)),
        |mad AS (SELECT event_type,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d)
        |      AS BIGINT) AS mad_cents FROM dev GROUP BY 1)
        |SELECT dev.event_type AS event_type, CAST(count(*) AS BIGINT) AS n,
        |  max(med_cents) AS med_cents, max(mad_cents) AS mad_cents,
        |  CAST(sum(CASE WHEN d > 3 * mad_cents THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  max(d) AS max_dev_cents
        |FROM dev JOIN mad USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin),


    // 2-D Pareto frontier over (type-token ratio, token count): the
    // non-dominated docs of the quality-vs-length tradeoff
    Q.df("x310_pareto_frontier",
      (s, dir) => Curation.paretoFrontier(
        TextStats.stats(Tables.load(s, dir, "documents")),
        "doc_id", col("ttr_x10k"), col("n_tok")),
      s"""WITH $duckTok,
         |st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |    CAST(floor(10000.0 * count(DISTINCT w) / count(*)) AS BIGINT)
         |      AS a
         |  FROM tok GROUP BY doc_id),
         |pts AS (SELECT doc_id AS id, a, n_tok AS b FROM st),
         |bya AS (SELECT a, max(b) AS mb FROM pts GROUP BY 1),
         |fr AS (SELECT a, mb AS b FROM (
         |    SELECT a, mb, max(mb) OVER (ORDER BY a DESC ROWS BETWEEN
         |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS better FROM bya) z
         |  WHERE better IS NULL OR mb > better)
         |SELECT p.a AS a, p.b AS b, CAST(min(id) AS BIGINT) AS doc_id,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM pts p JOIN fr ON p.a = fr.a AND p.b = fr.b
         |GROUP BY 1, 2 ORDER BY a""".stripMargin),


    // corpus novelty-decay curve: per 50-doc arrival bucket, the
    // fraction of distinct shingles never seen in an earlier doc
    Q.df("x315_novelty_curve",
      (s, dir) => Curation.noveltyCurve(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok, $duckShingles,
         |own AS (SELECT shingle, min(doc_id) AS owner FROM sh GROUP BY 1),
         |per AS (SELECT sh.doc_id, count(*) AS n_sh,
         |    sum(CASE WHEN own.owner = sh.doc_id THEN 1 ELSE 0 END) AS n_novel
         |  FROM sh JOIN own USING (shingle) GROUP BY 1)
         |SELECT CAST(doc_id // 50 AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_sh) AS BIGINT) AS n_shingles,
         |  CAST(sum(n_novel) AS BIGINT) AS n_novel,
         |  CAST(sum(n_novel) * 1000000 // sum(n_sh) AS BIGINT) AS novelty_ppm
         |FROM per GROUP BY 1 ORDER BY 1""".stripMargin),


    // exact 1-Wasserstein length drift of every source vs src0, on the
    // global value grid, scaled integers
    Q.df("x316_wasserstein_drift",
      (s, dir) => Profile.wassersteinDrift(Tables.load(s, dir, "documents")),
      """WITH vc AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
        |    count(*) AS c FROM documents GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT v FROM vc),
        |srcs AS (SELECT DISTINCT source FROM vc WHERE source <> 'src0'),
        |basec AS (SELECT v, c AS cb FROM vc WHERE source = 'src0'),
        |grid AS (SELECT s.source, vals.v, coalesce(vc.c, 0) AS c,
        |    coalesce(b.cb, 0) AS cb
        |  FROM srcs s CROSS JOIN vals
        |  LEFT JOIN vc ON vc.source = s.source AND vc.v = vals.v
        |  LEFT JOIN basec b ON b.v = vals.v),
        |st AS (SELECT source, v,
        |    sum(c) OVER (PARTITION BY source ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY source ORDER BY v) AS cumb,
        |    lead(v) OVER (PARTITION BY source ORDER BY v) AS nv
        |  FROM grid),
        |tota AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_a FROM vc
        |  WHERE source <> 'src0' GROUP BY 1),
        |totb AS (SELECT CAST(sum(cb) AS BIGINT) AS n_b FROM basec)
        |SELECT st.source AS source, n_a, n_b,
        |  CAST(sum(abs(cuma * n_b - cumb * n_a) * (nv - v)) AS BIGINT)
        |    AS w1_scaled,
        |  CAST(CAST(sum(abs(cuma * n_b - cumb * n_a) * (nv - v)) AS HUGEINT)
        |    * 1000000 // (n_a * n_b) AS BIGINT) AS w1_micro
        |FROM st JOIN tota USING (source) CROSS JOIN totb
        |WHERE nv IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin),


    // burstiness audit: variance-to-mean of daily counts per event
    // type over the global day span, exact milli
    Q.df("x322_dispersion_index",
      (s, dir) => TimeSeries.dispersionIndex(Tables.load(s, dir, "events")),
      """WITH daily AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |span AS (SELECT CAST(max(d) - min(d) + 1 AS BIGINT) AS m_days
        |  FROM daily),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_active_days,
        |    CAST(sum(c) AS BIGINT) AS n_events,
        |    CAST(sum(c * c) AS BIGINT) AS sumsq FROM daily GROUP BY 1)
        |SELECT event_type, m_days, n_active_days, n_events,
        |  (m_days * sumsq - n_events * n_events) * 1000
        |    // (m_days * n_events) AS disp_milli
        |FROM g CROSS JOIN span ORDER BY event_type""".stripMargin),


    // exact 10%-trimmed mean of order value per priority — rank-free,
    // off the bounded (group, cents) histogram
    Q.df("x331_trimmed_mean",
      (s, dir) => Profile.trimmedMean(Tables.load(s, dir, "orders"),
        "o_orderpriority",
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)"), 10),
      """WITH vc AS (SELECT o_orderpriority AS g,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c FROM orders GROUP BY 1, 2),
        |cumt AS (SELECT g, v, c,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
        |      AS cum FROM vc),
        |tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM vc GROUP BY 1),
        |k AS (SELECT cumt.g, v, c, cum, n, n * 10 // 100 AS t
        |  FROM cumt JOIN tot USING (g)),
        |kept AS (SELECT g, v, n,
        |    greatest(least(cum, n - t) - greatest(cum - c, t), 0) AS keep
        |  FROM k)
        |SELECT g AS o_orderpriority, n,
        |  CAST(sum(keep) AS BIGINT) AS n_kept,
        |  CAST(sum(v * keep) AS BIGINT) AS sum_kept,
        |  CAST(sum(v * keep) * 100 // sum(keep) AS BIGINT) AS mean_x100
        |FROM kept GROUP BY 1, 2 ORDER BY 1""".stripMargin),


    // KMV distinct sketch judged against its own ground truth: exact
    // distinct users, the k=64 minimum 32-bit hash, the estimate, and
    // its error — deterministic, unlike the HLL tiers
    Q.df("x335_kmv_distinct",
      (s, dir) => Profile.kmvDistinct(Tables.load(s, dir, "events"),
        "event_type", "user_id", 64),
      """WITH dk AS (SELECT DISTINCT event_type AS g,
        |    CAST(user_id AS VARCHAR) AS u FROM events
        |  WHERE user_id IS NOT NULL),
        |h AS (SELECT g, u, md5(u) AS h FROM dk),
        |rn AS (SELECT g, u, h, row_number() OVER
        |    (PARTITION BY g ORDER BY h, u) AS rn FROM h),
        |ex AS (SELECT g, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM dk GROUP BY 1),
        |kth AS (SELECT g, CAST(list_aggregate(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |      * 16 ** (8 - i)), 'sum') AS BIGINT) AS vk_32
        |  FROM rn WHERE rn = 64)
        |SELECT ex.g AS event_type, n_exact,
        |  CAST(least(n_exact, 64) AS BIGINT) AS n_sketch,
        |  CAST(coalesce(vk_32, 0) AS BIGINT) AS vk_32,
        |  CAST(CASE WHEN n_exact < 64 THEN n_exact
        |    ELSE 63 * 4294967296 // vk_32 END AS BIGINT) AS est_distinct,
        |  CAST(abs((CASE WHEN n_exact < 64 THEN n_exact
        |      ELSE 63 * 4294967296 // vk_32 END) - n_exact) * 1000000
        |    // n_exact AS BIGINT) AS err_ppm
        |FROM ex LEFT JOIN kth USING (g) ORDER BY 1""".stripMargin),


    // Theil-Sen robust daily-trend slope vs OLS, exact micro units
    Q.df("x345_theil_sen",
      (s, dir) => TimeSeries.theilSenTrend(
        Tables.load(s, dir, "events")),
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |mn AS (SELECT min(d) AS d0 FROM daily),
        |base AS (SELECT d - d0 AS d, y FROM daily CROSS JOIN mn),
        |pairs AS (SELECT (b.y - a.y) * 1000000 // (b.d - a.d) AS slope
        |  FROM base a JOIN base b ON a.d < b.d),
        |ts AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)
        |    AS BIGINT) AS theilsen_micro FROM pairs),
        |ols AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(CAST(count(*) * sum(d * y) - sum(d) * sum(y) AS HUGEINT)
        |    * 1000000
        |    // (count(*) * sum(d * d) - sum(d) * sum(d)) AS BIGINT)
        |    AS ols_micro FROM base)
        |SELECT n_days, n_pairs, theilsen_micro, ols_micro
        |FROM ols CROSS JOIN ts""".stripMargin),


    // population stability index per source vs the rest, whole-bit
    // log quantization with Laplace smoothing — the category-mix
    // drift monitor
    Q.df("x348_psi_drift",
      (s, dir) => Profile.psiDrift(Tables.load(s, dir, "documents")),
      """WITH vc AS (SELECT source, lang AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT v FROM vc),
        |srcs AS (SELECT DISTINCT source FROM vc),
        |grid AS (SELECT srcs.source, vals.v, coalesce(vc.c, 0) AS c
        |  FROM srcs CROSS JOIN vals
        |  LEFT JOIN vc ON vc.source = srcs.source AND vc.v = vals.v),
        |gt AS (SELECT v, sum(c) AS g FROM vc GROUP BY 1),
        |ta AS (SELECT source, sum(c) AS n_a FROM vc GROUP BY 1),
        |corp AS (SELECT sum(c) AS n_corpus, count(DISTINCT v) AS nv
        |  FROM vc),
        |t AS (SELECT grid.source, ta.n_a, grid.c + 1 AS a,
        |    gt.g - grid.c + 1 AS b, ta.n_a + corp.nv AS taa,
        |    corp.n_corpus - ta.n_a + corp.nv AS tb
        |  FROM grid JOIN gt USING (v)
        |  JOIN ta ON ta.source = grid.source CROSS JOIN corp)
        |SELECT source, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(sum((a * 1000000 // taa - b * 1000000 // tb)
        |    * ((length(bin(a * tb)) - 1) - (length(bin(b * taa)) - 1)))
        |    AS BIGINT) AS psi_ppm_bits
        |FROM t GROUP BY 1, 2 ORDER BY source""".stripMargin),


    // chi-square independence of lang x source over the full margin
    // grid (zero cells included), term-truncating micro units
    Q.df("x353_chi_square",
      (s, dir) => Profile.chiSquareIndependence(
        Tables.load(s, dir, "documents")),
      """WITH vc AS (SELECT lang AS rv, source AS cv,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |rm AS (SELECT rv, sum(o) AS r FROM vc GROUP BY 1),
        |cm AS (SELECT cv, sum(o) AS c FROM vc GROUP BY 1),
        |nn AS (SELECT sum(o) AS n FROM vc),
        |grid AS (SELECT rm.rv, cm.cv, rm.r, cm.c, coalesce(vc.o, 0) AS o
        |  FROM rm CROSS JOIN cm LEFT JOIN vc USING (rv, cv))
        |SELECT CAST(max(n) AS BIGINT) AS n,
        |  CAST(count(DISTINCT rv) AS BIGINT) AS n_row_cats,
        |  CAST(count(DISTINCT cv) AS BIGINT) AS n_col_cats,
        |  CAST((count(DISTINCT rv) - 1) * (count(DISTINCT cv) - 1)
        |    AS BIGINT) AS dof,
        |  CAST(sum((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |    * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |    * 1000000 // (CAST(n AS HUGEINT) * r * c)) AS BIGINT)
        |    AS chi2_micro
        |FROM grid CROSS JOIN nn""".stripMargin),


    // whole-bit mutual information + marginal entropies + uncertainty
    // coefficients of lang x source — chi-square's "how much" twin
    Q.df("x354_mutual_information",
      (s, dir) => Profile.mutualInformation(
        Tables.load(s, dir, "documents")),
      """WITH vc AS (SELECT lang AS rv, source AS cv,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |rm AS (SELECT rv, CAST(sum(o) AS BIGINT) AS r FROM vc GROUP BY 1),
        |cm AS (SELECT cv, CAST(sum(o) AS BIGINT) AS c FROM vc GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM vc),
        |mi AS (SELECT CAST(sum(o * ((length(bin(o * n)) - 1)
        |      - (length(bin(r * c)) - 1))) AS BIGINT) AS mi_bits_scaled
        |  FROM vc JOIN rm USING (rv) JOIN cm USING (cv) CROSS JOIN nn),
        |hr AS (SELECT CAST(sum(r * ((length(bin(n)) - 1)
        |      - (length(bin(r)) - 1))) AS BIGINT) AS h_row_bits_scaled
        |  FROM rm CROSS JOIN nn),
        |hc AS (SELECT CAST(sum(c * ((length(bin(n)) - 1)
        |      - (length(bin(c)) - 1))) AS BIGINT) AS h_col_bits_scaled
        |  FROM cm CROSS JOIN nn)
        |SELECT n, mi_bits_scaled, h_row_bits_scaled, h_col_bits_scaled,
        |  mi_bits_scaled * 1000000 // nullif(h_row_bits_scaled, 0)
        |    AS u_row_ppm,
        |  mi_bits_scaled * 1000000 // nullif(h_col_bits_scaled, 0)
        |    AS u_col_ppm
        |FROM nn CROSS JOIN mi CROSS JOIN hr CROSS JOIN hc""".stripMargin),


    // Q-Q decile drift per event type vs the corpus: WHERE the slice
    // moved, not just whether (oracle ranks rows, Spark folds the
    // histogram — independent shapes, same type-1 quantile)
    Q.df("x359_qq_drift",
      (s, dir) => Profile.qqDrift(Tables.load(s, dir, "events")),
      """WITH r AS (SELECT event_type AS grp,
        |    CAST(floor(value * 10) AS BIGINT) AS q,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY floor(value * 10)) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL),
        |d AS (SELECT unnest(range(1, 10)) AS decile),
        |gq AS (SELECT grp, d.decile, min(q) AS grp_q
        |  FROM r CROSS JOIN d WHERE rn * 10 >= d.decile * n
        |  GROUP BY 1, 2),
        |ra AS (SELECT CAST(floor(value * 10) AS BIGINT) AS q,
        |    row_number() OVER (ORDER BY floor(value * 10)) AS rn,
        |    count(*) OVER () AS n
        |  FROM events WHERE value IS NOT NULL),
        |cq AS (SELECT d.decile, min(q) AS corpus_q
        |  FROM ra CROSS JOIN d WHERE rn * 10 >= d.decile * n
        |  GROUP BY 1)
        |SELECT gq.grp AS event_type, CAST(gq.decile AS BIGINT) AS decile,
        |  gq.grp_q, cq.corpus_q, gq.grp_q - cq.corpus_q AS delta_q
        |FROM gq JOIN cq USING (decile)
        |ORDER BY event_type, decile""".stripMargin),


    // peaks-over-threshold doubling curve of the value tail
    Q.df("x371_tail_index",
      (s, dir) => Profile.tailIndexCurve(Tables.load(s, dir, "events")),
      """WITH h AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |mx AS (SELECT max(q) AS vmax FROM h),
        |lv AS (SELECT CAST(j AS BIGINT) AS j,
        |    CAST(vmax // (1 << j) AS BIGINT) AS threshold_q
        |  FROM (SELECT unnest(range(1, 11)) AS j) js CROSS JOIN mx),
        |ag AS (SELECT j, threshold_q, CAST(sum(c) AS BIGINT) AS n_above
        |  FROM lv JOIN h ON h.q > lv.threshold_q GROUP BY 1, 2)
        |SELECT j, threshold_q, n_above,
        |  n_above * 1000 // lag(n_above) OVER (ORDER BY j)
        |    AS ratio_milli
        |FROM ag ORDER BY j""".stripMargin),


    // stratified mutual information: does the lang-source association
    // survive inside each length band (Simpson's-paradox check)
    Q.df("x375_stratified_mi",
      (s, dir) => Profile.stratifiedMi(Tables.load(s, dir, "documents")),
      """WITH vc AS (SELECT
        |    CAST(length(bin(CAST(n_chars AS BIGINT))) - 1 AS BIGINT)
        |      AS z,
        |    lang AS rv, source AS cv, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2, 3),
        |rm AS (SELECT z, rv, sum(o) AS r FROM vc GROUP BY 1, 2),
        |cm AS (SELECT z, cv, sum(o) AS c FROM vc GROUP BY 1, 2),
        |nz AS (SELECT z, CAST(sum(o) AS BIGINT) AS n_band
        |  FROM vc GROUP BY 1)
        |SELECT z AS band, n_band,
        |  CAST(sum(o * ((length(bin(o * n_band)) - 1)
        |    - (length(bin(r * c)) - 1))) AS BIGINT) AS mi_bits_scaled
        |FROM vc JOIN rm USING (z, rv) JOIN cm USING (z, cv)
        |  JOIN nz USING (z)
        |GROUP BY 1, 2 ORDER BY band""".stripMargin),


    // Lorenz ownership curve: value share of the top 1/2/5/10/25/50%
    // of users — Spark folds the per-total histogram, the oracle
    // ranks every user (independent shapes, identical cuts)
    Q.df("x384_lorenz_curve",
      (s, dir) => Profile.lorenzCurve(Tables.load(s, dir, "events")),
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM events GROUP BY 1),
        |r AS (SELECT v,
        |    row_number() OVER (ORDER BY v DESC, user_id) AS rn,
        |    sum(v) OVER (ORDER BY v DESC, user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_v
        |  FROM u),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS u_all,
        |    CAST(sum(v) AS BIGINT) AS v_all FROM u),
        |p AS (SELECT unnest([1, 2, 5, 10, 25, 50]) AS pct),
        |c AS (SELECT CAST(pct AS BIGINT) AS pct,
        |    CAST((pct * u_all + 99) // 100 AS BIGINT) AS k_users,
        |    v_all
        |  FROM p CROSS JOIN tot)
        |SELECT c.pct, c.k_users,
        |  CAST(r.cum_v AS BIGINT) AS top_value_milli,
        |  CAST(CAST(r.cum_v AS HUGEINT) * 1000000 // c.v_all
        |    AS BIGINT) AS share_ppm
        |FROM c JOIN r ON r.rn = c.k_users
        |ORDER BY c.pct""".stripMargin),


    // truncation dedup on the prefix-collapsed corpus at the DOCUMENTED
    // knob setting: prefixLen=64 clears the 47-char boilerplate so the
    // successor windows re-shard on content (at the default 8 every
    // boilerplate doc lands in ONE window partition); planted truncated
    // copies (some shorter than 64 -> the broadcast short-text path
    // runs for real) are derived identically in the oracle
    Q.df("x391_skew_truncation",
      (s, dir) => {
        val skew = skewDocs(Tables.load(s, dir, "documents"))
          .select("doc_id", "text")
        val planted = skew
          .where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            expr("substring(text, 1, 40 + CAST(doc_id % 37 AS INT))")
              .as("text"))
        Dedup.truncationDupes(skew.unionByName(planted), prefixLen = 64)
      },
      s"""WITH $duckSkew,
         |corpus AS MATERIALIZED (
         |  SELECT doc_id, text FROM skew
         |  UNION ALL
         |  SELECT doc_id + 1000000, substr(text, 1, 40 + CAST(doc_id % 37 AS INT))
         |  FROM skew WHERE doc_id % 5 = 0),
         |own AS MATERIALIZED (
         |  SELECT text AS t, min(doc_id) AS owner FROM corpus GROUP BY 1),
         |srt AS (SELECT t, owner, lead(t) OVER (ORDER BY t) AS nxt,
         |        lead(owner) OVER (ORDER BY t) AS nxt_owner FROM own),
         |flag AS (SELECT t, nxt_owner FROM srt
         |         WHERE nxt IS NOT NULL AND starts_with(nxt, t))
         |SELECT c.doc_id AS doc_id,
         |  CAST(length(c.text) AS BIGINT) AS n_chars_trunc,
         |  f.nxt_owner AS container_id
         |FROM corpus c JOIN flag f ON c.text = f.t
         |ORDER BY doc_id""".stripMargin),


    // one-pass column-pair correlation matrix over lineitem numerics:
    // every Σx/Σx²/Σxy in ONE aggregation, per-pair signed r² milli on
    // the exploded single row — one corpus pass for the whole matrix
    Q.df("x394_correlation_matrix",
      (s, dir) => Profile.correlationMatrix(
        Tables.load(s, dir, "lineitem"),
        Seq(
          "disc" -> expr("CAST(floor(l_discount * 100) AS BIGINT)"),
          "price" -> expr("CAST(floor(l_extendedprice) AS BIGINT)"),
          "qty" -> expr("CAST(l_quantity AS BIGINT)"),
          "tax" -> expr("CAST(floor(l_tax * 100) AS BIGINT)"))),
      """WITH b AS (SELECT
        |    CAST(floor(l_discount * 100) AS HUGEINT) AS disc,
        |    CAST(floor(l_extendedprice) AS HUGEINT) AS price,
        |    CAST(l_quantity AS HUGEINT) AS qty,
        |    CAST(floor(l_tax * 100) AS HUGEINT) AS tax
        |  FROM lineitem),
        |mo AS (SELECT CAST(count(*) AS HUGEINT) AS m,
        |    sum(disc) AS sd, sum(price) AS sp, sum(qty) AS sq,
        |    sum(tax) AS st,
        |    sum(disc*disc) AS pdd, sum(disc*price) AS pdp,
        |    sum(disc*qty) AS pdq, sum(disc*tax) AS pdt,
        |    sum(price*price) AS ppp, sum(price*qty) AS ppq,
        |    sum(price*tax) AS ppt, sum(qty*qty) AS pqq,
        |    sum(qty*tax) AS pqt, sum(tax*tax) AS ptt
        |  FROM b),
        |pairs AS (
        |  SELECT 'disc' AS col_a, 'price' AS col_b, m,
        |    m*pdp - sd*sp AS cov, m*pdd - sd*sd AS va,
        |    m*ppp - sp*sp AS vb FROM mo
        |  UNION ALL SELECT 'disc', 'qty', m, m*pdq - sd*sq,
        |    m*pdd - sd*sd, m*pqq - sq*sq FROM mo
        |  UNION ALL SELECT 'disc', 'tax', m, m*pdt - sd*st,
        |    m*pdd - sd*sd, m*ptt - st*st FROM mo
        |  UNION ALL SELECT 'price', 'qty', m, m*ppq - sp*sq,
        |    m*ppp - sp*sp, m*pqq - sq*sq FROM mo
        |  UNION ALL SELECT 'price', 'tax', m, m*ppt - sp*st,
        |    m*ppp - sp*sp, m*ptt - st*st FROM mo
        |  UNION ALL SELECT 'qty', 'tax', m, m*pqt - sq*st,
        |    m*pqq - sq*sq, m*ptt - st*st FROM mo)
        |SELECT col_a, col_b, CAST(m AS BIGINT) AS n,
        |  CAST(CASE WHEN va = 0 OR vb = 0 THEN NULL
        |    WHEN abs(cov) >= 310000000000000000
        |      OR va >= 10000000000000000000
        |      OR vb >= 10000000000000000000 THEN NULL
        |    ELSE (CASE WHEN cov < 0 THEN -1 ELSE 1 END)
        |      * (cov * cov * 1000 // (va * vb)) END AS BIGINT)
        |    AS signed_r2_milli
        |FROM pairs ORDER BY col_a, col_b""".stripMargin),

  )
}
