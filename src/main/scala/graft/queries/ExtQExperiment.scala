package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming
import graft.queries.ExtShared._

/** §2.8 judged queries — experimentation statistics (A/B, causal, agreement). */
private[queries] object ExtQExperiment {

  val qs: Seq[Q] = Seq(

    // matched-control selection: for each eval-slice document, the
    // nearest-length corpus document within its language — ablation
    // control sets without a self-join (two IGNORE-NULLS running-last
    // windows per stratum), deterministic tie-break toward the
    // predecessor in the (covariate, doc_id) total order
    Q.df("x175_matched_controls",
      (s, dir) => Sampling.matchedControls(
        Tables.load(s, dir, "documents"),
        col("source") === "src19", "n_chars", "lang"),
      """WITH lab AS (
        |  SELECT lang, doc_id, n_chars, source = 'src19' AS is_t
        |  FROM documents
        |), wnd AS (
        |  SELECT lang, doc_id, n_chars, is_t,
        |    last_value(CASE WHEN NOT is_t
        |        THEN struct_pack(cv := n_chars, id := doc_id) END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY lang ORDER BY n_chars, doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS bef,
        |    last_value(CASE WHEN NOT is_t
        |        THEN struct_pack(cv := n_chars, id := doc_id) END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS aft
        |  FROM lab
        |)
        |SELECT lang, doc_id AS target_id, n_chars AS target_cv,
        |  CASE WHEN aft IS NULL OR (bef IS NOT NULL
        |            AND abs(bef.cv - n_chars) <= abs(aft.cv - n_chars))
        |       THEN bef.id ELSE aft.id END AS control_id,
        |  CASE WHEN aft IS NULL OR (bef IS NOT NULL
        |            AND abs(bef.cv - n_chars) <= abs(aft.cv - n_chars))
        |       THEN bef.cv ELSE aft.cv END AS control_cv
        |FROM wnd WHERE is_t ORDER BY lang, target_id""".stripMargin),


    // linear multi-touch attribution: purchase cents split EXACTLY
    // (largest-remainder to the most recent touches) across the
    // view/click events of the prior 7 days, then rolled up per touch;
    // conversion-touch pairing is a keyed interval join, split windows
    // are per-conversion (bounded), rollup is one keyed sum
    Q.df("x184_attribution",
      (s, dir) => TimeSeries.linearAttribution(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_id",
        "event_type", "value", "purchase", Seq("view", "click"), 7),
      """WITH t AS (
        |  SELECT user_id AS k, event_id AS tid, ts AS tts
        |  FROM events WHERE event_type IN ('view', 'click')),
        |p AS (
        |  SELECT user_id AS k, event_id AS pid, ts AS pts,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.pid, p.cents, t.tid, t.k, t.tts
        |  FROM p JOIN t ON p.k = t.k
        |    AND t.tts <= p.pts AND t.tts > p.pts - INTERVAL 7 DAY),
        |w AS (
        |  SELECT pid, cents, tid, k,
        |    row_number() OVER (PARTITION BY pid
        |      ORDER BY tts DESC, tid DESC) AS rn,
        |    count(*) OVER (PARTITION BY pid) AS nk
        |  FROM j)
        |SELECT tid AS event_id, k AS user_id,
        |  CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(sum(cents // nk
        |    + CASE WHEN rn <= cents % nk THEN 1 ELSE 0 END) AS BIGINT)
        |    AS attributed_cents
        |FROM w GROUP BY 1, 2 ORDER BY event_id""".stripMargin),


    // deterministic Poisson-bootstrap CI for mean chars per source:
    // weights = Poisson(1) inverse-CDF of md5(r:doc_id) hex (the
    // hashSplit trick), replicate means on the source × reps grid,
    // exact percentile_disc over 32 replicates — reproducible error
    // bars on every per-source average
    Q.df("x248_bootstrap_ci",
      (s, dir) => Sampling.bootstrapCi(
        Tables.load(s, dir, "documents"), "source", "doc_id",
        col("n_chars"), reps = 32),
      """WITH e AS (
        |  SELECT source, doc_id, n_chars, r.r AS r,
        |    substr(md5(CAST(r.r AS VARCHAR) || ':' ||
        |      CAST(doc_id AS VARCHAR)), 1, 6) AS h
        |  FROM documents, range(0, 32) r(r)
        |), w AS (
        |  SELECT source, r, n_chars,
        |    CASE WHEN h < '5e2d58' THEN 0 WHEN h < 'bc5ab1' THEN 1
        |         WHEN h < 'eb715e' THEN 2 WHEN h < 'fb2397' THEN 3
        |         WHEN h < 'ff1025' THEN 4 WHEN h < 'ffd90f' THEN 5
        |         ELSE 6 END AS w
        |  FROM e
        |), rm AS (
        |  SELECT source, r,
        |    CAST(10000 * sum(w * n_chars) // sum(w) AS BIGINT) AS mean_x10k
        |  FROM w GROUP BY 1, 2 HAVING sum(w) > 0
        |), ci AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_reps,
        |    CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY mean_x10k)
        |      AS BIGINT) AS lo95_x10k,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY mean_x10k)
        |      AS BIGINT) AS med_x10k,
        |    CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY mean_x10k)
        |      AS BIGINT) AS hi95_x10k
        |  FROM rm GROUP BY 1
        |), pt AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(10000 * sum(n_chars) // count(*) AS BIGINT) AS point_x10k
        |  FROM documents GROUP BY 1
        |)
        |SELECT p.source, p.n_rows, p.point_x10k,
        |  c.n_reps, c.lo95_x10k, c.med_x10k, c.hi95_x10k
        |FROM pt p JOIN ci c USING (source)
        |ORDER BY source""".stripMargin),


    // Bradley-Terry preference ranking: consecutive-event duels ->
    // win grid -> 3 integer fixed-point MM rounds (Hunter 2004) — the
    // RLHF reward-data aggregation with strength-of-schedule, exact
    // in both engines because every op is a truncating BIGINT div
    Q.df("x297_bradley_terry",
      (s, dir) => graft.ext.Preference.bradleyTerry(
        Tables.load(s, dir, "events"), 3),
      btOracleSql(3)),


    // split-conformal coverage: parity-split calibration, discrete 0.9
    // threshold (a data point — exact BIGINT), held-out coverage ppm
    Q.df("x306_conformal_coverage",
      (s, dir) => Profile.conformalCoverage(
        Tables.load(s, dir, "events"), "event_type", col("value"),
        col("event_id")),
      """WITH c AS (SELECT event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    event_id % 2 = 0 AS is_cal FROM events),
        |thr AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
        |    CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS thr_cents
        |  FROM c WHERE is_cal GROUP BY 1)
        |SELECT c.event_type AS event_type, max(n_cal) AS n_cal,
        |  CAST(count(*) AS BIGINT) AS n_test, max(thr_cents) AS thr_cents,
        |  CAST(sum(CASE WHEN cents <= thr_cents THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_covered,
        |  CAST(sum(CASE WHEN cents <= thr_cents THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS coverage_ppm
        |FROM c JOIN thr USING (event_type) WHERE NOT is_cal
        |GROUP BY 1 ORDER BY 1""".stripMargin),


    // Cohen's kappa per event_type: rater B is a deterministic noisy
    // copy of rater A; po/pe/kappa in exact ppm off the bounded
    // (group, a, b) cell table
    Q.df("x313_cohen_kappa",
      (s, dir) => Profile.cohenKappa(Tables.load(s, dir, "events")),
      """WITH r AS (SELECT event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    event_id AS eid FROM events),
        |ab AS (SELECT event_type,
        |    CASE WHEN cents < 2000 THEN 0 WHEN cents < 6000 THEN 1
        |      ELSE 2 END AS ra,
        |    CASE WHEN cents + (eid * 37) % 1000 - 500 < 2000 THEN 0
        |      WHEN cents + (eid * 37) % 1000 - 500 < 6000 THEN 1
        |      ELSE 2 END AS rb FROM r),
        |cells AS (SELECT event_type, ra, rb, count(*) AS c
        |  FROM ab GROUP BY 1, 2, 3),
        |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN ra = rb THEN c ELSE 0 END) AS BIGINT) AS agree
        |  FROM cells GROUP BY 1),
        |ma AS (SELECT event_type, ra AS cls, sum(c) AS na
        |  FROM cells GROUP BY 1, 2),
        |mb AS (SELECT event_type, rb AS cls, sum(c) AS nb
        |  FROM cells GROUP BY 1, 2),
        |pe AS (SELECT ma.event_type, CAST(sum(na * nb) AS BIGINT) AS prod
        |  FROM ma JOIN mb ON ma.event_type = mb.event_type
        |    AND ma.cls = mb.cls GROUP BY 1),
        |base AS (SELECT t.event_type, n,
        |    agree * 1000000 // n AS po_ppm,
        |    prod * 1000000 // (n * n) AS pe_ppm
        |  FROM tot t JOIN pe ON t.event_type = pe.event_type)
        |SELECT event_type, n, po_ppm, pe_ppm,
        |  CASE WHEN pe_ppm >= 1000000 THEN 1000000
        |    ELSE (po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm)
        |  END AS kappa_ppm
        |FROM base ORDER BY 1""".stripMargin),


    // Mann-Whitney U per event type vs the rest: doubled midranks
    // from the value histogram, rank-biserial effect size in ppm
    Q.df("x349_mann_whitney",
      (s, dir) => Profile.mannWhitney(Tables.load(s, dir, "events")),
      """WITH h AS (SELECT event_type AS grp,
        |    CAST(floor(value * 10) AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS ca
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |gq AS (SELECT q, sum(ca) AS gc FROM h GROUP BY 1),
        |m AS (SELECT q, 2 * coalesce(sum(gc) OVER (ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + gc + 1 AS midrank2 FROM gq),
        |s AS (SELECT grp, sum(ca) AS n_a,
        |    sum(ca * midrank2) AS sumrank2
        |  FROM h JOIN m USING (q) GROUP BY 1),
        |tot AS (SELECT sum(ca) AS n_all FROM h)
        |SELECT grp AS event_type, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n_all - n_a AS BIGINT) AS n_b,
        |  CAST(sumrank2 - n_a * (n_a + 1) AS BIGINT) AS u2_a,
        |  CAST(CAST(sumrank2 - n_a * (n_a + 1) AS HUGEINT) * 1000000
        |    // (n_a * (n_all - n_a)) - 1000000 AS BIGINT) AS rbc_ppm
        |FROM s CROSS JOIN tot ORDER BY event_type""".stripMargin),


    // forecast calibration bins + ECE: value min-max-normalized to
    // ppm, ten equal-width bins, mean score vs purchase rate
    Q.df("x355_calibration_bins",
      (s, dir) => Experiment.calibrationBins(
        Tables.load(s, dir, "events"), col("event_type") === "purchase"),
      """WITH q AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS q,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |mm AS (SELECT min(q) AS qlo, max(q) AS qhi FROM q),
        |b AS (SELECT
        |    least(9, (q - qlo) * 10 // greatest(qhi - qlo, 1)) AS bin,
        |    (q - qlo) * 1000000 // greatest(qhi - qlo, 1) AS s_ppm, y
        |  FROM q CROSS JOIN mm),
        |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(s_ppm) AS BIGINT) AS ss,
        |    CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM b GROUP BY 1),
        |r AS (SELECT CAST(bin AS BIGINT) AS bin, n,
        |    ss // n AS mean_score_ppm,
        |    n_pos * 1000000 // n AS pos_rate_ppm FROM g),
        |r2 AS (SELECT *, abs(mean_score_ppm - pos_rate_ppm) AS gap_ppm
        |  FROM r),
        |e AS (SELECT CAST(sum(CAST(n AS HUGEINT) * gap_ppm) // sum(n)
        |    AS BIGINT) AS ece_ppm FROM r2)
        |SELECT bin, n, mean_score_ppm, pos_rate_ppm, gap_ppm, ece_ppm
        |FROM r2 CROSS JOIN e ORDER BY bin""".stripMargin),


    // difference-in-differences: user-parity treatment, mid-month
    // cutover, all four cell means exact milli
    Q.df("x356_diff_in_diff",
      (s, dir) => Experiment.diffInDiff(Tables.load(s, dir, "events"),
        col("user_id") % 2 === 0,
        col("ts") >= lit("2024-01-16").cast("timestamp")),
      """WITH t AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS q,
        |    (user_id % 2 = 0) AS t,
        |    (ts >= TIMESTAMP '2024-01-16') AS p
        |  FROM events)
        |SELECT
        |  CAST(count(CASE WHEN t AND NOT p THEN 1 END) AS BIGINT)
        |    AS n_t_pre,
        |  CAST(count(CASE WHEN t AND p THEN 1 END) AS BIGINT)
        |    AS n_t_post,
        |  CAST(count(CASE WHEN NOT t AND NOT p THEN 1 END) AS BIGINT)
        |    AS n_c_pre,
        |  CAST(count(CASE WHEN NOT t AND p THEN 1 END) AS BIGINT)
        |    AS n_c_post,
        |  CAST(sum(CASE WHEN t AND NOT p THEN q END)
        |    // count(CASE WHEN t AND NOT p THEN 1 END) AS BIGINT)
        |    AS mean_t_pre_milli,
        |  CAST(sum(CASE WHEN t AND p THEN q END)
        |    // count(CASE WHEN t AND p THEN 1 END) AS BIGINT)
        |    AS mean_t_post_milli,
        |  CAST(sum(CASE WHEN NOT t AND NOT p THEN q END)
        |    // count(CASE WHEN NOT t AND NOT p THEN 1 END) AS BIGINT)
        |    AS mean_c_pre_milli,
        |  CAST(sum(CASE WHEN NOT t AND p THEN q END)
        |    // count(CASE WHEN NOT t AND p THEN 1 END) AS BIGINT)
        |    AS mean_c_post_milli,
        |  (CAST(sum(CASE WHEN t AND p THEN q END)
        |     // count(CASE WHEN t AND p THEN 1 END) AS BIGINT)
        |   - CAST(sum(CASE WHEN t AND NOT p THEN q END)
        |     // count(CASE WHEN t AND NOT p THEN 1 END) AS BIGINT))
        |  - (CAST(sum(CASE WHEN NOT t AND p THEN q END)
        |     // count(CASE WHEN NOT t AND p THEN 1 END) AS BIGINT)
        |   - CAST(sum(CASE WHEN NOT t AND NOT p THEN q END)
        |     // count(CASE WHEN NOT t AND NOT p THEN 1 END) AS BIGINT))
        |    AS did_milli
        |FROM t""".stripMargin),


    // CUPED variance reduction: per-user pre/post means, pooled theta,
    // adjusted post-period difference
    Q.df("x357_cuped",
      (s, dir) => Experiment.cuped(Tables.load(s, dir, "events"),
        col("user_id") % 2 === 0,
        col("ts") >= lit("2024-01-16").cast("timestamp")),
      """WITH t AS (SELECT user_id,
        |    CAST(floor(value * 1000) AS BIGINT) AS q,
        |    (user_id % 2 = 0) AS t,
        |    (ts >= TIMESTAMP '2024-01-16') AS p
        |  FROM events),
        |u AS (SELECT user_id, t,
        |    count(CASE WHEN NOT p THEN 1 END) AS n_pre,
        |    sum(CASE WHEN NOT p THEN q END) AS s_pre,
        |    count(CASE WHEN p THEN 1 END) AS n_post,
        |    sum(CASE WHEN p THEN q END) AS s_post
        |  FROM t GROUP BY 1, 2
        |  HAVING count(CASE WHEN NOT p THEN 1 END) > 0
        |    AND count(CASE WHEN p THEN 1 END) > 0),
        |v AS (SELECT t, CAST(s_pre // n_pre AS BIGINT) AS x,
        |    CAST(s_post // n_post AS BIGINT) AS y FROM u),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS n_treated,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    CAST(sum(CASE WHEN t THEN x END) AS BIGINT) AS sx_t,
        |    CAST(sum(CASE WHEN NOT t THEN x END) AS BIGINT) AS sx_c,
        |    CAST(sum(CASE WHEN t THEN y END) AS BIGINT) AS sy_t,
        |    CAST(sum(CASE WHEN NOT t THEN y END) AS BIGINT) AS sy_c
        |  FROM v),
        |f AS (SELECT n_users, n_treated,
        |    CAST((CAST(n_users AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy) * 1000000
        |      // nullif(CAST(n_users AS HUGEINT) * sxx
        |      - CAST(sx AS HUGEINT) * sx, 0) AS BIGINT) AS theta_ppm,
        |    sy_t * 1000 // n_treated
        |      - sy_c * 1000 // (n_users - n_treated) AS raw_diff_micro,
        |    sx_t * 1000 // n_treated
        |      - sx_c * 1000 // (n_users - n_treated) AS x_diff_micro
        |  FROM m)
        |SELECT n_users, n_treated, theta_ppm, raw_diff_micro,
        |  raw_diff_micro - CAST(CAST(theta_ppm AS HUGEINT)
        |    * x_diff_micro // 1000000 AS BIGINT) AS adj_diff_micro
        |FROM f""".stripMargin),


    // leave-one-day-out jackknife of the purchase-value ratio metric
    Q.df("x361_jackknife_ratio",
      (s, dir) => Experiment.jackknifeRatio(Tables.load(s, dir, "events"),
        col("event_type") === "purchase"),
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 1000) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS s_i,
        |    CAST(count(*) AS BIGINT) AS n_i
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(s_i) AS BIGINT) AS s,
        |    CAST(sum(n_i) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS dd FROM daily),
        |reps AS (SELECT dd,
        |    CAST(CAST(s AS HUGEINT) * 1000000 // n AS BIGINT)
        |      AS theta_ppm,
        |    CAST(CAST(s - s_i AS HUGEINT) * 1000000 // (n - n_i)
        |      AS BIGINT) AS theta_i
        |  FROM daily CROSS JOIN tot)
        |SELECT dd AS n_days, theta_ppm,
        |  CAST(sum(theta_i) // count(*) AS BIGINT) AS theta_dot_ppm,
        |  CAST((dd - 1) * (dd * sum(CAST(theta_i AS HUGEINT) * theta_i)
        |    - CAST(sum(theta_i) AS HUGEINT) * sum(theta_i))
        |    // (CAST(dd AS HUGEINT) * dd) AS BIGINT) AS jk_var_ppm2
        |FROM reps GROUP BY 1, 2""".stripMargin),


    // sample-ratio-mismatch trajectory: daily and cumulative
    // chi-square vs 50/50 under the parity assignment
    Q.df("x362_srm_trajectory",
      (s, dir) => Experiment.srmTrajectory(Tables.load(s, dir, "events"),
        col("user_id") % 2 === 0),
      """WITH b AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t
        |  FROM events),
        |g AS (SELECT d, CAST(sum(t) AS BIGINT) AS n_t,
        |    CAST(sum(1 - t) AS BIGINT) AS n_c FROM b GROUP BY 1),
        |c AS (SELECT *,
        |    CAST(sum(n_t) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_t,
        |    CAST(sum(n_c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c FROM g)
        |SELECT d, n_t, n_c,
        |  (n_t - n_c) * (n_t - n_c) * 1000000 // (n_t + n_c)
        |    AS chi2_micro,
        |  cum_t, cum_c,
        |  (cum_t - cum_c) * (cum_t - cum_c) * 1000000
        |    // (cum_t + cum_c) AS cum_chi2_micro
        |FROM c ORDER BY d""".stripMargin),


    // post-stratified treatment effect: power-of-two activity strata,
    // per-stratum diff + count-weighted ATE
    Q.df("x365_post_stratified",
      (s, dir) => Experiment.postStratifiedEffect(
        Tables.load(s, dir, "events"), col("user_id") % 2 === 0,
        col("ts") >= lit("2024-01-16").cast("timestamp")),
      """WITH t AS (SELECT user_id,
        |    CAST(floor(value * 1000) AS BIGINT) AS q,
        |    (user_id % 2 = 0) AS t,
        |    (ts >= TIMESTAMP '2024-01-16') AS p
        |  FROM events),
        |u AS (SELECT user_id, t,
        |    count(CASE WHEN NOT p THEN 1 END) AS n_pre,
        |    count(CASE WHEN p THEN 1 END) AS n_post,
        |    sum(CASE WHEN p THEN q END) AS s_post
        |  FROM t GROUP BY 1, 2
        |  HAVING count(CASE WHEN p THEN 1 END) > 0),
        |v AS (SELECT t, CAST(length(bin(n_pre)) - 1 AS BIGINT)
        |      AS stratum,
        |    CAST(s_post // n_post AS BIGINT) AS y FROM u),
        |s AS (SELECT stratum,
        |    CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS n_t,
        |    CAST(count(CASE WHEN NOT t THEN 1 END) AS BIGINT) AS n_c,
        |    sum(CASE WHEN t THEN y END) AS sy_t,
        |    sum(CASE WHEN NOT t THEN y END) AS sy_c
        |  FROM v GROUP BY 1),
        |d AS (SELECT stratum, n_t, n_c,
        |    CASE WHEN n_t > 0 THEN CAST(sy_t * 1000 // n_t AS BIGINT)
        |      END AS mean_t_micro,
        |    CASE WHEN n_c > 0 THEN CAST(sy_c * 1000 // n_c AS BIGINT)
        |      END AS mean_c_micro
        |  FROM s),
        |d2 AS (SELECT *, mean_t_micro - mean_c_micro AS diff_micro
        |  FROM d),
        |a AS (SELECT CAST(sum(CAST(n_t + n_c AS HUGEINT) * diff_micro)
        |    // sum(n_t + n_c) AS BIGINT) AS ate_micro
        |  FROM d2 WHERE diff_micro IS NOT NULL)
        |SELECT stratum, n_t, n_c, mean_t_micro, mean_c_micro,
        |  diff_micro, ate_micro
        |FROM d2 CROSS JOIN a ORDER BY stratum""".stripMargin),


    // Kish effective sample size of inverse-frequency source
    // balancing — what the weighted corpus is worth in unweighted rows
    Q.df("x377_effective_sample_size",
      (s, dir) => Sampling.effectiveSampleSize(
        Tables.load(s, dir, "documents")),
      """WITH src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_sources FROM src),
        |wtab AS (SELECT n, n_sources, n_s,
        |    n * 1000000 // (n_sources * n_s) AS w
        |  FROM src CROSS JOIN tot),
        |ag AS (SELECT n, n_sources, CAST(max(w) AS BIGINT) AS max_w_ppm,
        |    CAST(sum(n_s * w) AS BIGINT) AS sw,
        |    sum(CAST(n_s AS HUGEINT) * w * w) AS sww
        |  FROM wtab GROUP BY 1, 2)
        |SELECT n, n_sources, max_w_ppm,
        |  CAST(CAST(sw AS HUGEINT) * sw // sww AS BIGINT) AS ess,
        |  CAST(CAST(sw AS HUGEINT) * sw // sww AS BIGINT) * 1000000
        |    // n AS ess_ratio_ppm
        |FROM ag""".stripMargin),


    // quantile treatment effects: treated-minus-control gap at each
    // outcome decile (type-1 cents via the histogram fold) — the
    // distributional reading a mean difference hides
    Q.df("x400_quantile_effects",
      (s, dir) => Experiment.quantileEffects(
        Tables.load(s, dir, "events"), col("user_id") % 2 === 0),
      """WITH c AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |h AS (SELECT t, cents, CAST(count(*) AS BIGINT) AS c
        |      FROM c GROUP BY 1, 2),
        |cm AS (SELECT t, cents, c, sum(c) OVER (PARTITION BY t
        |    ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS cum FROM h),
        |tot AS (SELECT t, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |q AS (SELECT cm.t, k.k,
        |    CAST(min(CASE WHEN cum * 10 >= k.k * n THEN cents END)
        |      AS BIGINT) AS q
        |  FROM cm JOIN tot ON cm.t = tot.t
        |  CROSS JOIN range(1, 10) k(k)
        |  GROUP BY 1, 2)
        |SELECT qt.k AS decile, qt.q AS q_t_cents, qc.q AS q_c_cents,
        |  qt.q - qc.q AS qte_cents
        |FROM q qt JOIN q qc ON qt.k = qc.k AND qt.t = 1 AND qc.t = 0
        |ORDER BY decile""".stripMargin),

  )
}
