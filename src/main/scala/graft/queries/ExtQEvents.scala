package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming
import graft.queries.ExtShared._

/** §2.8 judged queries — event/time-series analytics: sessions, funnels, retention, trends. */
private[queries] object ExtQEvents {

  val qs: Seq[Q] = Seq(

    // batch session windows (gap-based), the Spark-native sessionize
    // operator; oracle re-derives sessions with the lag/running-sum CTE.
    Q.df("x65_session_window",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        ev.groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
          .agg(count(lit(1)).as("event_cnt"))
          .select(col("user_id"),
            date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            col("event_cnt"))
          .orderBy("user_id", "session_start")
      },
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sessions AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked
        |)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS event_cnt
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin),


    // conversion funnel: per signed-up user, the first purchase AT OR
    // AFTER their first signup (two keyed aggregations + one join —
    // never an event-pair blowup), rolled into the corpus conversion
    // summary; lag sums are exact integer milliseconds
    Q.sql2("x105_funnel",
      """WITH fs AS (
        |  SELECT user_id, min(unix_millis(ts)) AS first_signup
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id
        |), fp AS (
        |  SELECT e.user_id, min(unix_millis(e.ts)) AS first_purchase
        |  FROM events e JOIN fs ON e.user_id = fs.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND unix_millis(e.ts) >= fs.first_signup
        |  GROUP BY e.user_id
        |)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN fp.first_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_converted,
        |  CAST(floor(10000.0 * sum(CASE WHEN fp.first_purchase IS NOT NULL THEN 1 ELSE 0 END)
        |       / count(*)) AS BIGINT) AS conv_x10k,
        |  CAST(coalesce(sum(fp.first_purchase - fs.first_signup), 0) AS BIGINT)
        |    AS total_lag_ms
        |FROM fs LEFT JOIN fp ON fs.user_id = fp.user_id""".stripMargin,
      """WITH fs AS (
        |  SELECT user_id, min(epoch_ms(ts)) AS first_signup
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id
        |), fp AS (
        |  SELECT e.user_id, min(epoch_ms(e.ts)) AS first_purchase
        |  FROM events e JOIN fs ON e.user_id = fs.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_ms(e.ts) >= fs.first_signup
        |  GROUP BY e.user_id
        |)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN fp.first_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_converted,
        |  CAST(floor(10000.0 * sum(CASE WHEN fp.first_purchase IS NOT NULL THEN 1 ELSE 0 END)
        |       / count(*)) AS BIGINT) AS conv_x10k,
        |  CAST(coalesce(sum(fp.first_purchase - fs.first_signup), 0) AS BIGINT)
        |    AS total_lag_ms
        |FROM fs LEFT JOIN fp ON fs.user_id = fp.user_id""".stripMargin),


    // sliding (hopping) event-time windows: each event lands in 2
    // overlapping 2h windows on a 1h hop — the rate-over-sliding-horizon
    // aggregation; one Expand + one keyed agg, no self-join
    Q.df("x98_sliding_window",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        ev.groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
            col("event_type"), col("cnt"))
          .orderBy("win_start", "event_type")
      },
      """SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS cnt
        |FROM (SELECT date_trunc('hour', ts) - k.k * INTERVAL 1 HOUR AS win_start,
        |        event_type
        |      FROM events CROSS JOIN (VALUES (0), (1)) k(k)) w
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin),


    // calendar densification + LOCF: one row per (user, day) across
    // each user's own span, gap days carry the last observed value
    // forward bit-exactly; per-key generated calendar (no global
    // cross join), equi-join on (key, day), single-row window state
    Q.df("x181_gap_fill",
      (s, dir) => TimeSeries.gapFillLocf(
          Tables.load(s, dir, "events"), "user_id", "ts", "value",
          "event_id")
        // DATE columns render differently in the two compare paths
        // (pandas datetime64 vs datetime.date) — ship the day as text
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd")),
      """WITH daily AS (
        |  SELECT user_id AS k, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    arg_max(value, event_id) AS v
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT k, min(day) AS a, max(day) AS b FROM daily GROUP BY 1),
        |cal AS (
        |  SELECT k, CAST(unnest(generate_series(CAST(a AS TIMESTAMP),
        |    CAST(b AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span WHERE date_diff('day', a, b) < 3700),
        |j AS (
        |  SELECT c.k, c.day, d.v FROM cal c
        |  LEFT JOIN daily d ON c.k = d.k AND c.day = d.day)
        |SELECT k AS user_id, strftime(day, '%Y-%m-%d') AS day,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS value_filled,
        |  CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap
        |FROM j ORDER BY user_id, day""".stripMargin),


    // weekly cohort retention triangle: first-active-week cohorts x
    // week offsets, epoch-day div 7 buckets (integer, tz-free, no ISO
    // week drift); keyed distinct + min + join + grid agg, no windows
    Q.df("x190_retention_cohorts",
      (s, dir) => TimeSeries.cohortRetention(
        Tables.load(s, dir, "events"), "user_id", "ts"),
      """WITH a AS (
        |  SELECT DISTINCT user_id AS u,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
        |      AS wk
        |  FROM events),
        |c AS (SELECT u, min(wk) AS cw FROM a GROUP BY 1),
        |s AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size
        |      FROM c GROUP BY 1)
        |SELECT a.cw AS cohort_week, a.off AS week_offset,
        |  a.active_users, s.cohort_size,
        |  a.active_users * 1000000 // s.cohort_size AS retention_ppm
        |FROM (
        |  SELECT c.cw, x.wk - c.cw AS off,
        |    CAST(count(*) AS BIGINT) AS active_users
        |  FROM a x JOIN c USING (u) GROUP BY 1, 2) a
        |JOIN s USING (cw)
        |ORDER BY cohort_week, week_offset""".stripMargin),


    // first-order clickstream transition matrix: per-user lead(1)
    // window (no event-table self-join), 30-min session gap, exact
    // per-src probabilities in ppm
    Q.df("x200_event_transitions",
      (s, dir) => TimeSeries.transitionMatrix(
        Tables.load(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type", 30),
      """WITH s AS (
        |  SELECT event_type AS t, ts,
        |    lead(event_type) OVER w AS nt, lead(ts) OVER w AS nts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |),
        |c AS (
        |  SELECT t AS src_type, nt AS dst_type,
        |    CAST(count(*) AS BIGINT) AS n_trans
        |  FROM s
        |  WHERE nt IS NOT NULL AND nts <= ts + INTERVAL 30 MINUTE
        |  GROUP BY 1, 2)
        |SELECT src_type, dst_type, n_trans,
        |  n_trans * 1000000 // CAST(sum(n_trans) OVER
        |    (PARTITION BY src_type) AS BIGINT) AS p_ppm
        |FROM c ORDER BY src_type, dst_type""".stripMargin),


    // freshness-decayed activity ranking: integer halving decay
    // (cnt >> whole-half-lives-old) — exponential decay with zero
    // floats, bit-exact across engines
    Q.df("x201_decay_activity",
      (s, dir) => TimeSeries.decayActivity(
        Tables.load(s, dir, "events"), "user_id", "ts", 7, 50),
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(day) AS mx FROM daily)
        |SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events,
        |  CAST(sum(cnt >> (datediff('day', day, mx) // 7)) AS BIGINT)
        |    AS score
        |FROM daily, mx GROUP BY user_id
        |ORDER BY score DESC, user_id LIMIT 50""".stripMargin),


    // out-of-orderness audit (the watermark-sizing statistic): running
    // event-time max in a PLANTED deterministic arrival order (block +
    // content-hash scramble — the synthetic table arrives perfectly
    // sorted, so the scramble plants the disorder the operator
    // measures, like x194's planted PII), exact p50/p99/max lateness
    Q.df("x205_lateness_profile",
      (s, dir) => TimeSeries.latenessProfile(
        Tables.load(s, dir, "events"), "event_type", "ts",
        Seq(expr("event_id div 500"),
          md5(col("event_id").cast("string")), col("event_id"))),
      """WITH a AS (
        |  SELECT event_type AS k, epoch_us(ts) AS us,
        |    event_id // 500 AS arr0,
        |    md5(CAST(event_id AS VARCHAR)) AS arr1, event_id AS arr2
        |  FROM events),
        |r AS (
        |  SELECT k, (max(us) OVER (PARTITION BY k
        |      ORDER BY arr0, arr1, arr2
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - us)
        |      // 1000000 AS late_s
        |  FROM a)
        |SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY late_s)
        |    AS BIGINT) AS p50_late_s,
        |  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY late_s)
        |    AS BIGINT) AS p99_late_s,
        |  CAST(max(late_s) AS BIGINT) AS max_late_s
        |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin),


    // strict-order 3-step funnel: each stage's committed time is the
    // MINIMUM qualifying ts strictly after the previous stage's —
    // greedy-optimal and deterministic; per-type counts without the
    // order constraint answer a different (wrong) question
    Q.df("x218_funnel_steps",
      (s, dir) => TimeSeries.funnelSteps(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase")),
      """WITH s1 AS (
        |  SELECT user_id AS k, min(ts) AS t FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id AS k, min(e.ts) AS t
        |  FROM events e JOIN s1 ON s1.k = e.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id AS k, min(e.ts) AS t
        |  FROM events e JOIN s2 ON s2.k = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
        |c AS (
        |  SELECT 1 AS stage_no, 'signup' AS stage,
        |    (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_keys
        |  UNION ALL SELECT 2, 'view',
        |    (SELECT CAST(count(*) AS BIGINT) FROM s2)
        |  UNION ALL SELECT 3, 'purchase',
        |    (SELECT CAST(count(*) AS BIGINT) FROM s3)),
        |f AS (SELECT n_keys AS n_first FROM c WHERE stage_no = 1)
        |SELECT stage_no, stage, n_keys,
        |  CAST(CASE WHEN lag(n_keys) OVER (ORDER BY stage_no) IS NULL
        |         THEN 1000000
        |       WHEN lag(n_keys) OVER (ORDER BY stage_no) > 0
        |         THEN n_keys * 1000000 // lag(n_keys) OVER (ORDER BY stage_no)
        |       ELSE 1000000 END AS BIGINT) AS conv_from_prev_ppm,
        |  CAST(CASE WHEN f.n_first > 0
        |    THEN n_keys * 1000000 // f.n_first ELSE 0 END AS BIGINT)
        |    AS conv_from_first_ppm
        |FROM c, f ORDER BY stage_no""".stripMargin),


    // RFM lifecycle segmentation: per-key recency/frequency/monetary,
    // each cut at exact percentile_disc tertiles, rolled to the
    // 27-cell grid; corpus "today" = max activity day (reproducible,
    // no wall clock); all cents integer-floored on both engines
    Q.df("x219_rfm_segments",
      (s, dir) => TimeSeries.rfmSegments(
        Tables.load(s, dir, "events"), "user_id", "ts", "value"),
      """WITH per AS (
        |  SELECT user_id AS k,
        |    max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
        |      AS last_day,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |u AS (
        |  SELECT k, (SELECT max(last_day) FROM per) - last_day
        |      AS rec_days, freq, cents
        |  FROM per),
        |e AS (SELECT
        |  CAST(percentile_disc(0.33) WITHIN GROUP (ORDER BY rec_days) AS BIGINT) AS r33,
        |  CAST(percentile_disc(0.66) WITHIN GROUP (ORDER BY rec_days) AS BIGINT) AS r66,
        |  CAST(percentile_disc(0.33) WITHIN GROUP (ORDER BY freq) AS BIGINT) AS f33,
        |  CAST(percentile_disc(0.66) WITHIN GROUP (ORDER BY freq) AS BIGINT) AS f66,
        |  CAST(percentile_disc(0.33) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS m33,
        |  CAST(percentile_disc(0.66) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS m66
        |  FROM u)
        |SELECT
        |  CAST(CASE WHEN rec_days <= r33 THEN 3
        |       WHEN rec_days <= r66 THEN 2 ELSE 1 END AS INTEGER) AS r_tier,
        |  CAST(CASE WHEN freq <= f33 THEN 1
        |       WHEN freq <= f66 THEN 2 ELSE 3 END AS INTEGER) AS f_tier,
        |  CAST(CASE WHEN cents <= m33 THEN 1
        |       WHEN cents <= m66 THEN 2 ELSE 3 END AS INTEGER) AS m_tier,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM u, e GROUP BY 1, 2, 3 ORDER BY r_tier, f_tier, m_tier""".stripMargin),


    // session-quality mart: the q41 gap-rule sessions summarized to
    // bounce rate (single-event sessions ppm) + exact median/max
    // session size — the daily engagement-health row
    Q.df("x229_session_quality",
      (s, dir) => TimeSeries.sessionQuality(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_id"),
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN date_diff('second',
        |           lag(ts) OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id), ts)
        |         > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |), sessions AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM marked
        |), sized AS (
        |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_ev
        |  FROM sessions GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bounces,
        |  CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS bounce_ppm,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_ev)
        |    AS BIGINT) AS p50_session_events,
        |  CAST(max(n_ev) AS BIGINT) AS max_session_events
        |FROM sized""".stripMargin),


    // power-of-two activity histogram: per-user event counts bucketed
    // by floor(log2) via bit_length — the ten-row heavy-tail audit
    // that sizes state stores and salting thresholds; no float log
    Q.df("x236_activity_histogram",
      (s, dir) => Profile.activityHistogram(
        Tables.load(s, dir, "events"), "user_id"),
      """WITH per AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM per),
        |b AS (
        |  SELECT CAST(CAST(1 AS BIGINT) << (length(bin(c)) - 1)
        |      AS BIGINT) AS bucket_pow2, c
        |  FROM per)
        |SELECT bucket_pow2, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(c) AS BIGINT) AS n_events,
        |  CAST(sum(c) * 1000000 // max(tot.total) AS BIGINT)
        |    AS events_ppm
        |FROM b, tot GROUP BY 1 ORDER BY bucket_pow2""".stripMargin),


    // weekly growth accounting: active = new + retained + resurrected
    // (identity spec-pinned); churn attributed to the week AFTER the
    // last consecutive activity, capped at the corpus horizon
    Q.df("x238_growth_accounting",
      (s, dir) => TimeSeries.growthAccounting(
        Tables.load(s, dir, "events"), "user_id", "ts"),
      """WITH act AS (
        |  SELECT DISTINCT user_id AS u,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
        |      AS wk
        |  FROM events),
        |f AS (
        |  SELECT u, wk,
        |    min(wk) OVER (PARTITION BY u) AS first_wk,
        |    lag(wk) OVER (PARTITION BY u ORDER BY wk) AS prev_wk,
        |    lead(wk) OVER (PARTITION BY u ORDER BY wk) AS next_wk
        |  FROM act),
        |mx AS (SELECT max(wk) AS max_wk FROM act),
        |a AS (
        |  SELECT wk, CAST(count(*) AS BIGINT) AS n_active,
        |    CAST(sum(CASE WHEN wk = first_wk THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_new,
        |    CAST(sum(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN wk <> first_wk
        |      AND (prev_wk IS NULL OR prev_wk < wk - 1)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM f GROUP BY 1),
        |c AS (
        |  SELECT f.wk + 1 AS wk, CAST(count(*) AS BIGINT)
        |      AS n_churned_in
        |  FROM f, mx
        |  WHERE (f.next_wk IS NULL OR f.next_wk > f.wk + 1)
        |    AND f.wk + 1 <= mx.max_wk
        |  GROUP BY 1)
        |SELECT a.wk, a.n_active, a.n_new, a.n_retained,
        |  a.n_resurrected,
        |  CAST(coalesce(c.n_churned_in, 0) AS BIGINT) AS n_churned_in
        |FROM a LEFT JOIN c USING (wk)
        |ORDER BY a.wk""".stripMargin),


    // fulfillment-lag mart: ship-date minus order-date in whole days
    // per priority tier, exact percentile_disc p50/p99/max — the
    // supply-chain SLA report; also regression-covers BOTH re-encoded
    // parquet date columns end to end
    Q.df("x239_fulfillment_lag",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val o = Tables.load(s, dir, "orders")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority"),
            expr("datediff(to_date(l_shipdate), to_date(o_orderdate))")
              .cast("bigint").as("lag_days"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            expr("CAST(percentile_disc(0.5) WITHIN GROUP" +
              " (ORDER BY lag_days) AS BIGINT)").as("p50_lag_days"),
            expr("CAST(percentile_disc(0.99) WITHIN GROUP" +
              " (ORDER BY lag_days) AS BIGINT)").as("p99_lag_days"),
            max("lag_days").as("max_lag_days"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY
        |    date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE))) AS BIGINT) AS p50_lag_days,
        |  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY
        |    date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE))) AS BIGINT) AS p99_lag_days,
        |  CAST(max(date_diff('day', CAST(o_orderdate AS DATE),
        |    CAST(l_shipdate AS DATE))) AS BIGINT) AS max_lag_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),


    // per-user time-weighted average event value — the metering
    // aggregate: each reading holds until the next, weights are
    // epoch-micros durations, numerator in DECIMAL(38,0); the plain
    // mean sits beside it to expose burst bias
    Q.df("x253_time_weighted_avg",
      (s, dir) => TimeSeries.timeWeightedAvg(
        Tables.load(s, dir, "events"),
        "user_id", "ts", "event_id", "value"),
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tm, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), l AS (
        |  SELECT user_id, cents,
        |    lead(tm) OVER (PARTITION BY user_id ORDER BY tm, event_id)
        |      - tm AS dur
        |  FROM e
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(dur) // 1000000 AS BIGINT) AS span_s,
        |  CAST(sum(cents * dur) // sum(dur) AS BIGINT) AS twa_cents,
        |  CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
        |FROM l GROUP BY 1 HAVING sum(dur) > 0
        |ORDER BY user_id""".stripMargin),


    // exact OLS trend slope of weekly activity per event type over the
    // ZERO-FILLED week calendar (a missing week is zero activity);
    // sign and |slope| ppm emitted separately — Spark div truncates,
    // DuckDB // floors, and on the split both agree exactly
    Q.df("x257_trend_slope",
      (s, dir) => TimeSeries.trendSlope(
        Tables.load(s, dir, "events"), "event_type", "ts"),
      """WITH w AS (
        |  SELECT event_type AS g,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk
        |  FROM events),
        |per AS (SELECT g, wk, count(*) AS y FROM w GROUP BY 1, 2),
        |cal AS (
        |  SELECT g, a, unnest(generate_series(a, b)) AS wk
        |  FROM (SELECT g, min(wk) AS a, max(wk) AS b FROM per GROUP BY 1)),
        |f AS (
        |  SELECT cal.g, cal.wk - cal.a AS x, coalesce(per.y, 0) AS y
        |  FROM cal LEFT JOIN per ON per.g = cal.g AND per.wk = cal.wk),
        |st AS (
        |  SELECT g, count(*) AS n, CAST(sum(y) AS BIGINT) AS total,
        |    sum(x) AS sx, sum(x * x) AS sxx, sum(x * y) AS sxy
        |  FROM f GROUP BY 1),
        |r AS (
        |  SELECT g, n, total,
        |    n * sxy - sx * total AS num,
        |    n * sxx - sx * sx AS den
        |  FROM st)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n_weeks, total,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
        |    AS BIGINT) AS slope_sign,
        |  CAST(CASE WHEN den = 0 THEN 0
        |    ELSE abs(num) * 1000000 // den END AS BIGINT) AS slope_abs_ppm
        |FROM r ORDER BY event_type""".stripMargin),


    // weekly-percentile trend (SLO drift): OLS slope of the weekly p50
    // AND p90 of value per event type — the distribution trend a mean
    // hides; observed weeks only (an absent week has no percentile),
    // sign/|slope| split, DECIMAL(38,0) products
    Q.df("x269_percentile_trend",
      (s, dir) => TimeSeries.percentileTrend(
        Tables.load(s, dir, "events"), "event_type", "ts", "value"),
      """WITH w AS (
        |  SELECT event_type AS g,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |per AS (
        |  SELECT g, wk,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS p50,
        |    CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS p90
        |  FROM w GROUP BY 1, 2),
        |base AS (SELECT g, min(wk) AS wk0 FROM per GROUP BY 1),
        |xy AS (SELECT per.g, per.wk - base.wk0 AS x, p50, p90
        |       FROM per JOIN base ON per.g = base.g),
        |st AS (
        |  SELECT g, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
        |    sum(p50) AS sy50, sum(p90) AS sy90,
        |    sum(x * p50) AS sxy50, sum(x * p90) AS sxy90
        |  FROM xy GROUP BY 1),
        |r AS (
        |  SELECT g, n,
        |    n * sxy50 - sx * sy50 AS num50,
        |    n * sxy90 - sx * sy90 AS num90,
        |    n * sxx - sx * sx AS den
        |  FROM st)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n_weeks,
        |  CAST(CASE WHEN num50 > 0 THEN 1 WHEN num50 < 0 THEN -1
        |    ELSE 0 END AS BIGINT) AS p50_sign,
        |  CAST(CASE WHEN den = 0 THEN 0
        |    ELSE abs(num50) * 1000000 // den END AS BIGINT) AS p50_abs_ppm,
        |  CAST(CASE WHEN num90 > 0 THEN 1 WHEN num90 < 0 THEN -1
        |    ELSE 0 END AS BIGINT) AS p90_sign,
        |  CAST(CASE WHEN den = 0 THEN 0
        |    ELSE abs(num90) * 1000000 // den END AS BIGINT) AS p90_abs_ppm
        |FROM r ORDER BY event_type""".stripMargin),


    // exact integer CUSUM control chart per event type over zero-filled
    // weekly counts (Page 1954): the max-reset recursion is not a
    // prefix sum, but the week series is a bounded grid, so the whole
    // chart folds IN-ROW with aggregate()'s lambda; oracle = the same
    // recursion as a recursive CTE
    Q.df("x271_cusum_chart",
      (s, dir) => TimeSeries.cusumChart(
        Tables.load(s, dir, "events"), "event_type", "ts"),
      """WITH RECURSIVE w AS (
        |  SELECT event_type AS g,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk
        |  FROM events),
        |per AS (SELECT g, wk, count(*) AS y FROM w GROUP BY 1, 2),
        |sp AS (
        |  SELECT g, min(wk) AS a, max(wk) AS b, sum(y) AS tot,
        |    max(wk) - min(wk) + 1 AS nw,
        |    sum(y) // (max(wk) - min(wk) + 1) AS mu
        |  FROM per GROUP BY 1),
        |cal AS (
        |  SELECT g, a, mu, nw, unnest(generate_series(a, b)) AS wk
        |  FROM sp),
        |f AS (
        |  SELECT cal.g, cal.wk - cal.a AS x, coalesce(per.y, 0) AS y,
        |    cal.mu, cal.nw
        |  FROM cal LEFT JOIN per ON per.g = cal.g AND per.wk = cal.wk),
        |c(g, x, s, alarms, first_wk, maxs, mu, nw) AS (
        |  SELECT g, x, greatest(0, y - mu - mu // 10),
        |    CASE WHEN greatest(0, y - mu - mu // 10) > mu
        |      THEN 1 ELSE 0 END,
        |    CASE WHEN greatest(0, y - mu - mu // 10) > mu
        |      THEN x ELSE -1 END,
        |    greatest(0, y - mu - mu // 10), mu, nw
        |  FROM f WHERE x = 0
        |  UNION ALL
        |  SELECT f.g, f.x,
        |    greatest(0, c.s + f.y - f.mu - f.mu // 10),
        |    c.alarms + CASE WHEN greatest(0, c.s + f.y - f.mu
        |      - f.mu // 10) > f.mu THEN 1 ELSE 0 END,
        |    CASE WHEN c.first_wk >= 0 THEN c.first_wk
        |      WHEN greatest(0, c.s + f.y - f.mu - f.mu // 10) > f.mu
        |      THEN f.x ELSE -1 END,
        |    greatest(c.maxs, greatest(0, c.s + f.y - f.mu - f.mu // 10)),
        |    f.mu, f.nw
        |  FROM c JOIN f ON f.g = c.g AND f.x = c.x + 1)
        |SELECT g AS event_type, CAST(nw AS BIGINT) AS n_weeks,
        |  CAST(mu AS BIGINT) AS mu, CAST(alarms AS BIGINT) AS n_alarms,
        |  CAST(first_wk AS BIGINT) AS first_alarm_wk,
        |  CAST(maxs AS BIGINT) AS max_cusum
        |FROM c WHERE x = nw - 1 ORDER BY event_type""".stripMargin),


    // weekday-seasonality-adjusted outlier audit: each day compared to
    // its group's SAME-WEEKDAY mean by exact cross-multiplication over
    // the zero-filled calendar (a silent day is the outage case);
    // weekday = epoch-day mod 7, engine-neutral
    Q.df("x272_seasonal_outliers",
      (s, dir) => TimeSeries.seasonalOutliers(
        Tables.load(s, dir, "events"), "event_type", "ts"),
      """WITH d AS (
        |  SELECT event_type AS g,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS ep
        |  FROM events),
        |per AS (SELECT g, ep, count(*) AS n FROM d GROUP BY 1, 2),
        |cal AS (
        |  SELECT g, unnest(generate_series(a, b)) AS ep
        |  FROM (SELECT g, min(ep) AS a, max(ep) AS b FROM per GROUP BY 1)),
        |f AS (
        |  SELECT cal.g, cal.ep, cal.ep % 7 AS dow, coalesce(per.n, 0) AS n
        |  FROM cal LEFT JOIN per ON per.g = cal.g AND per.ep = cal.ep),
        |prof AS (SELECT g, dow, sum(n) AS tot_w, count(*) AS days_w
        |         FROM f GROUP BY 1, 2),
        |x AS (
        |  SELECT f.g, f.ep, f.n, p.tot_w, p.days_w,
        |    (f.n * p.days_w > 2 * p.tot_w) AS hi,
        |    (2 * f.n * p.days_w < p.tot_w) AS lo,
        |    CASE WHEN p.tot_w > 0
        |      THEN f.n * p.days_w * 1000000 // p.tot_w END AS ratio_ppm
        |  FROM f JOIN prof p ON p.g = f.g AND p.dow = f.dow),
        |mx AS (SELECT g, max(CASE WHEN hi THEN ratio_ppm END) AS mr
        |       FROM x GROUP BY 1)
        |SELECT x.g AS event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
        |  CAST(sum(CASE WHEN lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(min(CASE WHEN hi AND x.ratio_ppm = mx.mr THEN x.ep END)
        |    AS BIGINT) AS worst_hi_day
        |FROM x JOIN mx ON mx.g = x.g
        |GROUP BY 1 ORDER BY event_type""".stripMargin),


    // time-to-convert percentile mart: per signup-week cohort, exact
    // p50/p90 of the signup→first-purchase delay — the funnel-latency
    // number growth teams quote; two keyed min-aggregates, never an
    // event-pair join
    Q.df("x281_time_to_convert",
      (s, dir) => TimeSeries.timeToConvert(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_type",
        "signup", "purchase"),
      """WITH e AS (
        |  SELECT user_id AS k, event_type AS t, epoch_us(ts) AS tm
        |  FROM events),
        |f AS (SELECT k, min(tm) AS t0 FROM e WHERE t = 'signup'
        |      GROUP BY 1),
        |cv AS (
        |  SELECT e.k, min(e.tm - f.t0) AS delta_us
        |  FROM e JOIN f ON e.k = f.k
        |  WHERE e.t = 'purchase' AND e.tm > f.t0
        |  GROUP BY 1),
        |d AS (
        |  SELECT f.t0 // 604800000000 AS cohort_wk,
        |    cv.delta_us // 1000000 AS delta_s
        |  FROM f LEFT JOIN cv ON f.k = cv.k)
        |SELECT cohort_wk, CAST(count(*) AS BIGINT) AS n_signups,
        |  CAST(count(delta_s) AS BIGINT) AS n_converted,
        |  CAST(count(delta_s) * 1000000 // count(*) AS BIGINT)
        |    AS conv_ppm,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY delta_s)
        |    AS BIGINT) AS p50_s,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY delta_s)
        |    AS BIGINT) AS p90_s
        |FROM d GROUP BY 1 ORDER BY cohort_wk""".stripMargin),


    // activity streaks (gaps-and-islands, distributed): epoch-day
    // minus per-key rank is constant along a consecutive run — one
    // window + one keyed agg, no self-join; longest streak per user
    Q.df("x283_activity_streaks",
      (s, dir) => TimeSeries.activityStreaks(
        Tables.load(s, dir, "events"), "user_id", "ts"),
      """WITH act AS (
        |  SELECT DISTINCT user_id AS k,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS ep
        |  FROM events),
        |g AS (
        |  SELECT k, ep,
        |    ep - row_number() OVER (PARTITION BY k ORDER BY ep) AS grp
        |  FROM act),
        |runs AS (
        |  SELECT k, grp, count(*) AS len, min(ep) AS start
        |  FROM g GROUP BY 1, 2)
        |SELECT k AS user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  CAST(max(len) AS BIGINT) AS longest_streak,
        |  CAST(min(CASE WHEN len = ml THEN start END) AS BIGINT)
        |    AS streak_start
        |FROM (SELECT runs.*, max(len) OVER (PARTITION BY k) AS ml
        |      FROM runs)
        |GROUP BY 1 ORDER BY user_id""".stripMargin),


    // next-event predictability: the first-order Markov argmax
    // evaluated in-sample — per type, the modal next event and the
    // ppm of transitions it gets right (the ceiling a sequence model
    // must beat; near-uniform means unpredictable, not under-modeled)
    Q.df("x285_next_event_accuracy",
      (s, dir) => TimeSeries.nextEventAccuracy(
        Tables.load(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type"),
      """WITH e AS (
        |  SELECT user_id AS k, epoch_us(ts) AS tm, event_id,
        |    event_type AS cur
        |  FROM events),
        |tr AS (
        |  SELECT cur, lead(cur) OVER (PARTITION BY k
        |    ORDER BY tm, event_id) AS nxt
        |  FROM e),
        |grid AS (SELECT cur, nxt, count(*) AS c FROM tr
        |         WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |pred AS (
        |  SELECT cur, CAST(sum(c) AS BIGINT) AS n_transitions,
        |    min_by(nxt, lpad(CAST(1000000000 - c AS VARCHAR), 12, '0')
        |      || ':' || nxt) AS predicted_next
        |  FROM grid GROUP BY 1)
        |SELECT g.cur AS event_type, p.n_transitions, p.predicted_next,
        |  CAST(sum(CASE WHEN g.nxt = p.predicted_next THEN g.c
        |    ELSE 0 END) AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN g.nxt = p.predicted_next THEN g.c
        |    ELSE 0 END) * 1000000 // p.n_transitions AS BIGINT)
        |    AS acc_ppm
        |FROM grid g JOIN pred p ON g.cur = p.cur
        |GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin),


    // EWMA control chart: integer fixed-point level tracker
    // (e' = (y + 7e) div 8) over the zero-filled daily calendar,
    // alarm on the exact doubling rule — sequential state folded
    // in-row (x271's shape); oracle = recursive CTE, bit-identical
    Q.df("x295_ewma_chart",
      (s, dir) => TimeSeries.ewmaChart(
        Tables.load(s, dir, "events"), "event_type", "ts"),
      """WITH RECURSIVE per AS (
        |  SELECT event_type AS g,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS ep,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |cal AS (
        |  SELECT g, a, unnest(generate_series(a, b)) AS ep
        |  FROM (SELECT g, min(ep) AS a, max(ep) AS b FROM per
        |        GROUP BY 1)),
        |ser AS (
        |  SELECT cal.g, cal.ep - cal.a AS x, coalesce(per.y, 0) AS y,
        |    count(*) OVER (PARTITION BY cal.g) AS nd
        |  FROM cal LEFT JOIN per ON per.g = cal.g AND per.ep = cal.ep),
        |c(g, x, e, alarms, first_x, nd) AS (
        |  SELECT g, x, y, CAST(0 AS BIGINT), CAST(-1 AS BIGINT), nd
        |  FROM ser WHERE x = 0
        |  UNION ALL
        |  SELECT s.g, s.x,
        |    (s.y + 7 * c.e) // 8,
        |    c.alarms + CASE WHEN c.e > 0 AND s.y > 2 * c.e
        |      THEN 1 ELSE 0 END,
        |    CASE WHEN c.first_x >= 0 THEN c.first_x
        |      WHEN c.e > 0 AND s.y > 2 * c.e THEN s.x ELSE -1 END,
        |    c.nd
        |  FROM c JOIN ser s ON s.g = c.g AND s.x = c.x + 1)
        |SELECT g AS event_type, CAST(nd AS BIGINT) AS n_days,
        |  CAST(alarms AS BIGINT) AS n_alarms,
        |  CAST(first_x AS BIGINT) AS first_alarm_x,
        |  CAST(e AS BIGINT) AS final_ewma
        |FROM c WHERE x = nd - 1 ORDER BY event_type""".stripMargin),


    // linear-interpolation gap fill (the flow-series sibling of x184's
    // LOCF): integer-cents ramp between observed neighbors
    Q.df("x309_gapfill_interp",
      (s, dir) => TimeSeries.gapFillInterp(
          Tables.load(s, dir, "events").where(col("user_id") % 5 === 0)
            .withColumn("k2",
              concat_ws("|", col("user_id"), col("event_type"))),
          "k2", "ts", "value", "event_id")
        // DATE columns render differently in the two compare paths
        // (pandas datetime64 vs datetime.date) — ship the day as text
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd")),
      """WITH ev AS (SELECT user_id || '|' || event_type AS k2, ts, value,
        |            event_id FROM events WHERE user_id % 5 = 0),
        |daily AS (SELECT k2, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(max_by(CAST(floor(value * 100) AS BIGINT), event_id)
        |      AS BIGINT) AS v
        |  FROM ev GROUP BY 1, 2),
        |span AS (SELECT k2, min(day) AS a, max(day) AS b FROM daily
        |         GROUP BY 1),
        |cal AS (SELECT k2,
        |    unnest(generate_series(a, b, INTERVAL 1 DAY))::DATE AS day
        |  FROM span),
        |j AS (SELECT c.k2, c.day, d.v FROM cal c
        |      LEFT JOIN daily d ON d.k2 = c.k2 AND d.day = c.day),
        |f AS (SELECT k2, day, v,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER w AS pd,
        |    last_value(v IGNORE NULLS) OVER w AS pv,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER w2 AS nd,
        |    first_value(v IGNORE NULLS) OVER w2 AS nv
        |  FROM j WINDOW
        |    w AS (PARTITION BY k2 ORDER BY day ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW),
        |    w2 AS (PARTITION BY k2 ORDER BY day ROWS BETWEEN CURRENT ROW
        |      AND UNBOUNDED FOLLOWING))
        |SELECT k2, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(CASE WHEN v IS NOT NULL THEN v
        |    ELSE pv + ((nv - pv) * date_diff('day', pd, day))
        |      // date_diff('day', pd, nd) END AS BIGINT) AS cents_filled,
        |  CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_interp
        |FROM f ORDER BY k2, day""".stripMargin),


    // inter-arrival cadence profile: whole-second gap count / discrete
    // median / discrete p90 / max per event type
    Q.df("x323_inter_arrival",
      (s, dir) => TimeSeries.interArrival(Tables.load(s, dir, "events")),
      """WITH e AS (SELECT event_type, user_id, event_id,
        |    epoch_us(ts) AS ts_us FROM events WHERE user_id IS NOT NULL),
        |g AS (SELECT event_type, (ts_us - lag(ts_us) OVER
        |    (PARTITION BY event_type, user_id ORDER BY ts_us, event_id))
        |    // 1000000 AS gap_s
        |  FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_s)
        |    AS BIGINT) AS med_gap_s,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_s)
        |    AS BIGINT) AS p90_gap_s,
        |  CAST(max(gap_s) AS BIGINT) AS max_gap_s
        |FROM g WHERE gap_s IS NOT NULL
        |GROUP BY 1 ORDER BY event_type""".stripMargin),


    // exact lag-1..7 autocorrelation of daily counts per event type —
    // zero days counted via algebra, never materialized
    Q.df("x326_autocorr_daily",
      (s, dir) => TimeSeries.autocorrDaily(Tables.load(s, dir, "events")),
      """WITH daily AS (SELECT event_type AS g,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |span AS (SELECT CAST(min(d) AS BIGINT) AS dmin,
        |    CAST(max(d) AS BIGINT) AS dmax,
        |    CAST(max(d) - min(d) + 1 AS BIGINT) AS m FROM daily),
        |stats AS (SELECT g, CAST(sum(c) AS BIGINT) AS s,
        |    CAST(sum(c * c) AS BIGINT) AS sumsq FROM daily GROUP BY 1),
        |lags AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS k),
        |p AS (SELECT a.g, l.k, CAST(sum(a.c * b.c) AS BIGINT) AS p
        |  FROM daily a CROSS JOIN lags l
        |  JOIN daily b ON b.g = a.g AND b.d = a.d + l.k GROUP BY 1, 2),
        |ab AS (SELECT dl.g, dl.k,
        |    CAST(sum(CASE WHEN dl.d <= span.dmax - dl.k THEN dl.c
        |      ELSE 0 END) AS BIGINT) AS a_sum,
        |    CAST(sum(CASE WHEN dl.d >= span.dmin + dl.k THEN dl.c
        |      ELSE 0 END) AS BIGINT) AS b_sum
        |  FROM (SELECT daily.*, lags.k FROM daily CROSS JOIN lags) dl
        |  CROSS JOIN span GROUP BY 1, 2)
        |SELECT stats.g AS event_type, lags.k AS lag,
        |  m - lags.k AS n_pairs,
        |  CAST((m * m * coalesce(p.p, 0) - m * s * (a_sum + b_sum)
        |      + (m - lags.k) * s * s) * 1000
        |    // nullif(m * m * sumsq - m * s * s, 0) AS BIGINT)
        |    AS acf_milli
        |FROM stats CROSS JOIN lags
        |JOIN ab ON ab.g = stats.g AND ab.k = lags.k
        |LEFT JOIN p ON p.g = stats.g AND p.k = lags.k
        |CROSS JOIN span
        |ORDER BY event_type, lag""".stripMargin),


    // hour-of-day whole-bit entropy + peak share per event type: the
    // cron-vs-organic traffic separator
    Q.df("x332_hour_entropy",
      (s, dir) => TimeSeries.hourEntropy(Tables.load(s, dir, "events")),
      """WITH hc AS (SELECT event_type AS g, CAST(hour(ts) AS BIGINT) AS h,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |a AS (SELECT g, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(c * (length(bin(c)) - 1)) AS BIGINT) AS self_bits
        |  FROM hc GROUP BY 1),
        |peak AS (SELECT g, h AS peak_hour, c AS pc FROM (
        |    SELECT g, h, c, row_number() OVER
        |      (PARTITION BY g ORDER BY c DESC, h) AS rn FROM hc)
        |  WHERE rn = 1)
        |SELECT a.g AS event_type, n AS n_events,
        |  CAST((n * (length(bin(n)) - 1) - self_bits) * 1000 // n
        |    AS BIGINT) AS entropy_millibits,
        |  peak_hour, CAST(pc * 1000000 // n AS BIGINT) AS peak_ppm
        |FROM a JOIN peak USING (g) ORDER BY 1""".stripMargin),


    // discrete hazard curve of user lifetime — retention-cliff audit
    Q.df("x346_hazard_curve",
      (s, dir) => TimeSeries.hazardCurve(
        Tables.load(s, dir, "events")),
      """WITH ls AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(max(ts) AS DATE)) AS BIGINT) AS k
        |  FROM events GROUP BY 1),
        |h AS (SELECT k, CAST(count(*) AS BIGINT) AS n_churned
        |  FROM ls GROUP BY 1),
        |c AS (SELECT k, n_churned,
        |    CAST(sum(n_churned) OVER (ORDER BY k DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_at_risk
        |  FROM h)
        |SELECT k, n_churned, n_at_risk,
        |  n_churned * 1000000 // n_at_risk AS hazard_ppm
        |FROM c ORDER BY k""".stripMargin),


    // top event trigrams with Markov-1 lift: is the process
    // memoryless at depth 2?
    Q.df("x358_event_trigrams",
      (s, dir) => TimeSeries.eventTrigrams(Tables.load(s, dir, "events")),
      """WITH s AS (SELECT user_id, event_type AS a,
        |    lead(event_type, 1) OVER w AS b,
        |    lead(event_type, 2) OVER w AS c
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |bi AS (SELECT a AS b1, b AS b2, CAST(count(*) AS BIGINT) AS n_bc
        |  FROM s WHERE b IS NOT NULL GROUP BY 1, 2),
        |bo AS (SELECT b1, CAST(sum(n_bc) AS BIGINT) AS n_b_out
        |  FROM bi GROUP BY 1),
        |tri AS (SELECT a, b, c, CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE c IS NOT NULL GROUP BY 1, 2, 3),
        |tp AS (SELECT a, b, CAST(sum(n) AS BIGINT) AS n_ab
        |  FROM tri GROUP BY 1, 2)
        |SELECT tri.a, tri.b, tri.c, tri.n,
        |  tri.n * 1000000 // tp.n_ab AS p_cond_ppm,
        |  bi.n_bc * 1000000 // bo.n_b_out AS p1_ppm,
        |  (tri.n * 1000000 // tp.n_ab) * 1000
        |    // nullif(bi.n_bc * 1000000 // bo.n_b_out, 0) AS lift_milli
        |FROM tri JOIN tp ON tri.a = tp.a AND tri.b = tp.b
        |JOIN bi ON tri.b = bi.b1 AND tri.c = bi.b2
        |JOIN bo ON tri.b = bo.b1
        |ORDER BY tri.n DESC, tri.a, tri.b, tri.c
        |LIMIT 20""".stripMargin),


    // seasonal-naive vs persistence backtest — the baselines a
    // capacity forecast must beat, exact MAE/MAPE
    Q.df("x379_seasonal_naive_backtest",
      (s, dir) => TimeSeries.seasonalNaiveBacktest(
        Tables.load(s, dir, "events")),
      """WITH daily AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |l AS (SELECT d, n,
        |    max(n) OVER (ORDER BY d RANGE BETWEEN 1 PRECEDING
        |      AND 1 PRECEDING) AS p1,
        |    max(n) OVER (ORDER BY d RANGE BETWEEN 7 PRECEDING
        |      AND 7 PRECEDING) AS p7
        |  FROM daily),
        |f AS (SELECT * FROM l WHERE p1 IS NOT NULL AND p7 IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_scored,
        |  CAST(sum(abs(n - p1)) * 1000 // count(*) AS BIGINT)
        |    AS mae_p_milli,
        |  CAST(sum(abs(n - p1) * 1000000 // n) // count(*) AS BIGINT)
        |    AS mape_p_ppm,
        |  CAST(sum(abs(n - p7)) * 1000 // count(*) AS BIGINT)
        |    AS mae_w_milli,
        |  CAST(sum(abs(n - p7) * 1000000 // n) // count(*) AS BIGINT)
        |    AS mape_w_ppm
        |FROM f""".stripMargin),


    // changepoint localization: argmax cross-multiplied mean gap
    // over the daily series — WHERE the level shifted
    Q.df("x380_changepoint_locate",
      (s, dir) => TimeSeries.changepointLocate(
        Tables.load(s, dir, "events")),
      """WITH daily AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |pre AS (SELECT d, n,
        |    sum(n) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS ns,
        |    row_number() OVER (ORDER BY d) AS ds
        |  FROM daily),
        |tot AS (SELECT max(ns) AS s_all, max(ds) AS d_all FROM pre),
        |sc AS (SELECT d, ns, ds, s_all, d_all,
        |    abs(CAST(ns AS HUGEINT) * d_all
        |      - CAST(s_all AS HUGEINT) * ds) AS score
        |  FROM pre CROSS JOIN tot WHERE ds < d_all),
        |best AS (SELECT * FROM sc ORDER BY score DESC, d LIMIT 1)
        |SELECT CAST(d AS BIGINT) AS split_d,
        |  CAST(d_all AS BIGINT) AS n_days,
        |  CAST(ns * 1000 // ds AS BIGINT) AS mean_left_milli,
        |  CAST((s_all - ns) * 1000 // (d_all - ds) AS BIGINT)
        |    AS mean_right_milli,
        |  CAST(score AS BIGINT) AS gap_score
        |FROM best""".stripMargin),


    // daily co-movement of event-type pairs: sqrt-free signed r² in
    // ppm — "these two alerts are one incident"
    Q.df("x387_daily_comovement",
      (s, dir) => TimeSeries.dailyCoMovement(
        Tables.load(s, dir, "events")),
      """WITH daily AS (SELECT event_type AS t,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |p AS (SELECT a.t AS ta, b.t AS tb, a.n AS x, b.n AS y
        |  FROM daily a JOIN daily b ON a.d = b.d AND a.t < b.t),
        |m AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy FROM p GROUP BY 1, 2),
        |v AS (SELECT ta, tb, m,
        |    m * sxy - CAST(sx AS HUGEINT) * sy AS cov,
        |    m * sxx - CAST(sx AS HUGEINT) * sx AS va,
        |    m * syy - CAST(sy AS HUGEINT) * sy AS vb FROM m)
        |SELECT ta AS type_a, tb AS type_b, m AS n_days,
        |  CAST(CASE WHEN va = 0 OR vb = 0 THEN NULL ELSE
        |    (CASE WHEN cov < 0 THEN -1 ELSE 1 END)
        |    * (cov * cov * 1000000 // (va * vb)) END AS BIGINT)
        |    AS signed_r2_ppm
        |FROM v ORDER BY type_a, type_b""".stripMargin),


    // ship-lag profile per order priority: histogram-folded median
    // and type-1 p90 lag + late rate — the fulfillment-SLA audit
    Q.df("x388_ship_lag",
      (s, dir) => TimeSeries.shipLag(Tables.load(s, dir, "lineitem"),
        Tables.load(s, dir, "orders")),
      """WITH h AS (SELECT o_orderpriority AS pri,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
        |      AS BIGINT) AS lag,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |cum AS (SELECT pri, lag, c, sum(c) OVER (PARTITION BY pri
        |    ORDER BY lag ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS cum FROM h),
        |tot AS (SELECT pri, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN lag > 30 THEN c ELSE 0 END) AS BIGINT)
        |      AS n_late
        |  FROM h GROUP BY 1)
        |SELECT cum.pri AS o_orderpriority, tot.n,
        |  CAST(min(CASE WHEN cum * 10 >= n * 5 THEN lag END)
        |    AS BIGINT) AS median_lag,
        |  CAST(min(CASE WHEN cum * 10 >= n * 9 THEN lag END)
        |    AS BIGINT) AS p90_lag,
        |  max(n_late) * 1000000 // tot.n AS late_ppm
        |FROM cum JOIN tot ON cum.pri = tot.pri
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin),

  )
}
