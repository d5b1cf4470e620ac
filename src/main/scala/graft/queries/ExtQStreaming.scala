package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming
import graft.queries.ExtShared._

/** §2.8 judged queries — Structured Streaming shapes (AvailableNow replay, drained==batch). */
private[queries] object ExtQStreaming {

  val qs: Seq[Q] = Seq(

    // ---- streaming (Structured Streaming, AvailableNow replay) ---------
    Q.df("x62_stream_hourly",
      (s, dir) => Streaming.hourlyCounts(s, dir),
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),


    // the FILE-sink streaming path (append mode): results written as
    // parquet by executors — no driver-bound memory sink. Append emits
    // a window exactly once when the watermark (max ts - 1h) passes its
    // end, so the oracle counts only watermark-closed windows.
    Q.df("x111_stream_file_sink",
      (s, dir) => Streaming.hourlyCountsFileSink(s, dir),
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS cnt
        |FROM events
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
        |      <= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
        |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),


    // streaming exact dedup: per-key state across the replayed backlog
    Q.df("x76_stream_dedup",
      (s, dir) => Streaming.streamDistinctUsers(s, dir),
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin),


    // stream-static join: per-batch enrichment against a batch dimension
    // (stateless join; only the event_type aggregate is stateful)
    Q.df("x79_stream_static_join",
      (s, dir) => Streaming.streamStaticJoin(s, dir),
      """SELECT event_type,
        |  count(*) AS matched_events,
        |  CAST(sum(n_orders) AS BIGINT) AS sum_orders
        |FROM events e
        |JOIN (SELECT o_custkey, count(*) AS n_orders
        |      FROM orders GROUP BY o_custkey) d
        |  ON e.user_id = d.o_custkey
        |GROUP BY event_type ORDER BY event_type""".stripMargin),


    // arbitrary stateful streaming: flatMapGroupsWithState sessionizer
    Q.df("x68_stream_sessions_state",
      (s, dir) => Streaming.sessionizeStateful(s, dir),
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |)
        |SELECT user_id,
        |  CAST(sum(new_session) AS BIGINT) AS session_cnt,
        |  count(*) AS event_cnt
        |FROM marked GROUP BY user_id ORDER BY user_id""".stripMargin),


    // stream-stream interval join (funnel attribution): signups matched
    // to same-user purchases within 1 hour, watermarks on both sides —
    // drained over the backlog it equals the batch self-join
    Q.df("x96_stream_stream_join",
      (s, dir) => Streaming.streamStreamJoin(s, dir),
      """SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id
        |FROM events s JOIN events p
        |  ON s.user_id = p.user_id
        | AND s.event_type = 'signup' AND p.event_type = 'purchase'
        | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        |ORDER BY s.user_id, signup_id, purchase_id""".stripMargin),


    // foreachBatch sink: update-mode running totals appended to an
    // upsert journal per micro-batch, compacted latest-batch-wins on
    // read — the custom-sink exactly-once pattern; equals the batch
    // aggregation over the drained backlog
    Q.df("x122_stream_foreachbatch",
      (s, dir) => Streaming.userTotalsForeachBatch(s, dir),
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),


    // stream-stream LEFT OUTER interval join: unmatched signups emitted
    // exactly once at watermark-driven state eviction (purchase_id = -1)
    // — "never converted" as a first-class streaming answer (see
    // Streaming.streamStreamLeftOuterJoin scaladoc)
    Q.df("x133_stream_outer_join",
      (s, dir) => Streaming.streamStreamLeftOuterJoin(s, dir),
      """SELECT s.user_id, s.event_id AS signup_id,
        |  coalesce(p.event_id, -1) AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        |ORDER BY s.user_id, signup_id, purchase_id""".stripMargin),


    // hopping (sliding) windows as a STREAM — the streaming twin of the
    // batch x98: 2h windows advancing hourly, every event in two window
    // states (Expand), watermark-bounded; drained over the backlog it
    // equals the batch hopping aggregation
    Q.df("x136_stream_hopping",
      (s, dir) => Streaming.hoppingCounts(s, dir),
      """SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS cnt
        |FROM (SELECT date_trunc('hour', ts) - k.k * INTERVAL 1 HOUR AS win_start,
        |        event_type
        |      FROM events CROSS JOIN (VALUES (0), (1)) k(k)) w
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin),


    // FULL outer stream-stream interval join — completes the streaming
    // join family (inner x96, left x133): unmatched PURCHASES also
    // emitted once at their state eviction (signup_id = -1); same
    // sentinel-drain mechanics, equals the batch FULL JOIN
    Q.df("x140_stream_full_outer_join",
      (s, dir) => Streaming.streamStreamFullOuterJoin(s, dir),
      """SELECT coalesce(s.user_id, p.user_id) AS user_id,
        |  coalesce(s.event_id, -1) AS signup_id,
        |  coalesce(p.event_id, -1) AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        |ORDER BY user_id, signup_id, purchase_id""".stripMargin),


    // streaming per-key top-k leaderboard: bounded custom state (the
    // streaming twin of the batch TopKAgg bounded heap — streaming
    // can't sort, so rank must be spelled as state); monotone-state
    // compaction on read (see Streaming.topKStateful scaladoc)
    Q.df("x147_stream_topk",
      (s, dir) => Streaming.topKStateful(s, dir, 3),
      """SELECT event_type, CAST(rn AS BIGINT) AS rank, event_id, cents
        |FROM (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY floor(value * 100) DESC, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 3 ORDER BY event_type, rank""".stripMargin),


    // streaming incremental corpus dedup: the src19 batch PLUS a
    // planted batch of re-scraped corpus duplicates (corpus slice
    // re-keyed to fresh ids, byte-identical text) arrive as a STREAM
    // against the static src0-18 corpus — broadcast Bloom prefilter
    // per micro-batch, exact stream-static anti-join on the maybe
    // slice only. Every planted duplicate must be swallowed, every
    // original must pass; equals batch incrementalNew over the same
    // backlog (see Streaming.streamIncrementalDedup)
    Q.df("x154_stream_incremental_dedup",
      (s, dir) => Streaming.streamIncrementalDedup(s, dir),
      """WITH nw AS (
        |  SELECT doc_id, text FROM documents WHERE source = 'src19'
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE source <> 'src19' AND doc_id % 10 = 4)
        |SELECT n.doc_id FROM nw n
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents o
        |  WHERE o.source <> 'src19'
        |    AND md5(trim(regexp_replace(lower(o.text), '\s+', ' ', 'g'))) =
        |        md5(trim(regexp_replace(lower(n.text), '\s+', ' ', 'g'))))
        |ORDER BY n.doc_id""".stripMargin),


    // declarative session windows as a STREAM: session_window's
    // merging state (sessions coalesce when a bridging event arrives)
    // on the events backlog — the built-in spelling of x68's custom
    // state; equals the batch session_window agg, oracle = the
    // lag/running-sum session derivation (same as x65)
    Q.df("x161_stream_session_window",
      (s, dir) => Streaming.sessionWindowStream(s, dir),
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


    // streaming CURATED ingest: the x154 live front door with the
    // C4-style quality gate composed in-row BEFORE the Bloom dedup —
    // completely stateless per batch (array lambdas, no streaming agg,
    // no watermark); equals the batch quality-gate -> incrementalNew
    // composition over the same backlog (see
    // Streaming.streamCuratedIngest)
    Q.df("x160_stream_curated_ingest",
      (s, dir) => Streaming.streamCuratedIngest(s, dir),
      """WITH nw AS (
        |  SELECT doc_id, text FROM documents WHERE source = 'src19'
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE source <> 'src19' AND doc_id % 10 = 4),
        |q AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |    FROM nw) x
        |  WHERE len(t) >= 20
        |    AND CAST(floor(10000.0 * len(list_filter(t,
        |          w -> w IN ('the','a','of','and','to','in'))) / len(t))
        |        AS BIGINT) >= 100
        |    AND CAST(floor(10000.0 * list_sum(list_transform(t,
        |          w -> length(w))) / len(t)) AS BIGINT)
        |        BETWEEN 30000 AND 80000)
        |SELECT n.doc_id FROM nw n JOIN q USING (doc_id)
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents o
        |  WHERE o.source <> 'src19'
        |    AND md5(trim(regexp_replace(lower(o.text), '\s+', ' ', 'g'))) =
        |        md5(trim(regexp_replace(lower(n.text), '\s+', ' ', 'g'))))
        |ORDER BY n.doc_id""".stripMargin),


    // streaming CDC apply — the live twin of x153: the classified
    // changeset arrives as micro-batches, foreachBatch journals every
    // change (tombstones included) with its batch id, and serve-time
    // compaction + one keyed full-outer apply reconstructs the new
    // snapshot. Oracle: the actual v2.
    Q.df("x170_stream_cdc_apply",
      (s, dir) => Streaming.streamCdcApply(s, dir),
      """WITH v1 AS (SELECT o_orderkey AS k,
        |              CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |            FROM orders),
        |v2 AS (
        |  SELECT k, CASE WHEN k % 5 = 0 THEN cents + 100 ELSE cents END AS cents
        |  FROM v1 WHERE k % 7 <> 0
        |  UNION ALL
        |  SELECT -k, cents FROM v1 WHERE k % 11 = 0
        |)
        |SELECT k, cents FROM v2 ORDER BY k""".stripMargin),


    // streaming cohort-retention mart: distinct (user, week) activity
    // maintained as dropDuplicates state (bounded by keys x weeks,
    // not events), serve-time grid shared with batch x190 — the
    // drained stream must equal the batch triangle, which the oracle
    // (same SQL as x190) checks
    Q.df("x192_stream_retention",
      (s, dir) => Streaming.streamRetention(s, dir),
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


    // streaming rate-anomaly monitor: static baseline broadcast-joined
    // per micro-batch BEFORE the windowed agg (stateless enrichment),
    // integer cross-multiplied spike flag — no float rate anywhere
    Q.df("x204_stream_anomaly",
      (s, dir) => Streaming.streamRateAnomaly(s, dir, 150),
      """WITH base AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS base_total,
        |    CAST(count(DISTINCT date_trunc('hour', ts)) AS BIGINT)
        |      AS base_hours
        |  FROM events GROUP BY 1),
        |h AS (
        |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |      AS hour,
        |    event_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT h.hour, h.event_type, h.cnt, b.base_total, b.base_hours,
        |  CAST(CASE WHEN h.cnt * b.base_hours * 100
        |            >= b.base_total * 150 THEN 1 ELSE 0 END AS INTEGER)
        |    AS is_spike
        |FROM h JOIN base b USING (event_type)
        |ORDER BY hour, event_type""".stripMargin),


    // streaming dead-letter queue: ONE foreachBatch routes each
    // micro-batch to accepted/quarantine sinks (reason-stamped,
    // batch-id idempotent); sum_chars pins row ROUTING, not just counts
    Q.df("x209_stream_dlq",
      (s, dir) => Streaming.streamDlq(s, dir),
      """WITH g AS (
        |  SELECT n_chars,
        |    CASE WHEN n_chars < 150 THEN 'too_short'
        |         WHEN n_chars > 450 THEN 'too_long'
        |         WHEN lang NOT IN ('en', 'de', 'fr') THEN 'bad_lang'
        |         ELSE 'ok' END AS reason
        |  FROM documents)
        |SELECT CASE WHEN reason = 'ok' THEN 'accepted' ELSE 'rejected'
        |         END AS disposition,
        |  reason, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM g GROUP BY 1, 2 ORDER BY disposition, reason""".stripMargin),


    // streaming drift monitor: STATIC decile edges broadcast into each
    // micro-batch, state = the (source x 10) bin grid in complete
    // mode; served through the SAME driftFromBinned code as batch
    // x217 — the drained stream must equal the batch audit, which
    // this oracle (the x217 SQL) checks
    Q.df("x220_stream_drift",
      (s, dir) => Streaming.streamDriftMart(s, dir),
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
        |       FROM b GROUP BY 1),
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


    // streaming heavy-tail monitor: per-user counts as complete-mode
    // state, bucketed by bit_length at SERVE time (bucketing in the
    // stream would freeze early assignments) — drained == batch x236
    Q.df("x240_stream_activity",
      (s, dir) => Streaming.streamActivityHistogram(s, dir),
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


    // streaming NEAR-dup front door: arriving docs MinHash-banded
    // in-row, probed against the static corpus band table
    // (stream-static equi-join), exact-verified per row via
    // array_intersect — stateless per batch; the drained mart must
    // equal batch minhashLshPairs, so the oracle is x57's, verbatim
    Q.df("x242_stream_neardup",
      (s, dir) => Streaming.streamNearDup(s, dir),
      duckMinhash8x2Oracle),


    // streaming SCD2 enrichment: streamed clicks join the purchase-
    // history version active at their event time (stream-static
    // non-equi interval probe; dimension re-planned per micro-batch);
    // oracle = the batch interval join
    Q.df("x266_stream_scd2_enrich",
      (s, dir) => Streaming.streamScd2Enrich(s, dir),
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS eff_from,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    coalesce(lead(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
        |      9223372036854775807) AS eff_to
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'click')
        |SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_clicks,
        |  CAST(sum(p.cents) AS BIGINT) AS sum_active_cents
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND c.us >= p.eff_from AND c.us < p.eff_to
        |GROUP BY 1 ORDER BY c.user_id""".stripMargin),


    // streaming PSI monitor: complete-mode (source, lang) count state
    // drained into the batch serve-time arithmetic — oracle is x348's
    // SQL verbatim (drained == batch)
    Q.df("x360_stream_psi",
      (s, dir) => Streaming.streamPsi(s, dir),
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


    // streaming SRM monitor: complete-mode per-day arrival-count
    // state drained into the batch running-chi-square arithmetic —
    // oracle is x362's SQL verbatim (drained == batch)
    Q.df("x376_stream_srm",
      (s, dir) => Streaming.streamSrm(s, dir),
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


    // streaming partition-completeness monitor: per-day count state
    // drained into the batch median arithmetic — oracle is x372's SQL
    // verbatim (drained == batch)
    Q.df("x383_stream_completeness",
      (s, dir) => Streaming.streamCompleteness(s, dir),
      """WITH daily AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |w AS (SELECT d, n, list_sort(list(n) OVER (ORDER BY d
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS neigh
        |  FROM daily)
        |SELECT d, n,
        |  CAST(neigh[(len(neigh) + 1) // 2] AS BIGINT) AS med7,
        |  n * 1000000 // CAST(neigh[(len(neigh) + 1) // 2] AS BIGINT)
        |    AS completeness_ppm
        |FROM w ORDER BY d""".stripMargin),


    // streaming shape #24: NATIVE dropDuplicatesWithinWatermark TTL
    // dedup — (user, event_type) admitted once per 7-day window with
    // watermark-evicted per-key state; drained key set == batch
    // DISTINCT over the backlog (x261's windowedDedup is the batch
    // twin carrying counts; the native state op emits keys only)
    Q.df("x389_stream_ttl_dedup",
      (s, dir) => Streaming.streamTtlDedup(s, dir),
      """SELECT DISTINCT user_id, event_type,
        |  (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS win
        |FROM events
        |ORDER BY user_id, event_type, win""".stripMargin),


    // streaming shape #26: the QTE monitor — in-row arm/cents scoring,
    // complete-mode value-grid histogram state, drained through the
    // batch decile arithmetic; same oracle as x400
    Q.df("x401_stream_qte",
      (s, dir) => Streaming.streamQte(s, dir),
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


    // streaming shape #25: the encoding-damage monitor — in-row damage
    // scoring, complete-mode per-source counter state, drained through
    // the batch finishing stage; same oracle as x395
    Q.df("x397_stream_damage",
      // the deterministic planted damage lives HERE (and in the oracle
      // below), mirroring the batch x395 registration — the operator
      // itself consumes the raw arriving documents
      (s, dir) => Streaming.streamDamage(s, dir, raw => raw
        .select(col("source"),
          when(col("doc_id") % 13 === 0,
            concat(col("text"), lit("Ã© &amp; &#233; x�")))
            .otherwise(col("text")).as("text"))),
      """WITH dmg AS (SELECT source,
        |    CASE WHEN doc_id % 13 = 0 THEN
        |      concat(text, chr(195), chr(169), ' &amp; &#233; x',
        |             chr(65533))
        |    ELSE text END AS text
        |  FROM documents),
        |c AS (SELECT source,
        |    CAST(len(regexp_extract_all(text, chr(65533))) AS BIGINT)
        |      AS r,
        |    CAST(len(regexp_extract_all(text, chr(195) || '.'))
        |      AS BIGINT) AS m,
        |    CAST(len(regexp_extract_all(text,
        |      '&(amp|lt|gt|quot|apos|#[0-9]+);')) AS BIGINT) AS e,
        |    CAST(len(regexp_extract_all(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT) AS ct
        |  FROM dmg)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(r) AS BIGINT) AS n_replacement,
        |  CAST(sum(m) AS BIGINT) AS n_mojibake,
        |  CAST(sum(e) AS BIGINT) AS n_entity,
        |  CAST(sum(ct) AS BIGINT) AS n_ctrl,
        |  CAST(sum(CASE WHEN r + m + e + ct > 0 THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS damaged_ppm
        |FROM c GROUP BY source ORDER BY source""".stripMargin),


    // shape #27 — the APPEND-mode monitor: daily event-integrity report
    // finalized (and state-evicted) when the 1-day watermark passes the
    // day's end; open days are absent BY SEMANTICS. The oracle
    // re-derives the closed-day boundary from max(ts) - 1 day, so the
    // eviction rule itself is judged, not just the per-day arithmetic.
    Q.df("x403_stream_daily_integrity",
      (s, dir) => Streaming.streamDailyIntegrity(s, dir),
      """WITH mx AS (SELECT max(ts) AS m FROM events),
        |d AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CASE WHEN value < 1.0 OR value > 400.0
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT strftime(day, '%Y-%m-%d') AS day, event_type, n_events,
        |  n_anomalies,
        |  CAST(n_anomalies * 1000000 // n_events AS BIGINT) AS anomaly_ppm
        |FROM d, mx
        |WHERE CAST(day AS TIMESTAMP) + INTERVAL 1 DAY <= mx.m - INTERVAL 1 DAY
        |ORDER BY day, event_type""".stripMargin),



    // streaming STAGED-PROFILE curation front door — shape #28, the
    // live twin of x123's staged admission stages served from the
    // persisted curation profile: in-row quality gate, Bloom+anti-join
    // exact dedup against the staged fingerprint column, and
    // decontamination of an in-row 16-bit SimHash (spec-pinned equal
    // to Dedup.simhash) against the staged eval sketch set. The
    // arrival mix plants all three rejection paths (exact dups %10=4,
    // first-token-dropped near-copies %10=7, and the eval split itself
    // — the leak attempt decontamination refuses).
    Q.df("x406_stream_staged_curation",
      (s, dir) => Streaming.streamStagedCuration(s, dir),
      """WITH nw AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE source <> 'src19' AND doc_id % 10 = 4
        |  UNION ALL
        |  SELECT doc_id + 2000000, substr(text, instr(text, ' ') + 1)
        |  FROM documents WHERE source <> 'src19' AND doc_id % 10 = 7
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM documents WHERE source = 'src19'),
        |q AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |    FROM nw) x
        |  WHERE len(t) >= 20
        |    AND CAST(floor(10000.0 * len(list_filter(t,
        |          w -> w IN ('the','a','of','and','to','in'))) / len(t))
        |        AS BIGINT) >= 100
        |    AND CAST(floor(10000.0 * list_sum(list_transform(t,
        |          w -> length(w))) / len(t)) AS BIGINT)
        |        BETWEEN 30000 AND 80000),
        |etok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents WHERE source = 'src19'),
        |enib AS (
        |  SELECT doc_id, j, instr('0123456789abcdef', substr(md5(w), j, 1)) - 1 AS v
        |  FROM etok, range(1, 5) r(j)),
        |ebits AS (
        |  SELECT doc_id, (j - 1) * 4 + b.b AS pos,
        |    sum(CASE WHEN (v & b.mask) > 0 THEN 1 ELSE -1 END) AS s
        |  FROM enib, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) AS b(b, mask)
        |  GROUP BY doc_id, (j - 1) * 4 + b.b),
        |esk AS (
        |  SELECT DISTINCT CAST(sum(CASE WHEN s >= 0
        |    THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM ebits GROUP BY doc_id),
        |atok AS (
        |  SELECT n.doc_id, unnest(regexp_extract_all(lower(n.text), '[a-z0-9]+')) AS w
        |  FROM nw n JOIN q USING (doc_id)),
        |anib AS (
        |  SELECT doc_id, j, instr('0123456789abcdef', substr(md5(w), j, 1)) - 1 AS v
        |  FROM atok, range(1, 5) r(j)),
        |abits AS (
        |  SELECT doc_id, (j - 1) * 4 + b.b AS pos,
        |    sum(CASE WHEN (v & b.mask) > 0 THEN 1 ELSE -1 END) AS s
        |  FROM anib, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) AS b(b, mask)
        |  GROUP BY doc_id, (j - 1) * 4 + b.b),
        |ask AS (
        |  SELECT doc_id, CAST(sum(CASE WHEN s >= 0
        |    THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM abits GROUP BY doc_id)
        |SELECT n.doc_id FROM nw n JOIN q USING (doc_id)
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents o
        |  WHERE o.source <> 'src19'
        |    AND md5(trim(regexp_replace(lower(o.text), '\s+', ' ', 'g'))) =
        |        md5(trim(regexp_replace(lower(n.text), '\s+', ' ', 'g'))))
        |  AND NOT EXISTS (
        |    SELECT 1 FROM ask a JOIN esk e ON a.simhash = e.simhash
        |    WHERE a.doc_id = n.doc_id)
        |ORDER BY n.doc_id""".stripMargin),

    // streaming shape #29: the crawl-budget admission gate on the
    // arbitrary-state v2 API (transformWithState + ValueState,
    // RocksDB-backed) — per-source running token total folded in doc_id
    // order, admission decided at each document's start against the
    // 20k-token budget, counter advancing either way. Drained verdicts
    // equal the batch cumsum rule below; admitted_id_sum pins the exact
    // admission frontier.
    Q.df("x409_stream_quota",
      (s, dir) => Streaming.streamQuotaAdmission(s, dir, 20000L),
      """WITH t AS (
        |  SELECT source, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT source, doc_id, n_tok,
        |      sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
        |        - n_tok AS at_start
        |      FROM t)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN at_start < 20000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_admitted,
        |  CAST(COALESCE(sum(CASE WHEN at_start < 20000 THEN n_tok END), 0)
        |    AS BIGINT) AS tok_admitted,
        |  CAST(COALESCE(sum(CASE WHEN at_start < 20000 THEN doc_id END), 0)
        |    AS BIGINT) AS admitted_id_sum
        |FROM c GROUP BY source ORDER BY source""".stripMargin)
  )
}
