package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators (beyond-reference, SURVEY.md
  * §2.8). Event streams are irregular; model features and BI marts
  * want one row per (key, period) — densification plus
  * last-observation-carried-forward is the standard bridge.
  */
object TimeSeries {

  /** Densify per-key event history to one row per calendar day and
    * carry the last observed value forward across gap days.
    *
    * Per key: days span [first event day, last event day]; a day's
    * observed value is the value of its LAST event (by `idCol`, the
    * deterministic tie-break); gap days copy the previous observed
    * value bit-exactly (LOCF — no arithmetic, so no float drift).
    *
    * Scale shape: one keyed daily aggregate (map-side combinable);
    * the calendar is generated per key from its own span (narrow
    * explode — never a global calendar cross join); the gap join is
    * an equi-join on (key, day); the LOCF window partitions by key
    * only — state is one row. Keys whose span exceeds `maxSpanDays`
    * are dropped up front: one sensor with a 30-year span would
    * explode 10k rows regardless of its event count, and the cap
    * makes the output linear in keys * bounded-span.
    *
    * Output: (key, day DATE, value_filled, is_gap 0/1), totally
    * ordered by (key, day).
    */
  def gapFillLocf(events: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, idCol: String,
                  maxSpanDays: Int = 3700): DataFrame = {
    require(maxSpanDays >= 1, s"maxSpanDays must be positive")
    val daily = events
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(expr(s"max_by($valCol, $idCol)").as("v"))
    val cal = daily.groupBy("k")
      .agg(min(col("day")).as("a"), max(col("day")).as("b"))
      .where(datediff(col("b"), col("a")) < maxSpanDays)
      .select(col("k"), explode(expr("sequence(a, b, interval 1 day)"))
        .as("day"))
    val w = Window.partitionBy("k").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("k", "day"), "left")
      .select(col("k").as(keyCol), col("day"),
        last(col("v"), ignoreNulls = true).over(w).as("value_filled"),
        when(col("v").isNull, 1).otherwise(0).as("is_gap"))
      .orderBy(keyCol, "day")
  }

  /** Linear-INTERPOLATION gap fill — the arithmetic sibling of
    * [[gapFillLocf]]: a missing day between two observed days gets the
    * value linearly interpolated between its neighbors instead of a
    * held-last copy. LOCF is right for state-like series (a price holds
    * until changed); interpolation is right for flow-like series (a
    * meter read on Mon and Thu implies Tue/Wed in between). Exactness:
    * values are integer cents and the interpolation is
    *   prev + (next − prev) · (day − prevDay) div (nextDay − prevDay)
    * — one integer division, truncation toward zero in both engines,
    * so the fill is bit-portable with no float ramp.
    *
    * Scale shape: identical to LOCF — one keyed daily aggregate, a
    * per-key calendar explode bounded by `maxSpanDays`, and TWO
    * one-row-state windows per key (last-observed-before carries
    * (prevDay, prevVal) forward; first-observed-after carries
    * (nextDay, nextVal) backward). The spine never leaves its key's
    * partition; nothing global.
    *
    * Output: (key, day DATE, cents_filled, is_interp 0/1), totally
    * ordered by (key, day). */
  def gapFillInterp(events: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, idCol: String,
                    maxSpanDays: Int = 3700): DataFrame = {
    require(maxSpanDays >= 1, s"maxSpanDays must be positive")
    val daily = events
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(expr(s"max_by(CAST(floor($valCol * 100) AS BIGINT), $idCol)")
        .as("v"))
    val cal = daily.groupBy("k")
      .agg(min(col("day")).as("a"), max(col("day")).as("b"))
      .where(datediff(col("b"), col("a")) < maxSpanDays)
      .select(col("k"), explode(expr("sequence(a, b, interval 1 day)"))
        .as("day"))
    val back = Window.partitionBy("k").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("k").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cal.join(daily, Seq("k", "day"), "left")
      .select(col("k"), col("day"), col("v"),
        last(when(col("v").isNotNull, struct(col("day"), col("v"))),
          ignoreNulls = true).over(back).as("p"),
        first(when(col("v").isNotNull, struct(col("day"), col("v"))),
          ignoreNulls = true).over(fwd).as("nx"))
      .select(col("k").as(keyCol), col("day"),
        when(col("v").isNotNull, col("v")).otherwise(
          col("p.v") + expr(
            "((nx.v - p.v) * CAST(datediff(day, p.day) AS BIGINT))" +
              " div CAST(datediff(nx.day, p.day) AS BIGINT)"))
          .as("cents_filled"),
        when(col("v").isNull, 1).otherwise(0).as("is_interp"))
      .orderBy(keyCol, "day")
  }

  /** Linear multi-touch attribution: each conversion's value is split
    * in exact integer cents across the touch events that precede it
    * within `windowDays` for the same key; remainder cents go one
    * each to the MOST RECENT touches (ties to the larger event id),
    * so every attributed conversion's cents sum back exactly — the
    * same largest-remainder discipline as Sampling.quotaMix.
    *
    * Conversions with no in-window touch produce nothing (their value
    * is unattributable by definition — count them separately if the
    * gap matters). Values are assumed non-negative (cents of a sale);
    * a negative value would split consistently across engines but
    * skip remainder distribution.
    *
    * Scale shape: conversions and touches equi-join on the key with
    * the time window as a join-side predicate (per-key work is
    * bounded by per-key event counts — the as-of/range-join family);
    * the split windows partition by CONVERSION (a handful of touches
    * each); the final per-touch rollup is one keyed sum.
    *
    * Output: (event_id, key, n_conversions, attributed_cents) per
    * touch that attributed at least once, ordered by event_id.
    */
  def linearAttribution(events: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, typeCol: String, valCol: String,
                        conversionType: String, touchTypes: Seq[String],
                        windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      "touch types must be non-empty and disjoint from the conversion")
    val t = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(keyCol).as("k"), col(idCol).as("tid"), col(tsCol).as("tts"))
    val p = events.where(col(typeCol) === conversionType)
      .select(col(keyCol).as("k"), col(idCol).as("pid"),
        col(tsCol).as("pts"),
        floor(col(valCol) * 100).cast("bigint").as("cents"))
    val j = p.join(t, Seq("k"))
      .where(col("tts") <= col("pts") &&
        col("tts") > col("pts") - expr(s"INTERVAL $windowDays DAYS"))
    val byConv = Window.partitionBy("pid")
    val w = j
      .withColumn("rn", row_number().over(
        byConv.orderBy(col("tts").desc, col("tid").desc)))
      .withColumn("nk", count(lit(1)).over(byConv))
    w.groupBy(col("tid").as("event_id"), col("k").as(keyCol))
      .agg(count(lit(1)).as("n_conversions"),
        sum(expr("cents div nk") +
          when(col("rn") <= col("cents") % col("nk"), 1L).otherwise(0L))
          .as("attributed_cents"))
      .orderBy("event_id")
  }

  /** First-order event-transition matrix (the Markov-chain view of a
    * clickstream): for each key, consecutive events ordered by
    * (`tsCol`, `idCol`) form src -> dst transitions, kept only when
    * the gap is at most `maxGapMinutes` (a longer silence is a new
    * visit, not a transition). Counts roll up per (src, dst) with the
    * per-src row probability as exact ppm — the input a journey
    * analysis or next-event model starts from.
    *
    * Scale shape: ONE window per key ordered by time (lead(1) carries
    * one row of state — no self-join of the event table against
    * itself), then one aggregation onto the tiny |types|^2 grid and a
    * window over that grid for row totals. The event table is never
    * joined or crossed; everything after the lead is dimension-sized.
    *
    * Output: (src_type, dst_type, n_trans, p_ppm), ordered by
    * (src_type, dst_type); each src row's p_ppm is n_trans * 1e6 div
    * the src's total outgoing transitions (integer-exact). */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, typeCol: String,
                       maxGapMinutes: Int = 30): DataFrame = {
    require(maxGapMinutes >= 1, "maxGapMinutes must be positive")
    val perKey = Window.partitionBy("k").orderBy(col("ts"), col("id"))
    val trans = events
      .select(col(keyCol).as("k"), col(tsCol).as("ts"),
        col(idCol).as("id"), col(typeCol).as("t"))
      .withColumn("nt", lead("t", 1).over(perKey))
      .withColumn("nts", lead("ts", 1).over(perKey))
      .where(col("nt").isNotNull &&
        col("nts") <= col("ts") + expr(s"INTERVAL $maxGapMinutes MINUTES"))
    trans.groupBy(col("t").as("src_type"), col("nt").as("dst_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("row_total",
        sum("n_trans").over(Window.partitionBy("src_type")))
      .select(col("src_type"), col("dst_type"), col("n_trans"),
        expr("n_trans * 1000000L div row_total").as("p_ppm"))
      .orderBy("src_type", "dst_type")
  }

  /** Freshness-decayed activity ranking with INTEGER halving decay:
    * each (key, day)'s event count contributes `cnt >> age`, where age
    * is whole `halfLifeDays` periods between that day and the
    * corpus's newest day — exponential half-life decay with no floats
    * anywhere (exp(-lambda*t) on binary doubles is exactly the kind of
    * cross-engine drift the integer shift avoids; the staircase is the
    * price, bit-exactness the prize). The standard "recent activity
    * outranks stale volume" scorer for trending keys / active users.
    *
    * Scale shape: one (key, day) aggregation (map-side combinable — at
    * most |keys| * |days| rows survive), one 1-row broadcast of the
    * global max day, one keyed rollup, and a top-k sort of the rolled-
    * up keys. The raw event table is touched exactly once.
    *
    * Output: (key, n_events, score), score-descending (key as the
    * tie-break), top `topK` rows. */
  def decayActivity(events: DataFrame, keyCol: String, tsCol: String,
                    halfLifeDays: Int = 7, topK: Int = 50): DataFrame = {
    require(halfLifeDays >= 1 && topK >= 1, "halfLifeDays/topK must be positive")
    val daily = events
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val newest = daily.agg(max("day").as("mx"))
    daily.crossJoin(broadcast(newest))
      .select(col("k"), col("cnt"),
        expr(s"datediff(mx, day) div $halfLifeDays").cast("int").as("age"))
      .groupBy("k")
      .agg(sum("cnt").as("n_events"),
        sum(expr("shiftright(cnt, age)")).as("score"))
      .select(col("k").as(keyCol), col("n_events"), col("score"))
      .orderBy(col("score").desc, col(keyCol))
      .limit(topK)
  }

  /** Out-of-orderness profile of an arrival sequence — the
    * watermark-sizing tool: how late does event time actually run
    * behind the high-water mark, per key? A row's lateness is the gap
    * (whole seconds) between the maximum event time seen so far in
    * ARRIVAL order and its own event time; the per-key rollup reports
    * exact p50/p99/max lateness — precisely the statistic that decides
    * `withWatermark("ts", ???)` (p99 too small drops data; max too
    * large bloats state).
    *
    * Arrival order is an explicit column list (`arrival`), not an
    * assumption: a log's physical order, a kafka offset, an ingest
    * batch id. The running max partitions by the profile key and
    * orders by arrival — one window whose state is a single value, no
    * self-join; the rollup is one keyed aggregate over integer
    * seconds (micros div 1e6 — exact, no float duration).
    *
    * Output: (key, n_events, n_late, p50_late_s, p99_late_s,
    * max_late_s), ordered by key. */
  def latenessProfile(events: DataFrame, keyCol: String, tsCol: String,
                      arrival: Seq[Column]): DataFrame = {
    require(arrival.nonEmpty, "latenessProfile needs an arrival order")
    val arrCols = arrival.zipWithIndex.map { case (c, i) => c.as(s"arr_$i") }
    val sel = events.select(col(keyCol).as("k") +:
      unix_micros(col(tsCol)).as("us") +: arrCols: _*)
    val w = Window.partitionBy("k")
      .orderBy(arrival.indices.map(i => col(s"arr_$i")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sel.withColumn("run_us", max("us").over(w))
      .select(col("k"), expr("(run_us - us) div 1000000").as("late_s"))
      .groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_s") > 0, 1L).otherwise(0L)).as("n_late"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY late_s)" +
          " AS BIGINT)").as("p50_late_s"),
        expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY late_s)" +
          " AS BIGINT)").as("p99_late_s"),
        max("late_s").as("max_late_s"))
      .orderBy(keyCol)
  }

  /** Weekly cohort retention triangle: keys cohorted by their FIRST
    * active week, then each (cohort, week-offset) cell counts how
    * many of the cohort's keys were active that many weeks later.
    *
    * Weeks are epoch-day div 7 — a pure integer bucket, identical in
    * every engine and timezone-free (ISO week functions are exactly
    * the kind of cross-engine drift this avoids).
    *
    * Scale shape: one distinct pass to (key, week) activity, one
    * keyed min for the cohort, one equi-join back on the key, one
    * (cohort, offset) aggregate — all shuffles on the key or the tiny
    * cohort grid; no windows, no driver traffic.
    *
    * Output: (cohort_week, week_offset, active_users, cohort_size,
    * retention_ppm), ordered by (cohort_week, week_offset); the
    * offset-0 row of each cohort has retention_ppm = 1e6 by
    * construction (everyone is active in their first week).
    */
  def cohortRetention(events: DataFrame, keyCol: String,
                      tsCol: String): DataFrame =
    retentionFromActivity(events.select(col(keyCol).as("u"),
      expr(s"datediff(to_date($tsCol), date '1970-01-01') div 7")
        .as("wk")).distinct())

  /** The cohort grid over an already-distinct (u, wk) activity set —
    * the serve-time half of [[cohortRetention]], shared with the
    * streaming activity-journal path (graft.streaming). */
  /** Strict-order k-step funnel: stage i counts the keys whose
    * earliest stage-i event happens strictly AFTER their committed
    * stage-(i-1) time — the product-analytics question ("of those who
    * signed up, how many then viewed, then purchased") that naive
    * per-type counts answer wrongly because they ignore ORDER. The
    * committed time for each stage is the MINIMUM qualifying
    * timestamp, which makes the funnel deterministic and
    * greedy-optimal (taking the earliest possible prior step can only
    * admit more keys at the next step, never fewer).
    *
    * Scale shape: one filtered keyed min per stage, each joined to
    * the previous stage's (key, ts) — every shuffle is on the key,
    * state bounded by surviving keys, no windows, no event-pair
    * blowup. k stages = k keyed aggregations, the event table scanned
    * once per stage on a pushed-down type filter.
    *
    * Output: one row per stage: (stage_no, stage name, n_keys,
    * conv_from_prev_ppm, conv_from_first_ppm), ordered by stage_no. */
  def funnelSteps(events: DataFrame, keyCol: String, tsCol: String,
                  typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnelSteps needs at least two stages")
    val byKey = events.select(col(keyCol).as("k"),
      col(tsCol).as("t"), col(typeCol).as("ty"))
    // stage 1: earliest occurrence of the entry event per key
    val first = byKey.where(col("ty") === stages.head)
      .groupBy("k").agg(min("t").as("t"))
    val survivors = stages.tail.scanLeft(first) { (prev, st) =>
      byKey.where(col("ty") === st).join(prev.select(col("k"),
          col("t").as("t_prev")), Seq("k"))
        .where(col("t") > col("t_prev"))
        .groupBy("k").agg(min("t").as("t"))
    }
    val counts = survivors.zip(stages).zipWithIndex.map {
      case ((df, st), i) =>
        df.agg(count(lit(1)).as("n_keys"))
          .select(lit(i + 1).as("stage_no"), lit(st).as("stage"),
            col("n_keys"))
    }.reduce(_ unionByName _)
    val base = counts.where(col("stage_no") === 1)
      .select(col("n_keys").as("n_first"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("stage_no")
    counts.crossJoin(broadcast(base))
      .withColumn("n_prev", lag("n_keys", 1).over(w))
      .select(col("stage_no"), col("stage"), col("n_keys"),
        when(col("n_prev").isNotNull && col("n_prev") > 0,
          expr("n_keys * 1000000L div n_prev")).otherwise(1000000L)
          .as("conv_from_prev_ppm"),
        when(col("n_first") > 0,
          expr("n_keys * 1000000L div n_first")).otherwise(0L)
          .as("conv_from_first_ppm"))
      .orderBy("stage_no")
  }

  /** RFM segmentation: every key scored on Recency (days since last
    * activity, lower better), Frequency (event count) and Monetary
    * (integer cents), each cut into exact tertiles (percentile_disc
    * at 0.33/0.66 — member values, engine-exact), then rolled up to
    * the 27-cell segment grid — the classic lifecycle mart
    * ("champions" = 333, "at risk" = 1xx) that drives retention
    * targeting. Tier 3 is best on every axis; recency tiers compare
    * <= on DAYS so fresher keys land higher.
    *
    * Scale shape: the event table collapses to one row per key in one
    * keyed aggregation; tertile edges are ONE 1-row aggregate over
    * the key table broadcast back; the output is the 27-row grid.
    * Corpus "today" is the max activity day — derived, not wall-clock,
    * so the mart is reproducible.
    *
    * Output: (r_tier, f_tier, m_tier, n_keys, sum_cents), ordered by
    * (r_tier, f_tier, m_tier). */
  def rfmSegments(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val per = events.groupBy(col(keyCol).as("k"))
      .agg(max(expr(s"datediff(to_date($tsCol), date '1970-01-01')"))
          .as("last_day"),
        count(lit(1)).as("freq"),
        sum(expr(s"CAST(floor($valueCol * 100) AS BIGINT)")).as("cents"))
    val today = per.agg(max("last_day").as("corpus_day"))
    val u = per.crossJoin(broadcast(today))
      .select(col("k"), (col("corpus_day") - col("last_day")).as("rec_days"),
        col("freq"), col("cents"))
    def edge(c: String, q: String, as: String) =
      expr(s"CAST(percentile_disc($q) WITHIN GROUP (ORDER BY $c)" +
        s" AS BIGINT)").as(as)
    val edges = u.agg(edge("rec_days", "0.33", "r33"),
      edge("rec_days", "0.66", "r66"), edge("freq", "0.33", "f33"),
      edge("freq", "0.66", "f66"), edge("cents", "0.33", "m33"),
      edge("cents", "0.66", "m66"))
    u.crossJoin(broadcast(edges))
      .select(
        when(col("rec_days") <= col("r33"), 3)
          .when(col("rec_days") <= col("r66"), 2).otherwise(1).as("r_tier"),
        when(col("freq") <= col("f33"), 1)
          .when(col("freq") <= col("f66"), 2).otherwise(3).as("f_tier"),
        when(col("cents") <= col("m33"), 1)
          .when(col("cents") <= col("m66"), 2).otherwise(3).as("m_tier"),
        col("cents"))
      .groupBy("r_tier", "f_tier", "m_tier")
      .agg(count(lit(1)).as("n_keys"), sum("cents").as("sum_cents"))
      .orderBy("r_tier", "f_tier", "m_tier")
  }

  /** Session-quality mart: sessions derived with the standard
    * lag/gap/running-sum rule (same derivation the judged q41/x65/x68
    * family uses), then summarized corpus-wide — session count,
    * single-event "bounce" sessions and their ppm share, and the
    * exact median/max session size. Bounce rate is THE engagement
    * health metric a product team watches daily; a sudden jump also
    * flags instrumentation breakage (events losing their ids).
    *
    * Scale shape: the session derivation is two key-partitioned
    * windows (bounded per key); per-session sizes one keyed agg; the
    * summary one 1-row fold. Nothing global except the final
    * ten-byte row.
    *
    * Output: one row (n_sessions, n_bounces, bounce_ppm,
    * p50_session_events, max_session_events). */
  def sessionQuality(events: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, gapSec: Long = 1800L): DataFrame = {
    require(gapSec >= 1, s"gapSec must be positive; got $gapSec")
    val byKey = Window.partitionBy("k").orderBy(col("t"), col("id"))
    val run = Window.partitionBy("k").orderBy(col("t"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sized = events.select(col(keyCol).as("k"), col(tsCol).as("t"),
        col(idCol).as("id"))
      .withColumn("new_s",
        when(unix_timestamp(col("t")) -
          unix_timestamp(lag("t", 1).over(byKey)) > gapSec, 1)
          .otherwise(0))
      .withColumn("sess", sum("new_s").over(run))
      .groupBy("k", "sess").agg(count(lit(1)).as("n_ev"))
    sized.agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1L, 1L).otherwise(0L)).as("n_bounces"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_ev)" +
          " AS BIGINT)").as("p50_session_events"),
        max("n_ev").as("max_session_events"))
      .select(col("n_sessions"), col("n_bounces"),
        expr("n_bounces * 1000000L div n_sessions").as("bounce_ppm"),
        col("p50_session_events"), col("max_session_events"))
  }

  /** Weekly growth accounting — the new/retained/resurrected/churned
    * decomposition (the standard growth framework) over integer epoch
    * weeks: for every active (key, week), the key is NEW (first-ever
    * week), RETAINED (also active the immediately previous week) or
    * RESURRECTED (returning after a gap); churn is attributed to the
    * week AFTER the key's last consecutive activity (capped at the
    * corpus horizon, so the final week never reports phantom churn).
    * Per week, active = new + retained + resurrected — an identity
    * the spec pins.
    *
    * Scale shape: one distinct (key, week) projection; first week,
    * previous week and next week are key-partitioned min/lag/lead
    * windows (bounded per key); the report is a week-grid aggregation.
    *
    * Output: (wk, n_active, n_new, n_retained, n_resurrected,
    * n_churned_in), ordered by wk. */
  def growthAccounting(events: DataFrame, keyCol: String,
                       tsCol: String): DataFrame = {
    val act = events.select(col(keyCol).as("u"),
      expr(s"datediff(to_date($tsCol), date '1970-01-01') div 7")
        .as("wk")).distinct()
    val byU = Window.partitionBy("u").orderBy("wk")
    val flagged = act
      .withColumn("first_wk", min("wk").over(Window.partitionBy("u")))
      .withColumn("prev_wk", lag("wk", 1).over(byU))
      .withColumn("next_wk", lead("wk", 1).over(byU))
    val maxWk = act.agg(max("wk").as("max_wk"))
    val active = flagged.groupBy("wk")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("wk") === col("first_wk"), 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("prev_wk") === col("wk") - 1, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("wk") =!= col("first_wk") &&
          (col("prev_wk").isNull || col("prev_wk") < col("wk") - 1), 1L)
          .otherwise(0L)).as("n_resurrected"))
    // churn lands on wk+1 when the key's next activity is not wk+1
    val churn = flagged.crossJoin(broadcast(maxWk))
      .where((col("next_wk").isNull || col("next_wk") > col("wk") + 1) &&
        col("wk") + 1 <= col("max_wk"))
      .select((col("wk") + 1).as("wk"))
      .groupBy("wk").agg(count(lit(1)).as("n_churned_in"))
    active.join(churn, Seq("wk"), "left")
      .select(col("wk"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"),
        coalesce(col("n_churned_in"), lit(0L)).as("n_churned_in"))
      .orderBy("wk")
  }

  /** TTL-window dedup — the batch twin of streaming
    * dropDuplicatesWithinWatermark's bounded-state contract, with
    * tumbling windows: within each `windowDays` window a (key…)
    * combination is admitted ONCE (its earliest event by (ts, id)),
    * and re-admitted in the next window — the crawl-recency /
    * notification-throttling semantics where "duplicate" has a
    * freshness horizon, unlike global dedup which suppresses forever.
    *
    * One keyed aggregation: the keeper is min(struct(ts, id)) —
    * associative, partial-agg-friendly, no window function at all;
    * state per key is one struct, the exact bound the streaming twin
    * holds. Output: (key…, win, n_events, kept_id), ordered by
    * (key…, win). */
  def windowedDedup(events: DataFrame, keyCols: Seq[String],
                    tsCol: String, idCol: String,
                    windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive")
    val win = expr(
      s"datediff(to_date($tsCol), date '1970-01-01') div $windowDays")
    events
      .select(keyCols.map(col) ++ Seq(win.as("win"),
        unix_micros(col(tsCol)).as("tm"), col(idCol).as("id")): _*)
      .groupBy(keyCols.map(col) :+ col("win"): _*)
      .agg(count(lit(1)).as("n_events"),
        min(struct(col("tm"), col("id"))).as("f"))
      .select(keyCols.map(col) ++ Seq(col("win"), col("n_events"),
        col("f.id").as("kept_id")): _*)
      .orderBy(keyCols.map(col) :+ col("win"): _*)
  }

  /** Exact OLS trend slope of WEEKLY activity per group — the
    * direction-and-magnitude drift monitor ("is this event type
    * growing or dying, and how fast") as one integer rational per
    * group: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over the
    * zero-filled week series (a missing week IS zero activity —
    * fitting only observed weeks would hide every outage).
    *
    * Sign and magnitude are emitted SEPARATELY (slope_sign,
    * slope_abs_ppm): the numerator can be negative, and Spark's `div`
    * truncates toward zero while DuckDB's `//` floors toward −∞ — on
    * |value| of the split both agree exactly. Products run in
    * DECIMAL(38,0) (n·Σxy overflows BIGINT near 1e5-event weeks ×
    * 1e6 scaling). Groups with a single week report slope 0.
    *
    * Scale shape: one keyed (group, week) count, a per-group calendar
    * explode (bounded by the span), one keyed aggregation of the five
    * OLS sums. Output: (grp, n_weeks, total, slope_sign,
    * slope_abs_ppm), ordered by group. */
  def trendSlope(events: DataFrame, grp: String, tsCol: String): DataFrame = {
    val wk = events.select(col(grp).as("g"),
      expr(s"datediff(to_date($tsCol), date '1970-01-01') div 7").as("wk"))
    val per = wk.groupBy("g", "wk").agg(count(lit(1)).as("y"))
    val cal = per.groupBy("g").agg(min("wk").as("a"), max("wk").as("b"))
      .select(col("g"), col("a"), explode(expr("sequence(a, b)")).as("wk"))
    cal.join(per, Seq("g", "wk"), "left")
      .select(col("g"), (col("wk") - col("a")).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .groupBy(col("g").as(grp))
      .agg(count(lit(1)).as("n_weeks"), sum("y").as("total"),
        sum("x").as("sx"), sum(expr("x * x")).as("sxx"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
      .select(col(grp), col("n_weeks"), col("total"),
        (col("n_weeks").cast("decimal(38,0)") * col("sxy") -
          col("sx").cast("decimal(38,0)") * col("total")).as("num"),
        (col("n_weeks").cast("decimal(38,0)") * col("sxx") -
          col("sx").cast("decimal(38,0)") * col("sx")).as("den"))
      .select(col(grp), col("n_weeks"), col("total"),
        when(col("num") > 0, 1L).when(col("num") < 0, -1L).otherwise(0L)
          .as("slope_sign"),
        when(col("den") === 0, 0L)
          .otherwise(expr("CAST(abs(num) * 1000000 div den AS BIGINT)"))
          .as("slope_abs_ppm"))
      .orderBy(grp)
  }

  /** Exact Spearman rank correlation per group between a metric and
    * TIME — the rank-robust twin of [[trendSlope]]: a single late
    * outlier can own an OLS slope, but ranks bound every row's
    * influence, so agreement between the two statistics (or its
    * absence) is itself the diagnostic.
    *
    * Both variables are ranked with a deterministic unique tie-break
    * (the event id), making each rank vector a permutation, so the
    * classic integer identity applies EXACTLY:
    * rho = 1 − 6·Σd² / (n·(n²−1)). Sign and magnitude are split
    * (the trendSlope division discipline); products run in
    * DECIMAL(38,0) (n³ passes BIGINT near 2M rows per group).
    * Groups with n = 1 report 0.
    *
    * Scale shape: two key-partitioned rank windows (per-key bounded)
    * and one keyed aggregation of Σd². Output: (grp, n, rho_sign,
    * rho_abs_ppm), ordered by group. */
  def rankCorrelation(events: DataFrame, grp: String, tsCol: String,
                      idCol: String, valCol: String): DataFrame = {
    val e = events.select(col(grp).as("g"),
      unix_micros(col(tsCol)).as("tm"), col(idCol).as("id"),
      floor(col(valCol) * 100).cast("bigint").as("cents"))
    val wt = Window.partitionBy("g").orderBy("tm", "id")
    val wv = Window.partitionBy("g").orderBy("cents", "id")
    e.withColumn("rx", row_number().over(wt).cast("long"))
      .withColumn("ry", row_number().over(wv).cast("long"))
      .select(col("g"),
        ((col("rx") - col("ry")) * (col("rx") - col("ry")))
          .cast("decimal(38,0)").as("d2"))
      .groupBy(col("g").as(grp))
      .agg(count(lit(1)).as("n"), sum("d2").as("sd2"))
      .select(col(grp), col("n"),
        (col("n").cast("decimal(38,0)") *
          (col("n").cast("decimal(38,0)") * col("n") - 1) -
          lit(6).cast("decimal(38,0)") * col("sd2")).as("num"),
        (col("n").cast("decimal(38,0)") *
          (col("n").cast("decimal(38,0)") * col("n") - 1)).as("den"))
      .select(col(grp), col("n"),
        when(col("num") > 0, 1L).when(col("num") < 0, -1L).otherwise(0L)
          .as("rho_sign"),
        when(col("den") === 0, 0L)
          .otherwise(expr("CAST(abs(num) * 1000000 div den AS BIGINT)"))
          .as("rho_abs_ppm"))
      .orderBy(grp)
  }

  /** Weekly-percentile trend — the SLO-drift monitor: per group, the
    * OLS slope of the WEEKLY p50 and p90 of the value (integer
    * cents), over the weeks the group was observed. A mean-based
    * trend ([[trendSlope]]) follows volume; this follows the
    * DISTRIBUTION — a service whose median is flat while its p90
    * climbs is degrading in exactly the way a mean hides.
    *
    * Weeks with no observations carry no distribution and are
    * excluded (unlike trendSlope's zero-fill — an absent week has no
    * percentile); x is the week offset from the group's first
    * OBSERVED week. Same sign/|slope| split and DECIMAL(38,0)
    * discipline as trendSlope. Groups observed a single week report
    * 0 slopes.
    *
    * Scale shape: one exact percentile aggregate per (group, week)
    * — distributed by the composite key — then OLS sums over the
    * (group × weeks) grid. Output: (grp, n_weeks, p50_sign,
    * p50_abs_ppm, p90_sign, p90_abs_ppm), ordered by group. */
  def percentileTrend(events: DataFrame, grp: String, tsCol: String,
                      valCol: String): DataFrame = {
    val wk = events.select(col(grp).as("g"),
      expr(s"datediff(to_date($tsCol), date '1970-01-01') div 7").as("wk"),
      floor(col(valCol) * 100).cast("bigint").as("cents"))
    val per = wk.groupBy("g", "wk").agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)" +
        " AS BIGINT)").as("p50"),
      expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)" +
        " AS BIGINT)").as("p90"))
    val base = per.groupBy("g").agg(min("wk").as("wk0"))
    def slope(y: String, out: String): Seq[Column] = {
      val num = s"CAST(n AS DECIMAL(38,0)) * sxy_$y - " +
        s"CAST(sx AS DECIMAL(38,0)) * sy_$y"
      val den = "CAST(n AS DECIMAL(38,0)) * sxx - " +
        "CAST(sx AS DECIMAL(38,0)) * sx"
      Seq(
        when(expr(num) > 0, 1L).when(expr(num) < 0, -1L).otherwise(0L)
          .as(s"${out}_sign"),
        when(expr(den) === 0, 0L)
          .otherwise(expr(s"CAST(abs($num) * 1000000 div ($den) AS BIGINT)"))
          .as(s"${out}_abs_ppm"))
    }
    per.join(base, Seq("g"))
      .select(col("g"), (col("wk") - col("wk0")).as("x"),
        col("p50"), col("p90"))
      .groupBy(col("g").as(grp))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(expr("x * x")).as("sxx"),
        sum("p50").as("sy_p50"), sum("p90").as("sy_p90"),
        sum(col("x").cast("decimal(38,0)") * col("p50")).as("sxy_p50"),
        sum(col("x").cast("decimal(38,0)") * col("p90")).as("sxy_p90"))
      .select(col(grp) +: col("n").as("n_weeks") +:
        (slope("p50", "p50") ++ slope("p90", "p90")): _*)
      .orderBy(grp)
  }

  /** Interval-UNION coverage per key: each event covers
    * [ts, ts + holdSec); overlapping covers merge, and the union
    * length is exact in micros — the "actual active time" behind
    * uptime billing and engagement metrics, where summing raw
    * durations double-counts every overlap. With a FIXED hold the
    * union telescopes: covered = Σ min(next_ts − ts, hold) over
    * consecutive events plus hold for the last — one lead window per
    * key, one keyed sum, no interval self-join.
    *
    * Output: (key, n_events, covered_s, span_s, utilization_ppm)
    * where span = last − first + hold and utilization =
    * covered/span, ordered by key. */
  def intervalCoverage(events: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, holdSec: Long): DataFrame = {
    require(holdSec >= 1, s"holdSec must be positive")
    val hold = holdSec * 1000000L
    val w = Window.partitionBy("k").orderBy("tm", "id")
    events.select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("tm"),
        col(idCol).as("id"))
      .withColumn("nxt", lead("tm", 1).over(w))
      .groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("n_events"),
        (sum(when(col("nxt").isNotNull,
          least(col("nxt") - col("tm"), lit(hold))).otherwise(0L))
          + hold).as("covered_us"),
        (max("tm") - min("tm") + hold).as("span_us"))
      .select(col(keyCol), col("n_events"),
        expr("covered_us div 1000000").as("covered_s"),
        expr("span_us div 1000000").as("span_s"),
        // ppm numerator in DECIMAL(38,0): covered_us * 1e6 overflows
        // BIGINT once a key's covered time passes ~107 days — well
        // inside the years-of-uptime use this operator exists for
        expr("CAST(CAST(covered_us AS DECIMAL(38,0)) * 1000000" +
          " div span_us AS BIGINT)").as("utilization_ppm"))
      .orderBy(keyCol)
  }

  /** NEXT-EVENT predictability: evaluate the first-order Markov
    * baseline ([[transitionMatrix]]'s argmax) against the corpus it
    * was fit on — per current type, the modal next type and the
    * in-sample share of transitions it gets right. This is the
    * model-eval-in-SQL pattern: the ppm accuracy is the ceiling any
    * fancier sequence model must beat, and a type whose ceiling is
    * near uniform is genuinely unpredictable, not under-modeled.
    * (In-sample by construction — an upper bound, stated as such.)
    *
    * One per-key lead window (no event self-join), one |types|²-grid
    * count, argmax as min(struct(-cnt, next)). Output: (event_type,
    * n_transitions, predicted_next, n_hits, acc_ppm), ordered by
    * event_type. */
  def nextEventAccuracy(events: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy("k").orderBy("tm", "id")
    val tr = events.select(col(keyCol).as("k"),
        unix_micros(col(tsCol)).as("tm"), col(idCol).as("id"),
        col(typeCol).as("cur"))
      .withColumn("nxt", lead("cur", 1).over(w))
      .where(col("nxt").isNotNull)
    val grid = tr.groupBy("cur", "nxt").agg(count(lit(1)).as("c"))
    val pred = grid.groupBy("cur")
      .agg(sum("c").as("n_transitions"),
        min(struct((-col("c")).as("nc"), col("nxt").as("p"))).as("b"))
      .select(col("cur"), col("n_transitions"),
        col("b.p").as("predicted_next"))
    grid.join(pred, Seq("cur"))
      .groupBy(col("cur").as(typeCol))
      .agg(max("n_transitions").as("n_transitions"),
        max("predicted_next").as("predicted_next"),
        sum(when(col("nxt") === col("predicted_next"), col("c"))
          .otherwise(0L)).as("n_hits"))
      .select(col(typeCol), col("n_transitions"), col("predicted_next"),
        col("n_hits"),
        expr("n_hits * 1000000 div n_transitions").as("acc_ppm"))
      .orderBy(typeCol)
  }

  /** Activity streaks per key (gaps-and-islands): longest run of
    * CONSECUTIVE active days — the engagement-streak metric, and the
    * canonical islands derivation done distributed: within a key,
    * epoch-day minus its per-key rank is constant exactly along a
    * consecutive run, so one window plus one keyed aggregation finds
    * every island without any self-join.
    *
    * Output: (key, n_active_days, longest_streak, streak_start —
    * the epoch-day the longest streak begins, smallest on ties),
    * ordered by key. */
  def activityStreaks(events: DataFrame, keyCol: String,
                      tsCol: String): DataFrame = {
    val act = events.select(col(keyCol).as("k"),
      expr(s"CAST(datediff(to_date($tsCol), date '1970-01-01') AS BIGINT)")
        .as("ep")).distinct()
    val w = Window.partitionBy("k").orderBy("ep")
    act.withColumn("grp", col("ep") - row_number().over(w))
      .groupBy("k", "grp")
      .agg(count(lit(1)).as("len"), min("ep").as("start"))
      .groupBy(col("k").as(keyCol))
      .agg(sum("len").as("n_active_days"),
        min(struct((-col("len")).as("nl"), col("start").as("s"))).as("b"))
      .select(col(keyCol), col("n_active_days"),
        (-col("b.nl")).as("longest_streak"), col("b.s").as("streak_start"))
      .orderBy(keyCol)
  }

  /** EXACT trailing-window active users per day (the WAU/MAU family
    * without sketches): each (key, active-day) pair contributes to at
    * most `windowDays` window-end days, so the sliding distinct —
    * normally the awkward one, because distinct does not merge across
    * windows — becomes explode(activity × window) + dedupe + count:
    * cost O(activity · window), grid-bounded, no sketch error. At a
    * 90-day window on years of data, that constant is the price of
    * exactness; the HLL tier (x112's family) is the alternative when
    * ±2% is acceptable.
    *
    * Output: (ep — epoch-day window end, dau, wau — distinct keys
    * active in [ep−windowDays+1, ep]), for every day in the corpus
    * span, ordered by ep. */
  def rollingActiveUsers(events: DataFrame, keyCol: String, tsCol: String,
                         windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val act = events.select(col(keyCol).as("k"),
      expr(s"CAST(datediff(to_date($tsCol), date '1970-01-01') AS BIGINT)")
        .as("ep")).distinct()
    val span = act.agg(min("ep").as("a"), max("ep").as("b"))
    val dau = act.groupBy("ep").agg(count(lit(1)).as("dau"))
    val contrib = act.crossJoin(broadcast(span))
      .select(col("k"), explode(expr(
        s"sequence(ep, least(ep + ${windowDays - 1}, b))")).as("ep"))
      .distinct()
    val wau = contrib.groupBy("ep").agg(count(lit(1)).as("wau"))
    val cal = span.select(explode(expr("sequence(a, b)")).as("ep"))
    cal.join(dau, Seq("ep"), "left").join(wau, Seq("ep"), "left")
      .select(col("ep"), coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"))
      .orderBy("ep")
  }

  /** APPROXIMATE trailing-window active users — the sliding-HLL tier
    * beside [[rollingActiveUsers]]'s exact explode, completing the
    * exact/approx pairing discipline used for percentiles (x88/x129).
    * The exact tier's cost is O(activity · window): every (key, day)
    * pair is replicated `windowDays` times. Here each DAY folds to ONE
    * HLL sketch first (one activity-sized aggregation — the only
    * corpus-scale pass), and the window slide replicates those
    * days × window SKETCHES (a grid-bounded few KB each), merged per
    * window end with hll_union_agg. At a 90-day window on years of
    * 100 TB activity that turns the dominant explode into noise, for
    * the standard HLL error (rse ≈ 1.04/√2^lgK ≈ 1.6% at lgK=12).
    *
    * DataSketches HLL is deterministic (fixed hash, order-independent
    * merge), so results are stable run-to-run — but engine-specific,
    * hence rows-only at the oracle with an error-bound spec against
    * the exact tier.
    *
    * Output: (ep — epoch-day window end, dau_est, wau_est) for every
    * day in the corpus span, ordered by ep. */
  def rollingActiveUsersApprox(events: DataFrame, keyCol: String,
                               tsCol: String, windowDays: Int,
                               lgK: Int = 12): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    require(lgK >= 4 && lgK <= 21, s"lgK in [4,21]; got $lgK")
    // no pre-distinct: the sketch IS the dedup (saves the exact
    // tier's first corpus-wide shuffle)
    val act = events.select(col(keyCol).as("k"),
      expr(s"CAST(datediff(to_date($tsCol), date '1970-01-01') AS BIGINT)")
        .as("ep"))
    val sk = act.groupBy("ep")
      .agg(expr(s"hll_sketch_agg(k, $lgK)").as("sk"))
    val span = sk.agg(min("ep").as("a"), max("ep").as("b"))
    val dau = sk.select(col("ep"),
      expr("hll_sketch_estimate(sk)").as("dau_est"))
    val contrib = sk.crossJoin(broadcast(span))
      .select(col("sk"), explode(expr(
        s"sequence(ep, least(ep + ${windowDays - 1}, b))")).as("ep"))
    val wau = contrib.groupBy("ep")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))")
        .as("wau_est"))
    val cal = span.select(explode(expr("sequence(a, b)")).as("ep"))
    cal.join(dau, Seq("ep"), "left").join(wau, Seq("ep"), "left")
      .select(col("ep"), coalesce(col("dau_est"), lit(0L)).as("dau_est"),
        coalesce(col("wau_est"), lit(0L)).as("wau_est"))
      .orderBy("ep")
  }

  /** Time-to-convert percentile mart: per signup-week cohort, how
    * many signups converted (first qualifying event strictly after
    * the first signup) and the exact p50/p90 of the conversion delay
    * — the funnel-latency companion of [[funnelSteps]]' counts and
    * [[cohortRetention]]'s grid: "half of week-12's signups purchased
    * within N seconds" is the number growth teams actually quote.
    *
    * Exact integers: delays in whole seconds (epoch-micros delta div
    * 1e6), percentile_disc picks data points. Two keyed min-aggregates
    * (never an event-pair join), one cohort rollup.
    *
    * Output: (cohort_wk, n_signups, n_converted, conv_ppm, p50_s,
    * p90_s — percentiles NULL for cohorts with no conversions),
    * ordered by cohort_wk. */
  def timeToConvert(events: DataFrame, keyCol: String, tsCol: String,
                    typeCol: String, fromType: String,
                    toType: String): DataFrame = {
    val e = events.select(col(keyCol).as("k"), col(typeCol).as("t"),
      unix_micros(col(tsCol)).as("tm"))
    val first = e.where(col("t") === fromType)
      .groupBy("k").agg(min("tm").as("t0"))
    val conv = e.where(col("t") === toType)
      .join(first, Seq("k"))
      .where(col("tm") > col("t0"))
      .groupBy("k").agg(min(col("tm") - col("t0")).as("delta_us"))
    first.join(conv, Seq("k"), "left")
      .select(expr("t0 div 604800000000").as("cohort_wk"),
        when(col("delta_us").isNotNull,
          expr("delta_us div 1000000")).as("delta_s"))
      .groupBy("cohort_wk")
      .agg(count(lit(1)).as("n_signups"),
        count(col("delta_s")).as("n_converted"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY delta_s)" +
          " AS BIGINT)").as("p50_s"),
        expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY delta_s)" +
          " AS BIGINT)").as("p90_s"))
      .select(col("cohort_wk"), col("n_signups"), col("n_converted"),
        expr("n_converted * 1000000 div n_signups").as("conv_ppm"),
        col("p50_s"), col("p90_s"))
      .orderBy("cohort_wk")
  }

  /** TOKEN-BUCKET admission audit per key — replay a rate limit
    * (capacity `burst` tokens, refill `ratePerHour` tokens/hour, one
    * token per event) over the event history and report what it WOULD
    * have admitted: the capacity-planning question behind every
    * throttling rollout, answered exactly before a limiter ships.
    *
    * The bucket is sequential state with a clamp (min(cap, s+refill))
    * — like [[cusumChart]]'s max-reset, not a prefix sum — but per-key
    * event lists are collect-bounded, so the whole replay folds
    * IN-ROW with aggregate() over the key's time-sorted events.
    * Integer units: 1 token = 3.6e9 units (1 unit = one
    * microsecond-of-refill at 1 token/hour), so refill is
    * elapsed_us × ratePerHour with no division anywhere.
    *
    * At 100 TB, segment the replay by day and carry the closing
    * bucket state forward (the x134 mergeable-partial discipline) —
    * the per-key collect here is bounded by per-key event counts.
    *
    * Output: (key, n_events, n_admitted, n_rejected,
    * first_rejected_id — −1 if none), ordered by key. */
  def tokenBucketAudit(events: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, ratePerHour: Long,
                       burst: Long): DataFrame = {
    require(ratePerHour >= 1 && burst >= 1, "rate and burst must be >= 1")
    val cost = 3600000000L
    val cap = burst * cost
    // Refill overflow guard: a raw epoch-micros gap × ratePerHour
    // wraps BIGINT once gap > ~9.2e18/rate (months of silence at
    // rates ~1e5/h). Any gap >= gapCap fills the bucket completely,
    // so clamping BEFORE the multiply is exact: the clamped product
    // is >= cap whenever the true refill is, and least(cap, ·)
    // collapses both to cap. Max product = (cap/rate + 1)·rate
    // <= cap + rate — never near the BIGINT edge for any sane burst.
    val gapCap = cap / ratePerHour + 1L
    val avail = s"least(${cap}L, acc.s + IF(acc.pt < 0, 0L, " +
      s"least(e.tm - acc.pt, ${gapCap}L) * $ratePerHour))"
    events.select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("tm"),
        col(idCol).as("id"))
      .groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col("tm"), col("id")))).as("evs"))
      .select(col(keyCol), col("n_events"),
        expr(
          s"""aggregate(evs,
             |  named_struct('s', ${cap}L, 'pt', -1L, 'adm', 0L,
             |               'rej', 0L, 'first', -1L),
             |  (acc, e) -> named_struct(
             |    's', IF($avail >= ${cost}L,
             |         $avail - ${cost}L,
             |         $avail),
             |    'pt', e.tm,
             |    'adm', acc.adm + IF($avail >= ${cost}L, 1L, 0L),
             |    'rej', acc.rej + IF($avail >= ${cost}L, 0L, 1L),
             |    'first', IF(acc.first >= 0L, acc.first,
             |      IF($avail >= ${cost}L, -1L, e.id))))""".stripMargin)
          .as("st"))
      .select(col(keyCol), col("n_events"),
        col("st.adm").as("n_admitted"), col("st.rej").as("n_rejected"),
        col("st.first").as("first_rejected_id"))
      .orderBy(keyCol)
  }

  /** Weekday-seasonality-adjusted outlier audit: a Monday is only
    * anomalous relative to MONDAYS — the raw daily-count z-chart
    * (x204's shape) alarms every weekend of a weekday-heavy service.
    * Per (group, date) on the ZERO-FILLED calendar (a silent day is
    * the outage case the audit exists to catch), the day's count is
    * compared to its group's same-weekday mean by exact
    * cross-multiplication: hi iff n·days_w > 2·tot_w (more than twice
    * the weekday mean), lo iff 2·n·days_w < tot_w (under half).
    * Weekday = epoch-day mod 7, engine-neutral.
    *
    * Scale shape: one (group, date) count, the per-group calendar
    * explode, one (group, weekday) rollup joined back on the bounded
    * 7-row-per-group grid, one final rollup. Output: (grp, n_days,
    * n_hi, n_lo, worst_hi_day — the day with the highest
    * count/weekday-mean ratio among hi outliers, smallest date on
    * ties, NULL if none), ordered by group. */
  def seasonalOutliers(events: DataFrame, grp: String,
                       tsCol: String): DataFrame = {
    val d = events.select(col(grp).as("g"),
      expr(s"CAST(datediff(to_date($tsCol), date '1970-01-01') AS BIGINT)")
        .as("ep"))
    val per = d.groupBy("g", "ep").agg(count(lit(1)).as("n"))
    val cal = per.groupBy("g").agg(min("ep").as("a"), max("ep").as("b"))
      .select(col("g"), explode(expr("sequence(a, b)")).as("ep"))
    val filled = cal.join(per, Seq("g", "ep"), "left")
      .select(col("g"), col("ep"), (col("ep") % 7).as("dow"),
        coalesce(col("n"), lit(0L)).as("n"))
    val prof = filled.groupBy("g", "dow")
      .agg(sum("n").as("tot_w"), count(lit(1)).as("days_w"))
    filled.join(prof, Seq("g", "dow"))
      .select(col("g"), col("ep"), col("n"), col("tot_w"), col("days_w"),
        (col("n").cast("decimal(38,0)") * col("days_w") >
          lit(2).cast("decimal(38,0)") * col("tot_w")).as("hi"),
        (lit(2).cast("decimal(38,0)") * col("n") * col("days_w") <
          col("tot_w")).as("lo"),
        when(col("tot_w") > 0,
          expr("CAST(n AS DECIMAL(38,0)) * days_w * 1000000 div tot_w"))
          .otherwise(lit(null)).as("ratio_ppm"))
      .groupBy(col("g").as(grp))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("hi"), 1L).otherwise(0L)).as("n_hi"),
        sum(when(col("lo"), 1L).otherwise(0L)).as("n_lo"),
        min(when(col("hi"),
          struct((-col("ratio_ppm")).as("nr"), col("ep").as("e")))).as("w"))
      .select(col(grp), col("n_days"), col("n_hi"), col("n_lo"),
        col("w.e").as("worst_hi_day"))
      .orderBy(grp)
  }

  /** Exact integer CUSUM control chart per group over the zero-filled
    * weekly count series — the classic sequential change detector
    * (Page 1954): s_t = max(0, s_{t-1} + y_t − μ − κ) with slack
    * κ = μ div 10 and alarm threshold h = μ; an alarm at week t says
    * the counts have run persistently above baseline since the last
    * reset, which a per-week z-score (x204's shape) cannot see.
    *
    * The recursion has a max-reset, so it is NOT a prefix sum — but
    * the week series is a BOUNDED GRID (one value per group-week), so
    * the whole chart runs IN-ROW: the group's (wk, y) pairs are
    * sorted into an array and folded once with `aggregate`'s lambda —
    * a sequential recursion over a grid-bounded array is a narrow
    * map, not a distributed loop. The only shuffles are the weekly
    * count and the per-group collect.
    *
    * Output: (grp, n_weeks, mu, n_alarms, first_alarm_wk — offset
    * from the group's first week, −1 if never — max_cusum), ordered
    * by group. */
  def cusumChart(events: DataFrame, grp: String, tsCol: String): DataFrame = {
    val wk = events.select(col(grp).as("g"),
      expr(s"datediff(to_date($tsCol), date '1970-01-01') div 7").as("wk"))
    val per = wk.groupBy("g", "wk").agg(count(lit(1)).as("y"))
    val cal = per.groupBy("g").agg(min("wk").as("a"), max("wk").as("b"),
        sum("y").as("tot"))
      .select(col("g"), col("a"), col("tot"),
        explode(expr("sequence(a, b)")).as("wk"))
    cal.join(per, Seq("g", "wk"), "left")
      .select(col("g"), (col("wk") - col("a")).as("x"),
        coalesce(col("y"), lit(0L)).as("y"), col("tot"))
      .groupBy(col("g").as(grp))
      .agg(count(lit(1)).as("n_weeks"), max("tot").as("tot"),
        sort_array(collect_list(struct(col("x"), col("y")))).as("ys"))
      .select(col(grp), col("n_weeks"),
        expr("tot div n_weeks").as("mu"), col("ys"))
      .select(col(grp), col("n_weeks"), col("mu"),
        expr("""aggregate(ys,
          |  named_struct('s', 0L, 'alarms', 0L, 'first_wk', -1L,
          |               'maxs', 0L),
          |  (acc, p) -> named_struct(
          |    's', greatest(0L, acc.s + p.y - mu - mu div 10),
          |    'alarms', acc.alarms + IF(greatest(0L, acc.s + p.y - mu
          |      - mu div 10) > mu, 1L, 0L),
          |    'first_wk', IF(acc.first_wk >= 0L, acc.first_wk,
          |      IF(greatest(0L, acc.s + p.y - mu - mu div 10) > mu,
          |         p.x, -1L)),
          |    'maxs', greatest(acc.maxs,
          |      greatest(0L, acc.s + p.y - mu - mu div 10))))""".stripMargin)
          .as("st"))
      .select(col(grp), col("n_weeks"), col("mu"),
        col("st.alarms").as("n_alarms"),
        col("st.first_wk").as("first_alarm_wk"),
        col("st.maxs").as("max_cusum"))
      .orderBy(grp)
  }

  /** EWMA control chart per group — the LEVEL-tracking companion of
    * [[cusumChart]]'s drift accumulator: the exponentially weighted
    * moving average of the zero-filled daily count adapts to slow
    * trends, and a day alarms when it exceeds TWICE the running
    * level (the same exact doubling rule as [[seasonalOutliers]] —
    * cross-multiplication, no floats). Integer fixed point with
    * alpha = 1/8: e' = (y + 7·e) div 8, seeded from day one's count
    * — every step is a BIGINT op both engines compute identically,
    * so the chart is oracle-exact (recursive-CTE twin), unlike the
    * float EWMA every monitoring vendor ships.
    *
    * Same scale shape as cusum: sequential state folds IN-ROW with
    * aggregate() over the (group, day)-grid-bounded series — one
    * keyed agg, no window over events, no driver loop.
    *
    * Output: (grp, n_days, n_alarms, first_alarm_x — day offset from
    * the group's first day, −1 if none, final_ewma), ordered. */
  def ewmaChart(events: DataFrame, grp: String, tsCol: String): DataFrame = {
    val d = events.select(col(grp).as("g"),
      expr(s"CAST(datediff(to_date($tsCol), date '1970-01-01') AS BIGINT)")
        .as("ep"))
    val per = d.groupBy("g", "ep").agg(count(lit(1)).as("y"))
    val cal = per.groupBy("g").agg(min("ep").as("a"), max("ep").as("b"))
      .select(col("g"), col("a"), explode(expr("sequence(a, b)")).as("ep"))
    cal.join(per, Seq("g", "ep"), "left")
      .select(col("g"), (col("ep") - col("a")).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .groupBy(col("g").as(grp))
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("x"), col("y")))).as("ys"))
      .select(col(grp), col("n_days"),
        expr("""aggregate(ys,
          |  named_struct('e', -1L, 'alarms', 0L, 'first_x', -1L),
          |  (acc, p) -> named_struct(
          |    'e', IF(acc.e < 0, p.y, (p.y + 7L * acc.e) div 8L),
          |    'alarms', acc.alarms
          |      + IF(acc.e > 0 AND p.y > 2L * acc.e, 1L, 0L),
          |    'first_x', IF(acc.first_x >= 0L, acc.first_x,
          |      IF(acc.e > 0 AND p.y > 2L * acc.e, p.x, -1L))))"""
          .stripMargin).as("st"))
      .select(col(grp), col("n_days"),
        col("st.alarms").as("n_alarms"),
        col("st.first_x").as("first_alarm_x"),
        col("st.e").as("final_ewma"))
      .orderBy(grp)
  }

  /** Per-key TIME-WEIGHTED average of a metered value — the billing /
    * capacity aggregate: each reading holds until the next one, so its
    * weight is the micros until that next reading, and the average is
    * Σ cents_i·dur_i div Σ dur_i. A plain mean over-counts bursts of
    * readings and under-counts long steady plateaus; the contrast
    * column (`mean_cents`) makes the bias visible per key.
    *
    * Exactness: value as floor-cents, durations as epoch-micros
    * deltas; the weighted numerator runs in DECIMAL(38,0) (cents ×
    * month-of-micros per term would near a BIGINT at ~1e5 readings)
    * and the one division is an integer `div`. Equal timestamps get
    * duration 0 in (ts, id) order — order within a tie cannot change
    * either sum.
    *
    * Scale shape: one key-partitioned lead window (per-key bounded),
    * one keyed aggregation. Output rows = key cardinality.
    *
    * Output: (key, n_events, span_s, twa_cents, mean_cents) for keys
    * with a positive span, ordered by key. */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, valCol: String): DataFrame = {
    val e = events.select(col(keyCol).as("k"),
      unix_micros(col(tsCol)).as("tm"), col(idCol).as("id"),
      floor(col(valCol) * 100).cast("bigint").as("cents"))
    val w = Window.partitionBy("k").orderBy("tm", "id")
    e.withColumn("dur", lead("tm", 1).over(w) - col("tm"))
      .groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum("dur").as("span_us"),
        sum(col("cents").cast("decimal(38,0)") * col("dur")).as("num"),
        sum("cents").as("sum_cents"))
      .where(col("span_us") > 0)
      .select(col(keyCol), col("n_events"),
        expr("span_us div 1000000").as("span_s"),
        expr("CAST(num div CAST(span_us AS DECIMAL(38,0)) AS BIGINT)")
          .as("twa_cents"),
        expr("sum_cents div n_events").as("mean_cents"))
      .orderBy(keyCol)
  }

  def retentionFromActivity(act: DataFrame): DataFrame = {
    val cohort = act.groupBy("u").agg(min("wk").as("cw"))
    val sizes = cohort.groupBy("cw").agg(count(lit(1)).as("cohort_size"))
    act.join(cohort, Seq("u"))
      .groupBy(col("cw").as("cohort_week"),
        (col("wk") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(sizes.withColumnRenamed("cw", "cohort_week"), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("active_users"),
        col("cohort_size"),
        expr("active_users * 1000000L div cohort_size").as("retention_ppm"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Index of dispersion (variance-to-mean of DAILY counts) per group
    * — the burstiness audit that separates Poisson-like steady traffic
    * (ratio ~ 1) from bursty/campaign-driven streams (>> 1), which
    * decides state-store sizing and salting thresholds downstream.
    * Exact integers: over the global day span m (zero-activity days
    * count as zeros — they contribute 0 to both sum and sumsq, so the
    * active-days aggregate already carries them),
    *   disp_milli = 1000 * (m*sumsq - sum^2) div (m*sum),
    * non-negative by Cauchy-Schwarz.
    *
    * Scale shape: one map-side-combinable (group, day) count, then
    * aggregation over that bounded table; the global span is a scalar
    * broadcast back. */
  def dispersionIndex(events: DataFrame, grp: String = "event_type"): DataFrame = {
    val daily = events
      .select(col(grp),
        expr("CAST(datediff(to_date(ts), DATE'1970-01-01') AS BIGINT)")
          .as("d"))
      .groupBy(col(grp), col("d")).agg(count(lit(1)).as("c"))
    val span = daily.agg((max("d") - min("d") + 1).as("m_days"))
    daily.groupBy(grp)
      .agg(count(lit(1)).as("n_active_days"), sum("c").as("n_events"),
        sum(col("c") * col("c")).as("sumsq"))
      .crossJoin(broadcast(span))
      .select(col(grp), col("m_days"), col("n_active_days"), col("n_events"),
        expr("(m_days * sumsq - n_events * n_events) * 1000" +
          " div (m_days * n_events)").as("disp_milli"))
      .orderBy(grp)
  }

  /** EXACT lag-k autocorrelation of DAILY event counts per group, for
    * k = 1..maxLag — the seasonality / burst-persistence audit behind
    * capacity planning and anomaly-window sizing (a strong lag-7 says
    * weekly cycle; fast decay says memoryless traffic). Zero-activity
    * days inside the global span COUNT AS ZEROS, as they must for a
    * time-series statistic — but no zero row is ever materialized:
    * with d_t = m*c_t - S (so d_t = -S on inactive days),
    *   acf_k = num_k / den,
    *   num_k = m^2*P_k - m*S*(A_k + B_k) + (m-k)*S^2,
    *   den   = m^2*sumsq - m*S^2,
    * where P_k sums c_t*c_{t+k} over ACTIVE pairs and A_k/B_k are
    * range-filtered active sums — algebra replaces the dense grid.
    * All BIGINT, truncating division, reported in milli (can be
    * negative; both engines truncate toward zero).
    *
    * Scale shape: one map-side-combinable (group, day) count, one
    * |lags|-way explode of that bounded daily table, one equi-join on
    * (group, day+k) for P_k, keyed aggregates for the rest; the
    * global span is a scalar broadcast. Nothing row-shaped after the
    * first count.
    *
    * Output: (grp, lag, n_pairs, acf_milli), ordered. */
  def autocorrDaily(events: DataFrame, grp: String = "event_type",
                    maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1; got $maxLag")
    val spark = events.sparkSession
    import spark.implicits._
    val daily = CacheRegistry.pin(events
      .select(col(grp).as("g"),
        expr("CAST(datediff(to_date(ts), DATE'1970-01-01') AS BIGINT)")
          .as("d"))
      .groupBy("g", "d").agg(count(lit(1)).as("c")))
    val span = daily.agg(min("d").as("dmin"), max("d").as("dmax"),
      (max("d") - min("d") + 1).as("m"))
    val stats = daily.groupBy("g")
      .agg(sum("c").as("s"), sum(col("c") * col("c")).as("sumsq"))
    val lags = (1 to maxLag).map(_.toLong).toDF("k")
    val dl = daily.crossJoin(broadcast(lags))
    val p = dl.as("a")
      .join(daily.as("b"),
        col("a.g") === col("b.g") && col("b.d") === col("a.d") + col("a.k"))
      .groupBy(col("a.g").as("g"), col("a.k").as("k"))
      .agg(sum(col("a.c") * col("b.c")).as("p"))
    val ab = dl.crossJoin(broadcast(span))
      .groupBy("g", "k")
      .agg(sum(when(col("d") <= col("dmax") - col("k"), col("c"))
          .otherwise(0L)).as("a_sum"),
        sum(when(col("d") >= col("dmin") + col("k"), col("c"))
          .otherwise(0L)).as("b_sum"))
    stats.crossJoin(broadcast(lags))
      .join(ab, Seq("g", "k"))
      .join(p, Seq("g", "k"), "left").na.fill(0L, Seq("p"))
      .crossJoin(broadcast(span.select("m")))
      .select(col("g").as(grp), col("k").as("lag"),
        (col("m") - col("k")).as("n_pairs"),
        expr("""(m * m * p - m * s * (a_sum + b_sum) + (m - k) * s * s)
               | * 1000 div nullif(m * m * sumsq - m * s * s, 0)"""
          .stripMargin).as("acf_milli"))
      .where(col("n_pairs") > 0) // lags at/past the span have no pairs
      .orderBy(grp, "lag")
  }

  /** Inter-arrival profile: per group, the distribution of gaps (whole
    * seconds, truncating) between a user's consecutive events —
    * count, discrete median, discrete p90, max. The feed-health /
    * engagement-cadence audit; percentile_disc keeps every tier an
    * actual member of the gap multiset, so both engines agree
    * bit-for-bit.
    *
    * Scale shape: one window partitioned by (group, user) — state
    * bounded per user — then a keyed aggregate per group. */
  def interArrival(events: DataFrame, grp: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(col(grp), col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    events.where(col("user_id").isNotNull)
      .select(col(grp), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev", lag("ts_us", 1).over(w))
      .where(col("prev").isNotNull)
      .select(col(grp), expr("(ts_us - prev) div 1000000").as("gap_s"))
      .groupBy(grp)
      .agg(count(lit(1)).as("n_gaps"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_s)" +
          " AS BIGINT)").as("med_gap_s"),
        expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_s)" +
          " AS BIGINT)").as("p90_gap_s"),
        max("gap_s").as("max_gap_s"))
      .orderBy(grp)
  }

  /** HOUR-OF-DAY entropy per group in WHOLE-BIT millibits (the flog2
    * quantization every perplexity-family operator uses — engine-
    * identical, no floating log): H = sum c_h * (flog2(n) - flog2(c_h))
    * * 1000 div n over the 24 hourly buckets, plus the peak hour and
    * its exact share. Near-zero entropy with a tall peak = scheduled /
    * batch traffic; ~4.58 bits (log2 24) = organic. The
    * cron-vs-human separator that decides whether a stream belongs
    * in the anomaly baseline at all.
    *
    * Scale shape: one map-side-combinable (group, hour) count — a
    * table bounded at 24 rows per group — then one keyed aggregate;
    * peak tie-break is (count desc, hour asc) via one max(struct).
    *
    * Output: (grp, n_events, entropy_millibits, peak_hour,
    * peak_ppm), ordered. */
  def hourEntropy(events: DataFrame, grp: String = "event_type"): DataFrame = {
    def flog2(c: Column): Column = (length(bin(c)) - 1).cast("bigint")
    val hc = events
      .select(col(grp).as("g"), hour(col("ts")).cast("bigint").as("h"))
      .groupBy("g", "h").agg(count(lit(1)).as("c"))
    // H = sum c*(flog2(n) - flog2(c)) = n*flog2(n) - sum c*flog2(c):
    // the constant term factors out, so one keyed aggregate suffices
    hc.groupBy("g")
      .agg(sum("c").as("n"),
        sum(col("c") * flog2(col("c"))).as("self_bits"),
        max(struct(col("c"), (-col("h")).as("nh"))).as("pk"))
      .withColumn("hbits_raw", col("n") * flog2(col("n")) - col("self_bits"))
      .select(col("g").as(grp), col("n").as("n_events"),
        expr("hbits_raw * 1000 div n").as("entropy_millibits"),
        (-col("pk.nh")).as("peak_hour"),
        expr("pk.c * 1000000 div n").as("peak_ppm"))
      .orderBy(grp)
  }

  /** THEIL-SEN robust trend slope of the daily event-count series —
    * the median of all pairwise slopes (public estimator, Theil 1950 /
    * Sen 1968; 29% breakdown vs OLS's zero): one corrupted burst day
    * drags an OLS fit, the pairwise median shrugs it off. Slopes are
    * integer micro-units ((y2-y1)*1e6 div (d2-d1), truncating), the
    * median is the DISCRETE percentile of that integer multiset, and
    * the OLS slope (same micro scale, day index re-based to the min
    * day to keep moments small) rides along for the contrast — the
    * gap between the two IS the burst-contamination signal.
    *
    * Scale shape: the corpus collapses to the (day, count) table
    * first (one map-side-combinable agg, bounded by the observation
    * window, NOT the corpus); the pair join and the percentile run on
    * that bounded table — days², not rows², and days is a constant of
    * the time range at any SF.
    *
    * Output: one row (n_days, n_pairs, theilsen_micro, ols_micro). */
  def theilSenTrend(events: DataFrame): DataFrame = {
    val daily = events.select(
        datediff(to_date(col("ts")), lit("1995-01-01")).cast("bigint")
          .as("d"))
      .groupBy("d").agg(count(lit(1)).as("y"))
    val base = daily.crossJoin(
        broadcast(daily.agg(min("d").as("d0"))))
      .select((col("d") - col("d0")).as("d"), col("y"))
    val pairs = base.as("a").join(base.as("b"),
        col("a.d") < col("b.d"))
      .select(expr("(b.y - a.y) * 1000000 div (b.d - a.d)").as("slope"))
    val ts = pairs.agg(count(lit(1)).as("n_pairs"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)")
        .cast("bigint").as("theilsen_micro"))
    val ols = base.agg(count(lit(1)).as("n_days"), sum("d").as("sd"),
        sum("y").as("sy"), sum(expr("d * d")).as("sdd"),
        sum(expr("d * y")).as("sdy"))
      .select(col("n_days"),
        // the x1e6 numerator wraps BIGINT near ~9.2e12 covariance
        // mass — widen to DECIMAL(38,0) (DuckDB twin: HUGEINT)
        expr("CAST(CAST(n_days * sdy - sd * sy AS DECIMAL(38,0))" +
          " * 1000000 div (n_days * sdd - sd * sd) AS BIGINT)")
          .as("ols_micro"))
    ols.crossJoin(ts)
      .select(col("n_days"), col("n_pairs"), col("theilsen_micro"),
        col("ols_micro"))
  }

  /** DISCRETE HAZARD CURVE of user lifetime (Kaplan-Meier's hazard
    * column without the float survival product): lifespan = whole days
    * between a user's first and last event; for each day k,
    * n_at_risk = users whose lifespan >= k, n_churned = users whose
    * lifespan is exactly k, hazard_ppm = churned * 1e6 div at_risk —
    * all exact integers. The retention-cliff locator: a hazard spike
    * at k = 7 is a weekly-billing artifact, a flat tail is organic
    * decay. (The survival product is deliberately NOT emitted: its
    * running float product is engine-order-dependent; every number
    * here is engine-exact.)
    *
    * Scale shape: one (user -> min ts, max ts) keyed agg, one
    * lifespan histogram (bounded by the observation window), one
    * suffix-sum window over that bounded table.
    *
    * Output: (k, n_churned, n_at_risk, hazard_ppm), ordered by k. */
  def hazardCurve(events: DataFrame): DataFrame = {
    val ls = events.groupBy("user_id")
      .agg(datediff(to_date(max("ts")), to_date(min("ts")))
        .cast("bigint").as("k"))
    val hist = ls.groupBy("k").agg(count(lit(1)).as("n_churned"))
    hist
      .withColumn("n_at_risk",
        sum("n_churned").over(Window.orderBy(col("k").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("k"), col("n_churned"), col("n_at_risk"),
        expr("n_churned * 1000000 div n_at_risk").as("hazard_ppm"))
      .orderBy("k")
  }

  /** SCD-2 INTERVALIZATION of an event log: collapse each user's
    * consecutive same-type event runs into validity intervals
    * (valid_from = first event of the run, valid_to = first event of
    * the NEXT run, NULL while current) — the standard
    * slowly-changing-dimension type-2 history build that turns an
    * append-only log into a point-in-time-joinable dimension
    * ("what state was this user in at time t" becomes one range
    * predicate instead of a per-probe window scan). Gaps-and-islands:
    * a run boundary is lag(type) ≠ type under the per-user
    * (ts, event_id) order — the event_id tiebreak makes equal-ts
    * runs deterministic across engines. Epoch seconds out, not
    * timestamps, so the row is hash-stable across writers.
    *
    * Scale shape: two windows and one aggregate, all partitioned by
    * user — a single hash shuffle of (user, ts, type), reused by
    * every step (no second exchange: the run-id window, the groupBy,
    * and the valid_to lead all share the user partitioning). State
    * per user is O(its events), never global.
    *
    * Output: (user_id, seq, event_type, valid_from, valid_to,
    * n_events) ordered by (user_id, seq); seq is the 1-based run
    * index per user. */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val runs = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), unix_timestamp(col("ts")).as("ep"))
      .withColumn("chg",
        when(lag("event_type", 1).over(w).isNull
          || lag("event_type", 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("seq", sum("chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("seq"), col("event_type"))
      .agg(min("ep").as("valid_from"), count(lit(1)).as("n_events"))
    runs
      .withColumn("valid_to", lead("valid_from", 1).over(
        Window.partitionBy("user_id").orderBy("seq")))
      .select(col("user_id"), col("seq"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .orderBy("user_id", "seq")
  }

  /** TOP EVENT TRIGRAMS with Markov-1 lift: the k most frequent
    * consecutive type triples (a,b,c) under the per-user (ts,
    * event_id) order, each with its conditional continuation rate
    * p(c | a,b) in ppm, the order-1 baseline p(c | b) from the
    * bigram table, and lift_milli = p(c|a,b)·1000 div p(c|b) — lift
    * far from 1000 means the process is NOT memoryless at depth 2
    * and a sessionizer/anomaly rule keyed on pairs is leaving signal
    * on the table. Trigram-prefix counts n_ab come from the trigram
    * table itself (the last two events of a user have no trigram, so
    * n_ab ≠ the bigram count); the baseline n_bc/n_b• comes from the
    * full bigram table.
    *
    * Scale shape: two leads over one per-user window (a single hash
    * shuffle of (user, ts, type)), then map-side-combinable counts on
    * the bounded |types|³ tables; the top-k is a TakeOrdered, never a
    * global sort.
    *
    * Output: (a, b, c, n, p_cond_ppm, p1_ppm, lift_milli) — top k by
    * (n desc, a, b, c). */
  def eventTrigrams(events: DataFrame, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be positive; got $k")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val seq = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("a"))
      .withColumn("b", lead("a", 1).over(w))
      .withColumn("c", lead("a", 2).over(w))
    // ONE corpus pass: each position emits its trigram AND its bigram
    // through a two-struct explode, counted in a single aggregate to
    // the bounded (|types|³ + |types|²) table, pinned so the four
    // consumers below never re-run the window
    val counted = CacheRegistry.pin(seq
      .select(explode(array(
        struct(lit("tri").as("m"), col("a").as("xa"),
          col("b").as("xb"), col("c").as("xc")),
        struct(lit("bi").as("m"), col("a").as("xa"),
          col("b").as("xb"), lit(null).cast("string").as("xc")))).as("r"))
      .select(col("r.m").as("m"), col("r.xa").as("xa"),
        col("r.xb").as("xb"), col("r.xc").as("xc"))
      .where((col("m") === "tri" && col("xc").isNotNull)
        || (col("m") === "bi" && col("xb").isNotNull))
      .groupBy("m", "xa", "xb", "xc").agg(count(lit(1)).as("cnt")))
    val bi = counted.where(col("m") === "bi")
      .select(col("xa").as("b1"), col("xb").as("b2"),
        col("cnt").as("n_bc"))
    val bOut = bi.groupBy(col("b1").as("bk")).agg(sum("n_bc").as("n_b_out"))
    val tri = counted.where(col("m") === "tri")
      .select(col("xa").as("a"), col("xb").as("b"), col("xc").as("c"),
        col("cnt").as("n"))
    val triPrefix = tri.groupBy(col("a").as("pa"), col("b").as("pb"))
      .agg(sum("n").as("n_ab"))
    tri
      .join(triPrefix, col("a") === col("pa") && col("b") === col("pb"))
      .join(bi, col("b") === col("b1") && col("c") === col("b2"))
      .join(bOut, col("b") === col("bk"))
      .select(col("a"), col("b"), col("c"), col("n"),
        expr("n * 1000000 div n_ab").as("p_cond_ppm"),
        expr("n_bc * 1000000 div n_b_out").as("p1_ppm"))
      .withColumn("lift_milli",
        expr("p_cond_ppm * 1000 div nullif(p1_ppm, 0)"))
      .orderBy(col("n").desc, col("a"), col("b"), col("c"))
      .limit(k)
  }

  /** MARKOV ENTROPY RATE of the event-type chain (one row), in the
    * repo's whole-bit quantization: the marginal type entropy
    * H(X) = Σ n_b·(flog2(N)−flog2(n_b)) and the order-1 conditional
    * entropy H(X'|X) = Σ n_bc·(flog2(n_b•)−flog2(n_bc)) over the
    * per-user consecutive-pair counts, both count-scaled (divide by
    * n_pairs downstream for bits/event); memory_gain_scaled =
    * H(X)·n_pairs/N − ... is deliberately NOT blended across the two
    * different denominators — the two scaled sums and their ppm
    * ratio cond_vs_marginal_ppm (conditional surprise per pair vs
    * marginal surprise per event) are emitted instead, each
    * engine-exact. A ratio well under 1e6 = the chain has real
    * memory, sessionization and x358's depth-2 audit will pay.
    *
    * Scale shape: one lead over the per-user window (one hash
    * shuffle), counts on the bounded |types|² table; the marginal
    * uses the same pair table's left margin so both entropies see
    * the same sample space.
    *
    * Output: (n_pairs, h_marginal_scaled, h_cond_scaled,
    * cond_vs_marginal_ppm). */
  def markovEntropy(events: DataFrame): DataFrame = {
    def flog2(c: Column): Column = (length(bin(c)) - 1).cast("bigint")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val bi = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("bsrc"))
      .withColumn("bdst", lead("bsrc", 1).over(w))
      .where(col("bdst").isNotNull)
      .groupBy("bsrc", "bdst").agg(count(lit(1)).as("n_bc"))
    val marg = bi.groupBy("bsrc").agg(sum("n_bc").as("n_b"))
    val nn = marg.agg(sum("n_b").as("n_pairs"))
    val hm = marg.crossJoin(broadcast(nn))
      .agg(sum(col("n_b") * (flog2(col("n_pairs")) - flog2(col("n_b"))))
        .as("h_marginal_scaled"))
    val hc = bi.join(marg, Seq("bsrc"))
      .agg(sum(col("n_bc") * (flog2(col("n_b")) - flog2(col("n_bc"))))
        .as("h_cond_scaled"))
    nn.crossJoin(hm).crossJoin(hc)
      .select(col("n_pairs"), col("h_marginal_scaled"),
        col("h_cond_scaled"),
        expr("h_cond_scaled * 1000000" +
          " div nullif(h_marginal_scaled, 0)")
          .as("cond_vs_marginal_ppm"))
  }

  /** PARTITION COMPLETENESS audit: each day's event count against the
    * DISCRETE lower median of its ±3-day neighborhood (the seasonal
    * local baseline — a sorted 7-element array, element (size+1)/2,
    * no float percentile), with completeness in ppm — the
    * partial-load detector run after every backfill: a day at
    * 400k ppm of its neighbors is a half-written partition, a day at
    * 0 is a hole the calendar join would silently skip. Median via
    * sort_array keeps every number engine-exact, including at the
    * series edges where the window is shorter than 7.
    *
    * Scale shape: the corpus collapses to the (day, count) table
    * first (one map-side-combinable agg); the collect_list window
    * holds ≤7 BIGINTs per row of that bounded table.
    *
    * Output: (d, n, med7, completeness_ppm) ordered by d; d is the
    * epoch day. */
  def partitionCompleteness(events: DataFrame): DataFrame =
    completenessFromDaily(events
      .select(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("bigint").as("d"))
      .groupBy("d").agg(count(lit(1)).as("n")))

  /** [[partitionCompleteness]]'s finishing stage on an
    * already-aggregated (d, n) daily count table — exposed so the
    * streaming front door
    * ([[graft.streaming.Streaming.streamCompleteness]]) can drain its
    * complete-mode day-count state into the SAME median arithmetic
    * (drained == batch, checked by the shared oracle). */
  def completenessFromDaily(daily: DataFrame): DataFrame = {
    val w = Window.orderBy("d").rowsBetween(-3, 3)
    daily
      .withColumn("neigh", sort_array(collect_list("n").over(w)))
      .select(col("d"), col("n"),
        expr("element_at(neigh, CAST((size(neigh) + 1) div 2 AS INT))")
          .as("med7"))
      .withColumn("completeness_ppm",
        expr("n * 1000000 div med7"))
      .orderBy("d")
  }

  /** SEASONAL-NAIVE FORECAST BACKTEST (one row): score the two
    * baselines every capacity forecast must beat — persistence
    * (predict today = yesterday) and seasonal-naive (today = same
    * weekday last week) — on the daily count series, by exact MAE in
    * milli and MAPE in ppm (per-day APE truncating, then averaged).
    * If a model cannot beat mae_w_milli it is decoration; if
    * seasonal-naive beats persistence (it usually does on weekly-
    * cycled traffic) the series HAS a weekly season and capacity
    * planning must use it. Scored days are those with both
    * references available (d−1 and d−7 observed), counted in-band —
    * looked up by VALUE (a RANGE frame pinned at exactly d−1 / d−7),
    * so a hole elsewhere in the week never drops a scorable day.
    *
    * Scale shape: the corpus collapses to the (day, count) table;
    * the two references are lags over that bounded table.
    *
    * Output: (n_scored, mae_p_milli, mape_p_ppm, mae_w_milli,
    * mape_w_ppm). */
  def seasonalNaiveBacktest(events: DataFrame): DataFrame = {
    val daily = events
      .select(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("bigint").as("d"))
      .groupBy("d").agg(count(lit(1)).as("n"))
    // RANGE frames pinned at exactly d-1 / d-7: each holds at most one
    // row (d is distinct after the groupBy), so max() IS the lookup —
    // NULL when that calendar day is unobserved, regardless of holes
    // elsewhere in the window
    val w1 = Window.orderBy("d").rangeBetween(-1, -1)
    val w7 = Window.orderBy("d").rangeBetween(-7, -7)
    daily
      .withColumn("p1", max("n").over(w1))
      .withColumn("p7", max("n").over(w7))
      .where(col("p1").isNotNull && col("p7").isNotNull)
      .agg(count(lit(1)).as("n_scored"),
        sum(abs(col("n") - col("p1"))).as("ae1"),
        sum(expr("abs(n - p1) * 1000000 div n")).as("ape1"),
        sum(abs(col("n") - col("p7"))).as("ae7"),
        sum(expr("abs(n - p7) * 1000000 div n")).as("ape7"))
      .select(col("n_scored"),
        expr("ae1 * 1000 div n_scored").as("mae_p_milli"),
        expr("ape1 div n_scored").as("mape_p_ppm"),
        expr("ae7 * 1000 div n_scored").as("mae_w_milli"),
        expr("ape7 div n_scored").as("mape_w_ppm"))
  }

  /** CHANGEPOINT LOCALIZATION (one row): the split day s maximizing
    * the cross-multiplied mean gap |S_s·N − S·n_s| over the daily
    * count series (S_s, n_s = prefix sums; equivalent to the scaled
    * two-mean CUSUM statistic, no division until the end) — WHERE
    * the level shifted, to go with the cusum chart's WHETHER. Ties
    * break to the earliest day. Means on both sides ride along in
    * milli for the human reading the row. The gap products are
    * widened to DECIMAL(38,0) (DuckDB twin: HUGEINT) — S·n_s is
    * O(rows·days).
    *
    * Scale shape: one corpus collapse to (day, count), one prefix
    * window + one argmin-by-struct aggregate over the bounded day
    * table (the argmax folds in ONE aggregate via min on the
    * (-score, day) struct — no second pass, no window re-sort).
    *
    * Output: (split_d, n_days, mean_left_milli, mean_right_milli,
    * gap_score). */
  def changepointLocate(events: DataFrame): DataFrame = {
    val daily = events
      .select(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("bigint").as("d"))
      .groupBy("d").agg(count(lit(1)).as("n"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = daily
      .withColumn("ns", sum("n").over(w))
      .withColumn("ds", count(lit(1)).over(w))
    val tot = pre.agg(max("ns").as("s_all"), max("ds").as("d_all"))
    pre.crossJoin(broadcast(tot))
      .where(col("ds") < col("d_all"))
      .select(col("d"), col("ns"), col("ds"), col("s_all"),
        col("d_all"),
        expr("abs(CAST(ns AS DECIMAL(38,0)) * d_all" +
          " - CAST(s_all AS DECIMAL(38,0)) * ds)").as("score"))
      .agg(min(struct(expr("-score").as("neg"), col("d"), col("ns"),
        col("ds"), col("s_all"), col("d_all"))).as("b"))
      .select(col("b.d").as("split_d"), col("b.d_all").as("n_days"),
        expr("b.ns * 1000 div b.ds").as("mean_left_milli"),
        expr("(b.s_all - b.ns) * 1000 div (b.d_all - b.ds)")
          .as("mean_right_milli"),
        expr("CAST(-b.neg AS BIGINT)").as("gap_score"))
  }

  /** DAILY CO-MOVEMENT of event-type pairs: for every ordered type
    * pair, the SIGNED SQUARED Pearson correlation of their daily
    * count series in ppm — sign(cov)·cov²·1e6 div (var_a·var_b),
    * the sqrt-free exact form (r itself needs a square root when the
    * two marginals differ; r² with the covariance sign carries the
    * same reading: ±1e6 = lockstep, 0 = unrelated). Co-moving
    * metrics share an upstream cause — the "these two alerts are one
    * incident" dashboard arithmetic. Days are the INNER join of the
    * two types' observed days (documented; a type absent on a day is
    * a missing observation, not a zero). All moment products widened
    * to DECIMAL(38,0) (DuckDB twin: HUGEINT).
    *
    * Exactness bound (explicit, guarded): cov is O(days²·dailyCount²),
    * so cov²·1e6 exceeds 38 digits once |cov| ≥ 1e16 — roughly 3k days
    * at ~1e5 events/type/day — and va·vb exceeds them once either
    * variance term passes ~1e19. Past those bounds the pair's
    * signed_r2_ppm is returned as NULL BY THE GUARD BELOW (same row
    * count, deterministic under ANSI mode too), not by silent decimal
    * overflow; a caller needing the co-movement of series that hot
    * should pre-scale the daily counts (r² is scale-invariant).
    *
    * Scale shape: one (type, day) count — the only corpus pass; the
    * pair join and moments run on that bounded |types|×|days| table.
    *
    * Output: (type_a, type_b, n_days, signed_r2_ppm) ordered by
    * (type_a, type_b). */
  def dailyCoMovement(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type").as("t"),
        datediff(to_date(col("ts")), lit("1970-01-01"))
          .cast("bigint").as("d"))
      .groupBy("t", "d").agg(count(lit(1)).as("n"))
    val pairs = daily.as("a")
      .join(daily.as("b"), col("a.d") === col("b.d")
        && col("a.t") < col("b.t"))
      .select(col("a.t").as("ta"), col("b.t").as("tb"),
        col("a.n").as("x"), col("b.n").as("y"))
    pairs.groupBy("ta", "tb")
      .agg(count(lit(1)).as("m"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .withColumn("cov", expr("m * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("va", expr("m * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("vb", expr("m * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("m").as("n_days"),
        // integer sign (Spark's sign() returns DOUBLE — it would
        // poison the exact decimal chain); the abs(cov)/va/vb guard
        // keeps cov²·1e6 and va·vb inside DECIMAL(38,0) — NULL past
        // the documented exactness bound instead of overflow
        expr("CAST(CASE WHEN va = 0 OR vb = 0 THEN NULL" +
          " WHEN abs(cov) >= 10000000000000000BD" +
          "   OR va >= 10000000000000000000BD OR vb >= 10000000000000000000BD" +
          " THEN NULL ELSE" +
          " (CASE WHEN cov < 0 THEN -1 ELSE 1 END)" +
          " * (cov * cov * 1000000 div (va * vb)) END AS BIGINT)")
          .as("signed_r2_ppm"))
      .orderBy("type_a", "type_b")
  }

  /** SHIP-LAG PROFILE per order priority: days between order and
    * line ship, summarized as exact integers — n lines, discrete
    * median and type-1 p90 lag (10·cum ≥ k·n over the bounded lag
    * histogram — never a per-group sort), and the >30-day late rate
    * in ppm. The fulfillment-SLA audit: a priority class whose p90
    * drifts while its median holds is backlogged at the tail, which
    * a mean would hide.
    *
    * Scale shape: one lineitem⨝orders equi-join on the order key
    * (the fact-to-fact shuffle every mart pays once), collapsed
    * immediately to the (priority, lag) histogram — percentiles and
    * rates run on that bounded table.
    *
    * Output: (o_orderpriority, n, median_lag, p90_lag, late_ppm)
    * ordered by priority. */
  def shipLag(li: DataFrame, orders: DataFrame,
              lateDays: Long = 30L): DataFrame = {
    val h = li.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("pri"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("bigint").as("lag"))
      .groupBy("pri", "lag").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("pri").orderBy("lag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = h.groupBy(col("pri").as("p2"))
      .agg(sum("c").as("n"),
        sum(when(col("lag") > lateDays, col("c")).otherwise(0L))
          .as("n_late"))
    h.withColumn("cum", sum("c").over(w))
      .join(tot, col("pri") === col("p2"))
      .groupBy(col("pri").as("o_orderpriority"), col("n"),
        col("n_late"))
      .agg(min(when(col("cum") * 10 >= col("n") * 5, col("lag")))
          .as("median_lag"),
        min(when(col("cum") * 10 >= col("n") * 9, col("lag")))
          .as("p90_lag"))
      .select(col("o_orderpriority"), col("n"), col("median_lag"),
        col("p90_lag"),
        expr("n_late * 1000000 div n").as("late_ppm"))
      .orderBy("o_orderpriority")
  }
}
