package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation / measurement operators (beyond-reference,
  * SURVEY.md §2.8): the A/B-readout arithmetic a data platform runs
  * beside its pipelines — difference-in-differences, CUPED variance
  * reduction, and forecast-calibration audits. All integer-exact:
  * values quantize to milli units (floor(value·1000)) up front, every
  * downstream mean/moment is truncating integer arithmetic with
  * DECIMAL(38,0) widening where a product is O(n²) (DuckDB twin:
  * HUGEINT), so results are bit-identical across partitionings and
  * engines.
  *
  * Scale shape (shared): each operator is one or two
  * map-side-combinable aggregations — a conditional-sum pass over the
  * corpus, optionally a per-user pass first — and a constant-size
  * finishing select. Nothing user- or row-shaped is ever broadcast or
  * collected.
  */
object Experiment {

  /** DIFFERENCE-IN-DIFFERENCES readout (one row): mean outcome in
    * milli units per (treated, post) cell from ONE conditional-sum
    * corpus pass, and did_milli = (T,post − T,pre) − (C,post − C,pre)
    * — the standard two-way estimate of a cutover's effect when
    * treatment was not randomized but trends were parallel.
    *
    * `treated` / `post` are caller-supplied boolean Columns (the
    * synthetic default in the judged query: user-id parity and a
    * mid-range cutover date), so the operator is assignment-agnostic.
    *
    * Output: (n_t_pre, n_t_post, n_c_pre, n_c_post, mean_t_pre_milli,
    * mean_t_post_milli, mean_c_pre_milli, mean_c_post_milli,
    * did_milli). */
  def diffInDiff(events: DataFrame, treated: Column, post: Column,
                 valueCol: String = "value"): DataFrame =
    events
      .select(expr(s"CAST(floor(CAST($valueCol AS DOUBLE) * 1000)" +
          " AS BIGINT)").as("q"),
        treated.as("t"), post.as("p"))
      .agg(
        count(when(col("t") && !col("p"), lit(1))).as("n_t_pre"),
        count(when(col("t") && col("p"), lit(1))).as("n_t_post"),
        count(when(!col("t") && !col("p"), lit(1))).as("n_c_pre"),
        count(when(!col("t") && col("p"), lit(1))).as("n_c_post"),
        sum(when(col("t") && !col("p"), col("q"))).as("s_t_pre"),
        sum(when(col("t") && col("p"), col("q"))).as("s_t_post"),
        sum(when(!col("t") && !col("p"), col("q"))).as("s_c_pre"),
        sum(when(!col("t") && col("p"), col("q"))).as("s_c_post"))
      .select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"),
        col("n_c_post"),
        expr("s_t_pre div n_t_pre").as("mean_t_pre_milli"),
        expr("s_t_post div n_t_post").as("mean_t_post_milli"),
        expr("s_c_pre div n_c_pre").as("mean_c_pre_milli"),
        expr("s_c_post div n_c_post").as("mean_c_post_milli"))
      .withColumn("did_milli",
        expr("(mean_t_post_milli - mean_t_pre_milli)" +
          " - (mean_c_post_milli - mean_c_pre_milli)"))

  /** CUPED variance-reduced treatment readout (one row): per user,
    * x = pre-period mean value and y = post-period mean value (milli,
    * truncating; users present in BOTH periods only — CUPED needs the
    * covariate); θ = cov(x,y)/var(x) in ppm over all kept users
    * (pooled, the standard practice); the adjusted effect subtracts
    * θ·(x̄_T − x̄_C) from the raw post-period difference, cancelling
    * the pre-existing imbalance the covariate explains. `treated`
    * must be constant per user (it is grouped with the user key). Every moment
    * product is widened to DECIMAL(38,0) (DuckDB twin: HUGEINT) —
    * n·Σxy is O(n²·value²).
    *
    * Scale shape: one per-user conditional-sum aggregation (the only
    * corpus pass), one global moment aggregation over the user table,
    * one constant-size finish — no broadcast, no window.
    *
    * Output: (n_users, n_treated, theta_ppm, raw_diff_micro,
    * adj_diff_micro). */
  def cuped(events: DataFrame, treated: Column, post: Column,
            valueCol: String = "value"): DataFrame = {
    val users = events
      .select(col("user_id"),
        expr(s"CAST(floor(CAST($valueCol AS DOUBLE) * 1000)" +
          " AS BIGINT)").as("q"),
        treated.as("t"), post.as("p"))
      .groupBy("user_id", "t")
      .agg(count(when(!col("p"), lit(1))).as("n_pre"),
        sum(when(!col("p"), col("q"))).as("s_pre"),
        count(when(col("p"), lit(1))).as("n_post"),
        sum(when(col("p"), col("q"))).as("s_post"))
      .where(col("n_pre") > 0 && col("n_post") > 0)
      .select(col("t"), expr("s_pre div n_pre").as("x"),
        expr("s_post div n_post").as("y"))
    users.agg(
        count(lit(1)).as("n_users"),
        count(when(col("t"), lit(1))).as("n_treated"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(when(col("t"), col("x"))).as("sx_t"),
        sum(when(!col("t"), col("x"))).as("sx_c"),
        sum(when(col("t"), col("y"))).as("sy_t"),
        sum(when(!col("t"), col("y"))).as("sy_c"))
      .select(col("n_users"), col("n_treated"),
        expr("CAST((CAST(n_users AS DECIMAL(38,0)) * sxy" +
          " - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000" +
          " div nullif(CAST(n_users AS DECIMAL(38,0)) * sxx" +
          " - CAST(sx AS DECIMAL(38,0)) * sx, 0) AS BIGINT)")
          .as("theta_ppm"),
        expr("sy_t * 1000 div n_treated" +
          " - sy_c * 1000 div (n_users - n_treated)")
          .as("raw_diff_micro"),
        expr("sx_t * 1000 div n_treated" +
          " - sx_c * 1000 div (n_users - n_treated)")
          .as("x_diff_micro"))
      .withColumn("adj_diff_micro",
        expr("raw_diff_micro - CAST(CAST(theta_ppm AS DECIMAL(38,0))" +
          " * x_diff_micro div 1000000 AS BIGINT)"))
      .select("n_users", "n_treated", "theta_ppm", "raw_diff_micro",
        "adj_diff_micro")
  }

  /** FORECAST CALIBRATION BINS + expected calibration error (ECE):
    * the score column min-max-normalizes to ppm on its milli
    * quantization (all-integer, so the normalization is engine-exact),
    * lands in ten equal-width bins, and each bin reports its mean
    * score vs its realized positive rate — the reliability diagram as
    * a table. ece_ppm = Σ n_k·|gap_k| div N rides on every row
    * (constant), widened to DECIMAL(38,0) (DuckDB twin: HUGEINT) —
    * n_k·gap is O(n·1e6). The "is this quality score a probability
    * or just a ranking" audit run before thresholding a filter on it.
    *
    * Scale shape: one min/max aggregate broadcast back, one
    * map-side-combinable bin aggregate, one 10-row finish.
    *
    * Output: (bin, n, mean_score_ppm, pos_rate_ppm, gap_ppm, ece_ppm)
    * ordered by bin. */
  def calibrationBins(events: DataFrame, positive: Column,
                      scoreCol: String = "value"): DataFrame = {
    val q = events.select(
      expr(s"CAST(floor(CAST($scoreCol AS DOUBLE) * 1000) AS BIGINT)")
        .as("q"),
      positive.cast("long").as("y"))
    val mm = q.agg(min("q").as("qlo"), max("q").as("qhi"))
    val bins = q.crossJoin(broadcast(mm))
      .select(expr("least(9L, (q - qlo) * 10 div" +
          " greatest(qhi - qlo, 1L))").as("bin"),
        expr("(q - qlo) * 1000000 div greatest(qhi - qlo, 1L)")
          .as("s_ppm"), col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("s_ppm").as("ss"),
        sum("y").as("n_pos"))
      .select(col("bin"), col("n"),
        expr("ss div n").as("mean_score_ppm"),
        expr("n_pos * 1000000 div n").as("pos_rate_ppm"))
      .withColumn("gap_ppm",
        abs(col("mean_score_ppm") - col("pos_rate_ppm")))
    bins.crossJoin(broadcast(
        bins.agg(expr("CAST(sum(CAST(n AS DECIMAL(38,0)) * gap_ppm)" +
          " div sum(n) AS BIGINT)").as("ece_ppm"))))
      .select(col("bin"), col("n"), col("mean_score_ppm"),
        col("pos_rate_ppm"), col("gap_ppm"), col("ece_ppm"))
      .orderBy("bin")
  }

  /** LEAVE-ONE-DAY-OUT JACKKNIFE of a ratio metric (one row): the
    * ratio Σ purchase-value / Σ events in ppm, its nine-or-so
    * leave-one-day-out replicates θ_i = (S−s_i)·1e6 div (N−n_i), and
    * the jackknife variance (D−1)·Σ(θ_i−θ̄)² div D in ppm² — the
    * standard uncertainty estimate for RATIO metrics, whose naive
    * per-row variance is wrong because numerator and denominator
    * share rows (delta-method territory); day blocks also absorb
    * within-day correlation. No square root is taken (engine-exact);
    * compare jk_var_ppm2 across snapshots or take the root downstream.
    * The dev² sum is widened to DECIMAL(38,0) (DuckDB twin: HUGEINT).
    *
    * Scale shape: one map-side-combinable per-day conditional sum
    * (the only corpus pass); replicates and their moments run on the
    * bounded (days) table with totals broadcast back.
    *
    * Output: (n_days, theta_ppm, theta_dot_ppm, jk_var_ppm2). */
  def jackknifeRatio(events: DataFrame, positive: Column,
                     valueCol: String = "value"): DataFrame = {
    val daily = events
      .select(to_date(col("ts")).as("d"),
        expr(s"CAST(floor(CAST($valueCol AS DOUBLE) * 1000)" +
          " AS BIGINT)").as("q"),
        positive.cast("long").as("y"))
      .groupBy("d")
      .agg(sum(expr("CASE WHEN y = 1 THEN q ELSE 0 END")).as("s_i"),
        count(lit(1)).as("n_i"))
    val tot = daily.agg(sum("s_i").as("s"), sum("n_i").as("n"),
      count(lit(1)).as("d_days"))
    val reps = daily.crossJoin(broadcast(tot))
      .select(col("d_days"),
        // ×1e6 numerators widened: S is a corpus-sized milli sum
        expr("CAST(CAST(s AS DECIMAL(38,0)) * 1000000 div n" +
          " AS BIGINT)").as("theta_ppm"),
        expr("CAST(CAST(s - s_i AS DECIMAL(38,0)) * 1000000" +
          " div (n - n_i) AS BIGINT)").as("theta_i"))
    reps.groupBy("d_days", "theta_ppm")
      .agg(expr("sum(theta_i) div count(1)").as("theta_dot_ppm"),
        sum(expr("CAST(theta_i AS DECIMAL(38,0)) * theta_i")).as("tss"),
        sum("theta_i").as("ts1"), count(lit(1)).as("dd"))
      .select(col("d_days").as("n_days"), col("theta_ppm"),
        col("theta_dot_ppm"),
        // Σ(θi−θ̄)² = Σθi² − (Σθi)²/D, kept exact by scaling through
        // D: jk_var = (D−1)·(D·Σθi² − (Σθi)²) div D²
        expr("CAST((dd - 1) * (dd * tss" +
          " - CAST(ts1 AS DECIMAL(38,0)) * ts1)" +
          " div (CAST(dd AS DECIMAL(38,0)) * dd) AS BIGINT)")
          .as("jk_var_ppm2"))
  }

  /** SAMPLE-RATIO-MISMATCH TRAJECTORY (one row per day): daily
    * treated/control arrival counts under the caller's assignment,
    * the daily chi-square-vs-50/50 statistic (n_t−n_c)²·1e6 div
    * (n_t+n_c), and the same statistic on the CUMULATIVE counts — the
    * monitor that catches a broken randomizer mid-experiment (the
    * cumulative column is the one that trends when assignment is
    * subtly biased; the daily column isolates which day broke). The
    * squared deltas stay BIGINT — exact to ~3e9 arrivals/day.
    *
    * Scale shape: one map-side-combinable per-day conditional count;
    * the running sums are one window over the bounded day table.
    *
    * Output: (d, n_t, n_c, chi2_micro, cum_t, cum_c, cum_chi2_micro)
    * ordered by d. */
  def srmTrajectory(events: DataFrame, treated: Column): DataFrame =
    srmFromDaily(events
      .select(datediff(to_date(col("ts")), lit("1970-01-01"))
          .cast("bigint").as("d"),
        treated.cast("long").as("t"))
      .groupBy("d")
      .agg(sum("t").as("n_t"), sum(expr("1 - t")).as("n_c")))

  /** [[srmTrajectory]]'s finishing stage on an already-aggregated
    * (d, n_t, n_c) daily count table — exposed so the streaming
    * front door ([[graft.streaming.Streaming.streamSrm]]) can drain
    * its complete-mode state into the SAME running-chi-square
    * arithmetic (drained == batch, checked by the shared oracle). */
  def srmFromDaily(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_t", sum("n_t").over(w))
      .withColumn("cum_c", sum("n_c").over(w))
      .select(col("d"), col("n_t"), col("n_c"),
        expr("(n_t - n_c) * (n_t - n_c) * 1000000" +
          " div (n_t + n_c)").as("chi2_micro"),
        col("cum_t"), col("cum_c"),
        expr("(cum_t - cum_c) * (cum_t - cum_c) * 1000000" +
          " div (cum_t + cum_c)").as("cum_chi2_micro"))
      .orderBy("d")
  }

  /** POST-STRATIFIED treatment effect: users bucket by the bit
    * length of their PRE-period event count (the power-of-two strata
    * this repo's activity histograms use — heavy and light users
    * never average together), each stratum reports its own
    * treated-minus-control post-period mean difference in micro, and
    * ate_micro (on every row) recombines the strata weighted by
    * their user counts — the standard post-stratification estimator
    * that removes activity-mix imbalance a raw difference inherits.
    * Strata missing an arm are emitted with NULL diff and excluded
    * from the weighted ATE (their weight is not redistributable
    * without a model; documented, deterministic). The weighted sum
    * is widened to DECIMAL(38,0) (DuckDB twin: HUGEINT).
    *
    * Scale shape: one per-user conditional-sum pass (the only corpus
    * pass), one stratum aggregate on the bounded user table, the ATE
    * broadcast back onto the ≤64-row stratum table.
    *
    * Output: (stratum, n_t, n_c, mean_t_micro, mean_c_micro,
    * diff_micro, ate_micro) ordered by stratum. */
  def postStratifiedEffect(events: DataFrame, treated: Column,
                           post: Column,
                           valueCol: String = "value"): DataFrame = {
    val users = events
      .select(col("user_id"),
        expr(s"CAST(floor(CAST($valueCol AS DOUBLE) * 1000)" +
          " AS BIGINT)").as("q"),
        treated.as("t"), post.as("p"))
      .groupBy("user_id", "t")
      .agg(count(when(!col("p"), lit(1))).as("n_pre"),
        count(when(col("p"), lit(1))).as("n_post"),
        sum(when(col("p"), col("q"))).as("s_post"))
      .where(col("n_post") > 0)
      .select(col("t"),
        (length(bin(col("n_pre"))) - 1).cast("bigint").as("stratum"),
        expr("s_post div n_post").as("y"))
    val strata = users.groupBy("stratum")
      .agg(count(when(col("t"), lit(1))).as("n_t"),
        count(when(!col("t"), lit(1))).as("n_c"),
        sum(when(col("t"), col("y"))).as("sy_t"),
        sum(when(!col("t"), col("y"))).as("sy_c"))
      .select(col("stratum"), col("n_t"), col("n_c"),
        expr("CASE WHEN n_t > 0 THEN sy_t * 1000 div n_t END")
          .as("mean_t_micro"),
        expr("CASE WHEN n_c > 0 THEN sy_c * 1000 div n_c END")
          .as("mean_c_micro"))
      .withColumn("diff_micro",
        expr("mean_t_micro - mean_c_micro"))
    strata.crossJoin(broadcast(strata
        .where(col("diff_micro").isNotNull)
        .agg(expr("CAST(sum(CAST(n_t + n_c AS DECIMAL(38,0))" +
          " * diff_micro) div sum(n_t + n_c) AS BIGINT)")
          .as("ate_micro"))))
      .orderBy("stratum")
  }

  /** QUANTILE TREATMENT EFFECTS: the treated-minus-control gap at each
    * decile of the outcome distribution (type-1/discrete quantiles in
    * exact cents) — the distributional reading a mean difference
    * hides: an ATE of zero with a positive gap at p90 and a negative
    * one at p10 is a VARIANCE-increasing treatment, which ships very
    * differently from a no-op. Quantiles are histogram-folded
    * (10·cum ≥ k·n over the bounded value histogram — the repo's
    * type-1 rule, never float positions, never a per-arm sort).
    *
    * Scale shape: one corpus pass collapses each arm to its
    * (cents, count) histogram; deciles fold from the two bounded
    * histograms; the output is 9 rows.
    *
    * Output: (decile 1..9, q_t_cents, q_c_cents, qte_cents) ordered
    * by decile. */
  def quantileEffects(events: DataFrame, treated: Column): DataFrame =
    quantileEffectsFromHist(events
      .select(when(treated, 1L).otherwise(0L).as("t"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .groupBy("t", "cents").agg(count(lit(1)).as("c")))

  /** Serve-time finishing stage over the two bounded (t, cents, c)
    * arm histograms — exposed so the streaming monitor
    * ([[graft.streaming.Streaming.streamQte]]) drains its
    * complete-mode value-grid state into the SAME decile arithmetic
    * (drained == batch, checked by the shared oracle). */
  def quantileEffectsFromHist(h: DataFrame): DataFrame = {
    val w = Window.partitionBy("t").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = h.groupBy(col("t").as("t2")).agg(sum("c").as("n"))
    val q = h.withColumn("cum", sum("c").over(w))
      .join(tot, col("t") === col("t2"))
      .crossJoin(broadcast(
        h.sparkSession.range(1, 10).select(col("id").as("k"))))
      .where(col("cum") * 10 >= col("k") * col("n"))
      .groupBy("t", "k").agg(min("cents").as("q"))
    q.where(col("t") === 1L).select(col("k").as("decile"),
        col("q").as("q_t_cents"))
      .join(q.where(col("t") === 0L).select(col("k").as("decile"),
        col("q").as("q_c_cents")), Seq("decile"))
      .select(col("decile"), col("q_t_cents"), col("q_c_cents"),
        (col("q_t_cents") - col("q_c_cents")).as("qte_cents"))
      .orderBy("decile")
  }
}
