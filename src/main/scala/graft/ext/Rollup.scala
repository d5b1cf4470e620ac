package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (mergeable-state) aggregation (beyond-reference,
  * SURVEY.md §2.8): the daily-rollup pattern every 100 TB pipeline
  * runs. Recomputing a corpus-wide aggregate from scratch on each new
  * batch rescans everything ever ingested; the incremental shape
  * materializes per-key PARTIAL aggregation state for each batch and
  * folds new batches into the running state — each refresh touches
  * only the delta.
  *
  * That only works when the state is ALGEBRAIC: count/sum/min/max
  * merge by sum/sum/min/max, and derived statistics (mean here) are
  * computed at read time from merged state, never stored. Merging is
  * associative and commutative, so partials can be produced per day,
  * per shard, per region — in any grouping, in any order — and still
  * fold to exactly the full-scan answer, which is what the x134 oracle
  * checks (merged halves == one-pass aggregation, hash-exact).
  */
object Rollup {

  private val stateCols = Seq("n", "total_cents", "min_cents", "max_cents")

  /** Per-key algebraic state for one batch: (key, n, total_cents,
    * min_cents, max_cents). Values enter as exact integer cents so
    * merge order cannot move a floating-point sum. */
  def partials(batch: DataFrame, key: String, value: Column): DataFrame = {
    val cents = floor(value * 100).cast("bigint")
    batch.groupBy(key).agg(
      count(lit(1)).as("n"),
      sum(cents).as("total_cents"),
      min(cents).as("min_cents"),
      max(cents).as("max_cents"))
  }

  /** Fold any number of partial-state frames into one: sum the sums,
    * min the mins, max the maxes. One union + one keyed aggregation
    * over |keys| x |batches| STATE rows — the raw batches are never
    * rescanned. */
  def merge(key: String, parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "merge needs at least one partial frame")
    parts.reduce(_.unionByName(_)).groupBy(key).agg(
      sum("n").as("n"),
      sum("total_cents").as("total_cents"),
      min("min_cents").as("min_cents"),
      max("max_cents").as("max_cents"))
  }

  /** Read-time view over merged state: derived mean (integer cents)
    * alongside the algebraic columns. Spark's `div` and DuckDB's `//`
    * BOTH truncate toward zero (verified against the oracle's duckdb
    * 1.0.0: -7 // 2 = -3), so plain `div` is engine-exact for negative
    * totals too — no floor correction (one would silently diverge from
    * the oracle exactly when total_cents is negative with a nonzero
    * remainder; ExtSpec exercises that case). */
  def withMean(merged: DataFrame, key: String): DataFrame =
    merged.select(col(key) +: stateCols.map(col) :+
        expr("total_cents div n").as("mean_cents"): _*)
      .orderBy(key)

  /** Two-level hierarchical contribution report: child value, its
    * share of the parent subtotal and of the grand total — both in
    * exact basis points (integer cross-multiplication, no float
    * share) — the percent-of-parent drill-down every revenue review
    * reads. Shares are child-cents · 10000 div parent-cents, so rows
    * sum to ≤ 10000 bp per parent with truncation remainder, never
    * over.
    *
    * Scale shape: the fact table collapses to the (l1, l2) grid in
    * one map-side-combinable aggregation; parent subtotals and the
    * 1-row total are grid-sized broadcasts. Nothing after the first
    * aggregation scales with fact rows.
    *
    * Output: (l1, l2, cents, share_of_parent_bp, share_of_total_bp),
    * ordered by (l1, l2). */
  def hierarchyShares(fact: DataFrame, l1: String, l2: String,
                      valueCents: Column): DataFrame = {
    val per = fact.groupBy(col(l1).as("g1"), col(l2).as("g2"))
      .agg(sum(valueCents.cast("bigint")).as("cents"))
    val perL1 = per.groupBy("g1").agg(sum("cents").as("l1_cents"))
    val tot = per.agg(sum("cents").as("total"))
    per.join(broadcast(perL1), Seq("g1")).crossJoin(broadcast(tot))
      .select(col("g1").as(l1), col("g2").as(l2), col("cents"),
        expr("cents * 10000L div l1_cents").as("share_of_parent_bp"),
        expr("cents * 10000L div total").as("share_of_total_bp"))
      .orderBy(l1, l2)
  }

  /** COUNT-MIN sketch calibration audit — the sketch-vs-truth table
    * that sizes a heavy-hitter sketch before it serves alone: every
    * key's exact count beside its count-min estimate (min over
    * `depth` hash rows of `width` bucket sums). The estimate can only
    * OVERCOUNT (collisions add, never subtract) — est >= exact is a
    * structural invariant the spec pins — and the audit shows whether
    * depth×width is tight enough for the tail before the exact side
    * is dropped at 100 TB.
    *
    * The sketch itself is the depth×width-row keyed aggregation — the
    * mergeable partial that actually ships (same algebra as
    * [[partials]]/[[merge]]: bucket sums merge by +). Bucket hashes
    * are md5-derived (first 8 hex chars mod width), so the whole
    * construction is deterministic and engine-portable — the oracle
    * re-derives every bucket with a hex fold and matches hash-exact.
    *
    * Output: (key, exact_cnt, est_cnt), ordered by key. */
  def countMinCalibration(events: DataFrame, keyCol: String,
                          depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 2 && width <= 65536,
      s"depth in [1,16], width in [2,65536]; got $depth x $width")
    val bucket = expr(
      s"CAST(conv(substr(md5(concat(CAST(seed AS STRING), ':', t)), " +
        s"1, 8), 16, 10) AS BIGINT) % $width")
    val keyed = events.select(col(keyCol).cast("string").as("t"))
    val sketch = keyed
      .select(col("t"), explode(expr(s"sequence(0, ${depth - 1})"))
        .as("seed"))
      .withColumn("b", bucket)
      .groupBy("seed", "b").agg(count(lit(1)).as("c"))
    val exact = keyed.groupBy("t").agg(count(lit(1)).as("exact_cnt"))
    exact
      .select(col("t"), col("exact_cnt"),
        explode(expr(s"sequence(0, ${depth - 1})")).as("seed"))
      .withColumn("b", bucket)
      .join(broadcast(sketch), Seq("seed", "b"))
      .groupBy(col("t").as(keyCol))
      .agg(max("exact_cnt").as("exact_cnt"), min("c").as("est_cnt"))
      .orderBy(keyCol)
  }
}
