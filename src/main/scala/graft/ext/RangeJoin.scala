package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: `points.ts BETWEEN intervals.start AND
  * intervals.end` (plus an optional equi-key), executed as an EQUI-join
  * on a coarse time bucket instead of the nested-loop inequality join
  * Spark plans for a raw BETWEEN predicate (BroadcastNestedLoopJoin —
  * every point against every interval, the O(n*m) trap).
  *
  * The decomposition: each interval is exploded to the buckets it
  * overlaps (`sequence(floor(start/w), floor(end/w))`), each point maps
  * to exactly one bucket, and the join becomes `point.bucket ==
  * interval.bucket` refined by the exact BETWEEN — a shuffled hash join
  * that partitions by bucket and scales out. Replication factor is
  * avg(interval length / w) + 1, so `w` trades shuffle volume against
  * per-bucket fan-in; skewed buckets fall to AQE or salting like any
  * hot equi-key.
  *
  * This is the standard engine rewrite for interval joins (Spark has no
  * native one in batch; Databricks' range-join hint does exactly this),
  * and the batch twin of the stream-stream interval join (x96). The
  * as-of join ([[AsofJoin]]) covers the "latest before" special case;
  * this covers full containment.
  */
object RangeJoin {

  /** @param points  `pointTs` must be a numeric column (epoch
    *                 seconds/days); one bucket per point
    * @param intervals side with `start`/`end` columns, `end >= start`
    * @param bucketWidth bucket size in the same numeric unit
    * @param keyCond optional extra equi-condition (e.g. same-user);
    *                `lit(true)` for a pure (key-less) interval join —
    *                the case where a raw BETWEEN would otherwise plan a
    *                nested loop over the whole cross product
    * @param maxBucketsPerInterval replication-factor guard: an interval
    *                spanning more buckets than this fails the job with a
    *                message naming the width choice, instead of building
    *                a near-2^31-element explode array (Spark's sequence
    *                cap) from one malformed/huge interval or a too-small
    *                bucketWidth (ADVICE r3). Inverted intervals
    *                (end < start) fail the same way rather than silently
    *                producing an empty/backwards sequence.
    * @return all (point, interval) pairs with start <= ts <= end (and
    *         keyCond), refined exactly. */
  def bucketed(points: DataFrame, intervals: DataFrame,
               pointTs: Column, start: Column, end: Column,
               bucketWidth: Long,
               keyCond: Column = lit(true),
               maxBucketsPerInterval: Long = 1 << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive; got $bucketWidth")
    val p = points.withColumn("_bucket",
      floor(pointTs.cast("double") / bucketWidth).cast("bigint"))
    val lo = floor(start.cast("double") / bucketWidth).cast("bigint")
    val hi = floor(end.cast("double") / bucketWidth).cast("bigint")
    // data-dependent guard: validated per row at explode time, so misuse
    // fails fast with the width in the message, not with an opaque
    // sequence-length/OOM error deep in the shuffle
    val hiChecked =
      when(end < start, raise_error(format_string(
        "RangeJoin.bucketed: interval end < start (start=%s, end=%s)",
        start, end)))
      .when(hi - lo >= maxBucketsPerInterval, raise_error(format_string(
        s"RangeJoin.bucketed: interval [%s, %s] spans %s buckets at " +
          s"bucketWidth=$bucketWidth (cap $maxBucketsPerInterval); raise " +
          "bucketWidth or pre-filter oversized intervals",
        start, end, hi - lo + lit(1L))))
      .otherwise(hi)
    val iv = intervals.withColumn("_bucket", explode(sequence(lo, hiChecked)))
    p.join(iv,
      p("_bucket") === iv("_bucket") && keyCond &&
        pointTs >= start && pointTs <= end)
      .drop("_bucket")
  }
}
