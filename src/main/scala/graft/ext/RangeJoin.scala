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
    * @return all (point, interval) pairs with start <= ts <= end (and
    *         keyCond), refined exactly. */
  def bucketed(points: DataFrame, intervals: DataFrame,
               pointTs: Column, start: Column, end: Column,
               bucketWidth: Long,
               keyCond: Column = lit(true)): DataFrame = {
    val p = points.withColumn("_bucket",
      floor(pointTs.cast("double") / bucketWidth).cast("bigint"))
    val iv = intervals.withColumn("_bucket",
      explode(sequence(
        floor(start.cast("double") / bucketWidth).cast("bigint"),
        floor(end.cast("double") / bucketWidth).cast("bigint"))))
    p.join(iv,
      p("_bucket") === iv("_bucket") && keyCond &&
        pointTs >= start && pointTs <= end)
      .drop("_bucket")
  }
}
