package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the latest right row with
  * `rightTs <= leftTs` on the same key — the join training pipelines
  * use to attach the most recent state/label to an event. Spark has no
  * native ASOF JOIN; the standard range-join rewrite explodes into an
  * inequality join (O(n*m) per key in the worst case).
  *
  * This implementation is the union+window formulation: tag both sides,
  * union them, and run ONE window over (key, ts) carrying the last
  * right payload forward. Cost: a single shuffle on the key + a sort
  * within partitions — linear in total rows, no pair blowup, and it
  * inherits Spark's spill handling for hot keys. This is the shape that
  * survives 100 TB; the nested-loop rewrite does not.
  *
  * Right rows at the same timestamp as a left row ARE visible to it
  * (inclusive <=), matching DuckDB/kdb ASOF semantics. The right side
  * must be unique per (key, ts) — pre-aggregate ties or the carried
  * payload is nondeterministic.
  */
object AsofJoin {

  /** @param right unique per (rightKey, rightTs)
    * @return left rows (only those with a match — inner asof) plus the
    *         matched right payload column. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTs: Column, rightTs: Column,
               leftCols: Seq[Column], rightPayload: Column): DataFrame = {
    val l = left.select(
      leftKey.as("_k"), leftTs.as("_t"), lit(1).as("_side"),
      struct(leftCols: _*).as("_lp"), lit(null).cast(
        right.select(rightPayload).schema.head.dataType).as("_rp"))
    val r = right.select(
      rightKey.as("_k"), rightTs.as("_t"), lit(0).as("_side"),
      lit(null).cast(left.select(struct(leftCols: _*)).schema.head.dataType).as("_lp"),
      rightPayload.as("_rp"))
    // right (side=0) sorts before left (side=1) at equal _t -> inclusive
    val w = Window.partitionBy("_k").orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === 1 && col("_match").isNotNull)
      .select(col("_lp").as("l"), col("_match").as("asof"))
  }
}
