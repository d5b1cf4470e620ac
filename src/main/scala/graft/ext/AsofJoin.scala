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

  /** FORWARD as-of join: for each left row, the EARLIEST right row
    * with `rightTs >= leftTs` on the same key — the mirror of
    * [[asofJoin]] ("what happened next": the next quote after a
    * trade, the next purchase after a signup, the label observed
    * after a feature snapshot). Identical single-shuffle union+window
    * shape, just ordered descending: walking ts from the future
    * backwards, the last right payload seen IS the nearest future
    * right. Inclusive >=: a right row at the same timestamp matches
    * (right sorts before left at equal ts in the reversed order too).
    * Same uniqueness contract: `right` unique per (key, ts). */
  def asofJoinForward(left: DataFrame, right: DataFrame,
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
    val w = Window.partitionBy("_k").orderBy(col("_t").desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === 1 && col("_match").isNotNull)
      .select(col("_lp").as("l"), col("_match").as("asof"))
  }

  /** NEAREST as-of join: for each left row, the right row minimizing
    * |rightTs - leftTs| on the same key, ties broken toward the PAST
    * (the backward match) — the alignment sensor-fusion and
    * feature-attachment pipelines want when "most recent" is wrong
    * for rows that sit just before a burst of fresh state. Rows with
    * no right row on their key at all drop (inner).
    *
    * Same single-shuffle discipline as [[asofJoin]]: ONE union, one
    * exchange on the key, and two in-partition sorted windows (asc
    * carrying the latest past (ts, payload), desc carrying the
    * earliest future one) — never an inequality join, no pair
    * blowup. Timestamps are normalized to BIGINT microseconds inside
    * the operator so the delta arithmetic is engine-exact.
    *
    * Output: (l: struct(leftCols), asof: rightPayload, dir 'b'|'f',
    * delta_us >= 0). Same uniqueness contract: right unique per
    * (key, ts). */
  def asofNearest(left: DataFrame, right: DataFrame,
                  leftKey: Column, rightKey: Column,
                  leftTs: Column, rightTs: Column,
                  leftCols: Seq[Column], rightPayload: Column): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    def us(df: DataFrame, ts: Column): Column =
      if (df.select(ts).schema.head.dataType == TimestampType)
        unix_micros(ts)
      else ts.cast("bigint")
    val rpT = right.select(rightPayload).schema.head.dataType
    val lpT = left.select(struct(leftCols: _*)).schema.head.dataType
    val l = left.select(
      leftKey.as("_k"), us(left, leftTs).as("_t"), lit(1).as("_side"),
      struct(leftCols: _*).as("_lp"), lit(null).cast(rpT).as("_rp"))
    val r = right.select(
      rightKey.as("_k"), us(right, rightTs).as("_t"), lit(0).as("_side"),
      lit(null).cast(lpT).as("_lp"), rightPayload.as("_rp"))
    val wB = Window.partitionBy("_k").orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("_k").orderBy(col("_t").desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cand = when(col("_side") === 0,
      struct(col("_t").as("t"), col("_rp").as("p")))
    l.unionByName(r)
      .withColumn("_b", last(cand, ignoreNulls = true).over(wB))
      .withColumn("_f", last(cand, ignoreNulls = true).over(wF))
      .where(col("_side") === 1 &&
        (col("_b").isNotNull || col("_f").isNotNull))
      .withColumn("_useB", col("_f").isNull || (col("_b").isNotNull &&
        col("_t") - col("_b.t") <= col("_f.t") - col("_t")))
      .select(col("_lp").as("l"),
        when(col("_useB"), col("_b.p")).otherwise(col("_f.p")).as("asof"),
        when(col("_useB"), lit("b")).otherwise(lit("f")).as("dir"),
        when(col("_useB"), col("_t") - col("_b.t"))
          .otherwise(col("_f.t") - col("_t")).as("delta_us"))
  }
}
