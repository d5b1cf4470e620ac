package graft.ext

import org.apache.spark.sql.DataFrame
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
}
