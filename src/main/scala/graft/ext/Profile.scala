package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling (beyond-reference, SURVEY.md §2.8): the
  * null/cardinality summary a pipeline computes before trusting a new
  * data drop — the distributed analog of the reference's `df.info()`
  * catalog surface (localsql/localsql.py:226-228).
  *
  * Scale shape: ONE pass over the table — all per-column aggregates run
  * in a single aggregation (Catalyst plans the multiple DISTINCTs via
  * Expand), then the 1-row wide result is stacked to one row per column
  * driver-side-free. Never one scan per column: at 100 TB, 6 columns
  * must not mean 6 table reads.
  */
object Profile {

  /** (col_name, n_rows, n_null, n_distinct) for every column of df. */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null__$c"),
      countDistinct(col(c)).as(s"dist__$c"))) :+ count(lit(1)).as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stack = cols
      .map(c => s"'$c', `null__$c`, `dist__$c`")
      .mkString(s"stack(${cols.length}, ", ", ", ") AS (col_name, n_null, n_distinct)")
    one.select(col("n_rows"), expr(stack))
      .select("col_name", "n_rows", "n_null", "n_distinct")
      .orderBy("col_name")
  }
}
