package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** One judged query: a Spark implementation plus (optionally) equivalent
  * ANSI SQL the driver runs in DuckDB on the same parquet tables.
  *
  * Conventions that keep the hash-compare deterministic across engines:
  *  - every query has a TOTAL order (unique tie-break column in ORDER BY);
  *  - double SUMs go through a decimal cast (see [[Sql.dsum]]) so the
  *    result does not depend on accumulation order;
  *  - no raw timestamp output columns (cast to DATE or epoch seconds) —
  *    Spark writes tz-adjusted parquet timestamps, DuckDB naive ones;
  *  - integer SUMs are CAST(... AS BIGINT) in the oracle because DuckDB
  *    widens sum(BIGINT) to HUGEINT (which pandas reads as float).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Query whose SQL text is valid and equivalent in BOTH Spark SQL and
    * DuckDB — the text itself is the oracle, so there is zero drift. */
  def sql(name: String, text: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(text) }, Some(text))

  /** Query needing dialect-specific texts (function name deltas). */
  def sql2(name: String, sparkText: String, duckText: String): Q =
    Q(name, (s, dir) => { Tables.registerAll(s, dir); s.sql(sparkText) }, Some(duckText))

  /** DataFrame-API implementation with a DuckDB oracle. */
  def df(name: String, fn: (SparkSession, String) => DataFrame, duckText: String): Q =
    Q(name, fn, Some(duckText))

  /** Not expressible in DuckDB SQL — driver records a rows-only check. */
  def dfOnly(name: String, fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  def toQueries(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap

  def toOracle(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** SQL-text helpers shared by the query catalog. */
object Sql {
  /** Deterministic sum of a double monetary expression: cast the operand
    * to exact DECIMAL so the sum is order-independent, then back to
    * DOUBLE (rounded) for a stable, engine-neutral output type. */
  def dsum(decExpr: String, alias: String, scale: Int = 2): String =
    // round the exact DECIMAL first, THEN cast: rounding after the double
    // cast hits half-even/half-up tie deltas between engines on x.xx5.
    s"CAST(round(sum($decExpr), $scale) AS DOUBLE) AS $alias"

  /** Money column as exact decimal. */
  def dec(col: String): String = s"CAST($col AS DECIMAL(18,2))"

  /** Small factor (rates like 1-discount) as exact decimal. */
  def frac(expr: String): String = s"CAST($expr AS DECIMAL(8,6))"

  /** Order-insensitive average of doubles (error ~1e-9 relative, safe
    * under round-4). */
  def davg(expr: String, alias: String, scale: Int = 4): String =
    s"round(avg($expr), $scale) AS $alias"

  def bigint(expr: String, alias: String): String =
    s"CAST($expr AS BIGINT) AS $alias"
}
