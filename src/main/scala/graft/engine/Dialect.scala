package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions.{coalesce, col, lit, sum}
import org.apache.spark.sql.types._

/** SQLite-dialect shims (SURVEY.md §2.5 scalar table): the handful of
  * SQLite functions a reference user would expect that Spark does not
  * spell the same way. Registered as SQL functions so `spark.sql`
  * accepts reference-style queries.
  *
  * Kept deliberately small: everything else in the SQLite surface maps
  * to a same-name or trivially-renamed Spark builtin (see SURVEY.md),
  * and builtins stay inside whole-stage codegen. These UDFs sit on the
  * slow path only when a query actually uses a SQLite-ism.
  */
object Dialect {

  /** Unix-glob -> regex (for SQLite GLOB). Supports * ? [set].
    * Anchored with \A...\z, not ^...$: under String.matches (the UDF)
    * both spell "whole string", but the optimizer rewrite
    * (graft.plans.GlobToRLike) evaluates via Matcher.find, where '$'
    * also matches just before a trailing '\n' — \z keeps the two
    * evaluation paths bit-identical on newline-terminated values. */
  private[graft] def globToRegex(glob: String): String = {
    val sb = new StringBuilder("\\A")
    var i = 0
    while (i < glob.length) {
      glob(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val close = glob.indexOf(']', i + 1)
          if (close < 0) { sb.append("\\[") }
          else { sb.append(glob.substring(i, close + 1)); i = close }
        case c if "\\.^$+{}()|".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append("\\z").toString
  }

  /** GROUPS-frame window emulation — the one window-frame mode the
    * reference reaches through its delegated SQLite >= 3.28 dialect
    * (/root/reference/localsql/localsql.py:230; README.md:39-40) that
    * Spark has no native spelling for. Identity used:
    *
    *   agg(x) OVER (PARTITION BY p ORDER BY o
    *                GROUPS BETWEEN nPrec PRECEDING AND nFoll FOLLOWING)
    *
    * == the same agg over a ROWS frame on the DISTINCT peer-group
    * table. A GROUPS frame steps in whole peer groups (rows tied on the
    * ORDER BY value), so collapsing each peer group to one row carrying
    * its partial aggregate turns the GROUPS frame into a plain ROWS
    * frame, after which the framed value joins back to the detail rows
    * by (p, o) — every row in a peer group shares the frame result by
    * definition.
    *
    * Scale shape: one keyed partial aggregation (map-side combinable),
    * a window over the DISTINCT-(p, o) table (strictly smaller than the
    * input; partitioned by p, never a global sort), one equi-join back.
    * No range self-join, no row explosion.
    *
    * `partial` aggregates one peer group (e.g. sum(cents)); `combine`
    * merges partials across the frame — sum for sum/count, min/max for
    * min/max (any aggregate with a mergeable partial form works; an
    * avg is sum/count of two partials).
    *
    * Returns df's rows with `out` appended. */
  def groupsFrame(df: DataFrame, partCols: Seq[String], ordCol: String,
                  nPrec: Int, nFoll: Int, partial: Column, out: String,
                  combine: Column => Column = sum): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = partCols :+ ordCol
    val groups = df.groupBy(keys.map(col): _*).agg(partial.as("_gpart"))
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(ordCol)).rowsBetween(-nPrec.toLong, nFoll.toLong)
    val framed = groups
      .withColumn(out, combine(col("_gpart")).over(w)).drop("_gpart")
    df.join(framed, keys)
  }

  /** EXCLUDE-clause window emulation — the last window-frame dialect
    * row (SQLite >= 3.28 / standard SQL:2011 frame exclusion) with no
    * native Spark spelling. Each mode is an exact algebraic identity
    * on sums of frame/peer/current contributions, so Spark computes it
    * with one or two plain windows — no self-join, no row explosion:
    *
    *  - EXCLUDE CURRENT ROW over a ROWS frame:
    *      sum(frame) − current            (requires a UNIQUE total
    *      order — a ROWS frame over tied keys is nondeterministic in
    *      ANY engine, so a tie-broken order is a correctness
    *      precondition, not a limitation);
    *  - EXCLUDE GROUP over a RANGE frame:
    *      sum(frame) − sum(peers)         (a RANGE frame always
    *      contains the full peer group, so the subtraction is exact);
    *  - EXCLUDE TIES over a RANGE frame:
    *      sum(frame) − sum(peers) + current.
    *
    * `peers` is the partition-plus-order-value window (no frame): all
    * rows tied with the current one. Null values contribute nothing
    * to any sum, matching the native EXCLUDE semantics. */
  def sumExcludeCurrentRow(value: Column, rows: WindowSpec): Column = {
    import org.apache.spark.sql.functions.{count, when}
    // native sum over an empty/all-null surviving set is NULL, and the
    // subtraction identity would answer 0 — gate on the surviving
    // non-null count so the emulation is NULL-faithful
    val others = count(value).over(rows) -
      when(value.isNotNull, 1L).otherwise(0L)
    when(others === 0, lit(null))
      .otherwise(sum(value).over(rows) - coalesce(value, lit(0L)))
  }

  def sumExcludeGroup(value: Column, range: WindowSpec,
                      peers: WindowSpec): Column = {
    import org.apache.spark.sql.functions.{count, when}
    val others = count(value).over(range) - count(value).over(peers)
    when(others === 0, lit(null))
      .otherwise(sum(value).over(range) - sum(value).over(peers))
  }

  def sumExcludeTies(value: Column, range: WindowSpec,
                     peers: WindowSpec): Column = {
    import org.apache.spark.sql.functions.{count, when}
    val surviving = count(value).over(range) - count(value).over(peers) +
      when(value.isNotNull, 1L).otherwise(0L)
    when(surviving === 0, lit(null))
      .otherwise(sum(value).over(range) - sum(value).over(peers) +
        coalesce(value, lit(0L)))
  }

  def register(spark: SparkSession): Unit = {
    // glob-on-literal rewrites to a native codegen'd RLIKE (see
    // graft.plans.GlobToRLike); idempotent add
    val rules = Seq(graft.plans.GlobToRLike, graft.plans.DialectRewrites)
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
    // SQLite typeof(x): storage-class name of the value
    spark.udf.register("typeof", (x: Any) => x match {
      case null => "null"
      case _: Long | _: Int | _: Short | _: Byte | _: Boolean => "integer"
      case _: Double | _: Float => "real"
      case _: Array[Byte] => "blob"
      case _ => "text"
    })
    // SQLite GLOB: case-sensitive unix glob match
    spark.udf.register("glob", (s: String, pat: String) =>
      if (s == null || pat == null) null.asInstanceOf[java.lang.Boolean]
      else java.lang.Boolean.valueOf(s.matches(globToRegex(pat))))
    // SQLite quote(x): SQL-literal form of a value
    spark.udf.register("quote", (s: String) =>
      if (s == null) "NULL" else "'" + s.replace("'", "''") + "'")
    // SQLite julianday(date): days since noon UTC, 24 Nov 4714 BC
    spark.udf.register("julianday", (ts: java.sql.Timestamp) =>
      if (ts == null) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf(ts.getTime / 86400000.0 + 2440587.5))
    // SQLite date-modifier strings: datetime(ts, '+1 day') etc.
    // (SURVEY.md §2.5 scalar table: "modifier strings need a translation
    // helper"). Supports the common modifiers; unknown -> error.
    spark.udf.register("sqlite_date", (ts: java.sql.Timestamp, mod: String) =>
      if (ts == null || mod == null) null else applyModifier(ts, mod.trim))
  }

  private val NumUnit = """([+-]?\d+)\s+(day|days|month|months|year|years|hour|hours|minute|minutes|second|seconds)""".r

  private[engine] def applyModifier(ts: java.sql.Timestamp, mod: String): java.sql.Timestamp = {
    val utc = java.time.ZoneOffset.UTC
    val t = ts.toInstant.atZone(utc)
    val out = mod.toLowerCase match {
      case NumUnit(n, unit) =>
        val k = n.toLong
        unit.stripSuffix("s") match {
          case "day"    => t.plusDays(k)
          case "month"  => t.plusMonths(k)
          case "year"   => t.plusYears(k)
          case "hour"   => t.plusHours(k)
          case "minute" => t.plusMinutes(k)
          case "second" => t.plusSeconds(k)
        }
      case "start of day"   => t.toLocalDate.atStartOfDay(utc)
      case "start of month" => t.toLocalDate.withDayOfMonth(1).atStartOfDay(utc)
      case "start of year"  => t.toLocalDate.withDayOfYear(1).atStartOfDay(utc)
      case other => throw new IllegalArgumentException(s"unsupported modifier: $other")
    }
    java.sql.Timestamp.from(out.toInstant)
  }
}
