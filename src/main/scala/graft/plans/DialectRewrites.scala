package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, StringType, TimestampType}

/** Optimizer rules eliminating the remaining Dialect UDFs from hot
  * paths where a bit-identical native expression exists (same story as
  * [[GlobToRLike]]: a Scala UDF blocks whole-stage codegen and pays a
  * per-row serialization trip; the rewrite keeps the SQLite-dialect
  * SURFACE while restoring builtin execution).
  *
  *  - julianday(ts)  ->  unix_millis(ts) / 86400000.0 + 2440587.5
  *    The UDF computes exactly `ts.getTime / 86400000.0 + 2440587.5`;
  *    `unix_millis` IS getTime, and / + on doubles are IEEE ops the
  *    interpreter and codegen evaluate identically — bit-equal output.
  *  - quote(s)  ->  CASE WHEN s IS NULL THEN 'NULL'
  *                       ELSE concat('\'', replace(s, '\'', '\'\''), '\'')
  *    String-for-string the UDF's logic.
  *
  * (typeof and sqlite_date stay UDFs: typeof dispatches on the runtime
  * class and sqlite_date's modifier grammar has no single-expression
  * equivalent; neither appears in a filter/scan hot path.)
  */
object DialectRewrites extends Rule[LogicalPlan] {

  private def quoteOf(s: Expression): Expression =
    If(IsNull(s), Literal("NULL"),
      Concat(Seq(Literal("'"),
        StringReplace(s, Literal("'"), Literal("''")), Literal("'"))))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case u: ScalaUDF
          if u.udfName.contains("julianday") && u.children.size == 1 &&
            u.children.head.dataType == TimestampType =>
        Add(
          Divide(
            Cast(UnixMillis(u.children.head), DoubleType),
            Literal(86400000.0)),
          Literal(2440587.5))
      case u: ScalaUDF
          if u.udfName.contains("quote") && u.children.size == 1 &&
            u.children.head.dataType == StringType =>
        quoteOf(u.children.head)
    }
}
