package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, RLike, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite `glob(col, 'literal')` — a black-box Scala
  * UDF — into a native `RLIKE` on the translated regex.
  *
  * Why it matters at scale: a UDF predicate is opaque to Catalyst — it
  * blocks whole-stage codegen at the filter, costs a serialization trip
  * per row, and can never participate in scan-level filtering. The
  * rewritten RLike is a codegen'd native expression evaluated inside
  * the scan's generated loop. Semantics are identical: the UDF anchors
  * its regex (\A...\z — ^/$ would let RLike's find-mode '$' match
  * before a trailing newline) and `RLike` uses the same Java regex
  * engine, and
  * both null-propagate on a null input column; the rewrite only fires
  * for a literal pattern (a dynamic pattern keeps the UDF).
  *
  * Registered two ways: injected by [[graft.GraftExtensions]]
  * (spark.sql.extensions packaging), and added to
  * `spark.experimental.extraOptimizations` by Dialect.register for
  * sessions that opt into the SQLite shims at runtime.
  */
object GlobToRLike extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case u: ScalaUDF
          if u.udfName.contains("glob") && u.children.size == 2 &&
            u.dataType == org.apache.spark.sql.types.BooleanType &&
            u.children(1).isInstanceOf[Literal] &&
            u.children(1).dataType == StringType &&
            u.children(1).asInstanceOf[Literal].value != null =>
        val pat = u.children(1).asInstanceOf[Literal].value
          .asInstanceOf[UTF8String].toString
        RLike(u.children.head,
          Literal(graft.engine.Dialect.globToRegex(pat)))
    }
}
