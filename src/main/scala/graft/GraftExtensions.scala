package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FloatDot, QuantDot, StripAccents}

/** SparkSessionExtensions entry point: makes the graft native functions
  * available in ANY session via standard Spark configuration —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * This is the library-packaging path for custom Catalyst code
  * (SURVEY.md §2.6): no imperative registration calls needed; the
  * functions resolve in pure SQL on every executor-submitted query,
  * exactly like builtins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.GlobToRLike)
    ext.injectOptimizerRule(_ => graft.plans.DialectRewrites)
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("quant_dot"),
      new ExpressionInfo(classOf[QuantDot].getName, "quant_dot"),
      (children: Seq[Expression]) => QuantDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (children: Seq[Expression]) => StripAccents(children.head)))
  }
}
