package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to build a [[Column]] from a raw Catalyst [[Expression]]
  * without going through the session function registry.
  *
  * Exists for graft's INTERNAL kernel expressions whose input contract
  * is unchecked (e.g. [[graft.functions.SortedIntersectSize]]: sorted,
  * duplicate-free, no-null arrays — whatever sort_array(collect_list)
  * over a distinct set emits). Registering those as session-wide SQL
  * temp functions would let any later SQL on a shared session (a REPL
  * user, say) call them on arbitrary arrays and silently get wrong
  * counts; building the Column directly keeps them out of the
  * user-visible registry entirely (ADVICE r13). Spark 4 removed the
  * public Column(Expression) constructor, and the replacement
  * (classic.ExpressionUtils.column) is private[sql] — hence this
  * one-line shim in the sql package, the standard extension idiom.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
