package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd int-quantized dot product over two array<float> columns:
  * sum_i floor(a_i * 10^4) * floor(b_i * 10^4) as BIGINT.
  *
  * Semantically identical to the SQL formulation used by the DuckDB
  * oracle (floor of a double product is engine-exact), but evaluated in
  * one fused loop inside whole-stage codegen. The `zip_with` +
  * `aggregate` higher-order-function formulation it replaces walks an
  * interpreter lambda per element and allocates two intermediate
  * arrays per pair — at N^2 pair volume that interpreter tax dominates
  * the whole near-dup job.
  */
case class QuantDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quant_dot expects (array<float>, array<float>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "quant_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(x.getFloat(i).toDouble * 10000d).toLong *
             math.floor(y.getFloat(i).toDouble * 10000d).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) java.lang.Math.floor((double) $a.getFloat($i) * 10000d)
         |        * (long) java.lang.Math.floor((double) $b.getFloat($i) * 10000d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantDot =
    copy(left = newLeft, right = newRight)
}

object QuantDot {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quant_dot", exprs => QuantDot(exprs(0), exprs(1)), "built-in")
}
