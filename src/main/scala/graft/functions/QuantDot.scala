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

  // each side may independently be array<float> or array<double> —
  // float elements widen to double exactly, so the quantization is the
  // same arithmetic either way
  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (Seq(left, right).forall(e => elemOk(e.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quant_dot expects array<float|double> on both sides, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "quant_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left.dataType), isFloat(right.dataType))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += math.floor(xv * 10000d).toLong * math.floor(yv * 10000d).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, float: Boolean) =
        if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) java.lang.Math.floor(${get(a, isFloat(left.dataType))} * 10000d)
         |        * (long) java.lang.Math.floor(${get(b, isFloat(right.dataType))} * 10000d);
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
