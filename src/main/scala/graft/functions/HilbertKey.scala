package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd Hilbert-curve index of a 2-D point: the distance along the
  * order-`bits` Hilbert curve of the cell (x mod 2^bits, y mod 2^bits).
  *
  * Why it exists beside [[graft.ext.Layout.zorderKey]]: both linearize
  * 2-D space for zone-map clustering, but the Hilbert curve has no
  * Z-order "seams" — consecutive curve positions are always grid
  * NEIGHBORS (|Δx|+|Δy| = 1), so a range of curve positions maps to a
  * tighter bounding box and a clustered write prunes more files for
  * the same predicate. The cost is that the index is a genuine loop
  * with data-dependent rotation state (the classic xy2d walk), which
  * as a composed Column expression would blow up exponentially —
  * every round substitutes the previous round's x and y twice. As a
  * native expression it is eight iterations of straight-line integer
  * code inside whole-stage codegen.
  *
  * Algorithm: the standard xy2d quadrant-rotation walk (public
  * knowledge, e.g. Hamilton's compact Hilbert indices / the well-known
  * Wikipedia formulation): for s = 2^(bits-1) .. 1, accumulate
  * s²·((3·rx) xor ry) and rotate/reflect the lower quadrant.
  * Pure integer arithmetic — bit-identical in any engine; the DuckDB
  * oracle runs the same rounds unrolled as SQL CTEs
  * ([[graft.ext.Layout.hilbertSqlRounds]]).
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  private def intLike(dt: DataType): Boolean = dt match {
    case IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (intLike(left.dataType) && intLike(right.dataType) &&
        bits >= 1 && bits <= 31) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_key expects (int|bigint, int|bigint) and 1 <= bits <= 31;" +
        s" got (${left.dataType.simpleString}, ${right.dataType.simpleString}," +
        s" bits=$bits)")

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_key"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val n = 1L << bits
    var x = asLong(a) & (n - 1)
    var y = asLong(b) & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = 1L << bits
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = ((long) $a) & ${n - 1}L;
         |long $y = ((long) $b) & ${n - 1}L;
         |long $d = 0L;
         |for (long $s = ${n >> 1}L; $s > 0; $s >>= 1) {
         |  long $rx = ($x & $s) > 0 ? 1L : 0L;
         |  long $ry = ($y & $s) > 0 ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}

object HilbertKey {
  /** SQL surface: hilbert_key(x, y, bits) with a foldable bits literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_key",
      exprs => HilbertKey(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue),
      "built-in")
}
