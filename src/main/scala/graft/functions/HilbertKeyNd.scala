package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Codegen'd d-dimensional Hilbert-curve index (d = 2..4): the distance
  * along the order-`bits` Hilbert curve of the cell
  * (x_0 mod 2^bits, ..., x_{d-1} mod 2^bits).
  *
  * Why it exists beside the 2-D [[HilbertKey]]: real layout tuning
  * clusters 3-4 columns (ship date x supplier x part, or
  * lat x lon x time), and both the Morton `zorderKey` and the xy2d
  * walk stop at 2. The d-dimensional index keeps the Hilbert locality
  * guarantee — consecutive curve positions are grid neighbors in ONE
  * axis — so a range of positions maps to a tight d-dimensional box
  * and footer zone maps prune on every clustered column.
  *
  * Algorithm: Skilling's transpose walk (John Skilling, "Programming
  * the Hilbert curve", AIP Conf. Proc. 707, 2004 — public knowledge):
  * an inverse-undo sweep over bit planes Q = 2^(bits-1)..2 (invert or
  * exchange against axis 0), a Gray encode across axes, a correction
  * term folded from the last axis, then a plain bit interleave of the
  * transposed axes into one integer. Every step is integer &/^/shift
  * arithmetic — bit-identical in any engine; the DuckDB oracle runs
  * the same sweep unrolled as SQL CTEs
  * ([[graft.ext.Layout.hilbertNdSqlRounds]]).
  *
  * Like the 2-D walk, the sweep has data-dependent state threaded
  * through every round (axis 0 is rewritten at each step), so a
  * composed Column would blow up exponentially; as a native expression
  * it is (bits-1)*d short straight-line steps inside whole-stage
  * codegen. The index occupies d*bits bits, so d*bits <= 63 keeps it
  * a positive BIGINT.
  */
case class HilbertKeyNd(axes: Seq[Expression], bits: Int)
    extends Expression {

  override def children: Seq[Expression] = axes

  override def nullable: Boolean = axes.exists(_.nullable)

  override def foldable: Boolean = axes.forall(_.foldable)

  private def intLike(dt: DataType): Boolean = dt match {
    case IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (axes.length >= 2 && axes.length <= 4 &&
        axes.forall(a => intLike(a.dataType)) &&
        bits >= 1 && axes.length * bits <= 63) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_key_nd expects 2..4 int|bigint axes and 1 <= d*bits <= 63;" +
        s" got ${axes.length} axes (${axes.map(_.dataType.simpleString).mkString(", ")})," +
        s" bits=$bits")

  override def dataType: DataType = LongType

  override def prettyName: String = "hilbert_key_nd"

  /** The reference walk, shared by interpreted eval and the spec's
    * brute-force oracle. */
  override def eval(input: InternalRow): Any = {
    val n = axes.length
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = axes(i).eval(input)
      if (v == null) return null
      vals(i) = (v match {
        case x: Int => x.toLong
        case x: Long => x
      }) & ((1L << bits) - 1)
      i += 1
    }
    HilbertKeyNd.walk(vals, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = axes.length
    val m = 1L << (bits - 1)
    val evals = axes.map(_.genCode(ctx))
    val xs = (0 until n).map(i => ctx.freshName(s"hx$i"))
    val q = ctx.freshName("q"); val p = ctx.freshName("p")
    val t = ctx.freshName("t"); val d = ctx.freshName("d")
    val qi = ctx.freshName("qi")
    val steps = (0 until n).map { i =>
      if (i == 0)
        s"if ((${xs(0)} & $q) != 0L) ${xs(0)} ^= $p;"
      else
        s"""if ((${xs(i)} & $q) != 0L) { ${xs(0)} ^= $p; }
           |else { long $t$i = (${xs(0)} ^ ${xs(i)}) & $p;
           |  ${xs(0)} ^= $t$i; ${xs(i)} ^= $t$i; }""".stripMargin
    }.mkString("\n")
    val gray = (1 until n).map(i => s"${xs(i)} ^= ${xs(i - 1)};").mkString("\n")
    val interleave =
      s"""long $d = 0L;
         |for (int $qi = ${bits - 1}; $qi >= 0; $qi--) {
         |${(0 until n).map(i => s"  $d = ($d << 1) | ((${xs(i)} >> $qi) & 1L);").mkString("\n")}
         |}""".stripMargin
    val nullCheck =
      if (nullable) evals.map(e => s"${e.isNull}").mkString(" || ") else "false"
    val loads = (0 until n).map { i =>
      s"long ${xs(i)} = ((long) ${evals(i).value}) & ${(1L << bits) - 1}L;"
    }.mkString("\n")
    val code =
      code"""
         |${evals.map(_.code).mkString("\n")}
         |boolean ${ev.isNull} = $nullCheck;
         |long ${ev.value} = 0L;
         |if (!${ev.isNull}) {
         |  $loads
         |  for (long $q = ${m}L; $q > 1L; $q >>= 1) {
         |    long $p = $q - 1L;
         |    $steps
         |  }
         |  $gray
         |  long $t = 0L;
         |  for (long $q = ${m}L; $q > 1L; $q >>= 1)
         |    if ((${xs(n - 1)} & $q) != 0L) $t ^= $q - 1L;
         |${(0 until n).map(i => s"  ${xs(i)} ^= $t;").mkString("\n")}
         |  $interleave
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    if (nullable) ev.copy(code = code)
    else ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertKeyNd =
    copy(axes = newChildren)
}

object HilbertKeyNd {
  /** Skilling AxesToTranspose + bit interleave on masked coords;
    * mutates `x`. */
  def walk(x: Array[Long], bits: Int): Long = {
    val n = x.length
    val m = 1L << (bits - 1)
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0L) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    var d = 0L
    var qi = bits - 1
    while (qi >= 0) {
      i = 0
      while (i < n) { d = (d << 1) | ((x(i) >> qi) & 1L); i += 1 }
      qi -= 1
    }
    d
  }

  /** SQL surface: hilbert_key_nd(x0, ..., xk, bits) with a foldable
    * bits literal; dimensionality = argument count - 1. A non-foldable
    * or non-integral last argument is rejected here with a named
    * AnalysisException (the builder runs at function-resolution time,
    * before checkInputDataTypes — a raw eval() would surface as a
    * ClassCastException with no function name). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_key_nd",
      exprs => {
        // two DISTINCT diagnostics: a non-foldable bits argument gets
        // NON_FOLDABLE_ARGUMENT; a foldable-but-non-integral one (e.g.
        // hilbert_key_nd(x, y, 'eight')) is a TYPE error and gets the
        // type-mismatch class — reusing the non-foldable class there
        // would render a message claiming the literal is non-foldable
        def nonFoldable(what: String) =
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map(
              "funcName" -> "`hilbert_key_nd`",
              "paramName" -> s"`bits` (last argument; got $what)",
              "paramType" -> "\"INT\""))
        def wrongType(inputSql: String, inputType: String) =
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE",
            messageParameters = Map(
              "sqlExpr" -> "\"hilbert_key_nd\"",
              "paramIndex" -> "last (`bits`)",
              "requiredType" -> "\"INT\"",
              "inputSql" -> inputSql,
              "inputType" -> inputType))
        if (exprs.isEmpty) nonFoldable("no arguments")
        val last = exprs.last
        if (!last.foldable) nonFoldable(s"non-foldable expression ${last.sql}")
        last.eval() match {
          case n: java.lang.Integer => HilbertKeyNd(exprs.dropRight(1), n.intValue)
          case n: java.lang.Long => HilbertKeyNd(exprs.dropRight(1), n.intValue)
          case n: java.lang.Short => HilbertKeyNd(exprs.dropRight(1), n.intValue)
          case n: java.lang.Byte => HilbertKeyNd(exprs.dropRight(1), n.intValue)
          case null => wrongType("NULL", "\"NULL\"")
          case _ => wrongType(s"\"${last.sql}\"", s"\"${last.dataType.sql}\"")
        }
      },
      "built-in")
}
