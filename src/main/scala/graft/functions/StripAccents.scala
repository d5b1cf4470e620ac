package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Codegen'd Unicode accent stripping: NFD-decompose, drop combining
  * marks (category Mn), NFC-recompose — `résumé` -> `resume`. The text
  * normalization pass of a multilingual training pipeline (fold accented
  * variants together before dedup/token counting).
  *
  * Matches DuckDB's utf8proc-backed `strip_accents` on Latin text, so
  * the operator is oracle-checkable (x117). ASCII fast path: corpus text
  * is overwhelmingly ASCII, where the function is the identity — the
  * generated code checks `numBytes == numChars`-style purity via
  * UTF8String and skips the (allocating) normalizer entirely.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    StripAccents.stripUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StripAccents.stripUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {

  /** ASCII fast path, then NFD -> drop Mn -> NFC. Static entry point
    * shared by interpreted eval and generated code. */
  def stripUtf8(s: UTF8String): UTF8String = {
    // pure-ASCII strings can contain no accents or combining marks:
    // in UTF-8 every non-ASCII code point is multi-byte, so byte
    // count == char count implies ASCII
    if (s.numBytes == s.numChars) s
    else {
      val nfd = java.text.Normalizer.normalize(
        s.toString, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val cp = nfd.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      UTF8String.fromString(java.text.Normalizer.normalize(
        sb.toString, java.text.Normalizer.Form.NFC))
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "strip_accents", exprs => StripAccents(exprs.head), "built-in")
}
