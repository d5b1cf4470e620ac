package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 hardening invariants (ADVICE r11): crafted-input guards
  * that must fail LOUDLY instead of dividing by zero or colliding on
  * generated aliases. */
class Ext13Spec extends SparkSpec {

  // ---- pixelHistogramAudit pixelOff guard ---------------------------------

  test("pixelHistogramAudit: crafted pixelOff at/past the payload end fails loudly, not div0") {
    import spark.implicits._
    // hand-built header: valid magic + fileSize, pixelOff == length
    val len = 64
    val bad = new Array[Byte](len)
    bad(0) = 'B'.toByte; bad(1) = 'M'.toByte
    val buf = java.nio.ByteBuffer.wrap(bad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(2, len)   // fileSize: consistent
    buf.putInt(10, len)  // pixelOff: one past the last byte -> px = 0
    val docs = Seq((1L, bad)).toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.pixelHistogramAudit(docs).collect()
    }
    assert(e.getMessage.contains("pixel offset"), e.getMessage)
  }

  // ---- correlationMatrix name validation -----------------------------------

  test("correlationMatrix: duplicate column names are rejected, not silently collided") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Profile.correlationMatrix(df,
        Seq("x" -> col("a"), "x" -> col("b")))
    }
    assert(e.getMessage.contains("distinct"), e.getMessage)
  }

  test("correlationMatrix: a non-identifier name is rejected up front with a clear message") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Profile.correlationMatrix(df,
        Seq("a" -> col("a"), "b-1" -> col("b")))
    }
    assert(e.getMessage.contains("identifier"), e.getMessage)
  }
}
