package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed UDAF (SURVEY.md §2.6's extension surface): bitwise-XOR
  * aggregate over longs. XOR is commutative/associative, so the result
  * is independent of partitioning and merge order — the property that
  * makes a distributed aggregate deterministic by construction, and
  * what lets the DuckDB oracle (bit_xor) match bit-exactly.
  *
  * The Aggregator compiles to a partial+final HashAggregate pair like
  * any builtin: partial XORs run map-side per partition, only the
  * 8-byte buffers shuffle.
  */
object XorAgg extends Aggregator[java.lang.Long, Long, Long] {
  override def zero: Long = 0L
  override def reduce(b: Long, a: java.lang.Long): Long =
    if (a == null) b else b ^ a.longValue
  override def merge(b1: Long, b2: Long): Long = b1 ^ b2
  override def finish(r: Long): Long = r
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  def register(spark: SparkSession): Unit =
    spark.udf.register("xor_agg", udaf(XorAgg))
}
