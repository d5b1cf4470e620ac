package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up fixture generator (VERDICT r11 next-round #1): synthesize
  * sf1 (10x sf0.1) from the driver's sf0.1 tree so the heavy operators
  * can be measured one decade above the judged gate and their scaling
  * exponents recorded (BENCH_NOTES).
  *
  * Shape of the scale-up — each copy c of 10 is offset/decorrelated so
  * the workload is a FAITHFUL 10x of sf0.1, not a quadratic trap:
  *  - fact keys move by a per-table stride (FKs move together, so join
  *    cardinalities scale linearly); region/nation/supplier stay fixed
  *    (dimension tables, like TPC-H's nation/region);
  *  - document text gets a per-copy token suffix: within-copy near-dup
  *    structure (the planted clusters) is preserved EXACTLY, while
  *    cross-copy shingle overlap drops to zero — near-dup pair counts
  *    scale 10x, not 100x (identical copies would square every cluster);
  *  - embeddings get a per-copy cyclic dimension rotation: norms and
  *    within-copy geometry are exactly preserved, cross-copy dots
  *    decorrelate — embedding near-dup pairs stay linear too.
  *
  * Usage: runMain graft.GenScale [srcDir] [outDir] [copies]
  * (defaults /root/testdata/sf0.1 -> target/sf1 x10).
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = Tables.load(spark, src, name)
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")

    // strides: one above each table's max key so offset ranges never
    // collide; FK columns use the REFERENCED table's stride
    def strideOf(df: DataFrame, key: String): Long =
      df.agg(max(col(key).cast("long"))).head.getLong(0) + 1L

    val custStride = strideOf(t("customer"), "c_custkey")
    val orderStride = strideOf(t("orders"), "o_orderkey")
    val partStride = strideOf(t("part"), "p_partkey")
    val eventStride = strideOf(t("events"), "event_id")
    val userStride = strideOf(t("events"), "user_id")
    val docStride = strideOf(t("documents"), "doc_id")
    val vecStride = strideOf(t("embeddings"), "vec_id")

    /** Union `copies` offset copies of df: each long column named in
      * `offsets` moves by copy * its stride. */
    def scaled(df: DataFrame, offsets: Map[String, Long]): DataFrame =
      (0 until copies).map { c =>
        offsets.foldLeft(df) { case (d, (k, stride)) =>
          d.withColumn(k, (col(k).cast("long") + lit(c * stride)).cast(
            df.schema(k).dataType match {
              case org.apache.spark.sql.types.IntegerType => "int"
              case _ => "long"
            }))
        }.withColumn("copy_", lit(c))
      }.reduce(_.unionByName(_))

    // dimension tables: verbatim
    Seq("region", "nation", "supplier").foreach { n =>
      t(n).write.mode("overwrite").parquet(s"$out/$n.parquet")
    }

    write(scaled(t("customer"), Map("c_custkey" -> custStride))
      .drop("copy_"), "customer", 4)
    write(scaled(t("part"), Map("p_partkey" -> partStride))
      .drop("copy_"), "part", 4)
    write(scaled(t("orders"), Map(
      "o_orderkey" -> orderStride, "o_custkey" -> custStride))
      .drop("copy_"), "orders", 8)
    write(scaled(t("lineitem"), Map(
      "l_orderkey" -> orderStride, "l_partkey" -> partStride))
      .drop("copy_"), "lineitem", 16)
    write(scaled(t("events"), Map(
      "event_id" -> eventStride, "user_id" -> userStride))
      .drop("copy_"), "events", 8)

    // documents: per-copy token suffix (see scaladoc); n_chars re-derived
    val docs = scaled(t("documents"), Map("doc_id" -> docStride))
      .withColumn("text", when(col("copy_") === 0, col("text")).otherwise(
        // suffix EVERY whitespace token: within-copy shingles preserved,
        // cross-copy shingle sets disjoint
        expr("array_join(transform(split(text, ' '), " +
          "w -> concat(w, '(', CAST(copy_ AS STRING), ')')), ' ')")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("copy_")
    write(docs, "documents", 8)

    // embeddings: per-copy cyclic dimension rotation (norm-preserving,
    // cross-copy decorrelating); copy 0 stays bit-identical
    val dim = t("embeddings").select(size(col("embedding"))).head.getInt(0)
    val emb = scaled(t("embeddings"), Map("vec_id" -> vecStride))
      .withColumn("embedding", expr(
        s"transform(sequence(0, ${dim - 1}), " +
          s"i -> embedding[CAST((i + copy_ * 7) % $dim AS INT) + 1])"))
      .drop("copy_")
    write(emb, "embeddings", 4)

    println(s"GENSCALE done: $out (${copies}x of $src)")
    spark.stop()
  }
}
