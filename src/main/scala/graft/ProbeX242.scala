package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
object ProbeX242 {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.ext.{CacheRegistry, Dedup}
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROBE $tag ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { runi =>
      val name = "p" + runi
      val docsSchema = spark.read.parquet(s"$dir/documents.parquet").schema
      val f = new java.io.File(s"$dir/documents.parquet")
      val key = java.lang.Integer.toHexString(
        (dir, "nd8x2", f.lastModified, f.length).hashCode())
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ndidx_nd8x2_$key"
      val (idxBands, idxSh) = t("idx load") { Dedup.nearDupIndexAt(
        spark, path, graft.Tables.load(spark, dir, "documents")) }
      val corpusBands = t("pin bands") { val x = CacheRegistry.pin(
        idxBands.select(col("doc_id").as("d1"), col("band"), col("sig")))
        x.count(); x }
      val corpusSh = t("pin sh") { val x = CacheRegistry.pin(
        idxSh.select(col("doc_id").as("d1"), col("sh").as("sh1"), col("n").as("n1")))
        x.count(); x }
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
      val stage = java.nio.file.Files.createTempDirectory("graft_stream_src")
      java.nio.file.Files.createSymbolicLink(
        stage.resolve("documents.parquet"),
        java.nio.file.Paths.get(s"$dir/documents.parquet"))
      val numHashes = 8; val bands = 2
      val src = spark.readStream.schema(docsSchema).parquet(stage.toString)
      val withSh = src
        .select(col("doc_id"), graft.ext.TextStats.tokensCol(col("text")).as("t"))
        .select(col("doc_id"), expr(
          """CASE WHEN size(t) < 3 THEN array()
            |ELSE array_distinct(transform(sequence(1, size(t) - 2),
            |  i -> concat(element_at(t, i), ' ', element_at(t, i + 1),
            |              ' ', element_at(t, i + 2))))
            |END""".stripMargin).as("sh"))
        .where(size(col("sh")) > 0)
      val withMins = (0 until numHashes).foldLeft(withSh) { (df, i) =>
        df.withColumn(s"m$i", expr(
          s"array_min(transform(sh, s -> md5(concat('$i', ':', s))))"))
      }
      val bandCols = (0 until bands).map { bnd =>
        struct(lit(bnd.toLong).as("band"),
          md5(concat_ws(":",
            (bnd until numHashes by bands).map(i => col(s"m$i")): _*)).as("sig"))
      }
      val probes = withMins
        .select(col("doc_id").as("d2"), col("sh").as("sh2"),
          explode(array(bandCols: _*)).as("b"))
        .select(col("d2"), col("sh2"), col("b.band").as("band"), col("b.sig").as("sig"))
      val verified = probes
        .join(corpusBands, Seq("band", "sig"))
        .where(col("d1") < col("d2"))
        .join(corpusSh, Seq("d1"))
        .withColumn("i", size(array_intersect(col("sh1"), col("sh2"))).cast("bigint"))
        .where(col("i") >= 1)
        .select(col("d1"), col("d2"),
          floor(lit(10000.0) * col("i") / (col("n1") + size(col("sh2")) - col("i")))
            .cast("bigint").as("jac_x10k"))
      t("stream drain") {
        val q = verified.writeStream.format("memory").queryName(name)
          .outputMode("append").option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val progs = q.recentProgress
        progs.foreach { p =>
          println(s"PROBE batch ${p.batchId} rows=${p.numInputRows} " +
            s"durms=${p.durationMs}")
        }
      }
      t("collect") { println("PROBE rows=" + spark.table(name).distinct().count()) }
      CacheRegistry.clearAll()
    }
    spark.stop()
  }
}
