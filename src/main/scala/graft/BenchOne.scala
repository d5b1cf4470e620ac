package graft
import org.apache.spark.sql.SparkSession

/** Single-query bench probe (local iteration tool): same session config
  * and measurement protocol as [[Bench]] (warm-up run, then one timed
  * noop-sink execution), for the query names given as args. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    for (q <- args) {
      val fn = SparkEntry.queries(q)
      def once(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      once()
      val t0 = System.nanoTime()
      once()
      println(f"BENCHONE $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    graft.ext.CacheRegistry.clearAll()
    spark.stop()
  }
}
