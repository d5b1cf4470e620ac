package graft
import org.apache.spark.sql.SparkSession

/** Plan-dump tool (optimization rounds): writes `.explain("formatted")`
  * output for the named queries to `<outDir>/<name>_<tag>.txt`, so plan
  * claims in OPTIMIZATION notes are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <name>[,<name>...]
  * Session config matches Bench (same master/shuffle-partition shape),
  * so the dumped plan is the one the bench would execute. Queries whose
  * construction runs driver-side preparation (staged profiles, fitted
  * models) pay it here too — plans are dumped AFTER one full execution
  * through the noop sink, so operator-pinned caches are in the state
  * the warm (reported) bench run sees — InMemoryRelation nodes included.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <names,comma-sep>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench: advisory-size-respecting AQE coalescing
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      // one warm execution so pinned caches exist (the reported bench
      // number is the warm run over exactly this plan state)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${n}_$tag.txt"),
        plan.getBytes("UTF-8"))
      System.err.println(s"[plandump] wrote ${n}_$tag.txt")
      graft.ext.CacheRegistry.clearAll()
    }
    spark.stop()
  }
}
