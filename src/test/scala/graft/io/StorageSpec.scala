package graft.io

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** At-rest layout patterns for the 100 TB path: partition pruning and
  * bucketed (pre-shuffled) joins. These are the storage-side knobs the
  * engine relies on at scale; the specs assert the PLANS, not just the
  * row counts — a scan without pruning or a bucketed join with an
  * Exchange would silently regress to full-data cost. */
class StorageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partitioned write -> partition-pruned scan") {
    val docs = Tables.load(spark, dir, "documents")
    val out = tmpDir().resolve("docs_by_lang").toString
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).where(col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    assert(back.count() == docs.where(col("lang") === "en").count())
    // pruned scan must not list non-matching partitions
    val files = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!files.contains("lang=de") || files.contains("PartitionFilters"))
  }

  test("bucketed tables join without a shuffle exchange") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    val orders = Tables.load(s2, dir, "orders")
    val customer = Tables.load(s2, dir, "customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    val joined = s2.table("orders_b")
      .join(s2.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides bucketed on the join key -> no Exchange (shuffle) nodes
    assert(!plan.contains("Exchange"), s"unexpected shuffle in bucketed join:\n$plan")
    assert(joined.count() == orders.join(customer,
      orders("o_custkey") === customer("c_custkey")).count())
  }

  test("compaction collapses a fragmented directory and preserves every row") {
    val frag = tmpDir(); val out = tmpDir()
    try {
      // the append-sink aftermath: one file per micro-write
      val ev = Tables.load(spark, dir, "events").select("event_id", "value")
      ev.repartition(24).write.mode("overwrite").parquet(frag.toString)
      val before = spark.read.parquet(frag.toString)
      assert(before.inputFiles.length >= 24)
      val chosen = Compact.compact(spark, frag.toString, out.toString,
        targetBytes = 128L * 1024 * 1024)
      val after = spark.read.parquet(out.toString)
      // few large files instead of many small ones...
      assert(after.inputFiles.length == chosen &&
        chosen < before.inputFiles.length, s"$chosen vs ${before.inputFiles.length}")
      // ...with byte-for-byte the same rows
      assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(frag, out).foreach { root =>
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }
}
