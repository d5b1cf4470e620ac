package graft.io

import graft.{SparkSpec, Tables}

/** Storage-layout proof: bucketing removes the join shuffle, partition
  * layout prunes the scan — asserted on physical plans, the properties
  * that matter at 100 TB. */
class WarehouseSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed join: no Exchange in the plan; same result as the shuffle join") {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Warehouse.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Warehouse.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Warehouse.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), p) // neither shuffle nor broadcast
      // bucket-to-bucket result equals the plain shuffle join
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("partitioned layout: filter on the partition key prunes at planning time") {
    val out = tmpDir().resolve("events_by_type").toString
    val ev = Tables.load(spark, dir, "events")
      .select("event_id", "user_id", "event_type")
    Warehouse.writePartitioned(ev, out, "event_type")
    val one = spark.read.parquet(out).where("event_type = 'click'")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_type"), scan)
    // pruning is real: only the matching directory's files are read
    val allTypes = ev.select("event_type").distinct().count()
    assert(allTypes > 1)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves()
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.selectedPartitions.totalNumberOfFiles }.sum
    val files = filesRead(one)
    val total = filesRead(spark.read.parquet(out))
    assert(files < total, s"$files vs $total")
  }
}
