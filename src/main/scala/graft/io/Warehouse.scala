package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Storage-layout operators for the scale path (beyond-reference;
  * SURVEY.md §2.8): the two techniques that remove shuffles/scans
  * before a query even runs.
  *
  *  - BUCKETING: writing both join sides bucketed (and sorted) by the
  *    join key makes every later equi-join on that key bucket-to-bucket
  *    — zero Exchange in the plan. At 100 TB this converts the nightly
  *    fact-to-fact join from the cluster's largest shuffle into a local
  *    merge per bucket. Guarded by PlanSpec ("no Exchange").
  *  - PARTITIONED LAYOUT: writing partitioned by a coarse key (date,
  *    language, source) lets the reader prune whole directories —
  *    PartitionFilters in the scan, files never opened. Guarded by
  *    PlanSpec ("partition pruning").
  */
object Warehouse {

  /** Write df as a bucketed+sorted managed table (parquet). Requires a
    * table name (bucketing metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planned
    * shuffle-free (SortMergeJoin directly over bucket files). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Write df partitioned by the given columns (directory-per-value
    * layout); readers filtering on those columns prune at planning. */
  def writePartitioned(df: DataFrame, path: String, keys: String*): Unit =
    df.write.partitionBy(keys: _*).mode("overwrite").parquet(path)

  /** The bucketed-join path end-to-end, oracle-checkable: lineitem and
    * orders written bucketed+sorted by the join key (8 buckets, one
    * file per bucket via the aligned repartition), then joined and
    * rolled up to revenue per order priority — THROUGH the bucketed
    * reader, so the whole zero-shuffle machinery sits on the oracle
    * gate, not just on a spec. The no-Exchange guarantee is asserted
    * in-line (broadcast disabled for the scope so the plan can't dodge
    * into a BroadcastHashJoin at demo scale): this is the plan shape
    * that makes the nightly fact-to-fact join shuffle-free at 100 TB.
    *
    * The tiny result is re-materialized before the temp tables are
    * dropped; integer cents keep the rollup engine-exact. Output:
    * (o_orderpriority, revenue_cents, n_items), ordered. */
  def bucketedRevenueByPriority(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val suf = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val (tl, to) = (s"li_b_$suf", s"or_b_$suf")
    val root = java.nio.file.Files.createTempDirectory("graft_bucketed")
    def writeSide(df: DataFrame, table: String, key: String): Unit =
      df.repartition(8, col(key)).write.format("parquet")
        .bucketBy(8, key).sortBy(key)
        .option("path", root.resolve(table).toString)
        .mode("overwrite").saveAsTable(table)
    try {
      writeSide(graft.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount"),
        tl, "l_orderkey")
      writeSide(graft.Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_orderpriority"),
        to, "o_orderkey")
      graft.ext.SessionConf.withConfs(spark)(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val joined = spark.table(tl)
          .join(spark.table(to), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 100).cast("bigint")).as("revenue_cents"),
            count(lit(1)).as("n_items"))
          .orderBy("o_orderpriority")
        val rows = joined.collect()
        // the rollup above the join shuffles its 5-key grid and the
        // sort range-partitions — both correct; the guard is that the
        // JOIN SUBTREE is exchange-free (children print below the
        // SortMergeJoin line, so slice the final plan there)
        val plan = joined.queryExecution.executedPlan.toString
        val finalPlan = plan.split("== Initial Plan ==")(0)
        require(finalPlan.contains("SortMergeJoin"),
          s"expected merge join:\n$plan")
        val joinSubtree = finalPlan.substring(
          finalPlan.indexOf("SortMergeJoin"))
        require(!joinSubtree.contains("Exchange"),
          s"bucketed join shuffled:\n$plan")
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq, 1), joined.schema)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tl")
      spark.sql(s"DROP TABLE IF EXISTS $to")
      rmTree(root)
    }
  }

  /** Date-partitioned warehouse + DYNAMIC partition pruning — the
    * runtime cousin of static partition pruning and the partitioned
    * sibling of the x131 runtime Bloom join: the fact table is laid
    * out partitioned by day; the dimension's filter (an attribute the
    * fact scan cannot see statically) is evaluated at RUN time and its
    * surviving partition keys are pushed into the fact scan as a
    * dynamicpruning subquery — so the 100 TB fact read touches only
    * the qualifying days' files. The DPP subquery is `require`d in
    * the executed plan (same in-line discipline as the bucketed
    * joins); the judged rollup sits on the oracle gate, so the whole
    * layout + pruning round-trip is value-checked.
    *
    * The day-of-week attribute is epoch-day mod 7 — a pure integer
    * both engines compute identically (never a locale-dependent
    * dayofweek()). */
  def partitionPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_dpp")
    try {
      val ev = graft.Tables.load(spark, dir, "events")
        .select(col("event_id"),
          floor(col("value") * 100).cast("bigint").as("cents"),
          to_date(col("ts")).as("d"))
      ev.write.partitionBy("d").mode("overwrite")
        .parquet(root.resolve("events_p").toString)
      ev.select(col("d")).distinct()
        .select(col("d"),
          expr("datediff(d, date '1970-01-01') % 7").as("dow"))
        .write.mode("overwrite").parquet(root.resolve("dates").toString)
      val fact = spark.read.parquet(root.resolve("events_p").toString)
      val dim = spark.read.parquet(root.resolve("dates").toString)
        .where(col("dow") === 2)
      graft.ext.SessionConf.withConfs(spark)(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
        "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false") {
        val joined = fact.join(dim, Seq("d"))
          .groupBy("d")
          .agg(count(lit(1)).as("n_events"), sum("cents").as("cents"))
          // DATE columns render differently in the two compare paths
          // (pandas datetime64 vs datetime.date) — ship the day as text
          .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
            col("n_events"), col("cents"))
          .orderBy("d")
        val rows = joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        require(plan.contains("dynamicpruning"),
          s"expected a dynamic partition pruning subquery on the fact scan:\n$plan")
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq, 1), joined.schema)
      }
    } finally rmTree(root)
  }

  /** Bucketed UPSERT — incremental maintenance of a 100 TB fact table
    * without shuffling it: base and the (much smaller) change batch are
    * both written bucketed+sorted by the key, so the FULL OUTER merge
    * join runs bucket-to-bucket with a zero-Exchange join subtree
    * (asserted in-line, broadcast disabled so the plan can't dodge).
    * Update rows win over base rows (coalesce per column); rows only
    * in the batch are inserts. This is the merge shape behind
    * Delta/Iceberg MERGE INTO, expressed as plain bucketed Spark.
    *
    * The judged output rolls the merged table up by status so the
    * whole machinery (bucketed writes, bucket-aligned merge, the
    * upsert semantics) sits on the oracle gate. Deterministic change
    * batch derived from the base itself: keys ≡ 3 (mod 10) get cents
    * +500 (updates), keys ≡ 0 (mod 97) re-enter shifted by 1e8 with
    * status 'N' (inserts).
    *
    * Output: (o_orderstatus, n_rows, total_cents), ordered. */
  def bucketedUpsert(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val suf = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val (tb, tu) = (s"ub_base_$suf", s"ub_upd_$suf")
    val root = java.nio.file.Files.createTempDirectory("graft_upsert")
    def writeSide(df: DataFrame, table: String): Unit =
      df.repartition(8, col("k")).write.format("parquet")
        .bucketBy(8, "k").sortBy("k")
        .option("path", root.resolve(table).toString)
        .mode("overwrite").saveAsTable(table)
    try {
      val base = graft.Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100).cast("bigint").as("cents"),
          col("o_orderstatus").as("st"))
      val updates = base.where(col("k") % 10 === 3)
        .select(col("k"), (col("cents") + 500).as("cents"), col("st"))
        .unionByName(base.where(col("k") % 97 === 0)
          .select((col("k") + 100000000L).as("k"), col("cents"),
            lit("N").as("st")))
      writeSide(base, tb)
      writeSide(updates, tu)
      graft.ext.SessionConf.withConfs(spark)(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val b = spark.table(tb); val u = spark.table(tu)
        val merged = b.join(u, b("k") === u("k"), "full_outer")
          .select(coalesce(u("k"), b("k")).as("k"),
            coalesce(u("cents"), b("cents")).as("cents"),
            coalesce(u("st"), b("st")).as("st"))
        val out = merged.groupBy(col("st").as("o_orderstatus"))
          .agg(count(lit(1)).as("n_rows"),
            sum("cents").cast("bigint").as("total_cents"))
          .orderBy("o_orderstatus")
        val rows = out.collect()
        val plan = out.queryExecution.executedPlan.toString
        val finalPlan = plan.split("== Initial Plan ==")(0)
        require(finalPlan.contains("SortMergeJoin"),
          s"expected merge join:\n$plan")
        val joinSubtree = finalPlan.substring(
          finalPlan.indexOf("SortMergeJoin"))
        require(!joinSubtree.contains("Exchange"),
          s"bucketed upsert shuffled:\n$plan")
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tb")
      spark.sql(s"DROP TABLE IF EXISTS $tu")
      rmTree(root)
    }
  }

  /** Z-ORDER layout REWRITE + measured pruning win, end-to-end. x250
    * ([[graft.ext.Layout.zonemapAudit]]) prices candidate layouts on
    * zone-map arithmetic WITHOUT writing; this operator actually
    * writes the winning one: part is re-laid-out physically sorted by
    * the (p_size, p_partkey & 255) Morton key via a range-partitioned
    * sort-write — the real rewrite shape at 100 TB (one range
    * shuffle, executors stream sorted runs to parquet, nothing ever
    * collects) — and the judged rollup then READS the rewritten files
    * through a both-dimension predicate.
    *
    * Two in-line requires carry the scale claim (the same discipline
    * as the bucketed joins' no-Exchange guards):
    *  - the predicate is PUSHED to the rewritten scan (both
    *    dimensions appear in PushedFilters — pk8 is a real written
    *    column, so even the bit-masked key dimension pushes);
    *  - the measured zone-map win: per actually-written file min/max
    *    of both dimensions, the files any footer-stats reader must
    *    scan for the predicate are at most HALF of the files written
    *    (a single-dimension sort cannot deliver that on both
    *    predicates at once — x250 prices exactly that).
    *
    * Output is content-only (p_brand, n_parts, retail_cents — integer
    * cents), so the oracle ALSO checks the rewrite preserved the data
    * bit-for-bit. */
  def zorderRewrite(spark: SparkSession, dir: String): DataFrame =
    clusteredRewrite(spark, dir,
      p => graft.ext.Layout.zorderKey(col("p_size"), col("pk8"), 8))

  /** The same physical rewrite clustered by the HILBERT curve key
    * ([[graft.ext.Layout.hilbertKey]], the native codegen walk)
    * instead of the Morton key. Hilbert keeps consecutive curve
    * positions grid-adjacent (no Morton quadrant jumps), so file
    * min/max boxes are tighter for the same file count — the x307
    * locality spec measures that; here the SAME in-line requires
    * (pushdown + at-most-half-files-scanned) must hold on the files
    * actually written, and the oracle re-checks content
    * bit-for-bit. */
  def hilbertRewrite(spark: SparkSession, dir: String): DataFrame =
    clusteredRewrite(spark, dir,
      p => graft.ext.Layout.hilbertKey(p, col("p_size"), col("pk8"), 8))

  private def clusteredRewrite(spark: SparkSession, dir: String,
                               keyOf: DataFrame => Column): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_zorder")
    try {
      val part = graft.Tables.load(spark, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("bigint").as("p_size"),
          col("p_retailprice"), col("p_brand"),
          col("p_partkey").bitwiseAND(255).cast("bigint").as("pk8"))
      part.withColumn("zkey", keyOf(part))
        .repartitionByRange(16, col("zkey"))
        .sortWithinPartitions("zkey")
        .write.mode("overwrite").parquet(root.toString)
      val re = spark.read.parquet(root.toString)
      // measured win from the files ACTUALLY written: a footer-stats
      // reader scans a file iff its [min,max] box overlaps the
      // predicate box on EITHER-dimension terms
      val zones = re.groupBy(input_file_name().as("f"))
        .agg(min("p_size").as("lo_s"), max("p_size").as("hi_s"),
          min("pk8").as("lo_k"), max("pk8").as("hi_k"))
        .collect()
      val mustScan = zones.count(z =>
        z.getLong(1) <= 15 && z.getLong(2) >= 10 && z.getLong(3) <= 63)
      require(zones.length >= 8 && mustScan * 2 <= zones.length,
        s"Z-order rewrite did not prune: $mustScan of ${zones.length} " +
          "files overlap the two-dimension predicate")
      val out = re
        .where(col("p_size").between(10, 15) && col("pk8") <= 63)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
          sum(floor(col("p_retailprice") * 100).cast("bigint"))
            .as("retail_cents"))
        .orderBy("p_brand")
      // Assert pushdown STRUCTURALLY on the scan node's dataFilters
      // (the same predicate set the parquet reader receives), not on
      // the rendered plan string — plan toString formatting changes
      // across Spark versions and truncates long filter lists.
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.catalyst.expressions.{
        Attribute, BinaryComparison, GreaterThanOrEqual, LessThanOrEqual, Literal}
      // AdaptiveSparkPlanExec is a LEAF wrapping the real plan — unwrap
      // recursively before collecting scan nodes.
      def scanFiltersOf(p: SparkPlan): Seq[
          org.apache.spark.sql.catalyst.expressions.Expression] =
        p.collect {
          case a: AdaptiveSparkPlanExec => scanFiltersOf(a.executedPlan)
          case s: FileSourceScanExec => s.dataFilters
        }.flatten
      val scanFilters = scanFiltersOf(out.queryExecution.executedPlan)
      def hasCmp(name: String, value: Long,
                 want: BinaryComparison => Boolean): Boolean =
        scanFilters.exists(_.exists {
          case c: BinaryComparison => want(c) && ((c.left, c.right) match {
            case (a: Attribute, Literal(v, _)) =>
              a.name == name && String.valueOf(v) == value.toString
            case _ => false
          })
          case _ => false
        })
      require(
        hasCmp("p_size", 10, _.isInstanceOf[GreaterThanOrEqual]) &&
          hasCmp("p_size", 15, _.isInstanceOf[LessThanOrEqual]) &&
          hasCmp("pk8", 63, _.isInstanceOf[LessThanOrEqual]),
        "predicate not pushed to the rewritten scan; dataFilters = " +
          scanFilters.mkString("[", ", ", "]"))
      val rows = out.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
    } finally rmTree(root)
  }

  private def rmTree(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => try { java.nio.file.Files.deleteIfExists(p); () }
                      catch { case _: java.io.IOException => () })
    }
  }
}
