package graft.streaming

import graft.SparkSpec

/** Streaming hygiene: every run stages its source and checkpoint in
  * temp dirs that must be gone when the result is returned (round-1
  * leak: they accumulated for the life of /tmp). */
class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def graftTmpDirs(): Set[String] = {
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(tmp).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("graft_ckpt") || n.startsWith("graft_stream_src") ||
        n.startsWith("graft_feb_out") || n.startsWith("graft_stream_out"))
      .toSet
  }

  test("streaming runs clean up their checkpoint and stage dirs") {
    val before = graftTmpDirs()
    val r = Streaming.hourlyCounts(spark, dir)
    assert(r.count() > 0) // the query really ran (memory sink populated)
    val r2 = Streaming.streamStaticJoin(spark, dir)
    assert(r2.count() > 0)
    val r3 = Streaming.userTotalsForeachBatch(spark, dir)
    assert(r3.count() > 0)
    assert(graftTmpDirs() == before,
      s"leaked: ${graftTmpDirs().diff(before).mkString(",")}")
  }

  test("checkpoint recovery: stateful query restarted from its checkpoint equals the uninterrupted run") {
    // Production cares about mid-stream failure, not just a clean
    // AvailableNow drain: a stateful query is stopped after draining
    // half the backlog, the other half lands, and a NEW query restarts
    // from the SAME checkpoint. Offsets must prove the first half is
    // not reprocessed; recovered state must prove sessions CONTINUE
    // across the restart (event counts would double / reset otherwise).
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
    import spark.implicits._
    val gapUs = 1800L * 1000000L
    // fileA: u1 has 2 events of one session; u2 one event.
    // fileB: u1 continues that session (+60s) then opens a second one;
    //        u3 appears for the first time.
    val fileA = Seq((1L, 0L), (1L, 60000000L), (2L, 0L))
    val fileB = Seq((1L, 120000000L), (1L, 5000000000L), (3L, 0L))
    val stage = java.nio.file.Files.createTempDirectory("graft_ckpt_rec_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_rec")
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_ckpt_rec2")
    def land(rows: Seq[(Long, Long)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ckpt_land")
      rows.toDF("user_id", "ts_us").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(tmp).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .foreach(p => java.nio.file.Files.copy(p, stage.resolve(name)))
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    // foreachBatch -> parquet append: the memory sink refuses to
    // recover from an existing checkpoint (it is not fault-tolerant);
    // a durable sink is exactly what production restarts need anyway
    def runDrain(outDir: String, ckptDir: String): Unit = {
      val src = spark.readStream
        .schema("user_id LONG, ts_us LONG").parquet(stage.toString)
        .as[(Long, Long)]
      val sessions = src.groupByKey(_._1)
        .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
          OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
          case (user: Long, rows: Iterator[(Long, Long)],
                state: GroupState[(Long, Long, Long)]) =>
            val sorted = rows.map(_._2).toArray.sorted
            var (nSess, nEv, last) =
              state.getOption.getOrElse((0L, 0L, Long.MinValue))
            sorted.foreach { ts =>
              if (last == Long.MinValue || ts - last > gapUs) nSess += 1
              nEv += 1; last = ts
            }
            state.update((nSess, nEv, last))
            Iterator((user, nSess, nEv))
        }.toDF("user_id", "session_cnt", "event_cnt")
      val q = sessions.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir); ()
        }
        .outputMode("update").option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val out1 = java.nio.file.Files.createTempDirectory("graft_ckpt_out1")
    val out2 = java.nio.file.Files.createTempDirectory("graft_ckpt_out2")
    val out3 = java.nio.file.Files.createTempDirectory("graft_ckpt_out3")
    // update mode emits one row per key per BATCH; the latest state per
    // user is the event_cnt max (monotone), same rule as the x68 serve
    def latest(outDir: java.nio.file.Path): Map[Long, (Long, Long)] =
      spark.read.parquet(outDir.toString).collect().groupBy(_.getLong(0))
        .map { case (u, rows) =>
          u -> rows.map(r => (r.getLong(1), r.getLong(2))).maxBy(_._2)
        }
    try {
      land(fileA, "a.parquet")
      runDrain(out1.toString, ckpt.toString)
      val run1 = latest(out1)
      assert(run1 == Map(1L -> ((1L, 2L)), 2L -> ((1L, 1L))))
      // the second half of the backlog lands; restart from the SAME
      // checkpoint with a fresh query
      land(fileB, "b.parquet")
      runDrain(out2.toString, ckpt.toString)
      val run2 = latest(out2)
      // exactly-once: u2 (only in fileA) is NOT re-emitted — fileA was
      // not reprocessed after the restart
      assert(!run2.contains(2L), s"fileA reprocessed: $run2")
      // state recovery: u1's first fileB event continues the fileA
      // session (1 session, 4 events total, then a second session);
      // lost state would report event_cnt 2, reprocessing would give 6
      assert(run2(1L) == ((2L, 4L)), s"state not recovered: $run2")
      assert(run2(3L) == ((1L, 1L)))
      // the combined sink (run2 overriding run1, a compacted-sink read)
      // equals the uninterrupted single run over the full backlog
      val combined = run1 ++ run2
      runDrain(out3.toString, ckpt2.toString)
      val full = latest(out3)
      assert(combined == full, s"combined $combined != uninterrupted $full")
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(stage, ckpt, ckpt2, out1, out2, out3).foreach { root =>
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("streaming incremental dedup equals the batch anti-join path and drops every dup") {
    import org.apache.spark.sql.functions._
    val streamed = Streaming.streamIncrementalDedup(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    val docs = graft.Tables.load(spark, dir, "documents")
    val corpus = docs.where(col("source") =!= "src19")
    // the same composed backlog the stream sees: src19 + the planted
    // re-keyed duplicate slice
    val backlog = docs.where(col("source") === "src19")
      .select("doc_id", "text")
      .unionByName(corpus.where(col("doc_id") % 10 === 4)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val batch = graft.ext.Dedup.incrementalNew(backlog, corpus)
      .collect().map(_.getLong(0)).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // every planted duplicate was swallowed by the gate
    assert(streamed.forall(_ < 1000000L))
    assert(backlog.where(col("doc_id") >= 1000000L).count() > 0)
  }

  test("streaming curated ingest equals the batch quality->dedup composition") {
    import org.apache.spark.sql.functions._
    val streamed = Streaming.streamCuratedIngest(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    val docs = graft.Tables.load(spark, dir, "documents")
    val corpus = docs.where(col("source") =!= "src19")
    val backlog = docs.where(col("source") === "src19")
      .select("doc_id", "text")
      .unionByName(corpus.where(col("doc_id") % 10 === 4)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val kept = graft.ext.TextStats.qualityFilter(backlog)
      .where(col("keep")).select("doc_id")
    val batch = graft.ext.Dedup.incrementalNew(
        backlog.join(kept, "doc_id"), corpus)
      .collect().map(_.getLong(0)).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // both stages really filter on this backlog: quality drops some
    // arrivals, dedup drops every planted re-scrape that passes it
    assert(kept.count() < backlog.count())
    assert(streamed.forall(_ < 1000000L))
  }

  test("foreachBatch compaction equals the batch aggregation") {
    import org.apache.spark.sql.functions._
    val streamed = Streaming.userTotalsForeachBatch(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.Tables.load(spark, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("bigint")).as("cents"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("stream-stream join equals the batch interval self-join") {
    import org.apache.spark.sql.functions._
    val streamed = Streaming.streamStreamJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ev = graft.Tables.load(spark, dir, "events")
    val s = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("ts_s"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("ts_p"))
    val batch = s.join(p, col("user_id") === col("p_user_id") &&
        col("ts_p") >= col("ts_s") &&
        col("ts_p") <= col("ts_s") + expr("INTERVAL 1 HOUR"))
      .select("user_id", "signup_id", "purchase_id")
      .orderBy("user_id", "signup_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("left-outer stream-stream join equals the batch left join; eviction really fires") {
    import org.apache.spark.sql.functions._
    val streamed = Streaming.streamStreamLeftOuterJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // the outer semantics must actually be exercised: both matched
    // pairs and watermark-evicted unmatched signups in the output
    assert(streamed.exists(_._3 >= 0), "no matched pairs")
    assert(streamed.exists(_._3 == -1L), "no unmatched signups — eviction never fired")
    val ev = graft.Tables.load(spark, dir, "events")
    val s = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("ts_s"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("ts_p"))
    val batch = s.join(p, col("user_id") === col("p_user_id") &&
        col("ts_p") >= col("ts_s") &&
        col("ts_p") <= col("ts_s") + expr("INTERVAL 1 HOUR"), "left_outer")
      .select(col("user_id"), col("signup_id"),
        coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"))
      .orderBy("user_id", "signup_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch)
  }

  test("full-outer stream-stream join also evicts never-matched purchases") {
    val streamed = Streaming.streamStreamFullOuterJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed.exists(r => r._2 >= 0 && r._3 >= 0), "no matched pairs")
    assert(streamed.exists(_._3 == -1L), "no unmatched signups")
    assert(streamed.exists(_._2 == -1L),
      "no unmatched purchases — right-side eviction never fired")
  }

  test("streaming CDC apply reconstructs v2 exactly, like the batch apply") {
    import org.apache.spark.sql.functions._
    val v1 = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100).cast("bigint").as("cents"))
    val v2 = v1.where(col("k") % 7 =!= 0)
      .select(col("k"),
        when(col("k") % 5 === 0, col("cents") + 100)
          .otherwise(col("cents")).as("cents"))
      .unionByName(v1.where(col("k") % 11 === 0)
        .select((-col("k")).as("k"), col("cents")))
    val want = v2.collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val got = Streaming.streamCdcApply(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got == want)
    // the changeset really streamed as several micro-batches, so the
    // journal's latest-wins compaction was exercised across batch ids
    assert(want.nonEmpty)
  }

  // ---- checkpoint-recovery proofs for the remaining stateful shapes:
  // the sessionization spec above proves mapGroupsWithState recovery;
  // these prove it for stream-stream JOIN buffers, the foreachBatch
  // CDC journal, the DLQ two-way split, and the parquet file sink's
  // manifest discipline (x96 / x170 / x209 / x111 families).

  private def landDf(df: org.apache.spark.sql.DataFrame,
                     stage: java.nio.file.Path, name: String): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("graft_land")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    java.nio.file.Files.list(tmp).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .foreach(p => java.nio.file.Files.copy(p, stage.resolve(name)))
    java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  private def rmAll(roots: java.nio.file.Path*): Unit = {
    import scala.jdk.CollectionConverters._
    roots.foreach { root =>
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("checkpoint recovery: stream-stream join buffers survive a restart; drained halves never re-emit") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_ssjr_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssjr_ckpt")
    val out1 = java.nio.file.Files.createTempDirectory("graft_ssjr_o1")
    val out2 = java.nio.file.Files.createTempDirectory("graft_ssjr_o2")
    def drain(outDir: String): Unit = {
      def side(et: String, idAs: String, tsAs: String, uAs: String) =
        spark.readStream
          .schema("user_id LONG, event_type STRING, event_id LONG, ts_us LONG")
          .parquet(stage.toString)
          .where(col("event_type") === et)
          .select(col("event_id").as(idAs),
            timestamp_micros(col("ts_us")).as(tsAs), col("user_id").as(uAs))
          .withWatermark(tsAs, "1 hour")
      val joined = side("signup", "signup_id", "ts_s", "user_id")
        .join(side("purchase", "purchase_id", "ts_p", "p_user_id"),
          col("user_id") === col("p_user_id") &&
            col("ts_p") >= col("ts_s") &&
            col("ts_p") <= col("ts_s") + expr("INTERVAL 1 HOUR"))
        .select("user_id", "signup_id", "purchase_id")
      val q = joined.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir); ()
        }
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def rows(d: java.nio.file.Path): Set[(Long, Long, Long)] = {
      val fs = java.nio.file.Files.list(d)
      val any = try fs.findAny().isPresent finally fs.close()
      if (!any) Set.empty
      else spark.read.parquet(d.toString).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val min10 = 600L * 1000000L
    // modern epoch base: event times near 0 sit AT the initial zero
    // watermark and the join's range bounds treat them as expired
    val base = 1700000000L * 1000000L
    try {
      // fileA: u1 signup+purchase (matches in run 1); u2 signup only —
      // its join BUFFER must survive the restart
      landDf(Seq((1L, "signup", 1L, base), (1L, "purchase", 2L, base + min10),
        (2L, "signup", 3L, base)).toDF("user_id", "event_type", "event_id", "ts_us"),
        stage, "a.parquet")
      drain(out1.toString)
      assert(rows(out1) == Set((1L, 1L, 2L)), rows(out1).toString)
      // fileB: u2's purchase 30 min after its buffered signup, plus a
      // signup-less purchase that must match nothing
      landDf(Seq((2L, "purchase", 4L, base + 3 * min10),
        (3L, "purchase", 5L, base)).toDF("user_id", "event_type", "event_id", "ts_us"),
        stage, "b.parquet")
      drain(out2.toString)
      // exactly-once: (1,1,2) NOT re-emitted (fileA never reprocessed);
      // state recovery: u2's pair joins ACROSS the restart
      assert(rows(out2) == Set((2L, 3L, 4L)), rows(out2).toString)
    } finally rmAll(stage, ckpt, out1, out2)
  }

  test("checkpoint recovery: foreachBatch CDC journal stays exactly-once across a restart") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_cdcr_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdcr_ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft_cdcr_out")
    val schema = "k LONG, status STRING, cents_v1 LONG, cents_v2 LONG"
    def drain(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      val q = src.writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(out.toString); ()
        }
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    try {
      landDf(Seq((1L, "changed", Some(1L), Some(10L)),
        (2L, "added", None, Some(20L)))
        .toDF("k", "status", "cents_v1", "cents_v2"), stage, "a.parquet")
      drain()
      // crash here; a LATER change to k=1 and a removal land
      landDf(Seq((1L, "changed", Some(1L), Some(11L)),
        (3L, "removed", Some(3L), None))
        .toDF("k", "status", "cents_v1", "cents_v2"), stage, "b.parquet")
      drain()
      val journal = spark.read.parquet(out.toString)
      // exactly-once journal: each (k, batch) row written ONCE — the
      // restart neither re-journals fileA nor skips fileB
      val perRow = journal.groupBy("k", "batch_id").count().collect()
      assert(perRow.forall(_.getLong(2) == 1L), perRow.mkString(","))
      assert(journal.count() == 4, journal.collect().mkString(","))
      // batch ids must ADVANCE across the restart (continued log, not
      // a fresh one overwriting batch 0)
      val batches = journal.select("batch_id").distinct().collect()
        .map(_.getLong(0)).sorted
      assert(batches.length == 2 && batches(0) < batches(1),
        batches.mkString(","))
      // serve-time compaction (latest batch wins) + applyDiff equals
      // the uninterrupted final state: {1->11, 2->20}, 3 removed
      val changes = journal.groupBy("k")
        .agg(max_by(struct(col("status"), col("cents_v1"), col("cents_v2")),
          col("batch_id")).as("s"))
        .select(col("k"), col("s.status").as("status"),
          col("s.cents_v1").as("cents_v1"), col("s.cents_v2").as("cents_v2"))
      val v1 = Seq((1L, 1L), (3L, 3L)).toDF("k", "cents")
      val applied = graft.ext.Cdc.applyDiff(v1, changes, "k", "cents")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(applied == Map(1L -> 11L, 2L -> 20L), applied.toString)
    } finally rmAll(stage, ckpt, out)
  }

  test("checkpoint recovery: DLQ split routes each record exactly once across a restart") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_dlqr_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dlqr_ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft_dlqr_out")
    def drain(): Unit = {
      val src = spark.readStream.schema("doc_id LONG, n_chars LONG")
        .parquet(stage.toString)
        .select(col("doc_id"), col("n_chars"),
          when(col("n_chars") < 150, "too_short").otherwise("ok").as("reason"))
      val q = src.writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          val stamped = b.withColumn("batch_id", lit(id))
          stamped.where(col("reason") === "ok")
            .write.mode("append").parquet(s"$out/accepted")
          stamped.where(col("reason") =!= "ok")
            .write.mode("append").parquet(s"$out/rejected"); ()
        }
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def ids(sub: String): Seq[Long] = {
      val d = java.nio.file.Paths.get(s"$out/$sub")
      if (!java.nio.file.Files.exists(d)) Seq.empty
      else spark.read.parquet(d.toString).select("doc_id").collect()
        .map(_.getLong(0)).toSeq
    }
    try {
      landDf(Seq((1L, 200L), (2L, 100L)).toDF("doc_id", "n_chars"),
        stage, "a.parquet")
      drain()
      landDf(Seq((3L, 300L), (4L, 50L)).toDF("doc_id", "n_chars"),
        stage, "b.parquet")
      drain()
      // each record lands in exactly ONE branch exactly ONCE: the
      // restart must not re-split fileA (dup in both branches) nor
      // lose fileB
      val acc = ids("accepted"); val rej = ids("rejected")
      assert(acc.sorted == Seq(1L, 3L), acc.toString)
      assert(rej.sorted == Seq(2L, 4L), rej.toString)
      assert(acc.distinct.length == acc.length &&
        rej.distinct.length == rej.length, "duplicated routing")
    } finally rmAll(stage, ckpt, out)
  }

  test("checkpoint recovery: native session-window state survives a restart and closes exactly once") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_swr_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_swr_ckpt")
    val out1 = java.nio.file.Files.createTempDirectory("graft_swr_o1")
    val out2 = java.nio.file.Files.createTempDirectory("graft_swr_o2")
    def drain(outDir: String): Unit = {
      val src = spark.readStream.schema("user_id LONG, ts_us LONG")
        .parquet(stage.toString)
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))
        .withWatermark("ts", "10 minutes")
      val agg = src
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"))
      val q = agg.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir); ()
        }
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def rows(d: java.nio.file.Path): Seq[(Long, Long)] = {
      val fs = java.nio.file.Files.list(d)
      val any = try fs.findAny().isPresent finally fs.close()
      if (!any) Seq.empty
      else spark.read.parquet(d.toString).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val base = 1700000000L * 1000000L
    val min = 60L * 1000000L
    try {
      // fileA: u1 session of 3 events; the watermark (max - 10min)
      // has NOT passed the session end, so nothing emits in run 1 —
      // the open session lives purely in checkpointed state
      landDf(Seq((1L, base), (1L, base + min), (1L, base + 2 * min))
        .toDF("user_id", "ts_us"), stage, "a.parquet")
      drain(out1.toString)
      assert(rows(out1).isEmpty, s"open session leaked: ${rows(out1)}")
      // fileB: one event 2h later pushes the watermark past the
      // session end; the RECOVERED session must close with all 3
      // fileA events — lost state would report fewer, reprocessing
      // more or twice
      landDf(Seq((1L, base + 120 * min)).toDF("user_id", "ts_us"),
        stage, "b.parquet")
      drain(out2.toString)
      assert(rows(out2) == Seq((1L, 3L)),
        s"session not recovered intact: ${rows(out2)}")
    } finally rmAll(stage, ckpt, out1, out2)
  }

  test("streaming TTL dedup equals the batch per-window key distinct") {
    import org.apache.spark.sql.functions._
    val drained = Streaming.streamTtlDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val batch = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("datediff(to_date(ts), date '1970-01-01') div 7").as("win"))
      .distinct().orderBy("user_id", "event_type", "win")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(drained == batch, s"${drained.size} drained vs ${batch.size} batch")
  }

  test("checkpoint recovery: dropDuplicatesWithinWatermark state survives a restart, then expires by TTL") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_ttlr_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ttlr_ckpt")
    val outs = (1 to 3).map(i =>
      java.nio.file.Files.createTempDirectory(s"graft_ttlr_o$i"))
    def drain(outDir: String): Unit = {
      val src = spark.readStream
        .schema("user_id LONG, event_type STRING, win LONG, ts_us LONG")
        .parquet(stage.toString)
        .select(col("user_id"), col("event_type"), col("win"),
          timestamp_micros(col("ts_us")).as("ts"))
      val q = src.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type", "win")
        .select("user_id", "event_type", "win")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir); ()
        }
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def rows(d: java.nio.file.Path): Seq[(Long, String, Long)] = {
      val fs = java.nio.file.Files.list(d)
      val any = try fs.findAny().isPresent finally fs.close()
      if (!any) Seq.empty
      else spark.read.parquet(d.toString).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
    }
    val base = 1700000000L * 1000000L // modern epoch: near-zero event
    val min = 60L * 1000000L          // times sit below the watermark
    try {
      // fileA: K1 admitted, its in-batch duplicate dropped, K2 admitted
      landDf(Seq(
        (1L, "a", 0L, base), (1L, "a", 0L, base + min),
        (2L, "b", 0L, base)).toDF("user_id", "event_type", "win", "ts_us"),
        stage, "a.parquet")
      drain(outs(0).toString)
      assert(rows(outs(0)) == Seq((1L, "a", 0L), (2L, "b", 0L)),
        s"run1: ${rows(outs(0))}")
      // fileB after a RESTART: K1's duplicate must hit the RECOVERED
      // state and stay dropped; the fresh K3 admits and its event time
      // (base+3h) pushes the watermark to base+2h at batch end — past
      // K1/K2's expiry (first seen + 1h delay), so their state evicts
      landDf(Seq(
        (1L, "a", 0L, base + 2 * min),
        (3L, "c", 0L, base + 180 * min))
        .toDF("user_id", "event_type", "win", "ts_us"), stage, "b.parquet")
      drain(outs(1).toString)
      assert(rows(outs(1)) == Seq((3L, "c", 0L)),
        s"run2 (recovered state must drop K1's dup): ${rows(outs(1))}")
      // fileC: a K1 straggler ABOVE the watermark but LATER than its
      // TTL re-admits — the documented bounded-state tradeoff; losing
      // this re-admit would mean state never expires (unbounded)
      landDf(Seq((1L, "a", 0L, base + 150 * min))
        .toDF("user_id", "event_type", "win", "ts_us"), stage, "c.parquet")
      drain(outs(2).toString)
      assert(rows(outs(2)) == Seq((1L, "a", 0L)),
        s"run3 (TTL-expired key must re-admit): ${rows(outs(2))}")
    } finally rmAll((stage +: ckpt +: outs): _*)
  }

  test("file sink manifest: a crashed batch's orphan part-file is invisible to sink reads") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_fsm_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fsm_ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft_fsm_out")
    def drain(): Unit = {
      val src = spark.readStream.schema("event_id LONG, cents LONG")
        .parquet(stage.toString)
      val q = src.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    try {
      landDf(Seq((1L, 10L), (2L, 20L)).toDF("event_id", "cents"),
        stage, "a.parquet")
      drain()
      // simulate a batch killed between executor writes and the
      // manifest commit: a data file lands in the sink dir with NO
      // _spark_metadata entry
      val tmp = java.nio.file.Files.createTempDirectory("graft_fsm_orphan")
      Seq((99L, 999L)).toDF("event_id", "cents")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val orphanSrc = java.nio.file.Files.list(tmp).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).next()
      val orphan = out.resolve("part-00000-orphan-crashed.snappy.parquet")
      java.nio.file.Files.copy(orphanSrc, orphan)
      rmAll(tmp)
      landDf(Seq((3L, 30L)).toDF("event_id", "cents"), stage, "b.parquet")
      drain()
      // the orphan IS on disk and readable as a bare file...
      assert(java.nio.file.Files.exists(orphan))
      assert(spark.read.parquet(orphan.toString).count() == 1)
      // ...but the sink read goes through _spark_metadata and must see
      // exactly the committed batches: both halves once, no orphan row
      val got = spark.read.parquet(out.toString).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (2L, 20L), (3L, 30L)), got.toString)
    } finally rmAll(stage, ckpt, out)
  }

  test("streaming retention mart equals the batch cohort triangle") {
    val streamed = Streaming.streamRetention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val batch = graft.ext.TimeSeries.cohortRetention(
        graft.Tables.load(spark, dir, "events"), "user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming PSI mart equals the batch category-mix drift gate") {
    val streamed = Streaming.streamPsi(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.ext.Profile.psiDrift(
        graft.Tables.load(spark, dir, "documents")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming SRM mart equals the batch trajectory") {
    import org.apache.spark.sql.functions._
    def row(r: org.apache.spark.sql.Row) =
      (0 to 6).map(r.getLong).toList
    val streamed = Streaming.streamSrm(spark, dir).collect()
      .map(row).toSeq
    val batch = graft.ext.Experiment.srmTrajectory(
        graft.Tables.load(spark, dir, "events"),
        col("user_id") % 2 === 0).collect()
      .map(row).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming completeness mart equals the batch median audit") {
    def row(r: org.apache.spark.sql.Row) =
      (0 to 3).map(r.getLong).toList
    val streamed = Streaming.streamCompleteness(spark, dir).collect()
      .map(row).toSeq
    val batch = graft.ext.TimeSeries.partitionCompleteness(
        graft.Tables.load(spark, dir, "events")).collect()
      .map(row).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming QTE mart equals the batch decile readout") {
    import org.apache.spark.sql.functions._
    def row(r: org.apache.spark.sql.Row) = (0 to 3).map(r.getLong).toList
    val streamed = Streaming.streamQte(spark, dir).collect().map(row).toSeq
    val batch = graft.ext.Experiment.quantileEffects(
        graft.Tables.load(spark, dir, "events"),
        col("user_id") % 2 === 0).collect().map(row).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming encoding-damage mart equals the batch audit") {
    import org.apache.spark.sql.functions._
    def row(r: org.apache.spark.sql.Row) =
      (r.getString(0), (1 to 6).map(r.getLong).toList)
    // the planting lives in the caller (x397 registration / this spec),
    // not in the operator — streamDamage itself monitors what arrives
    val streamed = Streaming.streamDamage(spark, dir, raw => raw
        .select(col("source"),
          when(col("doc_id") % 13 === 0,
            concat(col("text"), lit("Ã© &amp; &#233; x�")))
            .otherwise(col("text")).as("text"))).collect()
      .map(row).toSeq
    val batch = graft.ext.TextStats.encodingDamage(
        graft.Tables.load(spark, dir, "documents")
          .select(col("source"),
            when(col("doc_id") % 13 === 0,
              concat(col("text"), lit("Ã© &amp; &#233; x�")))
              .otherwise(col("text")).as("text"))).collect()
      .map(row).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("append-mode daily report (shape #27): watermark-closed days emit exactly once across a checkpoint restart") {
    // The eviction contract of x403: a day is emitted when the 1-day
    // watermark passes its end, and NEVER again — not on later
    // micro-batches, not after a restart from the same checkpoint.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val day = 86400000000L // micros
    val base = 1704067200L * 1000000L // 2024-01-01T00:00Z (epoch-0 events sit at the zero watermark)
    // fileA: day0 x2 (one anomaly), day1 x1 (anomaly), max at day2T06
    // -> watermark day1T06 closes ONLY day0
    val fileA = Seq(
      (base + 3600000000L, 0.5), (base + 7200000000L, 10.0),
      (base + day + 10800000000L, 500.0), (base + 2 * day + 21600000000L, 5.0))
    // fileB: one event at day3T12 -> watermark day2T12 closes day1 ONLY
    // (day2 end = day3T00 is still open)
    val fileB = Seq((base + 3 * day + 43200000000L, 2.0))
    val stage = java.nio.file.Files.createTempDirectory("graft_appnd_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_appnd_ck")
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_appnd_ck2")
    def land(rows: Seq[(Long, Double)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_appnd_land")
      rows.toDF("ts_us", "value").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(tmp).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .foreach(p => java.nio.file.Files.copy(p, stage.resolve(name)))
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    // foreachBatch -> parquet append (the memory sink cannot recover
    // from an existing checkpoint), same discipline as the session spec
    def runDrain(outDir: String, ckptDir: String): Unit = {
      val src = spark.readStream.schema("ts_us LONG, value DOUBLE")
        .parquet(stage.toString)
        .withColumn("ts", timestamp_micros(col("ts_us")))
      val q = src.withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") < 1.0 || col("value") > 400.0, 1L)
            .otherwise(0L)).as("bad"))
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
          col("n"), col("bad"))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir); ()
        }
        .outputMode("append").option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def emitted(outDir: java.nio.file.Path): Seq[(String, Long, Long)] =
      spark.read.parquet(outDir.toString).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val out1 = java.nio.file.Files.createTempDirectory("graft_appnd_o1")
    val out2 = java.nio.file.Files.createTempDirectory("graft_appnd_o2")
    val out3 = java.nio.file.Files.createTempDirectory("graft_appnd_o3")
    try {
      land(fileA, "a.parquet")
      runDrain(out1.toString, ckpt.toString)
      assert(emitted(out1) == Seq(("2024-01-01", 2L, 1L)),
        s"drain1: ${emitted(out1)}")
      land(fileB, "b.parquet")
      runDrain(out2.toString, ckpt.toString)
      // day0 NOT re-emitted (state was evicted, offsets not replayed);
      // day1 closed by fileB's watermark; day2/day3 still open
      assert(emitted(out2) == Seq(("2024-01-02", 1L, 1L)),
        s"drain2: ${emitted(out2)}")
      // combined incremental emissions == one uninterrupted run
      runDrain(out3.toString, ckpt2.toString)
      assert((emitted(out1) ++ emitted(out2)).sortBy(_._1) == emitted(out3))
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(stage, ckpt, ckpt2, out1, out2, out3).foreach { root =>
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(p => try { java.nio.file.Files.deleteIfExists(p); () }
                        catch { case _: java.io.IOException => () })
      }
    }
  }

  test("checkpoint recovery: transformWithState ValueState survives a restart (x409 quota gate)") {
    // The arbitrary-state v2 recovery proof: a source's running token
    // total (RocksDB-backed ValueState) is built from fileA, the query
    // is stopped, fileB lands, and a NEW query restarts from the SAME
    // checkpoint. The budget boundary is crossed only with fileA's
    // state in hand: lost state would re-admit everything, a replay
    // would re-emit fileA's verdicts.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val stage = java.nio.file.Files.createTempDirectory("graft_tws_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt")
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_tws_ckpt2")
    val out1 = java.nio.file.Files.createTempDirectory("graft_tws_o1")
    val out2 = java.nio.file.Files.createTempDirectory("graft_tws_o2")
    val out3 = java.nio.file.Files.createTempDirectory("graft_tws_o3")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    def drain(outDir: String, ckptDir: String): Unit = {
      val prev = spark.conf.getOption(providerKey)
      spark.conf.set(providerKey, "org.apache.spark.sql.execution" +
        ".streaming.state.RocksDBStateStoreProvider")
      try {
        val src = spark.readStream
          .schema("source STRING, doc_id LONG, n_tok LONG")
          .parquet(stage.toString)
          .as[(String, Long, Long)]
        val q = src.groupByKey(_._1)
          .transformWithState(new QuotaProcessor(100L),
            TimeMode.None(), OutputMode.Update())
          .toDF("source", "doc_id", "n_tok", "admitted")
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(outDir); ()
          }
          .outputMode("update").option("checkpointLocation", ckptDir)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally {
        prev match {
          case Some(v) => spark.conf.set(providerKey, v)
          case None => spark.conf.unset(providerKey)
        }
      }
    }
    def verdicts(d: java.nio.file.Path): Set[(String, Long, Boolean)] = {
      val fs = java.nio.file.Files.list(d)
      val any = try fs.iterator().asScala.exists(_.toString.endsWith(".parquet"))
      finally fs.close()
      if (!any) Set.empty
      else spark.read.parquet(d.toString).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3))).toSet
    }
    try {
      // fileA: s1 reaches cum 90 of the 100 budget; s2 only here
      landDf(Seq(("s1", 1L, 40L), ("s1", 2L, 50L), ("s2", 9L, 10L))
        .toDF("source", "doc_id", "n_tok"), stage, "a.parquet")
      drain(out1.toString, ckpt.toString)
      assert(verdicts(out1) == Set(("s1", 1L, true), ("s1", 2L, true),
        ("s2", 9L, true)), s"drain1: ${verdicts(out1)}")
      // fileB: doc3 starts at 90 (< 100: admitted, cum 110), doc4 at
      // 110 (gate closed). Reset state would admit BOTH.
      landDf(Seq(("s1", 3L, 20L), ("s1", 4L, 10L))
        .toDF("source", "doc_id", "n_tok"), stage, "b.parquet")
      drain(out2.toString, ckpt.toString)
      // exactly-once: fileA verdicts (incl. all of s2) not re-emitted;
      // state recovery: the budget boundary lands between doc3 and doc4
      assert(verdicts(out2) == Set(("s1", 3L, true), ("s1", 4L, false)),
        s"drain2: ${verdicts(out2)}")
      // combined == one uninterrupted run over the full backlog
      drain(out3.toString, ckpt2.toString)
      assert(verdicts(out1) ++ verdicts(out2) == verdicts(out3))
    } finally {
      Seq(stage, ckpt, ckpt2, out1, out2, out3).foreach { root =>
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(p => try { java.nio.file.Files.deleteIfExists(p); () }
                        catch { case _: java.io.IOException => () })
      }
    }
  }
}
