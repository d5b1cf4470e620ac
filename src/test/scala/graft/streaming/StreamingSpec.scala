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
}
