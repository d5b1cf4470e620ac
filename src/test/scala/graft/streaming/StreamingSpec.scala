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
