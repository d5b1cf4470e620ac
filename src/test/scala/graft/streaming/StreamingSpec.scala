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
      .filter(n => n.startsWith("graft_ckpt") || n.startsWith("graft_stream_src"))
      .toSet
  }

  test("streaming runs clean up their checkpoint and stage dirs") {
    val before = graftTmpDirs()
    val r = Streaming.hourlyCounts(spark, dir)
    assert(r.count() > 0) // the query really ran (memory sink populated)
    val r2 = Streaming.streamStaticJoin(spark, dir)
    assert(r2.count() > 0)
    assert(graftTmpDirs() == before,
      s"leaked: ${graftTmpDirs().diff(before).mkString(",")}")
  }
}
