package graft.ingest

import graft.SparkSpec

/** Xlsx zip+XML reader/writer (SURVEY.md §7.4), exercised round-trip:
  * our writer's numeric + inline-string cells and our reader's shared/
  * inline string resolution and type inference. */
class XlsxSpec extends SparkSpec {

  test("write/read round-trip preserves schema and data") {
    import spark.implicits._
    val df = Seq((1L, 6L, "x"), (2L, 7L, "y"), (3L, 8L, "z & <q>"))
      .toDF("id", "b", "c")
    val path = tmpDir().resolve("t.xlsx").toString
    Xlsx.write(df, path)
    val back = Xlsx.read(spark, path)
    assert(back.columns.toSeq == Seq("id", "b", "c"))
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("c").dataType.typeName == "string")
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      == Seq((1L, 6L, "x"), (2L, 7L, "y"), (3L, 8L, "z & <q>")))
  }

  test("reference-shaped sheet: 5 rows id/b/c numeric (FIXTURES.md A)") {
    import spark.implicits._
    val df = (1L to 5L).map(i => (i, i + 5, i + 10)).toDF("id", "b", "c")
    val path = tmpDir().resolve("excel.xlsx").toString
    Xlsx.write(df, path)
    val back = Xlsx.read(spark, path)
    assert(back.count() == 5)
    assert(back.agg(org.apache.spark.sql.functions.sum("c")).head.getLong(0) == (11 to 15).sum)
  }

  test("DataSourceV2 path: spark.read.format(graft-xlsx) equals the driver reader") {
    import spark.implicits._
    val df = Seq((1L, 6L, "x"), (2L, 7L, "y"), (3L, 8L, "z & <q>"))
      .toDF("id", "b", "c")
    val path = tmpDir().resolve("v2.xlsx").toString
    Xlsx.write(df, path)
    val v2 = spark.read.format("graft-xlsx").load(path)
    val driver = Xlsx.read(spark, path)
    assert(v2.schema == driver.schema)
    assert(v2.orderBy("id").collect().toSeq == driver.orderBy("id").collect().toSeq)
  }

  test("DataSourceV2 path: row-range partitions cover the sheet exactly once") {
    import spark.implicits._
    val df = (1L to 257L).map(i => (i, s"s$i")).toDF("id", "s")
    val path = tmpDir().resolve("parts.xlsx").toString
    Xlsx.write(df, path)
    val v2 = spark.read.format("graft-xlsx")
      .option("rowsPerPartition", "100").load(path)
    // 257 data rows at 100/partition -> 3 input partitions, no row lost
    // or duplicated across the range boundaries
    assert(v2.rdd.getNumPartitions == 3)
    assert(v2.count() == 257)
    assert(v2.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == (1L to 257L))
  }

  test("DataSourceV2 path: column pruning reaches the scan") {
    import spark.implicits._
    val df = Seq((1L, 1.5, "a"), (2L, 2.5, "b")).toDF("k", "v", "s")
    val path = tmpDir().resolve("prune.xlsx").toString
    Xlsx.write(df, path)
    val pruned = spark.read.format("graft-xlsx").load(path).select("s")
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    // the v2 scan's read schema reflects the pushed projection
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("graft-xlsx") && scan.contains("[s]"), scan)
  }

  test("mixed / doubles infer DoubleType; column letters decode") {
    import spark.implicits._
    val df = Seq((1L, 1.5), (2L, 2.25)).toDF("k", "v")
    val path = tmpDir().resolve("d.xlsx").toString
    Xlsx.write(df, path)
    val back = Xlsx.read(spark, path)
    assert(back.schema("v").dataType.typeName == "double")
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA12") == 26)
    assert(Xlsx.colIndex("BC3") == 54)
  }
}
