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
