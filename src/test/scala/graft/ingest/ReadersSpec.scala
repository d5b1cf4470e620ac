package graft.ingest

import graft.SparkSpec

/** File readers vs the reference's ingestion semantics, over fixtures
  * generated to FIXTURES.md §A's documented shapes (content per
  * README.md examples — regenerated, not copied). */
class ReadersSpec extends SparkSpec {

  test("format/compression sniff (ref localsql.py:86-97)") {
    assert(Readers.sniff("a.csv") == (Some("csv"), None))
    assert(Readers.sniff("a.json.gz") == (Some("json"), Some("gz")))
    assert(Readers.sniff("a.csv.bz2") == (Some("csv"), Some("bz2")))
    assert(Readers.sniff("a.xlsx") == (Some("xlsx"), None))
    assert(Readers.sniff("a.parquet") == (Some("parquet"), None))
    assert(Readers.sniff("a.txt") == (None, None))
    assert(Readers.sniff("noext") == (None, None))
    assert(Readers.sniff("weird.gz") == (None, None)) // compressor without format
  }

  test("parquet reads natively (beyond-reference format); compressed parquet skipped") {
    val d = tmpDir()
    val p = d.resolve("data.parquet").toString
    spark.createDataFrame(Seq((1L, "a"), (2L, "b"))).toDF("id", "name")
      .coalesce(1).write.mode("overwrite").parquet(p)
    // spark writes a directory; point at the single part file like a
    // user handing us one .parquet file
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(p)).iterator()
    val file = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val df = Readers.read(spark, file.toString).get
    assert(df.columns.sorted.toSeq == Seq("id", "name"))
    assert(df.count() == 2)
    assert(Readers.read(spark, d.resolve("x.parquet.gz").toString).isEmpty)
  }

  test("orc reads natively (beyond-reference format); compressed orc skipped") {
    assert(Readers.sniff("a.orc") == (Some("orc"), None))
    val d = tmpDir()
    val p = d.resolve("data.orc").toString
    spark.createDataFrame(Seq((1L, "a"), (2L, "b"), (3L, "c"))).toDF("id", "name")
      .coalesce(1).write.mode("overwrite").orc(p)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(p)).iterator()
    val file = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".orc")).get
    val df = Readers.read(spark, file.toString).get
    assert(df.columns.sorted.toSeq == Seq("id", "name"))
    assert(df.count() == 3)
    assert(Readers.read(spark, d.resolve("x.orc.gz").toString).isEmpty)
  }

  test("csv: header + type inference") {
    val d = tmpDir()
    val p = writeFile(d, "csv.csv", "id,b,c\n1,4,7\n2,5,8\n3,6,9\n")
    val df = Readers.read(spark, p).get
    assert(df.columns.toSeq == Seq("id", "b", "c"))
    assert(df.count() == 3)
    assert(df.schema("id").dataType.typeName == "integer")
  }

  test("NDJSON with sparse keys: union-of-keys schema, nulls, no float upcast") {
    val d = tmpDir()
    val p = writeFile(d, "lines.json", """{"id":1,"b":4}""" + "\n" +
      """{"id":2,"b":5}""" + "\n" + """{"id":3,"c":6}""" + "\n")
    val df = Readers.read(spark, p).get
    assert(df.columns.sorted.toSeq == Seq("b", "c", "id"))
    assert(df.schema("b").dataType.typeName == "long") // no float64 upcast (SURVEY §7.5)
    assert(df.where("c IS NULL").count() == 2)
  }

  test("whole-document JSON array fallback (multiLine)") {
    val d = tmpDir()
    val p = writeFile(d, "one.json",
      """[{"id":1,"b":4},{"id":2,"c":5},{"id":3,"d":6}]""")
    val df = Readers.read(spark, p).get
    assert(df.columns.sorted.toSeq == Seq("b", "c", "d", "id"))
    assert(df.count() == 3)
  }

  test("nested values stringified by default (ref :72-76); native with flag off") {
    val d = tmpDir()
    val content = """{"id":1,"nest":{"a":1,"b":[1,2,3]}}""" + "\n" +
      """{"id":2,"c":6}""" + "\n"
    val p = writeFile(d, "lines_nested.json", content)
    val strified = Readers.read(spark, p).get
    assert(strified.schema("nest").dataType.typeName == "string")
    assert(strified.where("id = 1").head.getAs[String]("nest").contains("\"a\":1"))
    val native = Readers.json(spark, p, stringifyNested = false)
    assert(native.schema("nest").dataType.typeName == "struct")
  }

  test("jsonNormalize: dotted column names (ref -jn, README.md:84-90)") {
    val d = tmpDir()
    val content = """{"id":1,"nest":{"a":1,"b":[1,2,3]}}""" + "\n" +
      """{"id":2,"c":6}""" + "\n"
    val p = writeFile(d, "lines_nested.json", content)
    val df = Readers.jsonNormalize(spark, p)
    assert(df.columns.contains("nest.a"))
    assert(df.columns.contains("nest.b"))
    assert(df.select(org.apache.spark.sql.functions.col("`nest.a`")).where("id = 1").head.getLong(0) == 1L)
  }

  test("zip-compressed csv unpacks and reads (ref :91)") {
    val d = tmpDir()
    val zip = d.resolve("data.csv.zip")
    val zos = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(zip))
    zos.putNextEntry(new java.util.zip.ZipEntry("data.csv"))
    zos.write("id,v\n1,10\n2,20\n".getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val df = Readers.read(spark, zip.toString).get
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("id", "v"))
  }

  test("gzip NDJSON reads transparently (ref :121-122)") {
    val d = tmpDir()
    val raw = """{"id":1,"b":4}""" + "\n" + """{"id":2,"b":5}""" + "\n"
    val gz = d.resolve("lines.json.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(gz))
    out.write(raw.getBytes("UTF-8")); out.close()
    val df = Readers.read(spark, gz.toString).get
    assert(df.count() == 2)
  }

  test("xz csv decompresses correctly (no default Hadoop xz codec) and bz2 csv reads transparently") {
    import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
    import org.apache.commons.compress.compressors.xz.XZCompressorOutputStream
    val d = tmpDir()
    val raw = "id,v\n1,10\n2,20\n3,30\n".getBytes("UTF-8")
    val xz = d.resolve("data.csv.xz")
    val ox = new XZCompressorOutputStream(java.nio.file.Files.newOutputStream(xz))
    ox.write(raw); ox.close()
    val dfx = Readers.read(spark, xz.toString).get
    assert(dfx.columns.toSeq == Seq("id", "v") && dfx.count() == 3)
    val bz2 = d.resolve("data.csv.bz2")
    val ob = new BZip2CompressorOutputStream(java.nio.file.Files.newOutputStream(bz2))
    ob.write(raw); ob.close()
    val dfb = Readers.read(spark, bz2.toString).get
    assert(dfb.columns.toSeq == Seq("id", "v") && dfb.count() == 3)
  }

  test("bz2- and xz-compressed xlsx round-trip (ref {gz,bz2,zip,xz} x xlsx, :91)") {
    import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
    import org.apache.commons.compress.compressors.xz.XZCompressorOutputStream
    val d = tmpDir()
    val plain = d.resolve("excel.xlsx").toString
    val src = spark.createDataFrame(Seq((1L, "a"), (2L, "b"), (3L, "c")))
      .toDF("id", "name")
    Xlsx.write(src, plain)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(plain))
    val bz2 = d.resolve("excel.xlsx.bz2")
    val ob = new BZip2CompressorOutputStream(java.nio.file.Files.newOutputStream(bz2))
    ob.write(bytes); ob.close()
    val xz = d.resolve("excel.xlsx.xz")
    val ox = new XZCompressorOutputStream(java.nio.file.Files.newOutputStream(xz))
    ox.write(bytes); ox.close()
    for (p <- Seq(bz2, xz)) {
      val df = Readers.read(spark, p.toString).get
      assert(df.columns.toSeq == Seq("id", "name"), p)
      assert(df.count() == 3, p)
    }
  }
}
