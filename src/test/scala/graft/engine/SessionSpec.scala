package graft.engine

import graft.SparkSpec
import graft.io.Save

/** End-to-end engine flow over README-shaped fixtures: load -> register
  * -> SQL (the reference's golden sessions, README.md:42-116) -> export. */
class SessionSpec extends SparkSpec {

  private def freshSession(): Session = {
    Dialect.register(spark)
    new Session(spark)
  }

  private def loadFixtures(s: Session): java.nio.file.Path = {
    val d = tmpDir()
    writeFile(d, "csv.csv", "id,b,c\n1,4,7\n2,5,8\n3,6,9\n")
    writeFile(d, "one.json", """[{"id":1,"b":4},{"id":2,"c":5},{"id":3,"d":6}]""")
    s.loadDir(d.toString)
    d
  }

  test("load + name sanitization + \\t listing") {
    val s = freshSession()
    loadFixtures(s)
    assert(s.tableNames.toSet == Set("csv_csv", "one_json"))
  }

  test("README flagship: LEFT JOIN keeps unmatched rows with nulls (README.md:65-71)") {
    val s = freshSession()
    loadFixtures(s)
    val r = s.sql(
      """SELECT e.id AS eid, j.b AS jb FROM csv_csv e
        |LEFT JOIN one_json j ON e.id = j.id ORDER BY e.id""".stripMargin).collect()
    assert(r.length == 3)
    assert(r(0).getAs[Any]("jb") == 4L)
    assert(r(1).isNullAt(1)) // id=2 row of one_json has no b -> null, NOT NaN/float
  }

  test("README group-by: NULL is a group key; NULLS LAST ordering (README.md:74-79)") {
    val s = freshSession()
    loadFixtures(s)
    val r = s.sql(
      """SELECT c, count(*) AS cnt FROM one_json
        |GROUP BY c ORDER BY 1 ASC NULLS LAST""".stripMargin).collect()
    assert(r.length == 2)
    assert(r(0).getAs[Any]("c") == 5L)
    assert(r(1).isNullAt(0)) // the NULL group, last
  }

  test("bare table name -> schema info; describeTables has rows/cols") {
    val s = freshSession()
    loadFixtures(s)
    assert(s.info("csv_csv").contains("id"))
    val d = s.describeTables().map(t => (t._1, t._2, t._3)).toSet
    assert(d == Set(("csv_csv", 3L, 3), ("one_json", 3L, 4)))
  }

  test("dialect shims: typeof / glob / quote / julianday") {
    val s = freshSession()
    loadFixtures(s)
    val r = s.sql("""SELECT typeof(id) AS t1, typeof('x') AS t2,
      glob('hello', 'h*o') AS g1, glob('hello', 'h?l') AS g2,
      quote('it''s') AS q,
      julianday(TIMESTAMP '1970-01-01 12:00:00') AS jd
      FROM csv_csv LIMIT 1""").head
    assert(r.getAs[String]("t1") == "integer")
    assert(r.getAs[String]("t2") == "text")
    assert(r.getAs[Boolean]("g1"))
    assert(!r.getAs[Boolean]("g2"))
    assert(r.getAs[String]("q") == "'it''s'")
    assert(math.abs(r.getAs[Double]("jd") - 2440588.0) < 1e-9)
  }

  test("groupsFrame: GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING, hand-computed with ties") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // partition p=a: order values 1,1,2,4 — peer groups {1,1},{2},{4}
    // GROUPS 1 PRECEDING..1 FOLLOWING sums whole neighbor groups:
    //   o=1 rows: groups {1,1}+{2}            = 10+20+30   = 60
    //   o=2 row : groups {1,1}+{2}+{4}        = 10+20+30+40 = 100
    //   o=4 row : groups {2}+{4}              = 30+40      = 70
    val df = Seq(("a", 1, 10L), ("a", 1, 20L), ("a", 2, 30L),
      ("a", 4, 40L), ("b", 7, 5L)).toDF("p", "o", "v")
    val got = Dialect.groupsFrame(df, Seq("p"), "o", 1, 1,
        sum(col("v")), "fs")
      .select("p", "o", "v", "fs").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(("a", 1, 10L, 60L), ("a", 1, 20L, 60L),
      ("a", 2, 30L, 100L), ("a", 4, 40L, 70L), ("b", 7, 5L, 5L)))
    // min as the combine: GROUPS frame min over the same peers
    val gotMin = Dialect.groupsFrame(df, Seq("p"), "o", 1, 1,
        min(col("v")), "fm", min)
      .select("p", "o", "fm").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(gotMin == Set(("a", 1, 10L), ("a", 2, 10L), ("a", 4, 30L),
      ("b", 7, 5L)))
  }

  test("save: csv single file + json NDJSON + xlsx round-trip") {
    val s = freshSession()
    loadFixtures(s)
    s.sql("SELECT id, b FROM csv_csv ORDER BY id")
    val d = tmpDir()
    val csvOut = d.resolve("out.csv").toString
    Save.save(s.latestResult.get, csvOut)
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(csvOut))
    assert(lines.get(0) == "id,b" && lines.size == 4)
    val jsonOut = d.resolve("out.json").toString
    Save.save(s.latestResult.get, jsonOut)
    assert(java.nio.file.Files.readAllLines(java.nio.file.Paths.get(jsonOut)).get(0).startsWith("{\"id\":"))
    val xlsxOut = d.resolve("out.xlsx").toString
    Save.save(s.latestResult.get, xlsxOut)
    assert(graft.ingest.Xlsx.read(spark, xlsxOut).count() == 3)
    // beyond-reference columnar round-trips: one file out, readable back
    // through the ingestion dispatch
    val pqOut = d.resolve("out.parquet").toString
    Save.save(s.latestResult.get, pqOut)
    assert(graft.ingest.Readers.read(spark, pqOut).get.count() == 3)
    val orcOut = d.resolve("out.orc").toString
    Save.save(s.latestResult.get, orcOut)
    assert(graft.ingest.Readers.read(spark, orcOut).get.count() == 3)
    intercept[IllegalArgumentException] { Save.save(s.latestResult.get, d.resolve("out.txt").toString) }
  }

  test("glob->regex translation corners") {
    assert(Dialect.globToRegex("a[bc]d") == "\\Aa[bc]d\\z")
    assert(Dialect.globToRegex("*.csv") == "\\A.*\\.csv\\z")
    assert("x+y".matches(Dialect.globToRegex("x+y")))
  }

  test("glob: newline-terminated value matches identically via UDF and RLIKE rewrite") {
    // ^...$ anchoring would diverge: String.matches (UDF path) rejects a
    // trailing '\n' while RLike's find-mode '$' matches just before it —
    // \A...\z keeps the two paths bit-identical (ADVICE r2).
    val s = freshSession()
    import spark.implicits._
    val df = Seq("hello", "hello\n", "hello\nworld").toDF("v")
    df.createOrReplaceTempView("nl_vals")
    // literal pattern -> optimizer rewrites to RLIKE (PlanSpec guards this)
    val viaRewrite = s.sql(
      "SELECT v FROM nl_vals WHERE glob(v, 'h*o') ORDER BY v").collect().map(_.getString(0))
    // dynamic pattern -> stays a UDF (rewrite needs a literal)
    val viaUdf = s.sql(
      "SELECT v FROM nl_vals WHERE glob(v, concat('h*', 'o')) ORDER BY v").collect().map(_.getString(0))
    assert(viaRewrite.toSeq == Seq("hello"))
    assert(viaUdf.toSeq == viaRewrite.toSeq)
  }

  test("completions: tables first then deduped columns; quoting rule golden (ref :323-333, :40)") {
    val s = freshSession()
    loadFixtures(s)
    val c = s.completions
    // table names lead, then the union of columns, first-seen, deduped
    assert(c.take(2) == Seq("csv_csv", "one_json"))
    assert(c.count(_ == "id") == 1 && c.count(_ == "b") == 1)
    // prefix completion on the last word of the buffer
    assert(Completions.complete(c, "SELECT i") == Seq("id"))
    assert(Completions.complete(c, "SELECT id, b FROM csv") == Seq("csv_csv"))
    assert(Completions.complete(c, "SELECT ").size == c.size) // fresh word
    // quoting golden: the reference's special-char regex -> backticks
    assert(Completions.quoteIfNeeded("plain_col") == "plain_col")
    assert(Completions.quoteIfNeeded("my col") == "`my col`")
    assert(Completions.quoteIfNeeded("nest.a") == "`nest.a`")
    assert(Completions.quoteIfNeeded("a-b") == "`a-b`")
    assert(Completions.quoteIfNeeded("odd`tick") == "`odd``tick`")
    assert(Completions.quoteIfNeeded("col(1)") == "`col(1)`")
  }

  test("load-error tolerance: bad file skipped, good ones load (ref :302-316)") {
    val s = freshSession()
    val d = tmpDir()
    writeFile(d, "good.csv", "a,b\n1,2\n")
    writeFile(d, "bad.xlsx", "this is not a zip")
    writeFile(d, "skip.txt", "not a known format")
    val loaded = s.loadDir(d.toString)
    assert(loaded == Seq("good_csv"))
  }
}
