package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions packaging path: a session built with
  * GraftExtensions resolves float_dot/quant_dot in pure SQL, no
  * imperative registration. */
class GraftExtensionsSpec extends SparkSpec {

  test("injected functions resolve in SQL on an extensions-built session") {
    spark // force the shared session (and its context) to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s.sql(
        """SELECT quant_dot(array(CAST(0.5 AS FLOAT)), array(CAST(0.5 AS FLOAT))) AS q,
          |       float_dot(array(CAST(0.5 AS FLOAT)), array(CAST(0.5 AS FLOAT))) AS f""".stripMargin)
        .head
      assert(r.getLong(0) == 5000L * 5000L)
      assert(math.abs(r.getDouble(1) - 0.25) < 1e-12)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
