package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** x404's chooser contract: the salted path engages ONLY above the
  * documented threshold, at the exact integer ceil rule. (Lives in the
  * queries package to reuse the judged fixture derivation,
  * ExtShared.skewDocs, rather than duplicating it.) */
class SaltPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("x404 chooser: planned keys are exactly the above-threshold keys, at the exact ceil factor") {
    val sh = graft.ext.Dedup.shingles3(
      ExtShared.skewDocs(Tables.load(spark, dir, "documents")))
    val plan50 = graft.ext.Salting.saltPlan(sh, "shingle",
      targetPerTask = 50L, maxFactor = 16).collect()
    val nDocs = Tables.load(spark, dir, "documents").count()
    // the universal footer shingle (in EVERY doc) is planned at the
    // exact ceil rule, clamped to maxFactor
    val footer = plan50.find(_.getString(0) == "copyright footer notice")
    assert(footer.isDefined, plan50.take(5).mkString(","))
    assert(footer.get.getInt(1) == math.min(16L, (nDocs + 49) / 50).toInt,
      footer.get.toString)
    // and cold keys are absent: every planned key really exceeds the
    // threshold (re-profiled independently)
    val hot = sh.groupBy("shingle").agg(count(lit(1)).as("c"))
      .where(col("c") > 50).count()
    assert(plan50.length == hot.toInt, s"${plan50.length} vs $hot")
    // the planned aggregation equals the plain one (associativity is
    // the whole contract)
    val plain = sh.groupBy("shingle")
      .agg(count(lit(1)).as("cnt"),
        sum(col("doc_id") % 1000).cast("bigint").as("sum_val"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val salted = graft.ext.Salting.plannedSaltedCountSum(sh, "shingle",
        col("doc_id") % 1000, col("doc_id"),
        graft.ext.Salting.saltPlan(sh, "shingle", 50L, 16))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(salted == plain)
  }
}
