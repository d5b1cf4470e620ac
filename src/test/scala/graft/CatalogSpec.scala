package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog integrity: SparkEntry.queries is a Map, so a duplicated
  * query name would SILENTLY drop one implementation (and the driver
  * would never notice the missing row). Guard the invariant here. */
class CatalogSpec extends AnyFunSuite {

  test("no query-name collisions; every query has a well-formed name") {
    val names = (queries.Relational.qs ++ queries.Windows.qs ++
      queries.Functions.qs ++ queries.Parity.qs ++ queries.Extensions.qs ++
      queries.Fuzz.qs)
      .map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(",")}")
    assert(SparkEntry.queries.size == names.size)
    assert(names.forall(_.matches("(q|x|fz)[0-9]+_[a-z0-9_]+")), names.filterNot(_.matches("(q|x|fz)[0-9]+_[a-z0-9_]+")))
  }

  test("every oracle belongs to a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("the driver's flagship smoke-check contract holds: entry() returns rows") {
    // the driver calls SparkEntry.entry(spark) directly and requires
    // rows > 0 on sf0.001; nothing else exercises that exact code path
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-entry-smoke")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("rows-only queries are exactly the documented eleven — nothing loses its oracle silently") {
    // a new query registered without its oracleSql entry would demote
    // itself to the weaker rows-only check without any test noticing;
    // pin the intentional rows-only set (COVERAGE.md Totals) so the
    // omission fails loudly instead
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // round 12 shrank this set 11 -> 5: the deterministic-by-
    // construction ANN/semdedup tiers (IVF, PQ, IVF-PQ, residual,
    // incremental assign, SemDeDup) gained full DuckDB re-derivation
    // oracles (ExtShared.ivfOracleSql / pqOracleSql / ivfPqOracleSql /
    // semDedupOracleSql). What remains is approximate BY NATURE on the
    // oracle side: HLL sketches (x63, x112, x287), percentile_approx
    // (x129), and the engine-dependent float fold (x64).
    assert(rowsOnly == Set(
      "x63_approx_distinct", "x64_knn_float", "x112_profile_approx",
      "x129_median_gate_approx", "x287_rolling_active_approx"),
      s"unexpected rows-only set: ${rowsOnly.toSeq.sorted.mkString(",")}")
  }
}
