package graft.queries

import graft.Tables
import graft.engine.Dialect

/** Remaining SQLite-dialect parity corners (SURVEY.md §2.5): LIKE
  * ESCAPE, total()/ifnull/iif family, NATURAL JOIN, COLLATE NOCASE
  * emulation, recursive CTEs, GLOB, julianday, date-modifier strings.
  * Spark-side SQLite-isms run through the graft.engine.Dialect shims.
  */
object Parity {

  /** Q whose Spark text needs the Dialect UDFs registered first. */
  private def dsql(name: String, sparkText: String, duckText: String): Q =
    Q(name, (s, dir) => {
      Tables.registerAll(s, dir); Dialect.register(s); s.sql(sparkText)
    }, Some(duckText))

  val qs: Seq[Q] = Seq(

    Q.sql("q65_like_escape",
      """SELECT p_partkey, p_brand
        |FROM part
        |WHERE concat(p_brand, '_tail') LIKE 'Brand#3!_tail' ESCAPE '!'
        |ORDER BY p_partkey
        |LIMIT 300""".stripMargin),

    Q.sql2("q66_total_ifnull_iif",
      """SELECT o_orderstatus,
        |  CAST(round(coalesce(sum(CASE WHEN o_totalprice > 400000
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0.0), 2) AS DOUBLE) AS total_big,
        |  ifnull(max(CASE WHEN o_totalprice > 400000 THEN o_orderpriority END),
        |         'NONE') AS top_prio,
        |  count(if(o_orderpriority = '1-URGENT', 1, NULL)) AS urgent_cnt
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      """SELECT o_orderstatus,
        |  CAST(round(coalesce(sum(CASE WHEN o_totalprice > 400000
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0.0), 2) AS DOUBLE) AS total_big,
        |  ifnull(max(CASE WHEN o_totalprice > 400000 THEN o_orderpriority END),
        |         'NONE') AS top_prio,
        |  count(if(o_orderpriority = '1-URGENT', 1, NULL)) AS urgent_cnt
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    Q.sql("q67_natural_join",
      """SELECT k, n_name, cnt
        |FROM (SELECT n_nationkey AS k, n_name FROM nation) a
        |NATURAL JOIN (SELECT c_nationkey AS k, count(*) AS cnt
        |              FROM customer GROUP BY c_nationkey) b
        |ORDER BY k""".stripMargin),

    Q.sql("q68_collate_nocase",
      """SELECT p_partkey, p_type
        |FROM part
        |WHERE lower(p_type) = lower(upper(p_type))
        |   OR lower(p_brand) LIKE lower('BRAND#1%')
        |ORDER BY lower(p_type), p_partkey
        |LIMIT 400""".stripMargin),

    Q.sql("q69_recursive_cte",
      """WITH RECURSIVE seq(n) AS (
        |  SELECT 1
        |  UNION ALL
        |  SELECT n + 1 FROM seq WHERE n < 12
        |)
        |SELECT n, n * n AS sq FROM seq ORDER BY n""".stripMargin),

    dsql("q70_glob",
      """SELECT p_partkey, p_name
        |FROM part
        |WHERE glob(p_name, '*bolt*')
        |ORDER BY p_partkey
        |LIMIT 300""".stripMargin,
      """SELECT p_partkey, p_name
        |FROM part
        |WHERE p_name GLOB '*bolt*'
        |ORDER BY p_partkey
        |LIMIT 300""".stripMargin),

    dsql("q71_julianday",
      """SELECT o_orderkey,
        |  CAST(floor(julianday(o_orderdate)) AS BIGINT) AS jd
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey,
        |  CAST(floor(julian(o_orderdate) - 0.5) AS BIGINT) AS jd
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin),

    Q.sql("q73_grouping_sets",
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  count(*) AS cnt,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY flag, status""".stripMargin),

    Q.sql("q74_cube",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS prio,
        |  count(*) AS cnt
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, prio""".stripMargin),

    dsql("q72_date_modifiers",
      """SELECT o_orderkey,
        |  CAST(CAST(sqlite_date(o_orderdate, '+1 day') AS DATE) AS STRING) AS next_day,
        |  CAST(CAST(sqlite_date(o_orderdate, 'start of month') AS DATE) AS STRING) AS month_start,
        |  CAST(CAST(sqlite_date(o_orderdate, '-2 months') AS DATE) AS STRING) AS two_months_ago
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate + INTERVAL '1 day' AS DATE) AS STRING) AS next_day,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS STRING) AS month_start,
        |  CAST(CAST(o_orderdate - INTERVAL '2 months' AS DATE) AS STRING) AS two_months_ago
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin)
  )
}
