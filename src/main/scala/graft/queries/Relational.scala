package graft.queries

import Sql._

/** Core relational operator coverage (SURVEY.md §2.5): projection,
  * predicates, every join type, aggregation, set ops, subqueries, CTEs.
  * Texts are written in the Spark-SQL ∩ DuckDB dialect intersection so
  * one string serves as both the implementation and the oracle.
  */
object Relational {

  val qs: Seq[Q] = Seq(

    // ---- projection / filter / predicates ------------------------------
    Q.sql("q01_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum(dec("l_quantity"), "sum_qty")},
         |  ${dsum(dec("l_extendedprice"), "sum_base_price")},
         |  ${dsum(s"${dec("l_extendedprice")} * ${frac("1 - l_discount")}", "sum_disc_price")},
         |  ${dsum(s"CAST(${dec("l_extendedprice")} * ${frac("1 - l_discount")} AS DECIMAL(24,8)) * ${frac("1 + l_tax")}", "sum_charge")},
         |  ${davg("l_quantity", "avg_qty")},
         |  ${davg("l_extendedprice", "avg_price")},
         |  ${davg("l_discount", "avg_disc", 6)},
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= DATE '2000-12-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    Q.sql("q02_filter_predicates",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_returnflag IN ('A', 'R')
        |  AND NOT (l_discount > 0.08 OR l_tax < 0.01)
        |  AND l_shipdate >= DATE '1996-01-01'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag
        |LIMIT 2000""".stripMargin),

    Q.sql("q03_projection_expr",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,6)), 2) AS DOUBLE) AS net_price,
        |  upper(l_returnflag) AS flag_upper,
        |  l_quantity * 2 AS double_qty
        |FROM lineitem
        |WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber, net_price, flag_upper, double_qty""".stripMargin),

    Q.sql("q04_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    Q.sql("q05_case_cast",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 150000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_int,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_mapped
        |FROM orders
        |WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey""".stripMargin),

    // ---- joins ---------------------------------------------------------
    Q.sql("q06_join_inner",
      """SELECT o_orderkey, c_name, CAST(floor(o_totalprice) AS BIGINT) AS price_int
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 350000
        |ORDER BY o_orderkey""".stripMargin),

    Q.sql("q07_join_left",
      """SELECT c_custkey, count(o_orderkey) AS order_cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin),

    Q.sql("q08_join_right",
      """SELECT c_custkey, c_name, CAST(big_cnt AS BIGINT) AS big_cnt
        |FROM (SELECT o_custkey, count(*) AS big_cnt FROM orders
        |      WHERE o_totalprice > 300000 GROUP BY o_custkey) o
        |RIGHT JOIN customer ON o.o_custkey = customer.c_custkey
        |WHERE c_custkey <= 300
        |ORDER BY c_custkey""".stripMargin),

    Q.sql("q09_join_full",
      """SELECT coalesce(a.k, b.k) AS k, a.cnt_a, b.cnt_b
        |FROM (SELECT o_custkey AS k, count(*) AS cnt_a FROM orders
        |      WHERE o_totalprice > 380000 GROUP BY o_custkey) a
        |FULL JOIN (SELECT c_custkey AS k, count(*) AS cnt_b FROM customer
        |      WHERE c_acctbal < -800 GROUP BY c_custkey) b
        |ON a.k = b.k
        |ORDER BY k""".stripMargin),

    Q.sql("q10_join_cross",
      """SELECT r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name
        |LIMIT 60""".stripMargin),

    Q.sql("q11_semi_exists",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 390000)
        |ORDER BY c_custkey""".stripMargin),

    Q.sql("q12_anti_not_exists",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin),

    Q.sql("q13_self_join",
      """SELECT a.n_name AS n1, b.n_name AS n2, a.n_regionkey AS rk
        |FROM nation a JOIN nation b
        |  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
        |ORDER BY n1, n2""".stripMargin),

    Q.sql("q14_multi_join_revenue",
      s"""SELECT n_name,
         |  ${dsum(s"${dec("l_extendedprice")} * ${frac("1 - l_discount")}", "revenue")}
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND o_orderdate >= DATE '1996-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin),

    Q.sql("q15_join_using",
      """SELECT rk, r_name, count(*) AS nation_cnt
        |FROM (SELECT n_regionkey AS rk, n_name FROM nation) n
        |JOIN (SELECT r_regionkey AS rk, r_name FROM region) r USING (rk)
        |GROUP BY rk, r_name ORDER BY rk""".stripMargin),

    // ---- aggregation ---------------------------------------------------
    Q.sql("q16_group_having",
      """SELECT l_suppkey, count(*) AS cnt
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING count(*) > 590
        |ORDER BY l_suppkey""".stripMargin),

    Q.sql("q17_count_distinct",
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS supp_cnt,
        |  count(DISTINCT l_partkey) AS part_cnt,
        |  count(*) AS row_cnt
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    Q.sql("q18_minmax_agg",
      """SELECT o_orderstatus,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  min(o_orderdate) AS first_date, max(o_orderdate) AS last_date,
        |  max(o_orderpriority) AS max_prio
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin),

    Q.sql("q19_agg_filter_clause",
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_quantity > 25) AS big_qty_cnt,
        |  count(*) FILTER (WHERE l_discount = 0.0) AS no_disc_cnt,
        |  count(*) AS total_cnt
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    Q.sql2("q20_group_concat",
      """SELECT n_regionkey,
        |  array_join(sort_array(collect_list(n_name)), ',') AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin),

    Q.sql("q21_rollup",
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  count(*) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin),

    // ---- sort / limit / set ops ---------------------------------------
    Q.sql("q22_orderby_nulls",
      """SELECT s_suppkey, nullif(s_acctbal, 0) AS bal
        |FROM supplier
        |ORDER BY CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END
        |  ASC NULLS LAST, s_suppkey
        |LIMIT 200""".stripMargin),

    Q.sql("q23_limit_offset",
      """SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS price_int
        |FROM orders
        |ORDER BY o_orderkey
        |LIMIT 25 OFFSET 100""".stripMargin),

    Q.sql("q24_union",
      """SELECT k, count(*) AS cnt FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION
        |  SELECT s_nationkey AS k FROM supplier
        |) t GROUP BY k ORDER BY k""".stripMargin),

    Q.sql("q25_union_all",
      """SELECT k, count(*) AS cnt FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS k FROM supplier
        |) t GROUP BY k ORDER BY k""".stripMargin),

    Q.sql("q26_intersect",
      """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
        |INTERSECT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal > 0
        |ORDER BY k""".stripMargin),

    Q.sql("q27_except",
      """SELECT n_nationkey AS k FROM nation
        |EXCEPT
        |SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY k""".stripMargin),

    // ---- subqueries / CTEs / inline tables -----------------------------
    Q.sql("q28_subq_scalar",
      """SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS price_int
        |FROM orders
        |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin),

    Q.sql("q29_subq_in",
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        |ORDER BY s_suppkey""".stripMargin),

    Q.sql("q30_subq_correlated",
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS order_cnt
        |FROM customer
        |WHERE c_custkey <= 200
        |ORDER BY c_custkey""".stripMargin),

    Q.sql("q31_cte",
      """WITH big_orders AS (
        |  SELECT o_custkey, count(*) AS cnt FROM orders
        |  WHERE o_totalprice > 250000 GROUP BY o_custkey
        |), rich AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000
        |)
        |SELECT rich.c_custkey, rich.c_name, coalesce(big_orders.cnt, 0) AS big_cnt
        |FROM rich LEFT JOIN big_orders ON rich.c_custkey = big_orders.o_custkey
        |ORDER BY rich.c_custkey""".stripMargin),

    Q.sql("q32_values_inline",
      """SELECT t.prio, t.label, count(o_orderkey) AS cnt
        |FROM (VALUES ('1-URGENT', 'hot'), ('5-LOW', 'cold')) AS t(prio, label)
        |JOIN orders ON o_orderpriority = t.prio
        |GROUP BY t.prio, t.label
        |ORDER BY t.prio""".stripMargin),

    Q.sql("q33_derived_table",
      """SELECT d.o_orderstatus, d.cnt, d.avg_price
        |FROM (SELECT o_orderstatus, count(*) AS cnt,
        |             round(avg(o_totalprice), 4) AS avg_price
        |      FROM orders GROUP BY o_orderstatus) d
        |WHERE d.cnt > 10
        |ORDER BY d.o_orderstatus""".stripMargin)
  )
}
