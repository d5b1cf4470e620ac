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

  /** DuckDB expression for SQLite typeof() semantics over column c. */
  private def duckTypeof(c: String): String =
    s"""CASE WHEN ($c) IS NULL THEN 'null'
       |    WHEN lower(typeof($c)) IN
       |      ('tinyint','smallint','integer','bigint','hugeint','boolean')
       |      THEN 'integer'
       |    WHEN lower(typeof($c)) IN ('float','double','real') THEN 'real'
       |    WHEN lower(typeof($c)) = 'blob' THEN 'blob'
       |    ELSE 'text' END""".stripMargin

  /** DuckDB expression for SQLite quote() semantics over string c. */
  private def duckQuote(c: String): String =
    s"CASE WHEN ($c) IS NULL THEN 'NULL' " +
      s"ELSE '''' || replace($c, '''', '''''') || '''' END"

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

    Q.sql2("q75_pivot",
      """SELECT * FROM (SELECT o_orderstatus, o_orderpriority FROM orders)
        |PIVOT (count(*) FOR o_orderpriority
        |       IN ('1-URGENT' AS urgent, '3-MEDIUM' AS medium, '5-LOW' AS low))
        |ORDER BY o_orderstatus""".stripMargin,
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
        |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
        |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    Q.sql2("q76_array_hof",
      """SELECT vec_id, size(embedding) AS dim,
        |  CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) * 10000) AS BIGINT) AS first_q,
        |  aggregate(transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)),
        |    CAST(0 AS BIGINT), (acc, x) -> acc + x) AS qsum,
        |  size(filter(embedding, x -> x > 0)) AS n_pos
        |FROM embeddings WHERE vec_id < 200 ORDER BY vec_id""".stripMargin,
      """SELECT vec_id, len(embedding) AS dim,
        |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT) AS first_q,
        |  CAST(list_sum(list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS BIGINT) AS qsum,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos
        |FROM embeddings WHERE vec_id < 200 ORDER BY vec_id""".stripMargin),

    Q.sql2("q77_from_json_struct",
      """SELECT s.k % 5 AS km, count(*) AS cnt
        |FROM (SELECT from_json(props, 'k INT') AS s FROM events) t
        |GROUP BY s.k % 5 ORDER BY km""".stripMargin,
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 5 AS km,
        |  count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY km""".stripMargin),

    Q(name = "q78_udaf_xor",
      run = (s, dir) => {
        Tables.registerAll(s, dir)
        graft.functions.XorAgg.register(s)
        s.sql("""SELECT user_id % 10 AS g, xor_agg(event_id) AS x
                |FROM events GROUP BY user_id % 10 ORDER BY g""".stripMargin)
      },
      oracle = Some(
        """SELECT user_id % 10 AS g, bit_xor(event_id) AS x
          |FROM events GROUP BY 1 ORDER BY g""".stripMargin)),

    Q.df("q79_salted_agg",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir, "events")
        graft.ext.Salting.saltedCountSum(ev, "event_type",
            col("value").cast("decimal(18,2)"), col("event_id"), 32)
          .select(col("event_type"), col("cnt"),
            expr("CAST(round(sum_val, 2) AS DOUBLE)").as("sum_val"))
          .orderBy("event_type")
      },
      """SELECT event_type, count(*) AS cnt,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_val
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    Q.sql2("q80_string_fns2",
      """SELECT p_partkey,
        |  hex(encode(substr(p_name, 1, 4), 'UTF-8')) AS name_hex,
        |  ascii(p_brand) AS brand_ascii,
        |  chr(65 + CAST(p_partkey % 26 AS INT)) AS letter,
        |  repeat(p_brand, 2) AS brand2,
        |  reverse(p_type) AS type_rev,
        |  format_string('%d|%s', p_size, p_brand) AS formatted,
        |  left(p_name, 3) AS l3, right(p_name, 3) AS r3
        |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin,
      """SELECT p_partkey,
        |  hex(encode(substr(p_name, 1, 4))) AS name_hex,
        |  ascii(p_brand) AS brand_ascii,
        |  chr(65 + CAST(p_partkey % 26 AS INT)) AS letter,
        |  repeat(p_brand, 2) AS brand2,
        |  reverse(p_type) AS type_rev,
        |  printf('%d|%s', p_size, p_brand) AS formatted,
        |  left(p_name, 3) AS l3, right(p_name, 3) AS r3
        |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin),

    Q.sql2("q81_win_ignore_nulls",
      """SELECT s_suppkey,
        |  lag(nullif(s_acctbal, 0.0), 2, -1.0) OVER w AS lag2,
        |  first_value(CASE WHEN s_acctbal > 5000 THEN s_name END) IGNORE NULLS
        |    OVER (PARTITION BY s_nationkey ORDER BY s_suppkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS first_rich
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_suppkey)
        |ORDER BY s_suppkey""".stripMargin,
      """SELECT s_suppkey,
        |  lag(nullif(s_acctbal, 0.0), 2, -1.0) OVER w AS lag2,
        |  first_value(CASE WHEN s_acctbal > 5000 THEN s_name END IGNORE NULLS)
        |    OVER (PARTITION BY s_nationkey ORDER BY s_suppkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS first_rich
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_suppkey)
        |ORDER BY s_suppkey""".stripMargin),

    Q.sql2("q82_percentile_disc",
      """SELECT l_returnflag,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS med_qty,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS med_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |  quantile_disc(l_quantity, 0.5) AS med_qty,
        |  quantile_disc(l_quantity, 0.9) AS p90_qty,
        |  quantile_disc(l_extendedprice, 0.5) AS med_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    Q.sql2("q83_string_predicates",
      """SELECT p_partkey,
        |  translate(p_brand, '#', '_') AS brand_t,
        |  contains(p_name, 'olt') AS has_olt,
        |  startswith(p_type, 'PROMO') AS is_promo,
        |  endswith(p_type, 'STEEL') AS is_steel,
        |  CAST(position('a' IN p_name) AS BIGINT) AS first_a
        |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin,
      """SELECT p_partkey,
        |  translate(p_brand, '#', '_') AS brand_t,
        |  contains(p_name, 'olt') AS has_olt,
        |  starts_with(p_type, 'PROMO') AS is_promo,
        |  ends_with(p_type, 'STEEL') AS is_steel,
        |  CAST(position('a' IN p_name) AS BIGINT) AS first_a
        |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin),

    Q.sql2("q84_bitwise",
      """SELECT s_suppkey,
        |  s_suppkey & 255 AS low_byte,
        |  s_suppkey | 1024 AS with_flag,
        |  CAST(s_suppkey ^ 9999 AS BIGINT) AS xored,
        |  shiftleft(s_suppkey, 3) AS shl,
        |  shiftright(s_suppkey, 1) AS shr
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
      """SELECT s_suppkey,
        |  s_suppkey & 255 AS low_byte,
        |  s_suppkey | 1024 AS with_flag,
        |  CAST(xor(s_suppkey, 9999) AS BIGINT) AS xored,
        |  s_suppkey << 3 AS shl,
        |  s_suppkey >> 1 AS shr
        |FROM supplier ORDER BY s_suppkey""".stripMargin),

    Q.sql2("q85_unpivot",
      """SELECT s_suppkey, metric, val
        |FROM (SELECT s_suppkey, s_acctbal AS bal,
        |             CAST(s_nationkey AS DOUBLE) AS nk FROM supplier)
        |UNPIVOT (val FOR metric IN (bal, nk))
        |ORDER BY s_suppkey, metric""".stripMargin,
      """SELECT s_suppkey, metric, val FROM (
        |  UNPIVOT (SELECT s_suppkey, s_acctbal AS bal,
        |           CAST(s_nationkey AS DOUBLE) AS nk FROM supplier)
        |  ON bal, nk INTO NAME metric VALUE val
        |) ORDER BY s_suppkey, metric""".stripMargin),

    // SQLite typeof(): value storage class. DuckDB's native typeof()
    // reports its own static type names, so the oracle maps them onto
    // SQLite's classes (and applies the value-null rule SQLite has but
    // static typing doesn't).
    dsql("q86_typeof",
      """SELECT s_suppkey,
        |  typeof(s_suppkey) AS t_int,
        |  typeof(s_acctbal) AS t_real,
        |  typeof(s_name) AS t_text,
        |  typeof(nullif(s_name, s_name)) AS t_null
        |FROM supplier WHERE s_suppkey <= 200 ORDER BY s_suppkey""".stripMargin,
      s"""SELECT s_suppkey,
         |  ${duckTypeof("s_suppkey")} AS t_int,
         |  ${duckTypeof("s_acctbal")} AS t_real,
         |  ${duckTypeof("s_name")} AS t_text,
         |  ${duckTypeof("nullif(s_name, s_name)")} AS t_null
         |FROM supplier WHERE s_suppkey <= 200 ORDER BY s_suppkey""".stripMargin),

    // SQLite quote(): SQL-literal form ('' doubling, NULL keyword)
    dsql("q87_quote",
      """SELECT p_partkey,
        |  quote(p_name) AS q_name,
        |  quote(concat(p_brand, '''s')) AS q_quoted,
        |  quote(nullif(p_name, p_name)) AS q_null
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin,
      s"""SELECT p_partkey,
         |  ${duckQuote("p_name")} AS q_name,
         |  ${duckQuote("p_brand || '''s'")} AS q_quoted,
         |  ${duckQuote("nullif(p_name, p_name)")} AS q_null
         |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin),

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
