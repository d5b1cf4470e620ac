package graft.queries

/** Scalar-function coverage (SURVEY.md §2.5 scalar table): string, math,
  * date/time, conditional, pattern-match, JSON. Where Spark and DuckDB
  * spell a function differently the query carries two texts (Q.sql2).
  */
object Functions {

  val qs: Seq[Q] = Seq(

    Q.sql("q42_string_fns",
      """SELECT p_partkey,
        |  length(p_name) AS name_len,
        |  upper(p_brand) AS brand_up,
        |  lower(p_type) AS type_low,
        |  trim(concat('  ', p_brand, '  ')) AS trimmed,
        |  substr(p_name, 1, 5) AS name_head,
        |  replace(p_type, ' ', '_') AS type_snake,
        |  instr(p_name, 'a') AS first_a,
        |  lpad(CAST(p_size AS STRING), 4, '0') AS size_pad,
        |  split_part(p_type, ' ', 1) AS type_word1
        |FROM part
        |WHERE p_partkey <= 400
        |ORDER BY p_partkey""".stripMargin),

    // sqrt/ln outputs are floor-scaled BIGINTs (not round(...,6) doubles):
    // ln is not IEEE-correctly-rounded, so Spark (JDK Math.log) and DuckDB
    // (libm) can differ in the last ulp and a 6-decimal round flips at
    // boundary values. floor at 1e4 absorbs 1-ulp input noise — the
    // catalog's determinism contract (Q.scala).
    Q.sql("q43_math_fns",
      """SELECT s_suppkey,
        |  abs(s_acctbal) AS abs_bal,
        |  round(s_acctbal, 1) AS bal_r1,
        |  CAST(ceil(s_acctbal) AS BIGINT) AS bal_ceil,
        |  CAST(floor(s_acctbal) AS BIGINT) AS bal_floor,
        |  CAST(floor(sqrt(abs(s_acctbal)) * 10000) AS BIGINT) AS bal_sqrt_x10k,
        |  CAST(floor(ln(abs(s_acctbal) + 1) * 10000) AS BIGINT) AS bal_ln_x10k,
        |  CAST(power(s_suppkey, 2) AS BIGINT) AS key_sq,
        |  mod(s_suppkey, 7) AS key_mod,
        |  CAST(sign(s_acctbal) AS BIGINT) AS bal_sign
        |FROM supplier
        |ORDER BY s_suppkey""".stripMargin),

    Q.sql("q44_date_fns",
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  month(o_orderdate) AS m,
        |  day(o_orderdate) AS d,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS STRING) AS month_start,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS STRING) AS month_end,
        |  CAST(CAST(o_orderdate AS DATE) AS STRING) AS order_date
        |FROM orders
        |WHERE o_orderkey <= 1500
        |ORDER BY o_orderkey""".stripMargin),

    Q.sql2("q45_date_arith",
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate + INTERVAL '30' DAY AS DATE) AS STRING) AS due_date,
        |  CAST(CAST(o_orderdate + INTERVAL '3' MONTH AS DATE) AS STRING) AS review_date,
        |  datediff(DATE '2002-01-01', CAST(o_orderdate AS DATE)) AS age_days
        |FROM orders
        |WHERE o_orderkey <= 1500
        |ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate + INTERVAL '30 days' AS DATE) AS STRING) AS due_date,
        |  CAST(CAST(o_orderdate + INTERVAL '3 months' AS DATE) AS STRING) AS review_date,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS age_days
        |FROM orders
        |WHERE o_orderkey <= 1500
        |ORDER BY o_orderkey""".stripMargin),

    Q.sql("q46_like_patterns",
      """SELECT p_partkey, p_name, p_type
        |FROM part
        |WHERE p_name LIKE '%bolt%' AND p_type LIKE '%M%'
        |  AND p_name NOT LIKE '%zz%'
        |ORDER BY p_partkey
        |LIMIT 500""".stripMargin),

    Q.sql("q47_ilike",
      """SELECT p_partkey, p_brand
        |FROM part
        |WHERE p_brand ILIKE 'brand#1%'
        |ORDER BY p_partkey
        |LIMIT 500""".stripMargin),

    Q.sql2("q48_regexp",
      """SELECT p_partkey, p_name,
        |  regexp_extract(p_name, '([0-9]+)', 1) AS first_num
        |FROM part
        |WHERE p_name RLIKE '^[a-m]'
        |ORDER BY p_partkey
        |LIMIT 500""".stripMargin,
      """SELECT p_partkey, p_name,
        |  coalesce(regexp_extract(p_name, '([0-9]+)', 1), '') AS first_num
        |FROM part
        |WHERE regexp_matches(p_name, '^[a-m]')
        |ORDER BY p_partkey
        |LIMIT 500""".stripMargin),

    Q.sql2("q49_json_extract",
      """SELECT CAST(get_json_object(props, '$.k') AS INT) % 10 AS k_mod,
        |  count(*) AS cnt,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        |FROM events
        |GROUP BY CAST(get_json_object(props, '$.k') AS INT) % 10
        |ORDER BY k_mod""".stripMargin,
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
        |  count(*) AS cnt,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        |FROM events
        |GROUP BY CAST(json_extract_string(props, '$.k') AS INT) % 10
        |ORDER BY k_mod""".stripMargin),

    // SQLite string corners round 2: negative substr start (count from
    // end), ascii/chr codepoints, charset trims — identical spelling and
    // semantics in Spark SQL and DuckDB, so one text serves both.
    Q.sql("q88_string_fns3",
      """SELECT p_partkey,
        |  substr(p_name, -5, 5) AS tail5,
        |  ascii(p_name) AS first_cp,
        |  chr(65 + CAST(p_partkey % 26 AS INT)) AS cycle_chr,
        |  trim(LEADING 'a' FROM p_name) AS no_lead_a,
        |  trim(TRAILING 's' FROM p_name) AS no_trail_s
        |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin),

    Q.sql("q50_conditional_fns",
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg,
        |  CASE WHEN c_acctbal >= 0 THEN 'credit' ELSE 'debit' END AS side,
        |  greatest(c_acctbal, 0.0) AS pos_part,
        |  least(c_acctbal, 0.0) AS neg_part
        |FROM customer
        |WHERE c_custkey <= 500
        |ORDER BY c_custkey""".stripMargin)
  )
}
