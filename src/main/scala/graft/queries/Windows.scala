package graft.queries

/** Window-function coverage (SURVEY.md §2.5 window table): ranking,
  * offset, aggregate-as-window, ROWS/RANGE/GROUPS frames, named
  * windows. Every PARTITION BY keeps windows bounded so the plan
  * scales: no global single-partition sorts on the big tables.
  */
object Windows {

  val qs: Seq[Q] = Seq(

    Q.sql("q34_win_rownum_topk",
      """SELECT c_mktsegment, o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS price_int
        |FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |) t
        |WHERE rn <= 3
        |ORDER BY c_mktsegment, price_int DESC, o_orderkey""".stripMargin),

    Q.sql("q35_win_ranks",
      """SELECT s_suppkey,
        |  rank()       OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  round(cume_dist()    OVER w, 6) AS cdist,
        |  ntile(4)     OVER w AS quartile
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        |ORDER BY s_suppkey""".stripMargin),

    Q.sql("q36_win_lag_lead",
      """SELECT event_id, user_id,
        |  round(value - coalesce(lag(value)  OVER w, 0.0), 2) AS delta_prev,
        |  round(coalesce(lead(value) OVER w, 0.0), 2) AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id
        |LIMIT 3000""".stripMargin),

    Q.sql("q37_win_running_sum",
      """SELECT event_id, user_id,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
        |    AS running_total
        |FROM events
        |ORDER BY event_id
        |LIMIT 3000""".stripMargin),

    Q.sql("q38_win_rows_frame",
      """SELECT event_id, user_id,
        |  round(CAST(avg(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
        |    AS moving_avg3
        |FROM events
        |ORDER BY event_id
        |LIMIT 3000""".stripMargin),

    Q.sql("q39_win_range_frame",
      """SELECT o_orderkey, o_orderpriority,
        |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |                 RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)
        |    AS near_cheaper_cnt
        |FROM orders
        |WHERE o_orderkey <= 3000
        |ORDER BY o_orderkey""".stripMargin),

    Q.sql("q40_win_first_last",
      """SELECT s_suppkey, s_nationkey,
        |  first_value(s_name) OVER w AS richest,
        |  last_value(s_name)  OVER (PARTITION BY s_nationkey
        |    ORDER BY s_acctbal DESC, s_suppkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest,
        |  nth_value(s_name, 2) OVER w AS second
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        |ORDER BY s_suppkey""".stripMargin),

    // GROUPS frame (SQLite >= 3.28 dialect row): Spark has no native
    // GROUPS spelling, so the engine side runs Dialect.groupsFrame —
    // the peer-group-collapse rewrite (GROUPS over rows == ROWS over
    // the distinct peer table + join back). The oracle uses the OTHER
    // exact identity — GROUPS n PRECEDING/FOLLOWING == RANGE n over
    // dense_rank() of the ORDER BY value (peers share a rank, so rank
    // distance <= n IS whole-peer-group stepping) — because the
    // judge's duckdb 1.0.0 parses but does not implement GROUPS mode.
    // Two independent derivations agreeing on every tie is the point
    // of the check.
    Q.df("q89_win_groups_frame",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val base = graft.Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_orderdate"),
            expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        graft.engine.Dialect.groupsFrame(base, Seq("o_orderpriority"),
            "o_orderdate", 1, 1, sum(col("cents")), "grp_sum_cents")
          .where(col("o_orderkey") <= 3000)
          .select("o_orderkey", "o_orderpriority", "grp_sum_cents")
          .orderBy("o_orderkey")
      },
      """WITH r AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |    dense_rank() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_orderdate) AS dr
        |  FROM orders)
        |SELECT o_orderkey, o_orderpriority, grp_sum_cents FROM (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(sum(cents) OVER (PARTITION BY o_orderpriority ORDER BY dr
        |      RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
        |      AS grp_sum_cents
        |  FROM r) t
        |WHERE o_orderkey <= 3000
        |ORDER BY o_orderkey""".stripMargin),

    // EXCLUDE frame modes (the LAST window dialect row): CURRENT ROW /
    // GROUP / TIES emulated by the exact frame-minus-peers identities
    // (Dialect.sumExclude*) with NULL-faithful empty-set gating; the
    // oracle is duckdb's NATIVE EXCLUDE spelling, so two independent
    // derivations must agree on every tie and every frame edge
    Q.df("q90_win_exclude_frames",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val base = graft.Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            expr("datediff(o_orderdate, date '1970-01-01')").as("d"),
            expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        val rows = Window.partitionBy("o_orderpriority")
          .orderBy(col("d"), col("o_orderkey")).rowsBetween(-2, 2)
        val range = Window.partitionBy("o_orderpriority")
          .orderBy(col("d")).rangeBetween(-7, 7)
        val peers = Window.partitionBy("o_orderpriority", "d")
        base.select(col("o_orderkey"),
            graft.engine.Dialect.sumExcludeCurrentRow(col("cents"), rows)
              .as("ex_cur"),
            graft.engine.Dialect.sumExcludeGroup(col("cents"), range, peers)
              .as("ex_grp"),
            graft.engine.Dialect.sumExcludeTies(col("cents"), range, peers)
              .as("ex_ties"))
          .where(col("o_orderkey") <= 3000)
          .orderBy("o_orderkey")
      },
      """WITH r AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS d,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_orderkey, ex_cur, ex_grp, ex_ties FROM (
        |  SELECT o_orderkey,
        |    CAST(sum(cents) OVER (PARTITION BY o_orderpriority
        |      ORDER BY d, o_orderkey
        |      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
        |      EXCLUDE CURRENT ROW) AS BIGINT) AS ex_cur,
        |    CAST(sum(cents) OVER (PARTITION BY o_orderpriority ORDER BY d
        |      RANGE BETWEEN 7 PRECEDING AND 7 FOLLOWING
        |      EXCLUDE GROUP) AS BIGINT) AS ex_grp,
        |    CAST(sum(cents) OVER (PARTITION BY o_orderpriority ORDER BY d
        |      RANGE BETWEEN 7 PRECEDING AND 7 FOLLOWING
        |      EXCLUDE TIES) AS BIGINT) AS ex_ties
        |  FROM r) t
        |WHERE o_orderkey <= 3000
        |ORDER BY o_orderkey""".stripMargin),

    // gap-based sessionization over the events table: lag → gap flag →
    // running sum = session id → per-session aggregation. The batch twin
    // of the Structured Streaming path in graft.streaming.
    Q.sql2("q41_sessionize",
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN unix_timestamp(ts) - unix_timestamp(
        |           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |         > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |), sessions AS (
        |  SELECT user_id, event_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked
        |)
        |SELECT user_id, count(DISTINCT session_id) AS session_cnt,
        |       count(*) AS event_cnt
        |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin,
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN date_diff('second',
        |           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
        |         > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |), sessions AS (
        |  SELECT user_id, event_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked
        |)
        |SELECT user_id, count(DISTINCT session_id) AS session_cnt,
        |       count(*) AS event_cnt
        |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin)
  )
}
