package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract checks (beyond-reference, SURVEY.md §2.8): the
  * expectation suite a pipeline runs against every ingested batch —
  * null-ness, key uniqueness, value ranges, referential integrity —
  * reported as a violations ledger, not a boolean, so the severity is
  * measurable and trendable.
  *
  * Every check is one aggregate (or one anti-join + aggregate) over
  * the checked table; the runner unions the 1-row results. Nothing is
  * collected; the report is itself a DataFrame.
  */
object Expectations {

  /** Rows where `c` is null. */
  def notNull(df: DataFrame, c: String): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit(s"not_null:$c").as("rule"), col("n_rows"),
        col("violations"))

  /** Excess rows beyond one per distinct key tuple (0 = unique). */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - countDistinct(struct(cols.map(col): _*)))
          .as("violations"))
      .select(lit(s"unique:${cols.mkString(",")}").as("rule"),
        col("n_rows"), col("violations"))

  /** Rows outside [lo, hi] (nulls count as violations: an absent
    * value cannot satisfy a range contract). */
  def inRange(df: DataFrame, c: String, lo: Column, hi: Column): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        sum(when(col(c).between(lo, hi), 0L).otherwise(1L))
          .as("violations"))
      .select(lit(s"in_range:$c").as("rule"), col("n_rows"),
        col("violations"))

  /** Child rows whose foreign key has no parent (left-anti count —
    * the join is keyed, never a cross product). */
  def refIntegrity(child: DataFrame, fk: String, parent: DataFrame,
                   pk: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("n_rows"))
    val orphans = child.select(col(fk))
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("violations"))
    total.crossJoin(orphans)
      .select(lit(s"ref:$fk").as("rule"), col("n_rows"), col("violations"))
  }

  /** Union a suite of checks into one ledger, ordered by rule. */
  def suite(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "an empty expectation suite checks nothing")
    checks.reduce(_ unionByName _).orderBy("rule")
  }

  /** Whole-schema FK coverage matrix: [[refIntegrity]] over every
    * declared (child, fk, parent, pk) edge at once, each edge reported
    * with its orphan count AND the orphan share in exact ppm — the
    * one-screen referential-health report a warehouse runs after
    * every load (x197's ledger gates ONE relationship; this audits
    * the schema). Each edge costs one keyed anti-join; nothing joins
    * across edges.
    *
    * Null semantics: a NULL child fk matches no parent row under
    * left_anti, so it counts as an orphan — the NOT EXISTS reading of
    * referential integrity (an absent key cannot reference a parent).
    * This matches SQL NOT EXISTS, NOT the NOT IN idiom, which would
    * report zero orphans for the entire edge whenever the parent key
    * contains a NULL (ADVICE r6).
    *
    * Output: (fk_edge, n_child, n_orphans, orphan_ppm), ordered by
    * fk_edge. */
  def fkCoverage(edges: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(edges.nonEmpty, "fkCoverage needs at least one edge")
    edges.map { case (name, child, fk, parent, pk) =>
      val total = child.agg(count(lit(1)).as("n_child"))
      val orphans = child.select(col(fk))
        .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      total.crossJoin(orphans)
        .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphans"),
          when(col("n_child") > 0,
            expr("n_orphans * 1000000L div n_child"))
            .otherwise(0L).as("orphan_ppm"))
    }.reduce(_ unionByName _).orderBy("fk_edge")
  }

  /** INVOICE reconciliation: does each order's stored total equal the
    * sum of its lines priced as extendedprice·(1−discount)·(1+tax)?
    * The financial closing audit every billing pipeline runs — and the
    * discipline matters more than the answer: all arithmetic is EXACT
    * DECIMAL (cast once at the source, multiply, sum, round(2) —
    * half-up in both engines — THEN difference in cents), because a
    * double anywhere makes "off by one cent" indistinguishable from
    * float noise. Orders with no lines are reported separately, not
    * silently matched.
    *
    * One keyed line rollup + one key join + one status rollup.
    * Output: (o_orderstatus, n_orders, n_no_lines, n_exact,
    * n_mismatch, max_abs_delta_cents, sum_abs_delta_cents), ordered
    * by status. */
  def invoiceReconciliation(orders: DataFrame,
                            lineitem: DataFrame): DataFrame = {
    val lines = lineitem.select(col("l_orderkey").as("k"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)")) *
          (lit(1).cast("decimal(18,2)") +
            col("l_tax").cast("decimal(18,2)"))).as("line_amt"))
      .groupBy("k").agg(sum("line_amt").as("expected"))
    orders.select(col("o_orderkey").as("k"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("total"))
      .join(lines, Seq("k"), "left")
      .select(col("o_orderstatus"),
        when(col("expected").isNotNull,
          (round(col("expected"), 2) - col("total")) * 100)
          .cast("bigint").as("delta_cents"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("delta_cents").isNull, 1L).otherwise(0L))
          .as("n_no_lines"),
        sum(when(col("delta_cents") === 0, 1L).otherwise(0L))
          .as("n_exact"),
        sum(when(col("delta_cents").isNotNull &&
          col("delta_cents") =!= 0, 1L).otherwise(0L)).as("n_mismatch"),
        coalesce(max(abs(col("delta_cents"))), lit(0L))
          .as("max_abs_delta_cents"),
        coalesce(sum(abs(col("delta_cents"))), lit(0L)).cast("bigint")
          .as("sum_abs_delta_cents"))
      .orderBy("o_orderstatus")
  }

  /** Merkle-style block-checksum diff between two replicas of a keyed
    * table — the anti-entropy pass of replicated storage (Dynamo/
    * Cassandra lineage): rows hash into key-range BLOCKS whose
    * checksum is the XOR of per-row content hashes; two replicas
    * exchange only their block tables and the mismatched blocks name
    * exactly where to repair — O(n/blockSize) comparison traffic for
    * an n-row table, never a row-level join until a block diverges.
    *
    * Row hash = the first 15 md5 hex digits of "key:value" as a
    * BIGINT (both engines parse hex identically; 60 bits keeps the
    * XOR in a positive BIGINT). XOR is order- and partition-
    * independent, so the checksum is engine- and cluster-layout-
    * exact, and a row PRESENT on both sides cancels out — a block's
    * checksum mismatch certifies real content divergence.
    *
    * Output: only the blocks that disagree — (block, n_a, n_b, x_a,
    * x_b; counts 0 and checksum NULL on a side missing the whole
    * block), ordered by block. */
  def merkleDiff(a: DataFrame, b: DataFrame, key: String, value: String,
                 blockSize: Long): DataFrame = {
    require(blockSize >= 1, s"blockSize must be positive")
    graft.functions.XorAgg.register(a.sparkSession)
    def side(df: DataFrame, nn: String, xn: String): DataFrame =
      df.select(expr(s"$key div $blockSize").as("block"),
          expr(s"""CAST(conv(substr(md5(concat(CAST($key AS STRING), ':',
            CAST($value AS STRING))), 1, 15), 16, 10) AS BIGINT)""").as("h"))
        .groupBy("block")
        .agg(count(lit(1)).as(nn), expr("xor_agg(h)").as(xn))
    side(a, "n_a", "x_a")
      .join(side(b, "n_b", "x_b"), Seq("block"), "full_outer")
      .where(!(col("n_a") <=> col("n_b")) || !(col("x_a") <=> col("x_b")))
      .select(col("block"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"), col("x_a"), col("x_b"))
      .orderBy("block")
  }

  /** Per-entity PROVENANCE fingerprints — the tamper-evidence ledger
    * beside [[merkleDiff]]'s table-level blocks: each key's full
    * event history (ids in (ts, id) order) folds to ONE md5, so two
    * systems that both claim to hold "user X's complete history"
    * can settle it by comparing 16 bytes, and any replay gap,
    * reorder, or injected event flips the fingerprint. The chain is
    * a pure function of the data — both engines derive the identical
    * hash from the identical history.
    *
    * Scale shape: one keyed aggregation; the per-key collect is
    * bounded by per-key event counts (the same bound every
    * sequential-state operator here documents), and only 16-byte
    * hashes plus counts leave it.
    *
    * Null discipline: rows with a null key are excluded (an unowned
    * event belongs to no entity's chain), and a null timestamp sorts
    * LAST (coalesced to Long.MaxValue) — matching SQL's default
    * NULLS LAST so both engines derive the same chain; Spark's
    * sort_array would otherwise put null-ts structs first.
    *
    * Output: (key, n_events, chain_hash), ordered by key. */
  def provenanceChains(events: DataFrame, keyCol: String, tsCol: String,
                       idCol: String): DataFrame =
    events.where(col(keyCol).isNotNull)
      .select(col(keyCol).as("k"),
        coalesce(unix_micros(col(tsCol)), lit(Long.MaxValue)).as("tm"),
        col(idCol).as("id"))
      .groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("n_events"),
        md5(expr("array_join(transform(" +
          "sort_array(collect_list(struct(tm, id)))," +
          " s -> CAST(s.id AS STRING)), ',')")).as("chain_hash"))
      .orderBy(keyCol)
}
