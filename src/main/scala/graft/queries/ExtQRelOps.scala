package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming
import graft.queries.ExtShared._

/** §2.8 judged queries — scale-out relational ops: specialized joins, CDC/SCD2, io roundtrips. */
private[queries] object ExtQRelOps {

  val qs: Seq[Q] = Seq(

    // as-of join: latest order state per event, via the union+window
    // formulation (single shuffle, no inequality-join blowup). Oracle:
    // DuckDB's native ASOF JOIN over the same deduped right side.
    Q.df("x73_asof_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            date_add(lit(java.sql.Date.valueOf("1995-01-01")),
              (col("event_id") % 2400).cast("int")).cast("timestamp").as("cutoff"))
        val ord = Tables.load(s, dir, "orders")
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max("o_orderkey").as("o_orderkey"))
        AsofJoin.asofJoin(ev, ord,
            col("user_id"), col("o_custkey"),
            col("cutoff"), col("o_orderdate"),
            Seq(col("event_id")), col("o_orderkey"))
          .select(col("l.event_id").as("event_id"), col("asof").as("o_orderkey"))
          .orderBy("event_id")
      },
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |    CAST(DATE '1995-01-01' + INTERVAL (event_id % 2400) DAY AS TIMESTAMP)
        |      AS cutoff
        |  FROM events
        |), ord AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |)
        |SELECT ev.event_id, ord.o_orderkey
        |FROM ev ASOF JOIN ord
        |  ON ev.user_id = ord.o_custkey AND ev.cutoff >= ord.o_orderdate
        |ORDER BY event_id""".stripMargin),


    // per-stratum quantile gate: keep documents strictly longer than
    // skew-mitigated equi-join: big side salted, dimension replicated
    // per salt bucket — row-for-row equal to the plain join (the
    // oracle), with hot keys spread over `buckets` reducers
    Q.df("x106_salted_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select("user_id", "event_type", "event_id")
        val dim = Tables.load(s, dir, "orders")
          .groupBy(col("o_custkey").as("user_id"))
          .agg(count(lit(1)).as("n_orders"))
        graft.ext.Salting.saltedJoin(ev, dim, "user_id", col("event_id"), 8)
          .groupBy("event_type")
          .agg(count(lit(1)).as("matched"),
            sum("n_orders").cast("bigint").as("sum_orders"))
          .orderBy("event_type")
      },
      """SELECT e.event_type, count(*) AS matched,
        |  CAST(sum(d.n_orders) AS BIGINT) AS sum_orders
        |FROM events e
        |JOIN (SELECT o_custkey AS user_id, count(*) AS n_orders
        |      FROM orders GROUP BY 1) d
        |  ON e.user_id = d.user_id
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin),


    // AUTO-SALTING end to end on the x390 adversarial corpus (r11
    // advice #8): the chooser profiles per-shingle counts and emits a
    // hot-keys-only (key, salt_factor) plan — the universal footer
    // shingle (present in EVERY document) gets the max factor, the
    // 47-char boilerplate-prefix shingles get proportional factors,
    // content shingles stay unplanned — then the planned salted
    // aggregation consumes it: hot keys split into factor sub-keys,
    // cold keys take the direct path (PlanSpec guards the broadcast +
    // two-phase shape). The oracle re-derives counts, checksums AND
    // the chooser's exact factor rule, so the threshold itself is
    // judged. Output: shingles with >= 3 docs, their doc count, an
    // order-proof checksum (sum doc_id % 1000 re-associated across
    // phases), and the factor the chooser assigned.
    Q.df("x404_auto_salting",
      (s, dir) => {
        val sh = Dedup.shingles3(skewDocs(Tables.load(s, dir, "documents")))
        val plan = graft.ext.Salting.saltPlan(sh, "shingle",
          targetPerTask = 50L, maxFactor = 16)
        graft.ext.Salting.plannedSaltedCountSum(sh, "shingle",
            valueCol = col("doc_id") % 1000, saltCol = col("doc_id"), plan)
          .join(plan, Seq("shingle"), "left")
          .where(col("cnt") >= 3)
          .select(col("shingle"), col("cnt"),
            col("sum_val").cast("bigint").as("checksum"),
            coalesce(col("salt_factor"), lit(1)).cast("bigint")
              .as("salt_factor"))
          .orderBy("shingle")
      },
      s"""WITH $duckSkew, $duckSkewTok,
         |sh0 AS MATERIALIZED (
         |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
         |),
         |c AS MATERIALIZED (
         |  SELECT shingle, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(doc_id % 1000) AS BIGINT) AS checksum
         |  FROM sh0 GROUP BY 1
         |)
         |SELECT shingle, cnt, checksum,
         |  CAST(CASE WHEN cnt > 50 THEN least(16, (cnt + 49) // 50)
         |       ELSE 1 END AS BIGINT) AS salt_factor
         |FROM c WHERE cnt >= 3 ORDER BY shingle""".stripMargin),


    // the bucketed range join under DELIBERATE bucket skew: a quarter
    // of the intervals collapse onto one [1200, 1207] window, so two
    // buckets hold ~25% of the interval side — the hot-key regime every
    // real interval join hits (flash-sale windows, maintenance
    // outages). Key-less (pure containment), so the bucket IS the join
    // key and the hot bucket IS a hot partition: AQE's skew-join split
    // handles it at run time (PlanSpec asserts the split engages under
    // production-shaped thresholds); result is exact either way, judged
    // vs the plain BETWEEN join, aggregated per interval.
    Q.df("x126_range_join_skew",
      (s, dir) => {
        val p = Tables.load(s, dir, "events")
          .select((col("event_id") % 2400).cast("bigint").as("d"))
        val iv = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 4 === 0, lit(1200L))
              .otherwise((col("o_orderkey") % 2400).cast("bigint")).as("st"))
          .withColumn("en", col("st") + 7)
        graft.ext.RangeJoin.bucketed(p, iv,
            p("d"), iv("st"), iv("en"), bucketWidth = 4L)
          .groupBy("o_orderkey").agg(count(lit(1)).as("n_events"))
          .orderBy("o_orderkey")
      },
      """SELECT o.o_orderkey, count(*) AS n_events
        |FROM (SELECT event_id % 2400 AS d FROM events) e
        |JOIN (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 4 = 0 THEN 1200
        |             ELSE o_orderkey % 2400 END AS st
        |      FROM orders) o
        |  ON e.d BETWEEN o.st AND o.st + 7
        |GROUP BY o.o_orderkey ORDER BY o_orderkey""".stripMargin),


    // bucketed range join (point-in-interval): events matched to the
    // 8-day windows opened by each same-user order — executed as an
    // EQUI-join on a coarse day bucket + exact refine, never the
    // BroadcastNestedLoopJoin Spark plans for a raw BETWEEN (PlanSpec
    // guards the plan shape). Oracle: the plain inequality join.
    Q.df("x118_range_join",
      (s, dir) => {
        val p = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            (col("event_id") % 2400).cast("bigint").as("d"))
        val iv = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            datediff(col("o_orderdate").cast("date"),
              lit(java.sql.Date.valueOf("1995-01-01"))).cast("bigint").as("st"))
          .withColumn("en", col("st") + 7)
        graft.ext.RangeJoin.bucketed(p, iv,
            p("d"), iv("st"), iv("en"), bucketWidth = 4L,
            keyCond = p("user_id") === iv("o_custkey"))
          .groupBy("event_id")
          .agg(count(lit(1)).as("n_windows"),
            min("o_orderkey").as("first_order"))
          .orderBy("event_id")
      },
      """WITH p AS (
        |  SELECT event_id, user_id, event_id % 2400 AS d FROM events
        |), iv AS (
        |  SELECT o_orderkey, o_custkey,
        |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS st
        |  FROM orders
        |)
        |SELECT p.event_id, count(*) AS n_windows,
        |  min(iv.o_orderkey) AS first_order
        |FROM p JOIN iv
        |  ON p.user_id = iv.o_custkey AND p.d >= iv.st AND p.d <= iv.st + 7
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin),


    // runtime Bloom-filter join pruning: with the dimension side too
    // big to broadcast, Catalyst's InjectRuntimeFilter builds a Bloom
    // sketch of the SELECTIVE order keys at run time and pushes
    // might_contain onto the fact scan — rows that cannot join are
    // dropped before the shuffle, the runtime cousin of static
    // pushdown. Confs scoped + restored; materialized (localCheckpoint)
    // inside the scope so execution planning sees them. PlanSpec
    // asserts the bloom probe lands on the fact side.
    Q.df("x131_bloom_runtime_filter",
      (s, dir) => SessionConf.withConfs(s)(
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
          "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
        val li = Tables.load(s, dir, "lineitem")
        val ord = Tables.load(s, dir, "orders")
          .where(col("o_totalprice") > 450000.0)
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            sum(floor(col("l_extendedprice") * 100).cast("bigint"))
              .as("revenue_cents"))
          .orderBy("o_orderpriority")
          .localCheckpoint()
      },
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_totalprice > 450000.0
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin),


    // incremental rollup: per-batch ALGEBRAIC partials (count/sum/min/
    // max as exact cents) merged into the corpus answer without
    // rescanning the batches; mean derived at read time — provably
    // equal to the one-pass aggregation (see Rollup scaladoc)
    Q.df("x134_rollup_merge",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val merged = Rollup.merge("event_type",
          Rollup.partials(ev.where(col("event_id") % 2 === 0),
            "event_type", col("value")),
          Rollup.partials(ev.where(col("event_id") % 2 =!= 0),
            "event_type", col("value")))
        Rollup.withMean(merged, "event_type")
      },
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  CAST(min(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |    AS min_cents,
        |  CAST(max(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |    AS max_cents,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) // count(*) AS BIGINT)
        |    AS mean_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),


    // the xlsx surface oracle-verified end-to-end: region written as a
    // real xlsx workbook (numeric cells typed t="n"), read back through
    // the DataSourceV2 connector (spark.read.format("graft-xlsx") —
    // executor-side XML parsing, pruned columns), equal to the parquet
    // truth. Materialized (localCheckpoint) before the temp workbook is
    // deleted.
    Q.df("x143_xlsx_roundtrip",
      (s, dir) => {
        val region = Tables.load(s, dir, "region")
        val tmp = java.nio.file.Files.createTempDirectory("graft_xlsx_rt")
        val f = tmp.resolve("region.xlsx")
        try {
          graft.ingest.Xlsx.write(region.orderBy("r_regionkey"), f.toString)
          s.read.format("graft-xlsx").load(f.toString)
            .orderBy("r_regionkey")
            .localCheckpoint()
        } finally rmTree(tmp)
      },
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"),


    // the reference's PRIMARY ingestion path (header+inference csv) on
    // the oracle gate: region written as a csv file, read back through
    // Readers.csv (the REPL path), equal to the parquet truth
    Q.df("x144_csv_roundtrip",
      (s, dir) => {
        val rows = Tables.load(s, dir, "region").orderBy("r_regionkey").collect()
        val tmp = java.nio.file.Files.createTempDirectory("graft_csv_rt")
        val f = tmp.resolve("region.csv")
        java.nio.file.Files.writeString(f, "r_regionkey,r_name\n" +
          rows.map(r => s"${r.getInt(0)},${r.getString(1)}").mkString("\n"))
        try graft.ingest.Readers.csv(s, f.toString)
          .orderBy("r_regionkey").localCheckpoint()
        finally rmTree(tmp)
      },
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"),


    // NDJSON ingestion on the oracle gate: same truth through
    // Readers.json (line-JSON with schema inference)
    Q.df("x145_json_roundtrip",
      (s, dir) => {
        val rows = Tables.load(s, dir, "region").orderBy("r_regionkey").collect()
        val tmp = java.nio.file.Files.createTempDirectory("graft_json_rt")
        val f = tmp.resolve("region.json")
        java.nio.file.Files.writeString(f,
          rows.map(r =>
            s"""{"r_regionkey":${r.getInt(0)},"r_name":"${r.getString(1)}"}""")
            .mkString("\n"))
        try graft.ingest.Readers.json(s, f.toString)
          .select("r_regionkey", "r_name")
          .orderBy("r_regionkey").localCheckpoint()
        finally rmTree(tmp)
      },
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"),


    // ORC columnar round-trip on the oracle gate: events projected and
    // written as ORC by EXECUTORS (distributed write, no driver
    // collect), read back and aggregated — equal to the same
    // aggregation over the parquet truth
    Q.df("x146_orc_roundtrip",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_orc_rt")
        val out = tmp.resolve("events_orc").toString
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 100).cast("bigint").as("cents"))
          .write.mode("overwrite").orc(out)
        try s.read.orc(out)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
          .orderBy("event_type").localCheckpoint()
        finally rmTree(tmp)
      },
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),


    // snapshot DIFF (the CDC-derivation shape): two versions of a keyed
    // table full-outer-joined on the key and classified added / removed
    // / changed — the audit every dataset-versioning pipeline runs
    // before promoting a snapshot. v2 is derived deterministically from
    // v1 (keys % 7 deleted, % 5 price-bumped, % 11 mirrored as new
    // negative keys) so the oracle can rebuild both sides. One
    // key-shuffle join at any scale; unchanged rows never leave it.
    Q.df("x149_snapshot_diff",
      (s, dir) => {
        val v1 = Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("k"),
            floor(col("o_totalprice") * 100).cast("bigint").as("cents"))
        val v2 = v1.where(col("k") % 7 =!= 0)
          .select(col("k"),
            when(col("k") % 5 === 0, col("cents") + 100)
              .otherwise(col("cents")).as("cents"))
          .unionByName(v1.where(col("k") % 11 === 0)
            .select((-col("k")).as("k"), col("cents")))
        Cdc.diff(v1, v2, "k", "cents").orderBy("k")
      },
      """WITH v1 AS (SELECT o_orderkey AS k,
        |              CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |            FROM orders),
        |v2 AS (
        |  SELECT k, CASE WHEN k % 5 = 0 THEN cents + 100 ELSE cents END AS cents
        |  FROM v1 WHERE k % 7 <> 0
        |  UNION ALL
        |  SELECT -k, cents FROM v1 WHERE k % 11 = 0
        |),
        |d AS (
        |  SELECT coalesce(a.k, b.k) AS k,
        |    CASE WHEN a.k IS NULL THEN 'added'
        |         WHEN b.k IS NULL THEN 'removed'
        |         WHEN a.cents IS DISTINCT FROM b.cents THEN 'changed'
        |    END AS status,
        |    a.cents AS cents_v1, b.cents AS cents_v2
        |  FROM v1 a FULL JOIN v2 b ON a.k = b.k
        |)
        |SELECT k, status, cents_v1, cents_v2 FROM d
        |WHERE status IS NOT NULL ORDER BY k""".stripMargin),


    // CDC APPLY — the missing half of x149: replay the classified
    // changeset onto v1 and reconstruct v2 exactly (removed dropped,
    // changed updated, added inserted, untouched carried over) with
    // one keyed full-outer + coalesce. The oracle is total and
    // elegant: the ACTUAL v2 — any classification or replay bug makes
    // the reconstruction diverge from it (see Cdc scaladoc; ExtSpec
    // property-checks apply(v1, diff(v1, v2)) == v2 on other shapes)
    Q.df("x153_cdc_apply",
      (s, dir) => {
        val v1 = Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("k"),
            floor(col("o_totalprice") * 100).cast("bigint").as("cents"))
        val v2 = v1.where(col("k") % 7 =!= 0)
          .select(col("k"),
            when(col("k") % 5 === 0, col("cents") + 100)
              .otherwise(col("cents")).as("cents"))
          .unionByName(v1.where(col("k") % 11 === 0)
            .select((-col("k")).as("k"), col("cents")))
        Cdc.applyDiff(v1, Cdc.diff(v1, v2, "k", "cents"), "k", "cents")
          .orderBy("k")
      },
      """WITH v1 AS (SELECT o_orderkey AS k,
        |              CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |            FROM orders),
        |v2 AS (
        |  SELECT k, CASE WHEN k % 5 = 0 THEN cents + 100 ELSE cents END AS cents
        |  FROM v1 WHERE k % 7 <> 0
        |  UNION ALL
        |  SELECT -k, cents FROM v1 WHERE k % 11 = 0
        |)
        |SELECT k, cents FROM v2 ORDER BY k""".stripMargin),


    // SCD2 effective-interval build: each user's event value holds
    // until their next event (lead over the per-user timeline) — the
    // slowly-changing-dimension type-2 history every warehouse derives
    // from a change stream; the window is partitioned by user, never
    // global. Epoch-micros output (raw timestamps don't cross engines).
    Q.sql2("x150_scd2_intervals",
      """SELECT user_id, event_id,
        |  unix_micros(ts) AS eff_from_us,
        |  coalesce(lead(unix_micros(ts)) OVER (
        |    PARTITION BY user_id ORDER BY unix_micros(ts), event_id), -1)
        |    AS eff_to_us,
        |  CAST(floor(value * 100) AS BIGINT) AS cents
        |FROM events
        |ORDER BY user_id, eff_from_us, event_id""".stripMargin,
      """SELECT user_id, event_id,
        |  epoch_us(ts) AS eff_from_us,
        |  coalesce(lead(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id), -1)
        |    AS eff_to_us,
        |  CAST(floor(value * 100) AS BIGINT) AS cents
        |FROM events
        |ORDER BY user_id, eff_from_us, event_id""".stripMargin),


    // market-basket mining: parts co-purchased in the same order
    // (apriori 2-itemset pass) with exact integer lift; pair join is
    // per-basket only (bounded by maxBasket), support filter bounds
    // everything downstream
    Q.df("x180_market_basket",
      (s, dir) => Basket.frequentPairs(
        Tables.load(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 3L),
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |small AS (SELECT b FROM it GROUP BY 1 HAVING count(*) <= 1000),
        |itk AS (SELECT it.* FROM it JOIN small USING (b)),
        |n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM itk),
        |ic AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM itk GROUP BY 1),
        |p AS (
        |  SELECT a.i AS item_a, x.i AS item_b,
        |    CAST(count(*) AS BIGINT) AS pair_cnt
        |  FROM itk a JOIN itk x ON a.b = x.b AND a.i < x.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT p.item_a, p.item_b, p.pair_cnt,
        |  ca.c AS cnt_a, cb.c AS cnt_b,
        |  p.pair_cnt * (SELECT n FROM n) * 1000000 // (ca.c * cb.c)
        |    AS lift_ppm
        |FROM p JOIN ic ca ON p.item_a = ca.i
        |       JOIN ic cb ON p.item_b = cb.i
        |ORDER BY item_a, item_b""".stripMargin),


    // directional association rules: confidence = support / antecedent
    // count (floor ppm) filters each direction separately; lift is
    // symmetric and carried through — the output is the actionable
    // "who buys a also buys b" form of x180
    Q.df("x189_basket_rules",
      (s, dir) => Basket.rules(
        Tables.load(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 3L, minConfPpm = 100000L),
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |small AS (SELECT b FROM it GROUP BY 1 HAVING count(*) <= 1000),
        |itk AS (SELECT it.* FROM it JOIN small USING (b)),
        |n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM itk),
        |ic AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM itk GROUP BY 1),
        |p AS (
        |  SELECT a.i AS item_a, x.i AS item_b,
        |    CAST(count(*) AS BIGINT) AS pair_cnt
        |  FROM itk a JOIN itk x ON a.b = x.b AND a.i < x.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |pl AS (
        |  SELECT p.item_a, p.item_b, p.pair_cnt, ca.c AS cnt_a,
        |    cb.c AS cnt_b,
        |    p.pair_cnt * (SELECT n FROM n) * 1000000 // (ca.c * cb.c)
        |      AS lift_ppm
        |  FROM p JOIN ic ca ON p.item_a = ca.i
        |         JOIN ic cb ON p.item_b = cb.i),
        |r AS (
        |  SELECT item_a AS antecedent, item_b AS consequent, pair_cnt,
        |    cnt_a AS cnt_ant, cnt_b AS cnt_con, lift_ppm FROM pl
        |  UNION ALL
        |  SELECT item_b, item_a, pair_cnt, cnt_b, cnt_a, lift_ppm FROM pl)
        |SELECT antecedent, consequent, pair_cnt, cnt_ant, cnt_con,
        |  pair_cnt * 1000000 // cnt_ant AS conf_ppm, lift_ppm
        |FROM r WHERE pair_cnt * 1000000 // cnt_ant >= 100000
        |ORDER BY antecedent, consequent""".stripMargin),


    // Pareto concentration cut: minimal supplier prefix covering 80%
    // of revenue — integer cents + basis points, cross-multiplied;
    // the running sum runs over the SUPPLIER-cardinality rollup only
    Q.df("x202_pareto_suppliers",
      (s, dir) => Profile.paretoCover(
        Tables.load(s, dir, "lineitem"), "l_suppkey",
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100),
        8000),
      """WITH per AS (
        |  SELECT l_suppkey AS k,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per),
        |c AS (
        |  SELECT k, cents,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, k) AS BIGINT)
        |      AS cum_cents
        |  FROM per)
        |SELECT k AS l_suppkey, cents, cum_cents,
        |  cum_cents * 10000 // total AS cum_bp
        |FROM c, tot
        |WHERE (cum_cents - cents) * 10000 < total * 8000
        |ORDER BY cents DESC, l_suppkey""".stripMargin),


    // the bucketed-join machinery itself on the oracle gate: both
    // fact sides written bucketed+sorted by the join key, joined
    // exchange-free (asserted in-line), rolled up to integer cents
    Q.df("x207_bucketed_join",
      (s, dir) => graft.io.Warehouse.bucketedRevenueByPriority(s, dir),
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),


    // pre-flight join forecast: exact |A JOIN B| = sum(cA*cB) per
    // candidate key pair + the hottest value's share — the can-I-
    // afford-this-join check, priced at two keyed counts; the true
    // key and a bogus candidate are forecast side by side
    Q.df("x211_join_size_forecast",
      (s, dir) => Profile.joinSizeForecast(
        Tables.load(s, dir, "orders"), Tables.load(s, dir, "lineitem"),
        Seq("o_orderkey" -> "l_orderkey", "o_custkey" -> "l_partkey")),
      """WITH ca1 AS (SELECT o_orderkey AS v, CAST(count(*) AS BIGINT) AS ca
        |            FROM orders GROUP BY 1),
        |cb1 AS (SELECT l_orderkey AS v, CAST(count(*) AS BIGINT) AS cb
        |        FROM lineitem GROUP BY 1),
        |ca2 AS (SELECT o_custkey AS v, CAST(count(*) AS BIGINT) AS ca
        |        FROM orders GROUP BY 1),
        |cb2 AS (SELECT l_partkey AS v, CAST(count(*) AS BIGINT) AS cb
        |        FROM lineitem GROUP BY 1),
        |p1 AS (
        |  SELECT 'o_orderkey=l_orderkey' AS key_pair,
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders) AS a_rows,
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS b_rows,
        |    (SELECT CAST(count(*) AS BIGINT) FROM ca1) AS a_vals,
        |    (SELECT CAST(count(*) AS BIGINT) FROM cb1) AS b_vals,
        |    CAST(count(*) AS BIGINT) AS matched_vals,
        |    CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS out_rows,
        |    CAST(coalesce(max(ca * cb), 0) AS BIGINT) AS max_val_rows
        |  FROM ca1 JOIN cb1 USING (v)),
        |p2 AS (
        |  SELECT 'o_custkey=l_partkey' AS key_pair,
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders) AS a_rows,
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS b_rows,
        |    (SELECT CAST(count(*) AS BIGINT) FROM ca2) AS a_vals,
        |    (SELECT CAST(count(*) AS BIGINT) FROM cb2) AS b_vals,
        |    CAST(count(*) AS BIGINT) AS matched_vals,
        |    CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS out_rows,
        |    CAST(coalesce(max(ca * cb), 0) AS BIGINT) AS max_val_rows
        |  FROM ca2 JOIN cb2 USING (v))
        |SELECT key_pair, a_rows, b_rows, a_vals, b_vals, matched_vals,
        |  out_rows, max_val_rows,
        |  CAST(CASE WHEN out_rows > 0
        |    THEN max_val_rows * 1000000 // out_rows ELSE 0 END AS BIGINT)
        |    AS hot_ppm
        |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
        |ORDER BY key_pair""".stripMargin),


    // FORWARD as-of: each signup matched to the EARLIEST purchase at
    // or after it — the same single-shuffle union+window shape as the
    // backward x73, ordered descending; purchases pre-aggregated
    // unique per (user, ts) per the operator's contract
    Q.df("x231_asof_forward",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val signups = ev.where(col("event_type") === "signup")
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(min("event_id").as("pid"))
        AsofJoin.asofJoinForward(signups, purchases,
          col("user_id"), col("user_id"), col("ts"), col("ts"),
          Seq(col("user_id"), col("event_id")), col("pid"))
          .select(col("l.user_id").as("user_id"),
            col("l.event_id").as("signup_id"),
            col("asof").as("purchase_id"))
          .orderBy("user_id", "signup_id")
      },
      """WITH p AS (
        |  SELECT user_id, ts, min(event_id) AS pid FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1, 2),
        |un AS (
        |  SELECT user_id AS k, ts AS t, 1 AS side,
        |    event_id AS lid, CAST(NULL AS BIGINT) AS rid
        |  FROM events WHERE event_type = 'signup'
        |  UNION ALL
        |  SELECT user_id, ts, 0, NULL, pid FROM p),
        |w AS (
        |  SELECT k, side, lid,
        |    last_value(rid IGNORE NULLS) OVER (PARTITION BY k
        |      ORDER BY t DESC, side ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
        |  FROM un)
        |SELECT k AS user_id, lid AS signup_id, m AS purchase_id
        |FROM w WHERE side = 1 AND m IS NOT NULL
        |ORDER BY user_id, signup_id""".stripMargin),


    // whole-schema FK coverage matrix: every declared foreign-key
    // edge audited in one report (keyed anti-join per edge, exact
    // orphan ppm) — plus a deliberately wrong edge proving a non-key
    // column is caught with a nonzero orphan share
    Q.df("x234_fk_coverage",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val li = Tables.load(s, dir, "lineitem")
        val cust = Tables.load(s, dir, "customer")
        val part = Tables.load(s, dir, "part")
        val supp = Tables.load(s, dir, "supplier")
        Expectations.fkCoverage(Seq(
          ("lineitem.l_orderkey->orders", li, "l_orderkey", orders,
            "o_orderkey"),
          ("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"),
          ("lineitem.l_suppkey->supplier", li, "l_suppkey", supp,
            "s_suppkey"),
          ("orders.o_custkey->customer", orders, "o_custkey", cust,
            "c_custkey"),
          ("orders.o_orderkey->supplier(WRONG)", orders, "o_orderkey",
            supp, "s_suppkey")))
      },
      // NOT EXISTS, not NOT IN: NOT EXISTS is null-semantics-equivalent
      // to Spark's left_anti (a NULL child fk matches no parent row, so
      // it counts as an orphan; NOT IN would instead return zero orphans
      // for the whole edge if the parent key held a NULL) — ADVICE r6.
      """WITH e1 AS (
        |  SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child,
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem c
        |     WHERE NOT EXISTS (SELECT 1 FROM orders p
        |                       WHERE p.o_orderkey = c.l_orderkey))
        |      AS n_orphans),
        |e2 AS (
        |  SELECT 'lineitem.l_partkey->part',
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem c
        |     WHERE NOT EXISTS (SELECT 1 FROM part p
        |                       WHERE p.p_partkey = c.l_partkey))),
        |e3 AS (
        |  SELECT 'lineitem.l_suppkey->supplier',
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem c
        |     WHERE NOT EXISTS (SELECT 1 FROM supplier p
        |                       WHERE p.s_suppkey = c.l_suppkey))),
        |e4 AS (
        |  SELECT 'orders.o_custkey->customer',
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders c
        |     WHERE NOT EXISTS (SELECT 1 FROM customer p
        |                       WHERE p.c_custkey = c.o_custkey))),
        |e5 AS (
        |  SELECT 'orders.o_orderkey->supplier(WRONG)',
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders c
        |     WHERE NOT EXISTS (SELECT 1 FROM supplier p
        |                       WHERE p.s_suppkey = c.o_orderkey))),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
        |      UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4
        |      UNION ALL SELECT * FROM e5)
        |SELECT fk_edge, n_child, n_orphans,
        |  CAST(CASE WHEN n_child > 0
        |    THEN n_orphans * 1000000 // n_child ELSE 0 END AS BIGINT)
        |    AS orphan_ppm
        |FROM u ORDER BY fk_edge""".stripMargin),


    // bucketed UPSERT: base and change batch both bucketed by key, the
    // full-outer merge join runs bucket-to-bucket with a zero-Exchange
    // join subtree (asserted in-line) — MERGE INTO without shuffling
    // the fact table; judged through the merged rollup
    Q.df("x249_bucketed_upsert",
      (s, dir) => graft.io.Warehouse.bucketedUpsert(s, dir),
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_orderstatus AS st
        |  FROM orders
        |), upd AS (
        |  SELECT k, cents + 500 AS cents, st FROM base WHERE k % 10 = 3
        |  UNION ALL
        |  SELECT k + 100000000, cents, 'N' FROM base WHERE k % 97 = 0
        |), merged AS (
        |  SELECT coalesce(u.k, b.k) AS k,
        |    coalesce(u.cents, b.cents) AS cents,
        |    coalesce(u.st, b.st) AS st
        |  FROM base b FULL OUTER JOIN upd u ON b.k = u.k
        |)
        |SELECT st AS o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM merged GROUP BY 1 ORDER BY o_orderstatus""".stripMargin),


    // date-partitioned warehouse + dynamic partition pruning: the
    // dimension's runtime filter prunes the fact scan's partitions via
    // a dynamicpruning subquery (require'd in-plan); the rollup sits
    // on the oracle gate so layout + pruning round-trip is
    // value-checked; day-of-week is epoch-day mod 7 (engine-neutral)
    Q.df("x268_partition_pruned_join",
      (s, dir) => graft.io.Warehouse.partitionPrunedJoin(s, dir),
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events)
        |SELECT strftime(d, '%Y-%m-%d') AS d,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS cents
        |FROM ev WHERE (d - DATE '1970-01-01') % 7 = 2
        |GROUP BY 1 ORDER BY d""".stripMargin),


    // interval-union coverage per user: events hold 600 s, overlaps
    // merge via the telescoping min(next-ts, hold) identity — one lead
    // window, no interval self-join; the uptime/engagement metric that
    // raw duration sums double-count
    Q.df("x270_interval_coverage",
      (s, dir) => TimeSeries.intervalCoverage(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_id", 600L),
      """WITH e AS (
        |  SELECT user_id AS k, epoch_us(ts) AS tm, event_id FROM events),
        |l AS (
        |  SELECT k, tm,
        |    lead(tm) OVER (PARTITION BY k ORDER BY tm, event_id) AS nxt
        |  FROM e)
        |SELECT k AS user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST((sum(CASE WHEN nxt IS NULL THEN 0
        |      ELSE least(nxt - tm, 600000000) END) + 600000000)
        |    // 1000000 AS BIGINT) AS covered_s,
        |  CAST((max(tm) - min(tm) + 600000000) // 1000000 AS BIGINT)
        |    AS span_s,
        |  CAST((sum(CASE WHEN nxt IS NULL THEN 0
        |      ELSE least(nxt - tm, 600000000) END) + 600000000) * 1000000
        |    // (max(tm) - min(tm) + 600000000) AS BIGINT)
        |    AS utilization_ppm
        |FROM l GROUP BY 1 ORDER BY user_id""".stripMargin),


    // three-way snapshot merge (data branching): branches a and b both
    // evolved from orders; one-sided changes take that side, identical
    // changes converge, divergent changes are conflicts that keep base
    // — never a silent winner; removed-vs-updated conflicts included
    Q.df("x273_three_way_merge",
      (s, dir) => {
        val base = Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("k"),
            expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        val a = base.where(col("k") % 50 =!= 1)
          .select(col("k"), (col("cents") +
            when(col("k") % 6 === 0, 500L).otherwise(0L)).as("cents"))
        val b = base.where(col("k") % 50 =!= 2)
          .select(col("k"), (col("cents") +
            when(col("k") % 15 === 0, 700L).otherwise(0L)).as("cents"))
        Cdc.threeWayMerge(base, a, b, "k", "cents")
          .groupBy("status")
          .agg(count(lit(1)).as("n_keys"), sum("cents").as("sum_cents"),
            min("k").as("example_k"))
          .orderBy("status")
      },
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |a AS (SELECT k, cents + CASE WHEN k % 6 = 0 THEN 500 ELSE 0 END
        |        AS cents
        |      FROM base WHERE k % 50 <> 1),
        |b AS (SELECT k, cents + CASE WHEN k % 15 = 0 THEN 700 ELSE 0 END
        |        AS cents
        |      FROM base WHERE k % 50 <> 2),
        |j AS (
        |  SELECT base.k, base.cents AS c0,
        |    a.cents AS ca, a.k IS NOT NULL AS pa,
        |    b.cents AS cb, b.k IS NOT NULL AS pb
        |  FROM base LEFT JOIN a ON base.k = a.k
        |  LEFT JOIN b ON base.k = b.k),
        |c AS (
        |  SELECT k, c0, ca, cb, pa, pb,
        |    (NOT pa OR ca <> c0) AS cha,
        |    (NOT pb OR cb <> c0) AS chb
        |  FROM j),
        |m AS (
        |  SELECT k,
        |    CASE WHEN NOT cha AND NOT chb THEN 'unchanged'
        |      WHEN cha AND NOT chb THEN 'a_only'
        |      WHEN NOT cha AND chb THEN 'b_only'
        |      WHEN pa = pb AND ca IS NOT DISTINCT FROM cb THEN 'both_same'
        |      ELSE 'conflict' END AS status,
        |    CASE WHEN NOT cha AND NOT chb THEN c0
        |      WHEN cha AND NOT chb THEN ca
        |      WHEN NOT cha AND chb THEN cb
        |      WHEN pa = pb AND ca IS NOT DISTINCT FROM cb THEN ca
        |      ELSE c0 END AS cents,
        |    CASE WHEN NOT cha AND NOT chb THEN TRUE
        |      WHEN cha AND NOT chb THEN pa
        |      WHEN NOT cha AND chb THEN pb
        |      WHEN pa = pb AND ca IS NOT DISTINCT FROM cb THEN pa
        |      ELSE TRUE END AS present
        |  FROM c)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(min(k) AS BIGINT) AS example_k
        |FROM m WHERE present OR status = 'conflict'
        |GROUP BY 1 ORDER BY status""".stripMargin),


    // Merkle-style anti-entropy block diff between two replicas
    // (planted divergence: one corrupted value, one dropped row):
    // 60-bit row hashes XOR into key-range block checksums; only the
    // block tables are compared — O(n/blockSize) traffic, mismatched
    // blocks name where to repair
    Q.df("x275_merkle_diff",
      (s, dir) => {
        val base = Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("k"),
            expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        val replica = base.where(!(col("k") % 7000 === 23))
          .select(col("k"), (col("cents") +
            when(col("k") % 5000 === 17, 1L).otherwise(0L)).as("cents"))
        Expectations.merkleDiff(base, replica, "k", "cents", 256L)
      },
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |rep AS (
        |  SELECT k, cents + CASE WHEN k % 5000 = 17 THEN 1 ELSE 0 END
        |    AS cents
        |  FROM base WHERE k % 7000 <> 23),
        |ha AS (
        |  SELECT k // 256 AS block,
        |    CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':'
        |      || CAST(cents AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM base),
        |hb AS (
        |  SELECT k // 256 AS block,
        |    CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':'
        |      || CAST(cents AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM rep),
        |sa AS (SELECT block, CAST(count(*) AS BIGINT) AS n_a,
        |         bit_xor(h) AS x_a FROM ha GROUP BY 1),
        |sb AS (SELECT block, CAST(count(*) AS BIGINT) AS n_b,
        |         bit_xor(h) AS x_b FROM hb GROUP BY 1)
        |SELECT coalesce(sa.block, sb.block) AS block,
        |  coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b, x_a, x_b
        |FROM sa FULL JOIN sb ON sa.block = sb.block
        |WHERE n_a IS DISTINCT FROM n_b OR x_a IS DISTINCT FROM x_b
        |ORDER BY block""".stripMargin),


    // audience-overlap matrix in ONE bitmask pass: per-user bit_or
    // over the type alphabet, then every pair statistic reads off the
    // <=2^T-row mask histogram — the whole distinct-overlap grid for
    // one corpus-sized shuffle, vs T^2 COUNT(DISTINCT) fans
    Q.df("x277_audience_overlap",
      (s, dir) => Profile.audienceOverlap(
        Tables.load(s, dir, "events"), "user_id", "event_type"),
      """WITH per AS (SELECT DISTINCT event_type, user_id FROM events),
        |na AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |       FROM per GROUP BY 1),
        |ty AS (SELECT event_type FROM na),
        |pr AS (SELECT a.event_type AS ta, b.event_type AS tb
        |       FROM ty a JOIN ty b ON a.event_type < b.event_type),
        |bt AS (
        |  SELECT x.event_type AS ta, y.event_type AS tb,
        |    CAST(count(*) AS BIGINT) AS n_both
        |  FROM per x JOIN per y ON x.user_id = y.user_id
        |    AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT pr.ta AS type_a, pr.tb AS type_b,
        |  a.n AS n_a, b.n AS n_b,
        |  coalesce(bt.n_both, 0) AS n_both,
        |  a.n + b.n - coalesce(bt.n_both, 0) AS n_either,
        |  coalesce(bt.n_both, 0) * 1000000
        |    // (a.n + b.n - coalesce(bt.n_both, 0)) AS jac_ppm
        |FROM pr JOIN na a ON a.event_type = pr.ta
        |JOIN na b ON b.event_type = pr.tb
        |LEFT JOIN bt ON bt.ta = pr.ta AND bt.tb = pr.tb
        |ORDER BY type_a, type_b""".stripMargin),


    // invoice reconciliation: stored order total vs the exact-DECIMAL
    // sum of its lines at price*(1-disc)*(1+tax) — the financial
    // closing audit; round(2) half-up in both engines, difference in
    // cents, no doubles anywhere
    Q.df("x286_invoice_reconciliation",
      (s, dir) => Expectations.invoiceReconciliation(
        Tables.load(s, dir, "orders"), Tables.load(s, dir, "lineitem")),
      """WITH lines AS (
        |  SELECT l_orderkey AS k,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2))
        |         - CAST(l_discount AS DECIMAL(18,2)))
        |      * (CAST(1 AS DECIMAL(18,2))
        |         + CAST(l_tax AS DECIMAL(18,2)))) AS expected
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o.o_orderstatus,
        |    CASE WHEN l.expected IS NULL THEN NULL
        |      ELSE CAST((round(l.expected, 2)
        |        - CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
        |        AS BIGINT) END AS delta_cents
        |  FROM orders o LEFT JOIN lines l ON o.o_orderkey = l.k)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN delta_cents IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_no_lines,
        |  CAST(sum(CASE WHEN delta_cents = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN delta_cents IS NOT NULL AND delta_cents <> 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
        |  coalesce(max(abs(delta_cents)), 0) AS max_abs_delta_cents,
        |  CAST(coalesce(sum(abs(delta_cents)), 0) AS BIGINT)
        |    AS sum_abs_delta_cents
        |FROM j GROUP BY 1 ORDER BY o_orderstatus""".stripMargin),


    // join-cardinality calibration: textbook uniform-NDV estimate vs
    // ACTUAL join rows per star-schema edge — how far the CBO
    // assumption is off on this data; DECIMAL cross-multiplication,
    // err in ppm of actual
    Q.df("x301_join_cardinality",
      (s, dir) => Profile.joinCardinalityAudit(Seq(
        ("li_orders", Tables.load(s, dir, "lineitem"), "l_orderkey",
          Tables.load(s, dir, "orders"), "o_orderkey"),
        ("li_part", Tables.load(s, dir, "lineitem"), "l_partkey",
          Tables.load(s, dir, "part"), "p_partkey"),
        ("li_supplier", Tables.load(s, dir, "lineitem"), "l_suppkey",
          Tables.load(s, dir, "supplier"), "s_suppkey"),
        ("orders_customer", Tables.load(s, dir, "orders"), "o_custkey",
          Tables.load(s, dir, "customer"), "c_custkey"),
        ("customer_nation", Tables.load(s, dir, "customer"),
          "c_nationkey", Tables.load(s, dir, "nation"), "n_nationkey"))),
      """WITH edge AS (
        |  SELECT 'li_orders' AS edge,
        |    (SELECT count(*) FROM lineitem) AS n_left,
        |    (SELECT count(*) FROM orders) AS n_right,
        |    (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS ndv_left,
        |    (SELECT count(DISTINCT o_orderkey) FROM orders) AS ndv_right,
        |    (SELECT count(*) FROM lineitem JOIN orders
        |      ON l_orderkey = o_orderkey) AS actual_rows
        |  UNION ALL SELECT 'li_part',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM part),
        |    (SELECT count(DISTINCT l_partkey) FROM lineitem),
        |    (SELECT count(DISTINCT p_partkey) FROM part),
        |    (SELECT count(*) FROM lineitem JOIN part
        |      ON l_partkey = p_partkey)
        |  UNION ALL SELECT 'li_supplier',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM supplier),
        |    (SELECT count(DISTINCT l_suppkey) FROM lineitem),
        |    (SELECT count(DISTINCT s_suppkey) FROM supplier),
        |    (SELECT count(*) FROM lineitem JOIN supplier
        |      ON l_suppkey = s_suppkey)
        |  UNION ALL SELECT 'orders_customer',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM customer),
        |    (SELECT count(DISTINCT o_custkey) FROM orders),
        |    (SELECT count(DISTINCT c_custkey) FROM customer),
        |    (SELECT count(*) FROM orders JOIN customer
        |      ON o_custkey = c_custkey)
        |  UNION ALL SELECT 'customer_nation',
        |    (SELECT count(*) FROM customer),
        |    (SELECT count(*) FROM nation),
        |    (SELECT count(DISTINCT c_nationkey) FROM customer),
        |    (SELECT count(DISTINCT n_nationkey) FROM nation),
        |    (SELECT count(*) FROM customer JOIN nation
        |      ON c_nationkey = n_nationkey))
        |SELECT edge, CAST(n_left AS BIGINT) AS n_left,
        |  CAST(n_right AS BIGINT) AS n_right,
        |  CAST(ndv_left AS BIGINT) AS ndv_left,
        |  CAST(ndv_right AS BIGINT) AS ndv_right,
        |  CAST(CAST(n_left AS HUGEINT) * n_right
        |    // greatest(ndv_left, ndv_right) AS BIGINT) AS est_rows,
        |  CAST(actual_rows AS BIGINT) AS actual_rows,
        |  CAST(CAST(abs(CAST(n_left AS HUGEINT) * n_right
        |      // greatest(ndv_left, ndv_right) - actual_rows)
        |    AS HUGEINT) * 1000000 // actual_rows AS BIGINT) AS err_ppm
        |FROM edge ORDER BY edge""".stripMargin),


    // nearest as-of join: min |orderdate - cutoff| per event with ties
    // to the past — one shuffle, two sorted windows, no pair blowup
    Q.df("x339_asof_nearest",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            date_add(lit(java.sql.Date.valueOf("1995-01-01")),
              (col("event_id") % 2400).cast("int")).cast("timestamp")
              .as("cutoff"))
        val ord = Tables.load(s, dir, "orders")
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max("o_orderkey").as("o_orderkey"))
          .select(col("o_custkey"),
            col("o_orderdate").cast("timestamp").as("odt"),
            col("o_orderkey"))
        AsofJoin.asofNearest(ev, ord,
            col("user_id"), col("o_custkey"),
            col("cutoff"), col("odt"),
            Seq(col("event_id")), col("o_orderkey"))
          .select(col("l.event_id").as("event_id"),
            col("asof").as("o_orderkey"), col("dir"), col("delta_us"))
          .orderBy("event_id")
      },
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |    CAST(DATE '1995-01-01' + INTERVAL (event_id % 2400) DAY
        |      AS TIMESTAMP) AS cutoff
        |  FROM events
        |), ord AS (
        |  SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS odt,
        |    max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2
        |), b AS (
        |  SELECT ev.event_id, ord.o_orderkey AS bk, ord.odt AS bt
        |  FROM ev ASOF LEFT JOIN ord
        |    ON ev.user_id = ord.o_custkey AND ev.cutoff >= ord.odt
        |), f AS (
        |  SELECT ev.event_id, ord.o_orderkey AS fk, ord.odt AS ft
        |  FROM ev ASOF LEFT JOIN ord
        |    ON ev.user_id = ord.o_custkey AND ev.cutoff <= ord.odt
        |), j AS (
        |  SELECT ev.event_id, ev.cutoff, b.bk, b.bt, f.fk, f.ft,
        |    (f.ft IS NULL OR (b.bt IS NOT NULL AND
        |      epoch_us(ev.cutoff) - epoch_us(b.bt)
        |        <= epoch_us(f.ft) - epoch_us(ev.cutoff))) AS useb
        |  FROM ev JOIN b USING (event_id) JOIN f USING (event_id)
        |)
        |SELECT event_id,
        |  CASE WHEN useb THEN bk ELSE fk END AS o_orderkey,
        |  CASE WHEN useb THEN 'b' ELSE 'f' END AS dir,
        |  CAST(CASE WHEN useb THEN epoch_us(cutoff) - epoch_us(bt)
        |    ELSE epoch_us(ft) - epoch_us(cutoff) END AS BIGINT)
        |    AS delta_us
        |FROM j WHERE bk IS NOT NULL OR fk IS NOT NULL
        |ORDER BY event_id""".stripMargin),


    // SCD-2 intervalization of the event log: per-user consecutive
    // same-type runs to (valid_from, valid_to) epoch-second intervals
    Q.df("x352_scd2_intervals",
      (s, dir) => TimeSeries.scd2Intervals(Tables.load(s, dir, "events")),
      """WITH e AS (SELECT user_id, event_id, event_type, ts,
        |    CAST(date_diff('second', TIMESTAMP '1970-01-01', ts)
        |      AS BIGINT) AS ep
        |  FROM events),
        |c AS (SELECT user_id, event_type, ep, ts, event_id,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type
        |      THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id)),
        |r AS (SELECT user_id, event_type, ep,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        |  FROM c),
        |runs AS (SELECT user_id, seq, event_type,
        |    CAST(min(ep) AS BIGINT) AS valid_from,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT user_id, CAST(seq AS BIGINT) AS seq, event_type,
        |  valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY seq)
        |    AS valid_to,
        |  n_events
        |FROM runs ORDER BY user_id, seq""".stripMargin),

  )
}
