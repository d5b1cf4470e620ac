package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming
import graft.queries.ExtShared._

/** §2.8 judged queries — physical layout: z-order/Hilbert, zonemaps, partitioning, compaction. */
private[queries] object ExtQLayout {

  val qs: Seq[Q] = Seq(

    // Z-order (Morton) layout key over (p_size, p_partkey): the
    // clustering key a multi-dimension data-skipping rewrite sorts by
    Q.df("x93_zorder_key",
      (s, dir) => graft.ext.Layout.partZorder(Tables.load(s, dir, "part")),
      s"""SELECT p_partkey,
         |  ${graft.ext.Layout.zorderSql("p_size", "p_partkey", 8)} AS zkey
         |FROM part ORDER BY zkey, p_partkey""".stripMargin),


    // zone-map pruning audit: natural vs size-sorted vs Z-ordered
    // layout, files of 16 rows with min/max zone maps on both
    // dimensions, scan counts under a size predicate, a key predicate
    // and their conjunction — the measured scan-cost argument for a
    // layout rewrite, computed without writing a byte
    Q.df("x250_zonemap_audit",
      (s, dir) => graft.ext.Layout.zonemapAudit(
        Tables.load(s, dir, "part"), rowsPerFile = 16),
      s"""WITH b AS (
         |  SELECT CAST(p_partkey AS BIGINT) AS pk,
         |    CAST(p_size AS BIGINT) AS sz,
         |    CAST(p_partkey AS BIGINT) & 255 AS pk8
         |  FROM part
         |), l AS (
         |  SELECT '1_natural' AS layout, pk, sz, pk8,
         |    row_number() OVER (ORDER BY pk) - 1 AS gid FROM b
         |  UNION ALL
         |  SELECT '2_bysize', pk, sz, pk8,
         |    row_number() OVER (ORDER BY sz, pk) - 1 FROM b
         |  UNION ALL
         |  SELECT '3_zorder', pk, sz, pk8,
         |    row_number() OVER (ORDER BY ${graft.ext.Layout.zorderSql("sz", "pk", 8)}, pk) - 1
         |  FROM b
         |), f AS (
         |  SELECT layout, gid // 16 AS file,
         |    min(sz) AS lo_sz, max(sz) AS hi_sz,
         |    min(pk8) AS lo_pk, max(pk8) AS hi_pk
         |  FROM l GROUP BY 1, 2
         |)
         |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(CASE WHEN lo_sz <= 15 AND hi_sz >= 10
         |    THEN 1 ELSE 0 END) AS BIGINT) AS scan_size_pred,
         |  CAST(sum(CASE WHEN lo_pk <= 63 AND hi_pk >= 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS scan_key_pred,
         |  CAST(sum(CASE WHEN lo_sz <= 15 AND hi_sz >= 10
         |    AND lo_pk <= 63 AND hi_pk >= 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS scan_both
         |FROM f GROUP BY 1 ORDER BY layout""".stripMargin),


    // Z-order layout REWRITE (x250 prices layouts; this one WRITES the
    // winner): range-partitioned Morton sort-write, then the judged
    // rollup reads the rewritten files through a both-dimension
    // predicate — pushdown to the new scan and the measured <=50%
    // file-scan win are require'd in-line; content equality sits on
    // the oracle
    Q.df("x288_zorder_rewrite",
      (s, dir) => graft.io.Warehouse.zorderRewrite(s, dir),
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(CAST(floor(p_retailprice * 100) AS BIGINT))
        |    AS BIGINT) AS retail_cents
        |FROM part
        |WHERE p_size BETWEEN 10 AND 15 AND (p_partkey & 255) <= 63
        |GROUP BY 1 ORDER BY p_brand""".stripMargin),


    // Hilbert-curve clustering key: the native codegen'd xy2d walk,
    // judged row-exact against the same walk unrolled as SQL CTEs
    Q.df("x307_hilbert_layout",
      (s, dir) => graft.ext.Layout.partHilbert(Tables.load(s, dir, "part")),
      s"""WITH h0 AS (
         |  SELECT p_partkey AS id, CAST(p_size AS BIGINT) AS x,
         |    CAST(p_partkey & 255 AS BIGINT) AS y, CAST(0 AS BIGINT) AS d
         |  FROM part),
         |${graft.ext.Layout.hilbertSqlRounds(8)}
         |SELECT p.p_partkey AS p_partkey, CAST(p.p_size AS BIGINT) AS x,
         |  CAST(p.p_partkey & 255 AS BIGINT) AS y, CAST(h8.d AS BIGINT) AS hkey
         |FROM part p JOIN h8 ON h8.id = p.p_partkey
         |ORDER BY hkey, p_partkey""".stripMargin),


    // Hilbert-clustered physical rewrite (x288's Z-order twin): same
    // in-line pushdown + at-most-half-files-scanned requires, content
    // re-checked bit-for-bit by the oracle
    Q.df("x319_hilbert_rewrite",
      (s, dir) => graft.io.Warehouse.hilbertRewrite(s, dir),
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(CAST(floor(p_retailprice * 100) AS BIGINT))
        |    AS BIGINT) AS retail_cents
        |FROM part
        |WHERE p_size BETWEEN 10 AND 15 AND (p_partkey & 255) <= 63
        |GROUP BY 1 ORDER BY p_brand""".stripMargin),


    // chunking-pipeline boundary overlap: pairs where A's last 3
    // tokens equal B's first 3 — split-document forensics
    Q.df("x330_boundary_overlap",
      (s, dir) => Dedup.boundaryOverlap(
        Tables.load(s, dir, "documents"), 3),
      s"""WITH $duckTok,
         |nt AS (SELECT doc_id, CAST(max(pos) AS BIGINT) AS n
         |  FROM tok GROUP BY 1),
         |hd AS (SELECT t.doc_id AS dst_id,
         |    string_agg(w, ' ' ORDER BY pos) AS gram
         |  FROM tok t JOIN nt USING (doc_id)
         |  WHERE pos <= 3 AND n >= 3 GROUP BY 1),
         |tl AS (SELECT t.doc_id AS src_id,
         |    string_agg(w, ' ' ORDER BY pos) AS gram
         |  FROM tok t JOIN nt USING (doc_id)
         |  WHERE pos > n - 3 AND n >= 3 GROUP BY 1)
         |SELECT src_id, dst_id, tl.gram AS gram
         |FROM tl JOIN hd ON tl.gram = hd.gram AND src_id <> dst_id
         |ORDER BY src_id, dst_id""".stripMargin),


    // range-partition boundary plan for an 8-way repartitionByRange
    // of order value: discrete cuts + the census they produce
    Q.df("x336_range_boundaries",
      (s, dir) => graft.ext.Layout.rangeBoundaries(
        Tables.load(s, dir, "orders"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)"), 8),
      {
        val cuts = (1 to 7).map(i =>
          s"CAST(percentile_disc(${i / 8.0}) WITHIN GROUP (ORDER BY v)" +
            " AS BIGINT)").mkString(", ")
        s"""WITH v AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT)
           |    AS v FROM orders),
           |hist AS (SELECT v, CAST(count(*) AS BIGINT) AS c
           |  FROM v GROUP BY 1),
           |cuts AS (SELECT [$cuts] AS bs FROM v),
           |asg AS (SELECT v, c,
           |    CAST(len(list_filter(cuts.bs, b -> b < v)) AS BIGINT)
           |      AS part
           |  FROM hist CROSS JOIN cuts),
           |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM hist)
           |SELECT part, CAST(min(v) AS BIGINT) AS lo,
           |  CAST(max(v) AS BIGINT) AS hi,
           |  CAST(sum(c) AS BIGINT) AS n_rows,
           |  CAST(sum(c) * 8 * 1000 // n_total AS BIGINT)
           |    AS balance_milli
           |FROM asg CROSS JOIN tot GROUP BY 1, n_total
           |ORDER BY 1""".stripMargin
      }),


    // 3-column Hilbert clustering of lineitem: the native d-dim
    // Skilling expression vs the same walk unrolled as SQL CTEs
    Q.df("x340_hilbert3_layout",
      (s, dir) => graft.ext.Layout.lineitemHilbert3(
        Tables.load(s, dir, "lineitem")),
      s"""WITH hs0 AS (
         |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT)
         |      AS l_linenumber,
         |    CAST(l_suppkey & 63 AS BIGINT) AS x0,
         |    CAST(l_partkey & 63 AS BIGINT) AS x1,
         |    CAST(floor(l_quantity) AS BIGINT) & 63 AS x2
         |  FROM lineitem
         |),
         |${graft.ext.Layout.hilbertNdSqlRounds(3, 6,
             Seq("l_orderkey", "l_linenumber"))}
         |SELECT l_orderkey, l_linenumber, x0, x1, x2, hkey
         |FROM hsf
         |ORDER BY hkey, l_orderkey, l_linenumber, x0, x1, x2"""
        .stripMargin),


    // zone-map pricing of 2-D vs 3-D Hilbert clustering: does the
    // third clustering column pay for itself before the rewrite runs
    Q.df("x341_zonemap_3d",
      (s, dir) => graft.ext.Layout.zonemapAuditHilbert(
        Tables.load(s, dir, "lineitem")),
      {
        def lay(name: String, src: String, order: String) =
          s"""SELECT '$name' AS layout,
             |  CAST(count(*) AS BIGINT) AS n_files,
             |  CAST(sum(CASE WHEN lox <= 15 AND hix >= 8
             |    THEN 1 ELSE 0 END) AS BIGINT) AS scan_x,
             |  CAST(sum(CASE WHEN loy <= 31 AND hiy >= 16
             |    THEN 1 ELSE 0 END) AS BIGINT) AS scan_y,
             |  CAST(sum(CASE WHEN loz <= 10 AND hiz >= 1
             |    THEN 1 ELSE 0 END) AS BIGINT) AS scan_z,
             |  CAST(sum(CASE WHEN lox <= 15 AND hix >= 8
             |    AND loy <= 31 AND hiy >= 16
             |    AND loz <= 10 AND hiz >= 1
             |    THEN 1 ELSE 0 END) AS BIGINT) AS scan_xyz
             |FROM (SELECT gid // 16 AS file,
             |    min(x0) AS lox, max(x0) AS hix,
             |    min(x1) AS loy, max(x1) AS hiy,
             |    min(x2) AS loz, max(x2) AS hiz
             |  FROM (SELECT x0, x1, x2,
             |      row_number() OVER (ORDER BY $order) - 1 AS gid
             |    FROM $src)
             |  GROUP BY 1)""".stripMargin
        s"""WITH hs0 AS (
           |  SELECT CAST(l_orderkey AS BIGINT) AS ok,
           |    CAST(l_linenumber AS BIGINT) AS ln,
           |    CAST(l_suppkey & 63 AS BIGINT) AS x0,
           |    CAST(l_partkey & 63 AS BIGINT) AS x1,
           |    CAST(floor(l_quantity) AS BIGINT) & 63 AS x2
           |  FROM lineitem
           |),
           |ha0 AS (SELECT * FROM hs0),
           |${graft.ext.Layout.hilbertNdSqlRounds(2, 6,
               Seq("ok", "ln", "x2"), "ha")},
           |hb0 AS (SELECT * FROM hs0),
           |${graft.ext.Layout.hilbertNdSqlRounds(3, 6,
               Seq("ok", "ln"), "hb")}
           |${lay("1_natural", "hs0", "ok, ln, x0, x1, x2")}
           |UNION ALL
           |${lay("2_hilbert2d", "haf", "hkey, x0, x1, x2")}
           |UNION ALL
           |${lay("3_hilbert3d", "hbf", "hkey, x0, x1, x2")}
           |ORDER BY layout""".stripMargin
      }),


    // compaction candidates: top-overlap files by zone-map sweep —
    // the bounded-rewrite shopping list
    Q.df("x344_compaction_candidates",
      (s, dir) => graft.ext.Layout.compactionCandidates(
        Tables.load(s, dir, "lineitem")),
      """WITH b AS (SELECT CAST(l_orderkey AS BIGINT) AS ok,
        |    CAST(l_linenumber AS BIGINT) AS ln,
        |    CAST(l_partkey AS BIGINT) AS v FROM lineitem),
        |n AS (SELECT v, row_number() OVER (ORDER BY ok, ln, v) - 1
        |    AS gid FROM b),
        |fs AS (SELECT gid // 64 AS file, min(v) AS lo, max(v) AS hi
        |  FROM n GROUP BY 1)
        |SELECT file, lo, hi,
        |  CAST((SELECT count(*) FROM fs f2 WHERE f2.lo <= f1.hi)
        |     - (SELECT count(*) FROM fs f2 WHERE f2.hi < f1.lo) - 1
        |    AS BIGINT) AS n_overlap
        |FROM fs f1
        |ORDER BY n_overlap DESC, file
        |LIMIT 20""".stripMargin),


    // sortedness audit: adjacent inversions (intra-chunk + boundary)
    // of l_partkey in orderkey write order — rewrite-or-not evidence
    // (oracle uses the one global lag the Spark shape avoids)
    Q.df("x369_sortedness_audit",
      (s, dir) => graft.ext.Layout.sortednessAudit(
        Tables.load(s, dir, "lineitem")),
      """WITH b AS (SELECT CAST(l_orderkey AS BIGINT) AS ok,
        |    CAST(l_linenumber AS BIGINT) AS ln,
        |    CAST(l_partkey AS BIGINT) AS v FROM lineitem),
        |n AS (SELECT v, row_number() OVER (ORDER BY ok, ln, v) - 1
        |    AS gid FROM b),
        |l AS (SELECT v, gid, lag(v) OVER (ORDER BY gid) AS pv FROM n),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN pv IS NOT NULL AND v < pv
        |      AND gid % 64 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS intra_inversions,
        |    CAST(sum(CASE WHEN pv IS NOT NULL AND v < pv
        |      AND gid % 64 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS boundary_inversions,
        |    CAST(max(gid) // 64 + 1 AS BIGINT) AS n_chunks
        |  FROM l)
        |SELECT n_rows, n_chunks, intra_inversions, boundary_inversions,
        |  (n_rows - 1 - intra_inversions - boundary_inversions)
        |    * 1000000 // (n_rows - 1) AS sorted_ppm
        |FROM agg""".stripMargin),


    // partition completeness: each day vs its ±3-day discrete median
    // — the partial-load / hole detector
    Q.df("x372_partition_completeness",
      (s, dir) => TimeSeries.partitionCompleteness(
        Tables.load(s, dir, "events")),
      """WITH daily AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |w AS (SELECT d, n, list_sort(list(n) OVER (ORDER BY d
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS neigh
        |  FROM daily)
        |SELECT d, n,
        |  CAST(neigh[(len(neigh) + 1) // 2] AS BIGINT) AS med7,
        |  n * 1000000 // CAST(neigh[(len(neigh) + 1) // 2] AS BIGINT)
        |    AS completeness_ppm
        |FROM w ORDER BY d""".stripMargin),


    // sort-key chooser: 4x4 scan-fraction matrix — what each
    // candidate clustering column buys and costs
    Q.df("x374_sort_key_chooser",
      (s, dir) => graft.ext.Layout.sortKeyChooser(
        Tables.load(s, dir, "lineitem")),
      """WITH b AS (SELECT CAST(l_orderkey AS BIGINT) AS k1,
        |    CAST(l_partkey AS BIGINT) AS k2,
        |    CAST(l_suppkey AS BIGINT) AS k3,
        |    CAST(l_quantity AS BIGINT) AS k4 FROM lineitem),
        |bd AS (SELECT min(k1) AS lo1, max(k1) AS hi1,
        |    min(k2) AS lo2, max(k2) AS hi2,
        |    min(k3) AS lo3, max(k3) AS hi3,
        |    min(k4) AS lo4, max(k4) AS hi4 FROM b),
        |pr AS (SELECT lo1 + (hi1 - lo1) // 4 AS p1lo,
        |    lo1 + (hi1 - lo1) // 2 AS p1hi,
        |    lo2 + (hi2 - lo2) // 4 AS p2lo,
        |    lo2 + (hi2 - lo2) // 2 AS p2hi,
        |    lo3 + (hi3 - lo3) // 4 AS p3lo,
        |    lo3 + (hi3 - lo3) // 2 AS p3hi,
        |    lo4 + (hi4 - lo4) // 4 AS p4lo,
        |    lo4 + (hi4 - lo4) // 2 AS p4hi FROM bd),
        |n1 AS (SELECT *, row_number()
        |    OVER (ORDER BY k1, k2, k3, k4) - 1 AS gid FROM b),
        |f1 AS (SELECT gid // 256 AS file,
        |    min(k1) AS mn1, max(k1) AS mx1, min(k2) AS mn2,
        |    max(k2) AS mx2, min(k3) AS mn3, max(k3) AS mx3,
        |    min(k4) AS mn4, max(k4) AS mx4 FROM n1 GROUP BY 1),
        |n2 AS (SELECT *, row_number()
        |    OVER (ORDER BY k2, k1, k3, k4) - 1 AS gid FROM b),
        |f2 AS (SELECT gid // 256 AS file,
        |    min(k1) AS mn1, max(k1) AS mx1, min(k2) AS mn2,
        |    max(k2) AS mx2, min(k3) AS mn3, max(k3) AS mx3,
        |    min(k4) AS mn4, max(k4) AS mx4 FROM n2 GROUP BY 1),
        |n3 AS (SELECT *, row_number()
        |    OVER (ORDER BY k3, k1, k2, k4) - 1 AS gid FROM b),
        |f3 AS (SELECT gid // 256 AS file,
        |    min(k1) AS mn1, max(k1) AS mx1, min(k2) AS mn2,
        |    max(k2) AS mx2, min(k3) AS mn3, max(k3) AS mx3,
        |    min(k4) AS mn4, max(k4) AS mx4 FROM n3 GROUP BY 1),
        |n4 AS (SELECT *, row_number()
        |    OVER (ORDER BY k4, k1, k2, k3) - 1 AS gid FROM b),
        |f4 AS (SELECT gid // 256 AS file,
        |    min(k1) AS mn1, max(k1) AS mx1, min(k2) AS mn2,
        |    max(k2) AS mx2, min(k3) AS mn3, max(k3) AS mx3,
        |    min(k4) AS mn4, max(k4) AS mx4 FROM n4 GROUP BY 1),
        |u AS (
        |  SELECT 'l_orderkey' AS sort_key, 'l_orderkey' AS pred_col,
        |    CAST(count(*) AS BIGINT) AS n_files,
        |    CAST(sum(CASE WHEN mx1 >= p1lo AND mn1 <= p1hi
        |      THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned
        |  FROM f1 CROSS JOIN pr
        |  UNION ALL SELECT 'l_orderkey', 'l_partkey',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx2 >= p2lo AND mn2 <= p2hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f1 CROSS JOIN pr
        |  UNION ALL SELECT 'l_orderkey', 'l_suppkey',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx3 >= p3lo AND mn3 <= p3hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f1 CROSS JOIN pr
        |  UNION ALL SELECT 'l_orderkey', 'l_quantity',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx4 >= p4lo AND mn4 <= p4hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f1 CROSS JOIN pr
        |  UNION ALL SELECT 'l_partkey', 'l_orderkey',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx1 >= p1lo AND mn1 <= p1hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f2 CROSS JOIN pr
        |  UNION ALL SELECT 'l_partkey', 'l_partkey',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx2 >= p2lo AND mn2 <= p2hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f2 CROSS JOIN pr
        |  UNION ALL SELECT 'l_partkey', 'l_suppkey',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx3 >= p3lo AND mn3 <= p3hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f2 CROSS JOIN pr
        |  UNION ALL SELECT 'l_partkey', 'l_quantity',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx4 >= p4lo AND mn4 <= p4hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f2 CROSS JOIN pr
        |  UNION ALL SELECT 'l_suppkey', 'l_orderkey',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx1 >= p1lo AND mn1 <= p1hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f3 CROSS JOIN pr
        |  UNION ALL SELECT 'l_suppkey', 'l_partkey',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx2 >= p2lo AND mn2 <= p2hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f3 CROSS JOIN pr
        |  UNION ALL SELECT 'l_suppkey', 'l_suppkey',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx3 >= p3lo AND mn3 <= p3hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f3 CROSS JOIN pr
        |  UNION ALL SELECT 'l_suppkey', 'l_quantity',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx4 >= p4lo AND mn4 <= p4hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f3 CROSS JOIN pr
        |  UNION ALL SELECT 'l_quantity', 'l_orderkey',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx1 >= p1lo AND mn1 <= p1hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f4 CROSS JOIN pr
        |  UNION ALL SELECT 'l_quantity', 'l_partkey',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx2 >= p2lo AND mn2 <= p2hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f4 CROSS JOIN pr
        |  UNION ALL SELECT 'l_quantity', 'l_suppkey',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx3 >= p3lo AND mn3 <= p3hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f4 CROSS JOIN pr
        |  UNION ALL SELECT 'l_quantity', 'l_quantity',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN mx4 >= p4lo AND mn4 <= p4hi
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM f4 CROSS JOIN pr)
        |SELECT sort_key, pred_col, n_files, files_scanned,
        |  files_scanned * 1000000 // n_files AS scan_ppm
        |FROM u ORDER BY sort_key, pred_col""".stripMargin),

  )
}
