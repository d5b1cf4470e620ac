package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming

/** Helpers shared by the per-family §2.8 registration files (split out
  * of the former 10.4k-line Extensions.scala): temp-tree cleanup,
  * persisted-index path derivation, and the DuckDB CTE fragments the
  * dedup-family oracles compose.
  */
private[queries] object ExtShared {

  /** Recursively delete a temp tree (deepest-first). Roundtrip queries
    * must not assume the writer left exactly one file — an extra
    * sidecar would turn deleteIfExists(dir) into a
    * DirectoryNotEmptyException that masks the real failure. */
  def rmTree(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => try { java.nio.file.Files.deleteIfExists(p); () }
                      catch { case _: java.io.IOException => () })
    }
  }

  /** On-disk home for a persisted ANN index serving the judged
    * queries: keyed by the testdata dir, the variant, AND the
    * embeddings file's (mtime, size) — a regenerated corpus gets a
    * fresh path, so a stale index can never serve it (same identity
    * rule as the streaming ts-divisor cache). Lives under the JVM
    * tmpdir: a cache, rebuilt on first touch wherever it is missing. */
  def annIndexPath(dir: String, variant: String): String =
    Dedup.persistedIndexPath(dir, s"annidx_$variant", "embeddings.parquet")

  /** [[annIndexPath]]'s sibling for the persisted NEAR-DUP index,
    * keyed by the documents file's identity for the same staleness
    * guarantee. */
  def docIndexPath(dir: String, variant: String): String =
    Dedup.persistedIndexPath(dir, s"ndidx_$variant", "documents.parquet")

  /** The MinHash(8)+LSH(2 bands) oracle, shared by batch x57 and its
    * streaming twin x242 — one signature definition, two engines and
    * two execution modes judged against it. */
  lazy val duckMinhash8x2Oracle =
    s"""WITH $duckTok, $duckShingles,
       |mh AS (
       |  SELECT doc_id, i, min(md5(CAST(i AS STRING) || ':' || shingle)) AS m
       |  FROM sh, range(0, 8) r(i) GROUP BY doc_id, i
       |), bands AS (
       |  SELECT doc_id, i % 2 AS band,
       |    md5(min(CASE WHEN CAST(floor(i/2.0) AS BIGINT) = 0 THEN m END) || ':' ||
       |        min(CASE WHEN CAST(floor(i/2.0) AS BIGINT) = 1 THEN m END) || ':' ||
       |        min(CASE WHEN CAST(floor(i/2.0) AS BIGINT) = 2 THEN m END) || ':' ||
       |        min(CASE WHEN CAST(floor(i/2.0) AS BIGINT) = 3 THEN m END)) AS sig
       |  FROM mh GROUP BY doc_id, i % 2
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
       |), $duckJaccardTail
       |SELECT cand.d1, cand.d2,
       |  CAST(floor(10000.0 * i / (s1.n + s2.n - i)) AS BIGINT) AS jac_x10k
       |FROM cand JOIN inter ON cand.d1 = inter.d1 AND cand.d2 = inter.d2
       |JOIN sz s1 ON cand.d1 = s1.doc_id JOIN sz s2 ON cand.d2 = s2.doc_id
       |ORDER BY cand.d1, cand.d2""".stripMargin

  /** DuckDB token stream CTE: (doc_id, pos 1-based, w). */
  val duckTok =
    """tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
      |         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
      |  FROM documents
      |)""".stripMargin

  /** Adversarially SKEWED corpus (x390-x392): 47-char boilerplate
    * prefix on even doc_ids, universal footer on every doc — the two
    * dedup killers (giant shared-prefix windows, one shingle in all
    * documents) derived deterministically from the documents table so
    * the Spark side and the DuckDB oracle rebuild the identical
    * fixture. */
  def skewDocs(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), col("source"),
      concat(
        when(col("doc_id") % 2 === 0,
          lit("subscribe to read the full article terms apply "))
          .otherwise(lit("")),
        col("text"), lit(" copyright footer notice legal")).as("text"))

  val duckSkew =
    """skew AS MATERIALIZED (SELECT doc_id, source,
      |    concat(CASE WHEN doc_id % 2 = 0
      |      THEN 'subscribe to read the full article terms apply '
      |      ELSE '' END,
      |      text, ' copyright footer notice legal') AS text
      |  FROM documents)""".stripMargin

  /** duckTok over the skewed corpus (needs skew). */
  val duckSkewTok =
    """tok AS MATERIALIZED (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
      |         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
      |  FROM skew
      |)""".stripMargin

  /** duckShinglesFiltered over the skewed tok (needs tok). */
  def duckSkewShinglesFiltered(maxDf: Int) =
    s"""sh0 AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
       |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
       |), keep AS MATERIALIZED (
       |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= $maxDf
       |), sh AS MATERIALIZED (SELECT sh0.* FROM sh0 JOIN keep USING (shingle))""".stripMargin

  /** DuckDB distinct word-3-gram shingles CTE (needs tok). */
  val duckShingles =
    """sh AS (
      |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      |)""".stripMargin

  /** DuckDB stop-filtered shingles (needs tok): shingles in more than
    * `maxDf` docs dropped BEFORE any pair generation — the sub-quadratic
    * candidate path (mirrors Dedup.jaccardPairs(maxDocFreq=Some(f))). */
  def duckShinglesFiltered(maxDf: Int) =
    s"""sh0 AS (
       |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
       |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
       |), keep AS (
       |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= $maxDf
       |), sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle))""".stripMargin

  /** DuckDB BMP geometry CTE `g(doc_id, w, h, px)`: the deterministic
    * construction rule of Multimodal.withBmpPayload re-derived in SQL
    * (w = n_chars%64+1, h = n_chars%37+1, px = 4-aligned-3w * h). */
  val duckBmpGeom =
    """g AS (
      |  SELECT doc_id, w, h,
      |    (CAST(floor((3 * w + 3) / 4.0) AS BIGINT) * 4) * h AS px
      |  FROM (SELECT doc_id, n_chars % 64 + 1 AS w, n_chars % 37 + 1 AS h
      |        FROM documents) d
      |)""".stripMargin

  val duckJaccardTail =
    """sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS i
      |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2
      |)""".stripMargin



  /** DuckDB twin of [[graft.ext.Graph.kCoreTrajectory]] on the
    * customer-supplier graph: the peel rounds unrolled as materialized
    * CTE triples (n_r, e_r, r_r) — same contract (degree >= k on the
    * symmetrized distinct arc list, counts after restriction). */
  def kcoreOracleSql(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""n$r AS (SELECT src AS node FROM e${r - 1}
         |  GROUP BY 1 HAVING count(*) >= $k),
         |e$r AS MATERIALIZED (SELECT e.src, e.dst FROM e${r - 1} e
         |  JOIN n$r a ON e.src = a.node JOIN n$r b ON e.dst = b.node),
         |r$r AS (SELECT CAST($r AS BIGINT) AS round,
         |  (SELECT CAST(count(DISTINCT src) AS BIGINT) FROM e$r)
         |    AS n_nodes,
         |  (SELECT CAST(count(*) AS BIGINT) FROM e$r) AS n_arcs)"""
        .stripMargin
    }.mkString(",\n")
    val sel = (1 to rounds).map(r => s"SELECT * FROM r$r")
      .mkString(" UNION ALL ")
    s"""WITH b AS (SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR)
       |      AS src,
       |    's' || CAST(l.l_suppkey AS VARCHAR) AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |e0 AS MATERIALIZED (
       |  SELECT src, dst FROM b UNION SELECT dst, src FROM b),
       |$steps
       |$sel ORDER BY round""".stripMargin
  }

  /** DuckDB twin of [[graft.ext.Preference.bradleyTerry]]: the MM
    * rounds unrolled as CTE pairs (d_n, s_n) — every operation the
    * same truncating BIGINT arithmetic as the Spark side. */
  def btOracleSql(iters: Int): String = {
    val rounds = (1 to iters).map { n =>
      s"""d$n AS (
         |  SELECT g.i, sum(CAST(g.n_ij AS HUGEINT) * 1000000000000
         |    // (a.s + b.s)) AS dn
         |  FROM games g JOIN s${n - 1} a ON a.i = g.i
         |  JOIN s${n - 1} b ON b.i = g.j GROUP BY 1),
         |s$n AS (
         |  SELECT d$n.i, CAST(CAST(coalesce(w.n_wins, 0) AS HUGEINT)
         |    * 1000000000000 // d$n.dn AS BIGINT) AS s
         |  FROM d$n LEFT JOIN wins w ON w.i = d$n.i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT user_id AS u, epoch_us(ts) AS tm, event_id,
       |    event_type AS t, CAST(floor(value * 100) AS BIGINT) AS v
       |  FROM events),
       |sq AS (
       |  SELECT t, v, lead(t) OVER w AS nt, lead(v) OVER w AS nv
       |  FROM e WINDOW w AS (PARTITION BY u ORDER BY tm, event_id)),
       |cmp AS (
       |  SELECT CASE WHEN v > nv OR (v = nv AND t < nt)
       |      THEN t ELSE nt END AS w,
       |    CASE WHEN v > nv OR (v = nv AND t < nt)
       |      THEN nt ELSE t END AS l
       |  FROM sq WHERE nt IS NOT NULL AND nt <> t),
       |dir AS (SELECT w, l, CAST(count(*) AS BIGINT) AS c
       |        FROM cmp GROUP BY 1, 2),
       |games AS (
       |  SELECT i, j, CAST(sum(c) AS BIGINT) AS n_ij FROM (
       |    SELECT w AS i, l AS j, c FROM dir
       |    UNION ALL SELECT l AS i, w AS j, c FROM dir)
       |  GROUP BY 1, 2),
       |wins AS (SELECT w AS i, CAST(sum(c) AS BIGINT) AS n_wins
       |         FROM dir GROUP BY 1),
       |s0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS s
       |       FROM games),
       |$rounds,
       |tot AS (SELECT i, CAST(sum(n_ij) AS BIGINT) AS n_games
       |        FROM games GROUP BY 1)
       |SELECT s$iters.i AS event_type,
       |  CAST(coalesce(w.n_wins, 0) AS BIGINT) AS n_wins, tot.n_games,
       |  s$iters.s AS strength_x1e6,
       |  CAST(row_number() OVER (ORDER BY s$iters.s DESC, s$iters.i)
       |    AS BIGINT) AS rank
       |FROM s$iters JOIN tot ON tot.i = s$iters.i
       |LEFT JOIN wins w ON w.i = s$iters.i
       |ORDER BY rank, event_type""".stripMargin
  }
}
