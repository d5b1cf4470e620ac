package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming

/** Beyond-reference scale-out operators (SURVEY.md §2.8): dedup,
  * similarity search, text analysis, multimodal plumbing, streaming.
  * Spark side runs the graft.ext library (DataFrame API); the oracle
  * text re-expresses the same computation in DuckDB SQL.
  *
  * Cross-engine determinism: md5 hex strings as the only hash, ratios
  * and dot products as floor-scaled BIGINTs (see graft.ext scaladoc).
  */
object Extensions {

  /** Recursively delete a temp tree (deepest-first). Roundtrip queries
    * must not assume the writer left exactly one file — an extra
    * sidecar would turn deleteIfExists(dir) into a
    * DirectoryNotEmptyException that masks the real failure. */
  private def rmTree(root: java.nio.file.Path): Unit = {
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
  private def annIndexPath(dir: String, variant: String): String = {
    val f = new java.io.File(s"$dir/embeddings.parquet")
    val key = java.lang.Integer.toHexString(
      (dir, variant, f.lastModified, f.length).hashCode())
    s"${System.getProperty("java.io.tmpdir")}/graft_annidx_${variant}_$key"
  }

  /** [[annIndexPath]]'s sibling for the persisted NEAR-DUP index,
    * keyed by the documents file's identity for the same staleness
    * guarantee. */
  private def docIndexPath(dir: String, variant: String): String = {
    val f = new java.io.File(s"$dir/documents.parquet")
    val key = java.lang.Integer.toHexString(
      (dir, variant, f.lastModified, f.length).hashCode())
    s"${System.getProperty("java.io.tmpdir")}/graft_ndidx_${variant}_$key"
  }

  /** The MinHash(8)+LSH(2 bands) oracle, shared by batch x57 and its
    * streaming twin x242 — one signature definition, two engines and
    * two execution modes judged against it. */
  private lazy val duckMinhash8x2Oracle =
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
  private val duckTok =
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
  private def skewDocs(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), col("source"),
      concat(
        when(col("doc_id") % 2 === 0,
          lit("subscribe to read the full article terms apply "))
          .otherwise(lit("")),
        col("text"), lit(" copyright footer notice legal")).as("text"))

  private val duckSkew =
    """skew AS MATERIALIZED (SELECT doc_id, source,
      |    concat(CASE WHEN doc_id % 2 = 0
      |      THEN 'subscribe to read the full article terms apply '
      |      ELSE '' END,
      |      text, ' copyright footer notice legal') AS text
      |  FROM documents)""".stripMargin

  /** duckTok over the skewed corpus (needs skew). */
  private val duckSkewTok =
    """tok AS MATERIALIZED (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
      |         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
      |  FROM skew
      |)""".stripMargin

  /** duckShinglesFiltered over the skewed tok (needs tok). */
  private def duckSkewShinglesFiltered(maxDf: Int) =
    s"""sh0 AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
       |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
       |), keep AS MATERIALIZED (
       |  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= $maxDf
       |), sh AS MATERIALIZED (SELECT sh0.* FROM sh0 JOIN keep USING (shingle))""".stripMargin

  /** DuckDB distinct word-3-gram shingles CTE (needs tok). */
  private val duckShingles =
    """sh AS (
      |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      |)""".stripMargin

  /** DuckDB stop-filtered shingles (needs tok): shingles in more than
    * `maxDf` docs dropped BEFORE any pair generation — the sub-quadratic
    * candidate path (mirrors Dedup.jaccardPairs(maxDocFreq=Some(f))). */
  private def duckShinglesFiltered(maxDf: Int) =
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
  private val duckBmpGeom =
    """g AS (
      |  SELECT doc_id, w, h,
      |    (CAST(floor((3 * w + 3) / 4.0) AS BIGINT) * 4) * h AS px
      |  FROM (SELECT doc_id, n_chars % 64 + 1 AS w, n_chars % 37 + 1 AS h
      |        FROM documents) d
      |)""".stripMargin

  private val duckJaccardTail =
    """sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS i
      |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2
      |)""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- text analysis -------------------------------------------------
    Q.df("x51_text_stats",
      (s, dir) => TextStats.stats(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok
         |SELECT doc_id, count(*) AS n_tok, count(DISTINCT w) AS n_types,
         |  CAST(floor(10000.0 * count(DISTINCT w) / count(*)) AS BIGINT) AS ttr_x10k,
         |  CAST(floor(10000.0 * sum(CASE WHEN w IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS stop_x10k,
         |  CAST(floor(10000.0 * sum(length(w)) / count(*)) AS BIGINT) AS avglen_x10k
         |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    Q.df("x52_lang_id",
      (s, dir) => TextStats.langId(Tables.load(s, dir, "documents")),
      """SELECT doc_id, lang,
        |  CASE WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_en THEN 'de'
        |       WHEN h_fr >= h_es AND h_fr >= h_en THEN 'fr'
        |       WHEN h_es >= h_en THEN 'es'
        |       ELSE 'en' END AS predicted
        |FROM (
        |  SELECT doc_id, lang,
        |    CAST((length(t) - length(replace(t, ' the ', ''))) / 5 AS BIGINT) AS h_en,
        |    CAST((length(t) - length(replace(t, ' der ', ''))) / 5 AS BIGINT) AS h_de,
        |    CAST((length(t) - length(replace(t, ' le ', ''))) / 4 AS BIGINT) AS h_fr,
        |    CAST((length(t) - length(replace(t, ' el ', ''))) / 4 AS BIGINT) AS h_es
        |  FROM (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS t FROM documents) x
        |) y ORDER BY doc_id""".stripMargin),

    Q.df("x53_top_tokens",
      (s, dir) => TextStats.topTokens(Tables.load(s, dir, "documents"), 50),
      s"""WITH $duckTok
         |SELECT w, count(*) AS cnt FROM tok
         |GROUP BY w ORDER BY cnt DESC, w LIMIT 50""".stripMargin),

    // C4-style quality gate + BPE-ish piece count (the cleaning pass a
    // training-data pipeline runs before dedup): min tokens, stopword
    // floor, mean-token-length band — all exact integer ratios.
    Q.df("x78_quality_filter",
      (s, dir) => TextStats.qualityFilter(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |st AS (
         |  SELECT doc_id, count(*) AS n_tok,
         |    CAST(floor(10000.0 * sum(CASE WHEN w IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS stop_x10k,
         |    CAST(floor(10000.0 * sum(length(w)) / count(*)) AS BIGINT) AS avglen_x10k
         |  FROM tok GROUP BY doc_id
         |), pc AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS BIGINT) AS n_pieces
         |  FROM documents
         |)
         |SELECT st.doc_id AS doc_id, n_tok, n_pieces, stop_x10k, avglen_x10k,
         |  (n_tok >= 20 AND stop_x10k >= 100
         |   AND avglen_x10k BETWEEN 30000 AND 80000) AS keep
         |FROM st JOIN pc ON st.doc_id = pc.doc_id
         |ORDER BY st.doc_id""".stripMargin),

    // token-window chunking (context-window packing prep): 40-token
    // windows at stride 30, content carried as md5 for chunk-level dedup
    Q.df("x88_chunking",
      (s, dir) => TextStats.chunk(Tables.load(s, dir, "documents"), 40, 30),
      s"""WITH $duckTok,
         |nn AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1)
         |SELECT t.doc_id, CAST(r.i + 1 AS BIGINT) AS chunk_no,
         |  count(*) AS chunk_len,
         |  md5(string_agg(t.w, ' ' ORDER BY t.pos)) AS chunk_hash
         |FROM nn CROSS JOIN range(0, 1000) r(i)
         |JOIN tok t ON t.doc_id = nn.doc_id
         |          AND t.pos >= r.i * 30 + 1 AND t.pos <= r.i * 30 + 40
         |WHERE r.i <= CAST(floor((nn.n - 1) / 30.0) AS BIGINT)
         |GROUP BY t.doc_id, r.i
         |ORDER BY t.doc_id, chunk_no""".stripMargin),

    // TF-IDF relevance: top term per document by an all-integer
    // tf * (N/df) ratio score (ln-free: cross-engine exact)
    Q.df("x84_tfidf_top_term",
      (s, dir) => TextStats.tfidfTopTerm(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
         |nt AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1),
         |dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM documents),
         |sc AS (
         |  SELECT tf.doc_id, tf.w,
         |    CAST(floor(10000.0 * tf.tf * nn.n / (nt.n_tok * dfq.df)) AS BIGINT)
         |      AS score
         |  FROM tf JOIN nt ON tf.doc_id = nt.doc_id
         |          JOIN dfq ON tf.w = dfq.w, nn
         |)
         |SELECT doc_id, w AS top_term, score AS score_x10k FROM (
         |  SELECT doc_id, w, score,
         |    row_number() OVER (PARTITION BY doc_id
         |                       ORDER BY score DESC, w) AS rn
         |  FROM sc
         |) WHERE rn = 1 ORDER BY doc_id""".stripMargin),

    // corpus-wide bigram counts (LM co-occurrence stats): occurrence
    // counting, not the dedup index's per-doc-distinct shingles
    Q.df("x82_top_bigrams",
      (s, dir) => TextStats.topNgrams(Tables.load(s, dir, "documents"), 2, 50),
      s"""WITH $duckTok
         |SELECT a.w || ' ' || b.w AS ngram, count(*) AS cnt
         |FROM tok a JOIN tok b
         |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |GROUP BY 1 ORDER BY cnt DESC, ngram LIMIT 50""".stripMargin),

    Q.df("x54_fingerprint_dedup",
      (s, dir) => TextStats.fingerprints(Tables.load(s, dir, "documents")),
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  count(*) AS cnt, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin),

    // polynomial rolling hash (Rabin-Karp) as the document fingerprint —
    // computed as a per-row left fold over the character codes (narrow,
    // no shuffle; comparable incrementally at chunk boundaries at scale).
    Q(name = "x74_rolling_fingerprint",
      run = (s, dir) => {
        Tables.registerAll(s, dir)
        graft.functions.RollingHash.register(s)
        s.sql(
          """SELECT doc_id,
            |  rolling_hash(trim(regexp_replace(lower(text), '\\s+', ' '))) AS rhash
            |FROM documents
            |ORDER BY doc_id""".stripMargin)
      },
      oracle = Some(
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, length(t) + 1),
        |        i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS rhash
        |FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |      FROM documents) x
        |ORDER BY doc_id""".stripMargin)),

    // ---- dedup ---------------------------------------------------------
    // incremental dedup: the src19 batch arrives against the src0-18
    // corpus; anti-join on the 16-byte normalization fingerprint
    Q.df("x86_incremental_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.incrementalNew(
          docs.where(col("source") === "src19"),
          docs.where(col("source") =!= "src19"))
      },
      """SELECT n.doc_id FROM documents n
        |WHERE n.source = 'src19' AND NOT EXISTS (
        |  SELECT 1 FROM documents o
        |  WHERE o.source <> 'src19'
        |    AND md5(trim(regexp_replace(lower(o.text), '\s+', ' ', 'g'))) =
        |        md5(trim(regexp_replace(lower(n.text), '\s+', ' ', 'g'))))
        |ORDER BY n.doc_id""".stripMargin),

    // decontamination: eval docs (src19) whose SimHash sketch collides
    // with the training split — the fuzzy train/test overlap check
    // (exact fingerprints find nothing here; the planted overlaps are
    // near-dups)
    Q.df("x87_contamination",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.contaminationFuzzy(
          docs.where(col("source") === "src19"),
          docs.where(col("source") =!= "src19"))
      },
      s"""WITH $duckTok,
         |nib AS (
         |  SELECT doc_id, j, instr('0123456789abcdef', substr(md5(w), j, 1)) - 1 AS v
         |  FROM tok, range(1, 5) r(j)
         |), bits AS (
         |  SELECT doc_id, (j - 1) * 4 + b.b AS pos,
         |    sum(CASE WHEN (v & b.mask) > 0 THEN 1 ELSE -1 END) AS s
         |  FROM nib, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) AS b(b, mask)
         |  GROUP BY doc_id, (j - 1) * 4 + b.b
         |), sk AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN s >= 0 THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id
         |)
         |SELECT n.doc_id FROM sk n JOIN documents dn ON n.doc_id = dn.doc_id
         |WHERE dn.source = 'src19' AND EXISTS (
         |  SELECT 1 FROM sk o JOIN documents dd ON o.doc_id = dd.doc_id
         |  WHERE dd.source <> 'src19' AND o.simhash = n.simhash)
         |ORDER BY n.doc_id""".stripMargin),

    // the production-width simhash path, oracle-judged: 60-bit sketch,
    // four 15-bit LSH bands (32768 buckets/band), popcount verify
    Q.df("x109_simhash60_neardup",
      (s, dir) => Dedup.simhashNearDups60(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |nib AS (
         |  SELECT doc_id, j, instr('0123456789abcdef', substr(md5(w), j, 1)) - 1 AS v
         |  FROM tok, range(1, 16) r(j)
         |), bits AS (
         |  SELECT doc_id, (j - 1) * 4 + b.b AS pos,
         |    sum(CASE WHEN (v & b.mask) > 0 THEN 1 ELSE -1 END) AS s
         |  FROM nib, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) AS b(b, mask)
         |  GROUP BY doc_id, (j - 1) * 4 + b.b
         |), sk AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN s >= 0 THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id
         |), bands AS (
         |  SELECT doc_id, simhash, b.b AS band,
         |    (simhash >> (b.b * 15)) & 32767 AS nib15
         |  FROM sk, (VALUES (0), (1), (2), (3)) AS b(b)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
         |    a.simhash AS h1, b.simhash AS h2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.nib15 = b.nib15 AND a.doc_id < b.doc_id
         |)
         |SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(h1, h2)) <= 3
         |ORDER BY d1, d2""".stripMargin),

    Q.df("x55_dedup_exact",
      (s, dir) => Dedup.exactStats(Tables.load(s, dir, "documents")),
      """SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_uniq
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),

    Q.df("x56_jaccard_pairs",
      (s, dir) => Dedup.jaccardPairs(Tables.load(s, dir, "documents"), 0.2),
      s"""WITH $duckTok, $duckShingles, $duckJaccardTail
         |SELECT d1, d2,
         |  CAST(floor(10000.0 * i / (s1.n + s2.n - i)) AS BIGINT) AS jac_x10k
         |FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
         |ORDER BY d1, d2""".stripMargin),

    // the SCALE-SAFE jaccard variant: stop-shingle filter (docFreq > 2
    // dropped before the self-join) — the knob that keeps the inverted-
    // index join sub-quadratic on hot shingles (Dedup.jaccardPairs
    // scaladoc). Jaccard is computed over surviving shingles in BOTH
    // engines, so the filtered result is still oracle-exact.
    Q.df("x77_jaccard_stopfiltered",
      (s, dir) => Dedup.jaccardPairs(Tables.load(s, dir, "documents"), 0.2,
        maxDocFreq = Some(2)),
      s"""WITH $duckTok,
         |${duckShinglesFiltered(2)},
         |$duckJaccardTail
         |SELECT d1, d2,
         |  CAST(floor(10000.0 * i / (s1.n + s2.n - i)) AS BIGINT) AS jac_x10k
         |FROM inter JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
         |ORDER BY d1, d2""".stripMargin),

    Q.df("x57_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(Tables.load(s, dir, "documents")),
      duckMinhash8x2Oracle),

    // the parameterized LSH path at production-shaped settings: 16
    // minhashes in 4 bands of 4 rows (higher recall than the 8/2 demo
    // config of x57) — oracle re-derives the same banding, so the
    // tunable operator is hash-exact, not just spec-plausible
    Q.df("x83_minhash_lsh_16x4",
      (s, dir) => Dedup.minhashLshPairs(Tables.load(s, dir, "documents"),
        numHashes = 16, bands = 4),
      s"""WITH $duckTok, $duckShingles,
         |mh AS (
         |  SELECT doc_id, i, min(md5(CAST(i AS STRING) || ':' || shingle)) AS m
         |  FROM sh, range(0, 16) r(i) GROUP BY doc_id, i
         |), bands AS (
         |  SELECT doc_id, i % 4 AS band,
         |    md5(min(CASE WHEN CAST(floor(i/4.0) AS BIGINT) = 0 THEN m END) || ':' ||
         |        min(CASE WHEN CAST(floor(i/4.0) AS BIGINT) = 1 THEN m END) || ':' ||
         |        min(CASE WHEN CAST(floor(i/4.0) AS BIGINT) = 2 THEN m END) || ':' ||
         |        min(CASE WHEN CAST(floor(i/4.0) AS BIGINT) = 3 THEN m END)) AS sig
         |  FROM mh GROUP BY doc_id, i % 4
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |), $duckJaccardTail
         |SELECT cand.d1, cand.d2,
         |  CAST(floor(10000.0 * i / (s1.n + s2.n - i)) AS BIGINT) AS jac_x10k
         |FROM cand JOIN inter ON cand.d1 = inter.d1 AND cand.d2 = inter.d2
         |JOIN sz s1 ON cand.d1 = s1.doc_id JOIN sz s2 ON cand.d2 = s2.doc_id
         |ORDER BY cand.d1, cand.d2""".stripMargin),

    Q.df("x58_simhash",
      (s, dir) => Dedup.simhash(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |nib AS (
         |  SELECT doc_id, j, instr('0123456789abcdef', substr(md5(w), j, 1)) - 1 AS v
         |  FROM tok, range(1, 5) r(j)
         |), bits AS (
         |  SELECT doc_id, (j - 1) * 4 + b.b AS pos,
         |    sum(CASE WHEN (v & b.mask) > 0 THEN 1 ELSE -1 END) AS s
         |  FROM nib, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) AS b(b, mask)
         |  GROUP BY doc_id, (j - 1) * 4 + b.b
         |)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN s >= 0 THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // simhash near-dup matching: 4-bit nibble banding (pigeonhole: any
    // pair within hamming 3 of a 16-bit sketch shares a nibble) +
    // exact popcount verify — the hamming analog of LSH banding
    Q.df("x85_simhash_neardup",
      (s, dir) => Dedup.simhashNearDups(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |nib AS (
         |  SELECT doc_id, j, instr('0123456789abcdef', substr(md5(w), j, 1)) - 1 AS v
         |  FROM tok, range(1, 5) r(j)
         |), bits AS (
         |  SELECT doc_id, (j - 1) * 4 + b.b AS pos,
         |    sum(CASE WHEN (v & b.mask) > 0 THEN 1 ELSE -1 END) AS s
         |  FROM nib, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) AS b(b, mask)
         |  GROUP BY doc_id, (j - 1) * 4 + b.b
         |), sk AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN s >= 0 THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id
         |), bands AS (
         |  SELECT doc_id, simhash, b, (simhash >> (b * 4)) & 15 AS nib
         |  FROM sk, range(0, 4) r(b)
         |)
         |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM bands a JOIN bands b
         |  ON a.b = b.b AND a.nib = b.nib AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY d1, d2""".stripMargin),

    // ---- similarity search --------------------------------------------
    Q.df("x59_knn_quantized",
      (s, dir) => Similarity.knnQuantized(Tables.load(s, dir, "embeddings"), 20, 3),
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 20),
        |pairs AS (
        |  SELECT q.qid, e.vec_id,
        |    CAST(sum(CAST(floor(CAST(qe[i] AS DOUBLE) * 10000) AS BIGINT)
        |           * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS dot_q
        |  FROM q, embeddings e, range(1, 65) r(i)
        |  WHERE q.qid <> e.vec_id
        |  GROUP BY 1, 2
        |), ranked AS (
        |  SELECT qid, vec_id, dot_q,
        |    row_number() OVER (PARTITION BY qid ORDER BY dot_q DESC, vec_id) AS rn
        |  FROM pairs
        |)
        |SELECT qid, vec_id, dot_q, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin),

    Q.df("x60_embed_neardup",
      (s, dir) => Similarity.nearDupPairs(Tables.load(s, dir, "embeddings"), 33000000L),
      """SELECT a.vec_id AS d1, b.vec_id AS d2,
        |  CAST(sum(CAST(floor(CAST(a.embedding[i] AS DOUBLE) * 10000) AS BIGINT)
        |         * CAST(floor(CAST(b.embedding[i] AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS dot_q
        |FROM embeddings a
        |JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id, range(1, 65) r(i)
        |GROUP BY 1, 2
        |HAVING dot_q >= 33000000
        |ORDER BY d1, d2""".stripMargin),

    // the sub-quadratic embedding near-dup (x60's scale path): random-
    // hyperplane SimHash sketches (deterministic ±1 hyperplanes from md5
    // parity — engine-reproducible, so the LSH itself is oracle-exact),
    // 4-bit hamming banding for candidates, exact-cosine verify on
    // candidates only — never an all-pairs join. The corpus's organic
    // pair cosines top out at ~0.48, so the query PLANTS one true
    // near-dup per vector (a deterministic per-coordinate rescale,
    // cos ~0.9999, re-derived identically by the oracle) and the
    // operator must recover exactly those pairs at cos >= 0.99.
    Q.df("x114_embed_simhash_neardup",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val base = emb.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        val pert = emb.select((col("vec_id") + 1000000L).as("vec_id"),
          expr("transform(embedding, (x, i) -> CAST(x AS DOUBLE) * " +
            "((9500 + (vec_id + i) % 1000) / 10000.0))").as("embedding"))
        Similarity.embedSimhashNearDups(base.unionByName(pert),
          minCosX10k = 9900L)
      },
      """WITH base AS (
        |  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, range(1, 65) r(i)
        |), q AS (
        |  SELECT vec_id, pos, CAST(floor(v * 10000) AS BIGINT) AS qv FROM base
        |  UNION ALL
        |  SELECT vec_id + 1000000, pos,
        |    CAST(floor(v * ((9500 + (vec_id + pos - 1) % 1000) / 10000.0)
        |         * 10000) AS BIGINT)
        |  FROM base
        |), s AS (
        |  SELECT b.b, p.i AS pos,
        |    CASE WHEN instr('02468ace',
        |           substr(md5(CAST(b.b AS VARCHAR) || ':' || CAST(p.i AS VARCHAR)), 1, 1)) > 0
        |         THEN 1 ELSE -1 END AS sgn
        |  FROM range(0, 16) b(b), range(1, 65) p(i)
        |), proj AS (
        |  SELECT q.vec_id, s.b, sum(q.qv * s.sgn) AS proj
        |  FROM q JOIN s ON q.pos = s.pos
        |  GROUP BY 1, 2
        |), sk AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN proj >= 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS sketch
        |  FROM proj GROUP BY 1
        |), bands AS (
        |  SELECT vec_id, sketch, r.b AS band, (sketch >> (r.b * 4)) & 15 AS nib
        |  FROM sk, range(0, 4) r(b)
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS d1, bb.vec_id AS d2
        |  FROM bands a JOIN bands bb
        |    ON a.band = bb.band AND a.nib = bb.nib AND a.vec_id < bb.vec_id
        |  WHERE bit_count(xor(a.sketch, bb.sketch)) <= 3
        |), n2 AS (
        |  SELECT vec_id, CAST(sum(qv * qv) AS BIGINT) AS n2 FROM q GROUP BY 1
        |), dots AS (
        |  SELECT c.d1, c.d2, CAST(sum(qa.qv * qb.qv) AS BIGINT) AS dq
        |  FROM cand c
        |  JOIN q qa ON qa.vec_id = c.d1
        |  JOIN q qb ON qb.vec_id = c.d2 AND qa.pos = qb.pos
        |  GROUP BY 1, 2
        |)
        |SELECT d.d1, d.d2,
        |  CAST(floor(10000.0 * d.dq /
        |       sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))) AS BIGINT)
        |    AS cos_x10k
        |FROM dots d JOIN n2 na ON na.vec_id = d.d1
        |            JOIN n2 nb ON nb.vec_id = d.d2
        |WHERE floor(10000.0 * d.dq /
        |      sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))) >= 9900
        |ORDER BY d1, d2""".stripMargin),

    // near-dup clusters: pair list -> connected components (the step a
    // real dedup pipeline runs after LSH+verify, to pick one keeper per
    // group). Candidate pairs come from the SUB-QUADRATIC stop-filtered
    // generator (maxDocFreq=2, the x77 path) — the composition a 100 TB
    // run uses; the unfiltered all-pairs join stays judged on its own
    // as x56. Oracle: recursive-CTE transitive closure over the same
    // stop-filtered Jaccard>=0.2 pairs.
    Q.df("x66_neardup_clusters",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.clusters(docs, Dedup.jaccardPairs(docs, 0.2, maxDocFreq = Some(2)))
      },
      s"""WITH RECURSIVE $duckTok, ${duckShinglesFiltered(2)}, $duckJaccardTail,
         |pairs AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
         |), edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION SELECT d2, d1 FROM pairs
         |), reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
         |)
         |SELECT a AS doc_id, min(b) AS cluster_id
         |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin),

    // batch session windows (gap-based), the Spark-native sessionize
    // operator; oracle re-derives sessions with the lag/running-sum CTE.
    Q.df("x65_session_window",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        ev.groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
          .agg(count(lit(1)).as("event_cnt"))
          .select(col("user_id"),
            date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            col("event_cnt"))
          .orderBy("user_id", "session_start")
      },
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sessions AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked
        |)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS event_cnt
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin),

    // ---- multimodal: REAL BMP decode over distributed binary payloads --
    // Every doc carries a valid 24bpp BMP built deterministically from
    // n_chars; the Spark side PARSES the actual header bytes in
    // mapPartitions while the oracle re-derives the fields from the
    // construction formula — a decoder bug is a hash mismatch, not a
    // silently-agreeing stub. Shared DuckDB geometry CTE:
    //   w = n_chars%64+1, h = n_chars%37+1,
    //   rowsize = 4-aligned 3w, px = rowsize*h, n_bytes = 54 + px.
    Q.df("x61_multimodal_meta",
      (s, dir) => Multimodal.decodeBmp(
        Multimodal.withBmpPayload(Tables.load(s, dir, "documents")))
        .orderBy("doc_id"),
      s"""WITH $duckBmpGeom
         |SELECT doc_id, CAST(54 + px AS BIGINT) AS n_bytes,
         |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  CAST(24 AS BIGINT) AS bpp, CAST(px AS BIGINT) AS px_bytes
         |FROM g ORDER BY doc_id""".stripMargin),

    // the audio twin of x61: every doc carries a valid 16-bit PCM WAV
    // (RIFF built executor-side, parameters a pure function of n_chars)
    // and the judged fields are parsed from the actual bytes — the
    // oracle re-derives the construction formula, so a parser bug is a
    // correctness failure
    Q.df("x121_audio_meta",
      (s, dir) => Multimodal.decodeWav(
        Multimodal.withWavPayload(Tables.load(s, dir, "documents")))
        .orderBy("doc_id"),
      """SELECT doc_id,
        |  CAST(8000 + (n_chars % 3) * 4000 AS BIGINT) AS sample_rate,
        |  CAST(1 + n_chars % 2 AS BIGINT) AS channels,
        |  CAST(16 AS BIGINT) AS bits,
        |  CAST(n_chars % 500 + 50 AS BIGINT) AS n_samples,
        |  CAST(floor(10000.0 * (n_chars % 500 + 50) /
        |       (8000 + (n_chars % 3) * 4000)) AS BIGINT) AS dur_sec_x10k
        |FROM documents ORDER BY doc_id""".stripMargin),

    // frame sampling over the BMP payloads (video/audio chunk access)
    Q.df("x69_mm_frames",
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.withBmpPayload(Tables.load(s, dir, "documents")), 256),
      s"""WITH $duckBmpGeom
         |SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
         |  CAST(least(256, 54 + px - (i - 1) * 256) AS BIGINT) AS frame_bytes
         |FROM g, range(1, 1000) r(i)
         |WHERE (i - 1) * 256 < 54 + px
         |ORDER BY doc_id, frame_no""".stripMargin),

    // stub resize/downsample over the BMP payloads (every 4th byte);
    // the distributed resized payload stays binary — the oracle checks
    // the byte accounting
    Q.df("x80_mm_resize",
      (s, dir) => Multimodal.resize(
          Multimodal.withBmpPayload(Tables.load(s, dir, "documents")), 4)
        .select(col("doc_id"), col("n_bytes"), col("resized_bytes"))
        .orderBy("doc_id"),
      s"""WITH $duckBmpGeom
         |SELECT doc_id,
         |  CAST(54 + px AS BIGINT) AS n_bytes,
         |  CAST(floor((54 + px + 3) / 4.0) AS BIGINT) AS resized_bytes
         |FROM g ORDER BY doc_id""".stripMargin),

    // REAL feature extraction from decoded pixel data: 4-bin intensity
    // histogram over the image's pixel bytes, computed by the decoder;
    // the oracle derives the same counts in closed form from the pixel
    // fill rule (byte i = i % 256)
    Q.df("x70_mm_features",
      (s, dir) => {
        val f = Multimodal.decodeFeatures(
          Multimodal.withBmpPayload(Tables.load(s, dir, "documents")))
        f.select(col("doc_id"),
          element_at(col("features"), 1).as("b0"),
          element_at(col("features"), 2).as("b1"),
          element_at(col("features"), 3).as("b2"),
          element_at(col("features"), 4).as("b3"))
          .orderBy("doc_id")
      },
      s"""WITH $duckBmpGeom
         |SELECT doc_id,
         |  CAST(px // 256 * 64 + least(64, greatest(0, px % 256 - 0)) AS BIGINT) AS b0,
         |  CAST(px // 256 * 64 + least(64, greatest(0, px % 256 - 64)) AS BIGINT) AS b1,
         |  CAST(px // 256 * 64 + least(64, greatest(0, px % 256 - 128)) AS BIGINT) AS b2,
         |  CAST(px // 256 * 64 + least(64, greatest(0, px % 256 - 192)) AS BIGINT) AS b3
         |FROM g ORDER BY doc_id""".stripMargin),

    // ---- streaming (Structured Streaming, AvailableNow replay) ---------
    Q.df("x62_stream_hourly",
      (s, dir) => Streaming.hourlyCounts(s, dir),
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),

    // the FILE-sink streaming path (append mode): results written as
    // parquet by executors — no driver-bound memory sink. Append emits
    // a window exactly once when the watermark (max ts - 1h) passes its
    // end, so the oracle counts only watermark-closed windows.
    Q.df("x111_stream_file_sink",
      (s, dir) => Streaming.hourlyCountsFileSink(s, dir),
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS cnt
        |FROM events
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
        |      <= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
        |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),

    // streaming exact dedup: per-key state across the replayed backlog
    Q.df("x76_stream_dedup",
      (s, dir) => Streaming.streamDistinctUsers(s, dir),
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin),

    // stream-static join: per-batch enrichment against a batch dimension
    // (stateless join; only the event_type aggregate is stateful)
    Q.df("x79_stream_static_join",
      (s, dir) => Streaming.streamStaticJoin(s, dir),
      """SELECT event_type,
        |  count(*) AS matched_events,
        |  CAST(sum(n_orders) AS BIGINT) AS sum_orders
        |FROM events e
        |JOIN (SELECT o_custkey, count(*) AS n_orders
        |      FROM orders GROUP BY o_custkey) d
        |  ON e.user_id = d.o_custkey
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // arbitrary stateful streaming: flatMapGroupsWithState sessionizer
    Q.df("x68_stream_sessions_state",
      (s, dir) => Streaming.sessionizeStateful(s, dir),
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |)
        |SELECT user_id,
        |  CAST(sum(new_session) AS BIGINT) AS session_cnt,
        |  count(*) AS event_cnt
        |FROM marked GROUP BY user_id ORDER BY user_id""".stripMargin),

    // ---- approx sketches (rows-only: DuckDB's HLL differs by design) ---
    Q.dfOnly("x63_approx_distinct",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        ev.groupBy("event_type")
          .agg(approx_count_distinct(col("user_id")).as("approx_users"),
            countDistinct(col("user_id")).as("exact_users"))
          .orderBy("event_type")
      }),

    // keep-latest dedup: newest event per user via distributed argmax
    // (max_by partial aggregation — no per-key window sort). Oracle
    // re-derives the winner with a row_number window.
    Q.df("x81_keep_latest",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        Dedup.keepLatest(ev, col("user_id"), col("event_id"),
            col("ts"), col("event_id"))
          .select(col("key").as("user_id"), col("keep_id").as("event_id"))
      },
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY (epoch_ns(ts) // 1000) DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY user_id""".stripMargin),
        // (epoch_ns // 1000: rank at Spark's microsecond precision — the
        // parquet column is TIMESTAMP(NANOS), and a sub-microsecond delta
        // would otherwise break ties differently in the two engines)

    // keeper materialization: the dedup pipeline's last step — drop
    // every document that is not its cluster's representative. Same
    // sub-quadratic candidate generator as x66 (stop-filtered shingles),
    // so the full judged pipeline — shingle -> filtered pairs -> CC ->
    // keep — is the shape that survives a 100 TB corpus.
    Q.df("x71_dedup_keep",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val labels = Dedup.clusters(docs,
          Dedup.jaccardPairs(docs, 0.2, maxDocFreq = Some(2)))
        docs.join(labels, "doc_id")
          .where(col("doc_id") === col("cluster_id"))
          .groupBy("lang")
          .agg(count(lit(1)).as("kept"), sum("n_chars").as("kept_chars"))
          .orderBy("lang")
      },
      s"""WITH RECURSIVE $duckTok, ${duckShinglesFiltered(2)}, $duckJaccardTail,
         |pairs AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
         |), edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION SELECT d2, d1 FROM pairs
         |), reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
         |)
         |SELECT lang, count(*) AS kept,
         |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
         |FROM documents d
         |JOIN (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a) c
         |  ON d.doc_id = c.doc_id
         |WHERE d.doc_id = c.cluster_id
         |GROUP BY lang ORDER BY lang""".stripMargin),

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

    // IVF-probed ANN: learned coarse cells (mini k-means) + cell-local
    // search. Approximate by design -> rows-only check.
    Q.dfOnly("x72_knn_ivf",
      (s, dir) => Similarity.knnIvf(Tables.load(s, dir, "embeddings"), 20, 3, 8)),

    // ---- float-tier ANN (rows-only: float fold is engine-dependent;
    // uses the native codegen'd float_dot expression) -------------------
    Q.dfOnly("x64_knn_float",
      (s, dir) => {
        graft.functions.FloatDot.register(s)
        val fn = graft.functions.TopKAggD.register(s, 3)
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val pairs = broadcast(q).join(emb, col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id"),
            call_function("float_dot", col("qe"), col("embedding")).as("sim"))
        // bounded-heap top-k (same shape as the quantized tier): the
        // exchange carries 3 rows per partition per query, never the
        // full scored pair set
        pairs.groupBy("qid")
          .agg(call_function(fn, col("sim"), col("vec_id")).as("top"))
          .select(col("qid"), posexplode(col("top")).as(Seq("i", "s")))
          .select(col("qid"), col("s.id").as("vec_id"),
            col("s.score").as("sim"), (col("i") + 1).cast("bigint").as("rn"))
          .orderBy("qid", "rn")
      }),

    // product-quantization ANN with exact re-rank (rows-only like IVF:
    // the codebooks are engine-specific; determinism is spec-guarded)
    Q.dfOnly("x103_knn_pq",
      (s, dir) => Similarity.knnPQ(Tables.load(s, dir, "embeddings"), 20, 3)),

    // the composed production ANN stack: IVF coarse probe -> PQ-ADC
    // scoring only within probed cells -> exact re-rank. Rows-only like
    // its two legs; recall and the cell-keyed scoring join are
    // spec-guarded (ExtSpec / PlanSpec). Served build-once/serve-many:
    // the index (codes partitioned by ivf_cell + centroids + codebooks)
    // is persisted on first touch and every query — including this
    // one — READS THE STORE; no k-means job runs once the index
    // exists. The store is keyed by the embeddings file's identity
    // (mtime+size), so a regenerated corpus re-builds.
    Q.dfOnly("x110_knn_ivfpq",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.searchIvfPq(
          Similarity.ivfPqIndexAt(s, annIndexPath(dir, "ivfpq_raw"), emb),
          emb, 20, 3)
      }),

    // the true FAISS IVF-PQ: codebooks fit on per-cell RESIDUALS
    // x - centroid(cell(x)) — better recall at identical index size and
    // scoring shape (spec-guarded strictly above the raw variant);
    // served from its own persisted index like x110
    Q.dfOnly("x124_knn_ivfpq_residual",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.searchIvfPq(
          Similarity.ivfPqIndexAt(s, annIndexPath(dir, "ivfpq_res"), emb,
            residual = true),
          emb, 20, 3)
      }),

    // incremental ANN index maintenance — the daily-ingestion path of a
    // production vector index: the coarse quantizer is fit ONCE on the
    // base corpus, then a new batch is assigned against the FROZEN
    // centroids (one broadcast + one argmax aggregation; no refit, no
    // driver-side corpus). Rows-only judged like the other ANN ops
    // (cell boundaries are engine-specific); ExtSpec guards that frozen
    // assignment equals a full refit's for unchanged centroids.
    Q.dfOnly("x125_ann_incremental_assign",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val base = emb.where(col("vec_id") < 400)
        val batch = emb.where(col("vec_id") >= 400)
        val (_, centroids) = Similarity.kmeansFit(base, 8, 3)
        Similarity.assignCells(batch, centroids)
          .select(col("vec_id"), col("cell").cast("bigint").as("cell"))
          .orderBy("vec_id")
      }),

    // ---- corpus curation: repetition, splits, sampling, scrubbing ----

    // Gopher/MassiveText repetition signals: top-token and top-bigram
    // occupancy fractions (boilerplate/spam detector)
    Q.df("x89_repetition_stats",
      (s, dir) => TextStats.repetitionStats(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bg
         |       FROM tok a JOIN tok b
         |         ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
         |t1 AS (SELECT doc_id, max(tf) AS max_tf,
         |         CAST(sum(tf) AS BIGINT) AS n_tok FROM tf GROUP BY 1),
         |bf AS (SELECT doc_id, bg, count(*) AS bf FROM bg GROUP BY 1, 2),
         |b1 AS (SELECT doc_id, max(bf) AS max_bf,
         |         CAST(sum(bf) AS BIGINT) AS n_bg FROM bf GROUP BY 1)
         |SELECT t1.doc_id, t1.n_tok,
         |  CAST(floor(10000.0 * t1.max_tf / t1.n_tok) AS BIGINT)
         |    AS top_token_x10k,
         |  coalesce(CAST(floor(10000.0 * b1.max_bf / b1.n_bg) AS BIGINT), 0)
         |    AS top_bigram_x10k
         |FROM t1 LEFT JOIN b1 ON t1.doc_id = b1.doc_id
         |ORDER BY t1.doc_id""".stripMargin),

    // deterministic content-hash train/valid/test split (~80/10/10):
    // assignment is a pure function of the key — reproducible across
    // runs, engines, and repartitionings, unlike any rand() path
    Q.df("x90_hash_split",
      (s, dir) => Sampling.hashSplit(Tables.load(s, dir, "documents"), "doc_id"),
      """SELECT doc_id,
        |  CASE WHEN h < 'cc' THEN 'train'
        |       WHEN h < 'e6' THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
        |      FROM documents) x
        |ORDER BY doc_id""".stripMargin),

    // stratified deterministic sampling: same hash rule inside every
    // stratum keeps strata proportionally represented, no coordination
    Q.df("x91_stratified_sample",
      (s, dir) => Sampling.stratifiedSample(
        Tables.load(s, dir, "documents"), "source", "doc_id", 64),
      """SELECT source, count(*) AS n_total,
        |  CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(floor(10000.0 * sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
        |                               THEN 1 ELSE 0 END) / count(*)) AS BIGINT)
        |    AS kept_x10k
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),

    // balanced per-stratum downsample: exactly n rows per stratum by
    // smallest content hash — the class-balancing step of a training
    // mix, deterministic and stable under corpus growth
    Q.df("x108_balanced_sample",
      (s, dir) => Sampling.balancedSample(
        Tables.load(s, dir, "documents"), "source", "doc_id", 5),
      """SELECT source, doc_id, h FROM (
        |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents
        |) x WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin),

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

    // histogram-sketch quantile estimation: one pass builds a 1024-bin
    // equi-width histogram (mergeable, streaming-friendly — the
    // deterministic cousin of t-digest); quantiles read off the
    // cumulative bin counts. Bin edges are exact integers, so the
    // estimate is engine-identical; the exact-percentile q82 is the
    // per-group sort-based alternative this avoids at scale
    Q.sql("x107_binned_quantiles",
      """WITH bins AS (
        |  SELECT CAST(floor(l_extendedprice / 110) AS BIGINT) AS bin,
        |         count(*) AS c
        |  FROM lineitem GROUP BY 1
        |), cum AS (
        |  SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum,
        |         (SELECT count(*) FROM lineitem) AS n
        |  FROM bins
        |)
        |SELECT
        |  CAST(min(CASE WHEN cum >= 0.50 * n THEN bin * 110 END) AS BIGINT) AS p50_est,
        |  CAST(min(CASE WHEN cum >= 0.90 * n THEN bin * 110 END) AS BIGINT) AS p90_est,
        |  CAST(min(CASE WHEN cum >= 0.99 * n THEN bin * 110 END) AS BIGINT) AS p99_est
        |FROM cum""".stripMargin),

    // per-group winsorization: clip event values into their type's
    // [p10, p90] band — the robust-statistics outlier treatment before
    // any mean-based downstream stat; groupwise percentiles + join-back
    // + least/greatest, all integer outputs (value is clipped cents)
    Q.sql2("x104_winsorize",
      """SELECT e.event_id, e.event_type,
        |  CAST(least(greatest(floor(e.value * 100), p.lo), p.hi) AS BIGINT)
        |    AS clipped_cents
        |FROM events e
        |JOIN (SELECT event_type,
        |        percentile_disc(0.1) WITHIN GROUP (ORDER BY floor(value * 100)) AS lo,
        |        percentile_disc(0.9) WITHIN GROUP (ORDER BY floor(value * 100)) AS hi
        |      FROM events GROUP BY event_type) p
        |  ON e.event_type = p.event_type
        |WHERE e.event_id < 3000
        |ORDER BY e.event_id""".stripMargin,
      """SELECT e.event_id, e.event_type,
        |  CAST(least(greatest(floor(e.value * 100), p.lo), p.hi) AS BIGINT)
        |    AS clipped_cents
        |FROM events e
        |JOIN (SELECT event_type,
        |        quantile_disc(floor(value * 100), 0.1) AS lo,
        |        quantile_disc(floor(value * 100), 0.9) AS hi
        |      FROM events GROUP BY event_type) p
        |  ON e.event_type = p.event_type
        |WHERE e.event_id < 3000
        |ORDER BY e.event_id""".stripMargin),

    // conversion funnel: per signed-up user, the first purchase AT OR
    // AFTER their first signup (two keyed aggregations + one join —
    // never an event-pair blowup), rolled into the corpus conversion
    // summary; lag sums are exact integer milliseconds
    Q.sql2("x105_funnel",
      """WITH fs AS (
        |  SELECT user_id, min(unix_millis(ts)) AS first_signup
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id
        |), fp AS (
        |  SELECT e.user_id, min(unix_millis(e.ts)) AS first_purchase
        |  FROM events e JOIN fs ON e.user_id = fs.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND unix_millis(e.ts) >= fs.first_signup
        |  GROUP BY e.user_id
        |)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN fp.first_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_converted,
        |  CAST(floor(10000.0 * sum(CASE WHEN fp.first_purchase IS NOT NULL THEN 1 ELSE 0 END)
        |       / count(*)) AS BIGINT) AS conv_x10k,
        |  CAST(coalesce(sum(fp.first_purchase - fs.first_signup), 0) AS BIGINT)
        |    AS total_lag_ms
        |FROM fs LEFT JOIN fp ON fs.user_id = fp.user_id""".stripMargin,
      """WITH fs AS (
        |  SELECT user_id, min(epoch_ms(ts)) AS first_signup
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id
        |), fp AS (
        |  SELECT e.user_id, min(epoch_ms(e.ts)) AS first_purchase
        |  FROM events e JOIN fs ON e.user_id = fs.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_ms(e.ts) >= fs.first_signup
        |  GROUP BY e.user_id
        |)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN fp.first_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_converted,
        |  CAST(floor(10000.0 * sum(CASE WHEN fp.first_purchase IS NOT NULL THEN 1 ELSE 0 END)
        |       / count(*)) AS BIGINT) AS conv_x10k,
        |  CAST(coalesce(sum(fp.first_purchase - fs.first_signup), 0) AS BIGINT)
        |    AS total_lag_ms
        |FROM fs LEFT JOIN fp ON fs.user_id = fp.user_id""".stripMargin),

    // their source's median length (groupwise percentile + semi-join
    // back — the "filter by corpus statistic" shape)
    Q.df("x92_median_length_filter",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.createOrReplaceTempView("documents")
        s.sql(
          """SELECT d.doc_id, d.source, d.n_chars, m.med_chars
            |FROM documents d
            |JOIN (SELECT source,
            |        CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
            |          AS BIGINT) AS med_chars
            |      FROM documents GROUP BY source) m
            |  ON d.source = m.source
            |WHERE d.n_chars > m.med_chars
            |ORDER BY d.doc_id""".stripMargin)
      },
      """SELECT d.doc_id, d.source, d.n_chars, m.med_chars
        |FROM documents d
        |JOIN (SELECT source, CAST(quantile_disc(n_chars, 0.5) AS BIGINT)
        |        AS med_chars
        |      FROM documents GROUP BY source) m
        |  ON d.source = m.source
        |WHERE d.n_chars > m.med_chars
        |ORDER BY d.doc_id""".stripMargin),

    // Z-order (Morton) layout key over (p_size, p_partkey): the
    // clustering key a multi-dimension data-skipping rewrite sorts by
    Q.df("x93_zorder_key",
      (s, dir) => graft.ext.Layout.partZorder(Tables.load(s, dir, "part")),
      s"""SELECT p_partkey,
         |  ${graft.ext.Layout.zorderSql("p_size", "p_partkey", 8)} AS zkey
         |FROM part ORDER BY zkey, p_partkey""".stripMargin),

    // PII scrub: redact URLs, emails, digit runs (privacy pass before
    // training); narrow regexp_replace chain, zero shuffles
    Q.df("x94_pii_scrub",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        ev.where(col("event_id") < 2000)
          .select(col("event_id"), TextStats.scrub(col("props")).as("scrubbed"))
          .orderBy("event_id")
      },
      """SELECT event_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(props, 'https?://[^ ]+', '<URL>', 'g'),
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]+', '<N>', 'g') AS scrubbed
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin),

    // stream-stream interval join (funnel attribution): signups matched
    // to same-user purchases within 1 hour, watermarks on both sides —
    // drained over the backlog it equals the batch self-join
    Q.df("x96_stream_stream_join",
      (s, dir) => Streaming.streamStreamJoin(s, dir),
      """SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id
        |FROM events s JOIN events p
        |  ON s.user_id = p.user_id
        | AND s.event_type = 'signup' AND p.event_type = 'purchase'
        | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        |ORDER BY s.user_id, signup_id, purchase_id""".stripMargin),

    // foreachBatch sink: update-mode running totals appended to an
    // upsert journal per micro-batch, compacted latest-batch-wins on
    // read — the custom-sink exactly-once pattern; equals the batch
    // aggregation over the drained backlog
    Q.df("x122_stream_foreachbatch",
      (s, dir) => Streaming.userTotalsForeachBatch(s, dir),
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    // Bloom-prefiltered incremental dedup: corpus fingerprints -> Bloom
    // sketch -> only the maybe-duplicate slice of the new batch pays the
    // exact anti-join; result is exactly incrementalNew's (fpp-bounded
    // candidate cost, zero wrong answers)
    Q.df("x97_bloom_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.incrementalNewBloom(
          docs.where(col("source") === "src19"),
          docs.where(col("source") =!= "src19"))
      },
      """SELECT n.doc_id FROM documents n
        |WHERE n.source = 'src19' AND NOT EXISTS (
        |  SELECT 1 FROM documents o
        |  WHERE o.source <> 'src19'
        |    AND md5(trim(regexp_replace(lower(o.text), '\s+', ' ', 'g'))) =
        |        md5(trim(regexp_replace(lower(n.text), '\s+', ' ', 'g'))))
        |ORDER BY n.doc_id""".stripMargin),

    // exact-cosine top-k: quantized dot over quantized norms — the only
    // double math is one IEEE-exact (*, /, sqrt) scalar expression, so
    // ranking is engine-identical (a float-fold cosine is not)
    Q.df("x101_cosine_topk",
      (s, dir) => Similarity.cosineTopK(Tables.load(s, dir, "embeddings"), 20, 3),
      """WITH n2 AS (
        |  SELECT vec_id,
        |    CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
        |           * CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS n2
        |  FROM embeddings, range(1, 65) r(i) GROUP BY 1
        |), pairs AS (
        |  SELECT q.vec_id AS qid, e.vec_id,
        |    CAST(sum(CAST(floor(CAST(q.embedding[i] AS DOUBLE) * 10000) AS BIGINT)
        |           * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS dot_q
        |  FROM embeddings q, embeddings e, range(1, 65) r(i)
        |  WHERE q.vec_id < 20 AND q.vec_id <> e.vec_id
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT p.qid, p.vec_id,
        |    CAST(floor(10000.0 * p.dot_q /
        |         sqrt(CAST(nq.n2 AS DOUBLE) * CAST(ne.n2 AS DOUBLE))) AS BIGINT)
        |      AS cos_x10k
        |  FROM pairs p JOIN n2 nq ON nq.vec_id = p.qid
        |               JOIN n2 ne ON ne.vec_id = p.vec_id
        |), ranked AS (
        |  SELECT qid, vec_id, cos_x10k,
        |    row_number() OVER (PARTITION BY qid
        |                       ORDER BY cos_x10k DESC, vec_id) AS rn
        |  FROM scored
        |)
        |SELECT qid, vec_id, cos_x10k, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin),

    // GPT-3-style n-gram-overlap decontamination: fraction of each eval
    // doc's distinct 3-grams that appear anywhere in the training side;
    // semi-join keyed on the shingle, never a doc-pair join. Split form:
    // ONE corpus shingling (shared with the whole LSH family's cached
    // shingle table) + a doc_id-keyed side flag, instead of tokenizing
    // each filtered side separately
    Q.df("x102_ngram_overlap",
      (s, dir) => Dedup.ngramOverlapSplit(
        Tables.load(s, dir, "documents"), col("source") === "src19"),
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
        |    generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT a.doc_id, a.source,
        |    a.w || ' ' || b.w || ' ' || c.w AS shingle
        |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        |), tr AS (SELECT DISTINCT shingle FROM sh WHERE source <> 'src19'),
        |ev AS (SELECT doc_id, shingle FROM sh WHERE source = 'src19'),
        |tot AS (SELECT doc_id, count(*) AS n_shingles FROM ev GROUP BY 1),
        |hit AS (
        |  SELECT doc_id, count(*) AS n_hit FROM ev
        |  WHERE shingle IN (SELECT shingle FROM tr) GROUP BY 1
        |)
        |SELECT t.doc_id, t.n_shingles,
        |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
        |  CAST(floor(10000.0 * coalesce(h.n_hit, 0) / t.n_shingles) AS BIGINT)
        |    AS overlap_x10k
        |FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
        |ORDER BY t.doc_id""".stripMargin),

    // sliding (hopping) event-time windows: each event lands in 2
    // overlapping 2h windows on a 1h hop — the rate-over-sliding-horizon
    // aggregation; one Expand + one keyed agg, no self-join
    Q.df("x98_sliding_window",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        ev.groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
            col("event_type"), col("cnt"))
          .orderBy("win_start", "event_type")
      },
      """SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS cnt
        |FROM (SELECT date_trunc('hour', ts) - k.k * INTERVAL 1 HOUR AS win_start,
        |        event_type
        |      FROM events CROSS JOIN (VALUES (0), (1)) k(k)) w
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin),

    // exact distributed Pearson correlation: all accumulations are
    // order-independent BIGINT sums (quantity is integral; price floored
    // to dollars), so the per-group moments are bit-identical in every
    // engine; the final formula is a fixed IEEE double expression
    // (*, /, sqrt are correctly rounded — unlike ln, the q43 lesson)
    Q.sql("x99_grouped_corr",
      """SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST(floor(10000.0 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |       sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
        |            (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT)
        |    AS corr_x10k
        |FROM (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
        |    CAST(sum(CAST(l_quantity AS BIGINT) *
        |             CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy,
        |    CAST(sum(CAST(l_quantity AS BIGINT) *
        |             CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
        |    CAST(sum(CAST(floor(l_extendedprice) AS BIGINT) *
        |             CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy
        |  FROM lineitem GROUP BY l_returnflag
        |) t ORDER BY l_returnflag""".stripMargin),

    // single-pass column profiling (null counts + cardinalities for
    // every column in ONE scan — the new-data-drop sanity check)
    Q.df("x100_profile",
      (s, dir) => graft.ext.Profile.profile(Tables.load(s, dir, "orders")),
      """SELECT col_name, n_rows, n_null, n_distinct FROM (
        |  SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    count(DISTINCT o_orderkey) AS n_distinct FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', count(*),
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_custkey) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*),
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*),
        |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_totalprice) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', count(*),
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderdate) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*),
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderpriority) FROM orders
        |) p ORDER BY col_name""".stripMargin),

    // the approx tier of x100 (rows-only like x63: HLL sketches are
    // engine-specific): one scan, one aggregation, NO per-column Expand
    // replication — the wide-table 100 TB profile; exact x100 stays
    // judged alongside
    Q.dfOnly("x112_profile_approx",
      (s, dir) => graft.ext.Profile.profileApprox(
        Tables.load(s, dir, "orders"))),

    // the sketch-based winsorize (x104's documented 100 TB path): clip
    // bounds read off per-group cumulative 50-cent equi-width histogram
    // bins (the mergeable one-pass sketch of x107) instead of exact
    // per-group percentile sorts; bin edges are exact integers so the
    // whole query is engine-identical and fully oracle-checked
    Q.sql("x113_winsorize_binned",
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100 / 50) AS BIGINT) AS bin, count(*) AS c
        |  FROM events GROUP BY event_type, bin
        |), cum AS (
        |  SELECT event_type, bin, c,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM b
        |), q AS (
        |  SELECT event_type,
        |    CAST(min(CASE WHEN cum >= 0.10 * n THEN bin * 50 END) AS BIGINT) AS lo,
        |    CAST(min(CASE WHEN cum >= 0.90 * n THEN bin * 50 END) AS BIGINT) AS hi
        |  FROM cum GROUP BY event_type
        |)
        |SELECT e.event_id, e.event_type,
        |  CAST(least(greatest(floor(e.value * 100), q.lo), q.hi) AS BIGINT)
        |    AS clipped_cents
        |FROM events e JOIN q ON e.event_type = q.event_type
        |WHERE e.event_id < 3000
        |ORDER BY e.event_id""".stripMargin),

    // distributed per-label centroids over embeddings: the k-means
    // update step as a judged operator — only partial (label, pos) sums
    // cross the shuffle; exact quantized-integer arithmetic throughout
    Q.df("x95_label_centroids",
      (s, dir) => Similarity.labelCentroids(Tables.load(s, dir, "embeddings")),
      """SELECT label, CAST(pos AS INT) AS pos, count(*) AS n_vecs,
        |  CAST(sum(q) AS BIGINT) AS sum_q,
        |  CAST(floor(CAST(sum(q) AS DOUBLE) / count(*)) AS BIGINT)
        |    AS centroid_x10k
        |FROM (
        |  SELECT label,
        |    generate_subscripts(embedding, 1) AS pos,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT) AS q
        |  FROM embeddings
        |) x GROUP BY label, pos ORDER BY label, pos""".stripMargin),

    // sequence packing (concat-and-chunk pretraining prep): documents
    // routed to 16 md5 buckets, packed greedily into 256-token context
    // windows by the running token total within each bucket — the only
    // shuffle is the bucket-partitioned window, so packing parallelizes
    // by bucket (raise the bucket count at scale, ext.Pack scaladoc)
    Q.df("x115_sequence_pack",
      (s, dir) => Pack.packManifest(Tables.load(s, dir, "documents"), 256),
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(instr('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
        |      AS bucket
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, bucket, n_tok,
        |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |), p AS (
        |  SELECT doc_id, bucket, n_tok,
        |    CAST(floor((cum - n_tok) / 256.0) AS BIGINT) AS pack_id
        |  FROM c
        |)
        |SELECT bucket, pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tok,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY bucket, pack_id
        |ORDER BY bucket, pack_id""".stripMargin),

    // THE END-TO-END CURATION PIPELINE — every stage above composed as
    // one DAG and judged as one query: quality gate (x78) -> exact
    // dedup keep-min (x55 family) -> near-dup keeper (x71 pipeline) ->
    // SimHash decontamination vs the held-out src19 split (x87) ->
    // sequence packing (x115). The oracle is the same five stages
    // composed as chained CTEs. Catches inter-stage schema drift that
    // no per-stage judgment sees; PlanSpec guards the single-raw-scan
    // property (every stage reads the pinned/checkpointed boundary).
    Q.df("x123_curation_pipeline",
      (s, dir) => Curation.curate(Tables.load(s, dir, "documents"), 256),
      """WITH RECURSIVE
        |tok0 AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
        |         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
        |  FROM documents
        |),
        |st AS (
        |  SELECT doc_id, count(*) AS n_tok,
        |    CAST(floor(10000.0 * sum(CASE WHEN w IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS stop_x10k,
        |    CAST(floor(10000.0 * sum(length(w)) / count(*)) AS BIGINT) AS avglen_x10k
        |  FROM tok0 GROUP BY doc_id
        |),
        |q AS (
        |  SELECT doc_id FROM st
        |  WHERE n_tok >= 20 AND stop_x10k >= 100
        |    AND avglen_x10k BETWEEN 30000 AND 80000
        |),
        |base1 AS (
        |  SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)
        |  WHERE d.source <> 'src19'
        |),
        |ex AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM (SELECT doc_id,
        |          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |        FROM base1)
        |  GROUP BY fp
        |),
        |base2 AS (SELECT b.* FROM base1 b JOIN ex USING (doc_id)),
        |tok AS (SELECT t.* FROM tok0 t JOIN base2 USING (doc_id)),
        |sh0 AS (
        |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
        |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        |),
        |keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 2),
        |sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS i
        |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |),
        |pairs AS (
        |  SELECT d1, d2 FROM inter
        |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
        |),
        |edges AS (
        |  SELECT d1 AS src, d2 AS dst FROM pairs
        |  UNION SELECT d2, d1 FROM pairs
        |),
        |reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM base2
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
        |),
        |labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
        |base3 AS (
        |  SELECT b.* FROM base2 b JOIN labels c ON b.doc_id = c.doc_id
        |  WHERE b.doc_id = c.cluster_id
        |),
        |nib AS (
        |  SELECT doc_id, j, instr('0123456789abcdef', substr(md5(w), j, 1)) - 1 AS v
        |  FROM tok0, range(1, 5) r(j)
        |),
        |bits AS (
        |  SELECT doc_id, (j - 1) * 4 + b.b AS pos,
        |    sum(CASE WHEN (v & b.mask) > 0 THEN 1 ELSE -1 END) AS s
        |  FROM nib, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) AS b(b, mask)
        |  GROUP BY doc_id, (j - 1) * 4 + b.b
        |),
        |sk AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s >= 0 THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id
        |),
        |base4 AS (
        |  SELECT b3.* FROM base3 b3
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM sk n JOIN sk o ON n.simhash = o.simhash
        |    JOIN documents dd ON o.doc_id = dd.doc_id
        |    WHERE n.doc_id = b3.doc_id AND dd.source = 'src19')
        |),
        |t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(instr('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
        |      AS bucket
        |  FROM base4
        |),
        |c AS (
        |  SELECT doc_id, bucket, n_tok,
        |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |),
        |p AS (
        |  SELECT doc_id, bucket, n_tok,
        |    CAST(floor((cum - n_tok) / 256.0) AS BIGINT) AS pack_id
        |  FROM c
        |)
        |SELECT bucket, pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tok,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY bucket, pack_id
        |ORDER BY bucket, pack_id""".stripMargin),

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

    // SemDeDup: k-means clusters + within-cluster near-dup drop (keep
    // smallest id). Same planted near-dups as x114 (rescaled copies at
    // cos ~0.9999) so the operator has real work; rows-only judged
    // because cluster boundaries are engine-specific (like IVF/PQ) —
    // planted-dup removal + determinism are spec-guarded in ExtSpec.
    Q.dfOnly("x116_semdedup",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val base = emb.select(col("vec_id"), col("embedding"))
        val pert = emb.select((col("vec_id") + 1000000L).as("vec_id"),
          expr("transform(embedding, (x, i) -> CAST(CAST(x AS DOUBLE) * " +
            "((9500 + (vec_id + i) % 1000) / 10000.0) AS FLOAT))")
            .as("embedding"))
        Similarity.semDedup(base.unionByName(pert),
          cells = 8, iters = 3, minCosX10k = 9900L)
      }),

    // Unicode text normalization (multilingual-corpus fold-in pass):
    // accents injected deterministically via translate, then stripped by
    // the native codegen'd strip_accents expression (NFD -> drop
    // combining marks -> NFC) — judged against DuckDB's utf8proc-backed
    // strip_accents on the same injected text. Narrow per-row map, zero
    // shuffles; ASCII rows skip the normalizer entirely (fast path).
    Q.df("x117_normalize",
      (s, dir) => {
        graft.functions.StripAccents.register(s)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            translate(col("text"), "aeioucn", "áéíóúçñ").as("accented"))
          .select(col("doc_id"), col("accented"),
            call_function("strip_accents", col("accented")).as("clean"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  translate(text, 'aeioucn', 'áéíóúçñ') AS accented,
        |  strip_accents(translate(text, 'aeioucn', 'áéíóúçñ')) AS clean
        |FROM documents ORDER BY doc_id""".stripMargin),

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

    // out-of-vocabulary gate against the corpus-derived top-20 vocab:
    // the two-pass corpus-statistic shape — one keyed agg + bounded
    // top-k for the vocabulary, then a broadcast join back (vocab rows
    // are constant-size regardless of corpus) and one per-doc agg
    Q.df("x119_oov_rate",
      (s, dir) => TextStats.oovRate(
        Tables.load(s, dir, "documents"), vocabSize = 20, maxOovX10k = 3000L),
      s"""WITH $duckTok,
         |vocab AS (
         |  SELECT w FROM (
         |    SELECT w, count(*) AS cnt FROM tok GROUP BY w
         |    ORDER BY cnt DESC, w LIMIT 20) v
         |), agg AS (
         |  SELECT doc_id, count(*) AS n_tok,
         |    CAST(sum(CASE WHEN w NOT IN (SELECT w FROM vocab)
         |             THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |  FROM tok GROUP BY doc_id
         |)
         |SELECT doc_id, n_tok, n_oov,
         |  CAST(floor(10000.0 * n_oov / n_tok) AS BIGINT) AS oov_x10k,
         |  CAST(CASE WHEN floor(10000.0 * n_oov / n_tok) <= 3000
         |       THEN 1 ELSE 0 END AS INT) AS keep
         |FROM agg ORDER BY doc_id""".stripMargin),

    // score-ranked keep-best-n per stratum (the "best documents per
    // domain" curation cut): per-source top-3 by length via the bounded
    // -heap aggregate — the shuffle carries at most k rows per
    // (partition, source), where the window formulation (the oracle)
    // sorts every row; plan-guarded window-free
    Q.df("x120_best_per_source",
      (s, dir) => {
        val fn = graft.functions.TopKAgg.register(s, 3)
        Tables.load(s, dir, "documents")
          .groupBy("source")
          .agg(call_function(fn, col("n_chars"), col("doc_id")).as("top"))
          .select(col("source"), posexplode(col("top")).as(Seq("i", "t")))
          .select(col("source"), col("t.id").as("doc_id"),
            col("t.score").as("n_chars"),
            (col("i") + 1).cast("bigint").as("rn"))
          .orderBy("source", "rn")
      },
      """SELECT source, doc_id, n_chars, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) x
        |WHERE rn <= 3 ORDER BY source, rn""".stripMargin),

    // ---- round 4: passage dedup, sketch-exact heavy hitters, mixing,
    //      runtime filters, global ids, incremental rollups ----

    // Lee-et-al-style passage-level exact dedup: fixed 8-token blocks
    // deduped globally by first occurrence, documents reconstructed
    // from their surviving blocks — removes boilerplate WITHIN docs
    // instead of dropping whole docs (see Dedup.blockDedup scaladoc)
    Q.df("x127_block_dedup",
      (s, dir) => Dedup.blockDedup(Tables.load(s, dir, "documents"), 8),
      s"""WITH $duckTok,
         |blk AS (
         |  SELECT doc_id, (pos - 1) // 8 AS blk,
         |         string_agg(w, ' ' ORDER BY pos) AS btxt
         |  FROM tok GROUP BY doc_id, (pos - 1) // 8
         |),
         |r AS (SELECT doc_id, blk, btxt,
         |        row_number() OVER (PARTITION BY btxt
         |                           ORDER BY doc_id, blk) AS rn
         |      FROM blk),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks
         |        FROM blk GROUP BY doc_id),
         |srv AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |          md5(string_agg(btxt, ' ' ORDER BY blk)) AS kept_md5
         |        FROM r WHERE rn = 1 GROUP BY doc_id)
         |SELECT t.doc_id, t.n_blocks,
         |  CAST(coalesce(s.n_kept, 0) AS BIGINT) AS n_kept, s.kept_md5
         |FROM tot t LEFT JOIN srv s USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin),

    // EXACT heavy hitters through a bounded sketch: Misra-Gries (256
    // counters) guarantees a candidate superset of every token with
    // frequency >= n/50, then one broadcast-semi-join recount makes the
    // answer exact — the two-pass trick that never shuffles the full
    // vocabulary (see functions.MisraGries scaladoc)
    Q.df("x128_heavy_hitters",
      (s, dir) => {
        val fn = graft.functions.MisraGries.register(s, 256)
        val tok = TextStats.tokens(Tables.load(s, dir, "documents"))
          .select("w")
        val cand = tok.agg(call_function(fn, col("w")).as("sk"))
          .select(explode(map_keys(col("sk"))).as("w"))
        val n = tok.agg(count(lit(1)).as("n_tok"))
        tok.join(broadcast(cand), Seq("w"), "left_semi")
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(n))
          // theta = 1/50: integer cross-multiply, no float threshold
          .where(col("cnt") * 50 >= col("n_tok"))
          .select(col("w"), col("cnt"))
          .orderBy(col("cnt").desc, col("w"))
      },
      s"""WITH $duckTok
         |SELECT w, CAST(count(*) AS BIGINT) AS cnt
         |FROM tok GROUP BY w
         |HAVING 50 * count(*) >= (SELECT count(*) FROM tok)
         |ORDER BY cnt DESC, w""".stripMargin),

    // sketch tier of the x92 median gate (same pairing as exact x104 /
    // sketch x113): percentile_approx's mergeable one-pass summary in
    // place of the exact per-group sort. Rows-only like every
    // engine-specific sketch; ExtSpec pins the estimate inside the
    // sketch's rank-error band around the exact median.
    Q.dfOnly("x129_median_gate_approx",
      (s, dir) => Tables.load(s, dir, "documents")
        .groupBy("source")
        .agg(percentile_approx(col("n_chars"), lit(0.5), lit(100))
            .as("med_approx"),
          count(lit(1)).as("n_docs"))
        .orderBy("source")),

    // temperature-based source mixing (alpha = 0.5): budget shares
    // proportional to sqrt(stratum size), rows picked as the smallest
    // content hashes — integer-exact targets, reproducible selection
    // (see Sampling.temperatureMix scaladoc)
    Q.df("x130_temperature_mix",
      (s, dir) => Sampling.temperatureMix(
        Tables.load(s, dir, "documents"), "source", "doc_id", 1000L),
      """WITH c AS (SELECT source, count(*) AS n_raw
        |           FROM documents GROUP BY source),
        |w AS (SELECT source, CAST(floor(sqrt(n_raw)) AS BIGINT) AS w FROM c),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS w_tot FROM w),
        |g AS (SELECT source, (1000 * w) // w_tot AS target FROM w, t),
        |r AS (SELECT source, doc_id,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |      FROM documents)
        |SELECT r.source, r.doc_id FROM r JOIN g USING (source)
        |WHERE r.rn <= g.target
        |ORDER BY r.source, r.doc_id""".stripMargin),

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

    // global contiguous 0..n-1 ids WITHOUT the single-partition window
    // that row_number() OVER (ORDER BY ...) plans — range-partitioned
    // sort + per-partition offsets (see Ids.contiguousIds scaladoc)
    Q.df("x132_global_ids",
      (s, dir) => Ids.contiguousIds(Tables.load(s, dir, "documents"), "doc_id"),
      """SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS gid
        |FROM documents ORDER BY doc_id""".stripMargin),

    // stream-stream LEFT OUTER interval join: unmatched signups emitted
    // exactly once at watermark-driven state eviction (purchase_id = -1)
    // — "never converted" as a first-class streaming answer (see
    // Streaming.streamStreamLeftOuterJoin scaladoc)
    Q.df("x133_stream_outer_join",
      (s, dir) => Streaming.streamStreamLeftOuterJoin(s, dir),
      """SELECT s.user_id, s.event_id AS signup_id,
        |  coalesce(p.event_id, -1) AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        |ORDER BY s.user_id, signup_id, purchase_id""".stripMargin),

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

    // robust outlier detection via MAD (median absolute deviation):
    // per-source median + MAD over n_chars, outliers = |x - med| >
    // 3 * MAD — the robust-statistics twin of the winsorize family
    // (x104/x113); percentile_disc keeps every number an exact element
    // of the data, so the answer is engine-exact
    Q.sql2("x135_mad_outliers",
      """WITH med AS (
        |  SELECT source,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
        |      AS BIGINT) AS med
        |  FROM documents GROUP BY source),
        |dev AS (
        |  SELECT d.source, d.doc_id, abs(d.n_chars - m.med) AS ad, m.med
        |  FROM documents d JOIN med m ON d.source = m.source),
        |mad AS (
        |  SELECT source,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)
        |      AS BIGINT) AS mad
        |  FROM dev GROUP BY source)
        |SELECT v.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(v.med) AS med, min(a.mad) AS mad,
        |  CAST(count(*) FILTER (WHERE v.ad > 3 * a.mad) AS BIGINT)
        |    AS n_outliers
        |FROM dev v JOIN mad a ON v.source = a.source
        |GROUP BY v.source ORDER BY v.source""".stripMargin,
      """WITH med AS (
        |  SELECT source, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med
        |  FROM documents GROUP BY source),
        |dev AS (
        |  SELECT d.source, d.doc_id, abs(d.n_chars - m.med) AS ad, m.med
        |  FROM documents d JOIN med m ON d.source = m.source),
        |mad AS (
        |  SELECT source, CAST(quantile_disc(ad, 0.5) AS BIGINT) AS mad
        |  FROM dev GROUP BY source)
        |SELECT v.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(v.med) AS med, min(a.mad) AS mad,
        |  CAST(count(*) FILTER (WHERE v.ad > 3 * a.mad) AS BIGINT)
        |    AS n_outliers
        |FROM dev v JOIN mad a ON v.source = a.source
        |GROUP BY v.source ORDER BY v.source""".stripMargin),

    // hopping (sliding) windows as a STREAM — the streaming twin of the
    // batch x98: 2h windows advancing hourly, every event in two window
    // states (Expand), watermark-bounded; drained over the backlog it
    // equals the batch hopping aggregation
    Q.df("x136_stream_hopping",
      (s, dir) => Streaming.hoppingCounts(s, dir),
      """SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS cnt
        |FROM (SELECT date_trunc('hour', ts) - k.k * INTERVAL 1 HOUR AS win_start,
        |        event_type
        |      FROM events CROSS JOIN (VALUES (0), (1)) k(k)) w
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin),

    // sparse TF-IDF cosine candidate pairs over the inverted index —
    // rare-shingle (df <= 2) candidate generation, integer-exact
    // numerator and norms (see TextStats.tfidfPairs scaladoc)
    Q.df("x137_tfidf_pairs",
      (s, dir) => TextStats.tfidfPairs(Tables.load(s, dir, "documents"), 2),
      s"""WITH $duckTok,
         |tf AS (
         |  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s,
         |    count(*) AS tf
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
         |  GROUP BY 1, 2
         |),
         |nn AS (SELECT count(*) AS n FROM documents),
         |rare AS (SELECT s, count(*) AS df FROM tf GROUP BY 1
         |         HAVING count(*) <= 2),
         |wts AS (
         |  SELECT tf.doc_id, tf.s,
         |    CAST(tf.tf * ((100 * nn.n) // rare.df) AS BIGINT) AS wt
         |  FROM tf JOIN rare ON tf.s = rare.s, nn
         |),
         |norms AS (SELECT doc_id, CAST(sum(wt * wt) AS BIGINT) AS nsq
         |          FROM wts GROUP BY doc_id),
         |num AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2,
         |    CAST(sum(a.wt * b.wt) AS BIGINT) AS num
         |  FROM wts a JOIN wts b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT num.d1, num.d2, num.num,
         |  x.nsq AS n1sq, y.nsq AS n2sq
         |FROM num JOIN norms x ON num.d1 = x.doc_id
         |         JOIN norms y ON num.d2 = y.doc_id
         |ORDER BY d1, d2""".stripMargin),

    // per-group MODE with a deterministic tie-break (count desc, value
    // asc): two keyed aggregations; the window runs over the TINY
    // (status x priority) count table, bounded by key cardinality —
    // never over the raw rows
    Q.sql("x138_group_mode",
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |  CAST(cnt AS BIGINT) AS cnt
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |        ORDER BY cnt DESC, o_orderpriority) AS rn FROM c)
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin),

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

    // exact image dedup by content hash over the REAL payload bytes —
    // the object-store dedup step of a multimodal corpus; oracle = the
    // construction-formula twin: payloads are byte-identical exactly
    // when the dimension formula (n_chars % 64, n_chars % 37) collides
    Q.df("x142_image_dedup",
      (s, dir) => Multimodal.imageDedup(Tables.load(s, dir, "documents")),
      """SELECT CAST(count(*) AS BIGINT) AS n_images, min(doc_id) AS keep_id
        |FROM documents
        |GROUP BY n_chars % 64, n_chars % 37
        |ORDER BY keep_id""".stripMargin),

    // passage-level novelty of an incoming batch vs the corpus — block
    // anti-join, the incremental sibling of x127 (see
    // Dedup.blockNovelty scaladoc): src19 is the "new crawl"
    Q.df("x141_block_novelty",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.blockNovelty(
          docs.where(col("source") === "src19"),
          docs.where(col("source") =!= "src19"), 8)
      },
      s"""WITH $duckTok,
         |blk AS (
         |  SELECT t.doc_id, (t.pos - 1) // 8 AS blk,
         |         string_agg(t.w, ' ' ORDER BY t.pos) AS btxt,
         |         min(d.source) AS source
         |  FROM tok t JOIN documents d ON t.doc_id = d.doc_id
         |  GROUP BY t.doc_id, (t.pos - 1) // 8
         |),
         |nb AS (SELECT doc_id, blk, btxt FROM blk WHERE source = 'src19'),
         |seen AS (SELECT DISTINCT btxt FROM blk WHERE source <> 'src19'),
         |novel AS (SELECT nb.* FROM nb
         |          WHERE nb.btxt NOT IN (SELECT btxt FROM seen)),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks
         |        FROM nb GROUP BY doc_id),
         |k AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_novel,
         |        md5(string_agg(btxt, ' ' ORDER BY blk)) AS novel_md5
         |      FROM novel GROUP BY doc_id)
         |SELECT t.doc_id, t.n_blocks,
         |  CAST(coalesce(k.n_novel, 0) AS BIGINT) AS n_novel, k.novel_md5
         |FROM tot t LEFT JOIN k USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin),

    // FULL outer stream-stream interval join — completes the streaming
    // join family (inner x96, left x133): unmatched PURCHASES also
    // emitted once at their state eviction (signup_id = -1); same
    // sentinel-drain mechanics, equals the batch FULL JOIN
    Q.df("x140_stream_full_outer_join",
      (s, dir) => Streaming.streamStreamFullOuterJoin(s, dir),
      """SELECT coalesce(s.user_id, p.user_id) AS user_id,
        |  coalesce(s.event_id, -1) AS signup_id,
        |  coalesce(p.event_id, -1) AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        |ORDER BY user_id, signup_id, purchase_id""".stripMargin),

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

    // per-source distinctive term by integer lift (exp-form PMI — the
    // domain-signature extractor; ln-free like x84/x139, see
    // TextStats.distinctiveTerms scaladoc)
    Q.df("x148_distinctive_terms",
      (s, dir) => TextStats.distinctiveTerms(
        Tables.load(s, dir, "documents"), "source", 5L),
      s"""WITH $duckTok,
         |st AS (SELECT d.source, t.w
         |       FROM tok t JOIN documents d USING (doc_id)),
         |o AS (SELECT source, w, count(*) AS o FROM st GROUP BY 1, 2),
         |r AS (SELECT source, count(*) AS r FROM st GROUP BY 1),
         |c AS (SELECT w, count(*) AS c FROM st GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM st),
         |sc AS (
         |  SELECT o.source, o.w,
         |    CAST((100 * o.o * n.n) // (r.r * c.c) AS BIGINT) AS lift_x100
         |  FROM o JOIN r USING (source) JOIN c USING (w), n
         |  WHERE o.o >= 5
         |)
         |SELECT source, w AS top_term, lift_x100 FROM (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY lift_x100 DESC, w) AS rn FROM sc)
         |WHERE rn = 1 ORDER BY source""".stripMargin),

    // streaming per-key top-k leaderboard: bounded custom state (the
    // streaming twin of the batch TopKAgg bounded heap — streaming
    // can't sort, so rank must be spelled as state); monotone-state
    // compaction on read (see Streaming.topKStateful scaladoc)
    Q.df("x147_stream_topk",
      (s, dir) => Streaming.topKStateful(s, dir, 3),
      """SELECT event_type, CAST(rn AS BIGINT) AS rank, event_id, cents
        |FROM (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY floor(value * 100) DESC, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 3 ORDER BY event_type, rank""".stripMargin),

    // lexical diversity as the Gini-Simpson index — ln-free (integer)
    // alternative to token entropy; low = repetitive/boilerplate (see
    // TextStats.lexicalDiversity scaladoc)
    Q.df("x139_lexical_diversity",
      (s, dir) => TextStats.lexicalDiversity(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |c AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
         |g AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
         |        CAST(sum(c * c) AS BIGINT) AS s2
         |      FROM c GROUP BY doc_id)
         |SELECT doc_id, n_tok,
         |  CAST((10000 * (n_tok * n_tok - s2)) // (n_tok * n_tok) AS BIGINT)
         |    AS gini_x10k
         |FROM g ORDER BY doc_id""".stripMargin),

    // CCNet-style bigram-LM perplexity gate: every doc scored by
    // whole-bit -log2 of its add-one-smoothed bigram stream (integer
    // bit-length log2 — no floating log), bucketed into head/middle/
    // tail by integer cumulative-histogram tertiles. The canonical
    // LM-based curation filter, bit-reproducible across engines (see
    // LmQuality scaladoc)
    Q.df("x151_lm_quality_gate",
      (s, dir) => LmQuality.lmQualityGate(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |big AS (
         |  SELECT a.doc_id, a.w AS w1, b.w AS w2
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         |bc AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
         |pc AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
         |v AS (SELECT count(DISTINCT w) AS v FROM tok),
         |terms AS (
         |  SELECT g.doc_id,
         |    (length(bin(p.c1 + v.v)) - 1) - (length(bin(b.c2 + 1)) - 1) AS nb
         |  FROM big g JOIN bc b ON g.w1 = b.w1 AND g.w2 = b.w2
         |             JOIN pc p ON g.w1 = p.w1, v),
         |scored AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_big,
         |    CAST(sum(nb) AS BIGINT) AS bits,
         |    (100 * CAST(sum(nb) AS BIGINT)) // CAST(count(*) AS BIGINT)
         |      AS ppl_cbit
         |  FROM terms GROUP BY doc_id),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
         |hist AS (SELECT ppl_cbit, count(*) AS c FROM scored GROUP BY ppl_cbit),
         |cum AS (SELECT ppl_cbit,
         |          CAST(sum(c) OVER (ORDER BY ppl_cbit) AS BIGINT) AS cum
         |        FROM hist),
         |thr AS (SELECT
         |    min(CASE WHEN cum >= (n + 2) // 3 THEN ppl_cbit END) AS t1,
         |    min(CASE WHEN cum >= (2 * n + 2) // 3 THEN ppl_cbit END) AS t2
         |  FROM cum, n),
         |b AS (
         |  SELECT d.doc_id, coalesce(s.n_big, 0) AS n_big,
         |    coalesce(s.bits, 0) AS bits,
         |    coalesce(s.ppl_cbit, -1) AS ppl_cbit,
         |    CASE WHEN s.n_big IS NULL THEN 'tail'
         |         WHEN s.ppl_cbit <= t.t1 THEN 'head'
         |         WHEN s.ppl_cbit <= t.t2 THEN 'middle'
         |         ELSE 'tail' END AS bucket
         |  FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id, thr t)
         |SELECT doc_id, n_big, bits, ppl_cbit, bucket,
         |  bucket != 'tail' AS keep
         |FROM b ORDER BY doc_id""".stripMargin),

    // perceptual image near-dup: REAL dHash over decoded BMP pixels
    // (9x8 grid averages -> 64-bit difference hash), 4x16-bit hamming
    // bands for candidates, exact bit_count verify — the image twin of
    // the SimHash text path. Oracle = the construction-formula twin:
    // planted payloads are pure functions of doc_id (per-group texture
    // + one perturbed grid cell), so DuckDB re-derives each doc's
    // flipped-bit set and every within-group hamming distance without
    // seeing a byte; a decode, grid, hashing or banding bug all break
    // the pair set or the distances (see Multimodal.imageNearDup)
    Q.df("x152_image_near_dup",
      (s, dir) => Multimodal.imageNearDup(
        Tables.load(s, dir, "documents").where(col("doc_id") % 10 < 2), 8),
      """WITH img AS (
        |  SELECT doc_id, doc_id % 8 AS g,
        |    (doc_id * 7) % 9 AS cx, (doc_id * 5) % 8 AS cy
        |  FROM documents WHERE doc_id % 10 < 2),
        |cells0 AS (
        |  SELECT gs.g, gyy.gy, gxx.gx,
        |    CAST((CAST(gs.g * 1000 + gyy.gy * 9 + gxx.gx AS HUGEINT)
        |      * 2654435761) % 4294967296 AS BIGINT) AS x
        |  FROM generate_series(0, 7) gs(g)
        |  CROSS JOIN generate_series(0, 7) gyy(gy)
        |  CROSS JOIN generate_series(0, 8) gxx(gx)),
        |cells AS (
        |  SELECT g, gy, gx,
        |    CAST((CAST(xor(x, x >> 16) AS HUGEINT) * 2654435761) % 4294967296
        |      AS BIGINT) >> 24 AS v
        |  FROM cells0),
        |fl AS (
        |  SELECT i.doc_id, i.g,
        |    CASE WHEN i.cx >= 1 AND ((l.v < (c.v + 128) % 256) <> (l.v < c.v))
        |         THEN i.cy * 8 + i.cx - 1 END AS b1,
        |    CASE WHEN i.cx <= 7 AND (((c.v + 128) % 256 < r.v) <> (c.v < r.v))
        |         THEN i.cy * 8 + i.cx END AS b2
        |  FROM img i
        |  JOIN cells c ON c.g = i.g AND c.gy = i.cy AND c.gx = i.cx
        |  LEFT JOIN cells l ON l.g = i.g AND l.gy = i.cy AND l.gx = i.cx - 1
        |  LEFT JOIN cells r ON r.g = i.g AND r.gy = i.cy AND r.gx = i.cx + 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(
        |    (CASE WHEN a.b1 IS NOT NULL AND a.b1 IS DISTINCT FROM b.b1
        |          AND a.b1 IS DISTINCT FROM b.b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.b2 IS NOT NULL AND a.b2 IS DISTINCT FROM b.b1
        |          AND a.b2 IS DISTINCT FROM b.b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN b.b1 IS NOT NULL AND b.b1 IS DISTINCT FROM a.b1
        |          AND b.b1 IS DISTINCT FROM a.b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN b.b2 IS NOT NULL AND b.b2 IS DISTINCT FROM a.b1
        |          AND b.b2 IS DISTINCT FROM a.b2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS dist
        |FROM fl a JOIN fl b ON a.g = b.g AND a.doc_id < b.doc_id
        |WHERE dist <= 8
        |ORDER BY doc_a, doc_b""".stripMargin),

    // streaming incremental corpus dedup: the src19 batch PLUS a
    // planted batch of re-scraped corpus duplicates (corpus slice
    // re-keyed to fresh ids, byte-identical text) arrive as a STREAM
    // against the static src0-18 corpus — broadcast Bloom prefilter
    // per micro-batch, exact stream-static anti-join on the maybe
    // slice only. Every planted duplicate must be swallowed, every
    // original must pass; equals batch incrementalNew over the same
    // backlog (see Streaming.streamIncrementalDedup)
    Q.df("x154_stream_incremental_dedup",
      (s, dir) => Streaming.streamIncrementalDedup(s, dir),
      """WITH nw AS (
        |  SELECT doc_id, text FROM documents WHERE source = 'src19'
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE source <> 'src19' AND doc_id % 10 = 4)
        |SELECT n.doc_id FROM nw n
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents o
        |  WHERE o.source <> 'src19'
        |    AND md5(trim(regexp_replace(lower(o.text), '\s+', ' ', 'g'))) =
        |        md5(trim(regexp_replace(lower(n.text), '\s+', ' ', 'g'))))
        |ORDER BY n.doc_id""".stripMargin),

    // split-and-carry sequence packing (window 64 < the longest doc,
    // so documents genuinely overflow): one row per (document, pack)
    // segment; every pack fills to exactly 64 tokens except each
    // bucket's last, every token lands in exactly one segment (see
    // Pack.packSegments; ExtSpec stitches the segments back together)
    Q.df("x155_pack_segments",
      (s, dir) => Pack.packSegments(Tables.load(s, dir, "documents"), 64),
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(instr('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
        |      AS bucket
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, bucket, n_tok,
        |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |), p AS (
        |  SELECT doc_id, bucket, n_tok,
        |    CAST(cum - n_tok AS BIGINT) AS off
        |  FROM c
        |), seg AS (
        |  SELECT bucket, doc_id, n_tok, off,
        |    unnest(generate_series(off // 64, (off + n_tok - 1) // 64))
        |      AS pack_id
        |  FROM p
        |)
        |SELECT bucket, pack_id, doc_id,
        |  pack_id - off // 64 + 1 AS seg_no,
        |  greatest(off, pack_id * 64) - off AS seg_off,
        |  least(off + n_tok, (pack_id + 1) * 64)
        |    - greatest(off, pack_id * 64) AS seg_len
        |FROM seg
        |ORDER BY bucket, pack_id, doc_id, seg_no""".stripMargin),

    // perceptual near-dup KEEPER: the x152 dHash pair graph fed through
    // the judged connected-components machinery (x66/x71), labeling
    // every image with its cluster representative — the "keep one per
    // perceptual group" step of multimodal curation. Because x152's
    // recall is provably exact (every within-group pair found, none
    // across groups), each planted texture group is one complete
    // component and the CC labels must equal the per-group minimum —
    // which the oracle states directly from the construction formula
    Q.df("x157_image_neardup_keeper",
      (s, dir) => {
        val sub = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 10 < 2)
        val pairs = Multimodal.imageNearDup(sub, 8)
          .select(col("doc_a").as("d1"), col("doc_b").as("d2"))
        Dedup.clusters(sub, pairs).orderBy("doc_id")
      },
      """WITH img AS (
        |  SELECT doc_id, doc_id % 8 AS g
        |  FROM documents WHERE doc_id % 10 < 2)
        |SELECT doc_id, min(doc_id) OVER (PARTITION BY g) AS cluster_id
        |FROM img ORDER BY doc_id""".stripMargin),

    // stupid-backoff trigram LM scoring (Brants et al. 2007), held
    // out: model trained on src0-18 only, src19 scored — unseen
    // trigrams genuinely take the backoff branch (the judged `hits`
    // column pins the branch mix); whole-centibit integer scoring,
    // ln-free like x151 (see LmQuality.stupidBackoffScore)
    Q.df("x156_lm_stupid_backoff",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        LmQuality.stupidBackoffScore(
          docs.where(col("source") =!= "src19"),
          docs.where(col("source") === "src19"))
      },
      s"""WITH $duckTok,
         |tr3 AS (
         |  SELECT a.doc_id, a.w AS w1, b.w AS w2, c.w AS w3
         |  FROM tok a
         |  JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
         |  JOIN documents d ON d.doc_id = a.doc_id AND d.source <> 'src19'),
         |sc3 AS (
         |  SELECT a.doc_id, a.w AS w1, b.w AS w2, c.w AS w3
         |  FROM tok a
         |  JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
         |  JOIN documents d ON d.doc_id = a.doc_id AND d.source = 'src19'),
         |tb AS (
         |  SELECT a.doc_id, a.w AS w1, b.w AS w2
         |  FROM tok a
         |  JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  JOIN documents d ON d.doc_id = a.doc_id AND d.source <> 'src19'),
         |c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tr3 GROUP BY 1, 2, 3),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM tr3 GROUP BY 1, 2),
         |cb AS (SELECT w1, w2, count(*) AS cb FROM tb GROUP BY 1, 2),
         |pc AS (SELECT w1, count(*) AS pc FROM tb GROUP BY 1),
         |v AS (SELECT count(DISTINCT t.w) AS v FROM tok t
         |      JOIN documents d ON t.doc_id = d.doc_id
         |      WHERE d.source <> 'src19'),
         |terms AS (
         |  SELECT s.doc_id,
         |    CASE WHEN c3.c3 IS NOT NULL THEN 1 ELSE 0 END AS hit,
         |    CASE WHEN c3.c3 IS NOT NULL
         |      THEN 100 * ((length(bin(c12.c12)) - 1)
         |                - (length(bin(c3.c3)) - 1))
         |      ELSE 132 + 100 * ((length(bin(coalesce(pc.pc, 0) + v.v)) - 1)
         |                      - (length(bin(coalesce(cb.cb, 0) + 1)) - 1))
         |    END AS nb
         |  FROM sc3 s
         |  LEFT JOIN c3 ON s.w1 = c3.w1 AND s.w2 = c3.w2 AND s.w3 = c3.w3
         |  LEFT JOIN c12 ON s.w1 = c12.w1 AND s.w2 = c12.w2
         |  LEFT JOIN cb ON s.w2 = cb.w1 AND s.w3 = cb.w2
         |  LEFT JOIN pc ON s.w2 = pc.w1, v),
         |sco AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
         |    CAST(sum(hit) AS BIGINT) AS hits,
         |    CAST(sum(nb) AS BIGINT) AS bits_cb,
         |    CAST(sum(nb) AS BIGINT) // CAST(count(*) AS BIGINT) AS ppl_cb
         |  FROM terms GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(s.n_tri, 0) AS n_tri,
         |  coalesce(s.hits, 0) AS hits,
         |  coalesce(s.bits_cb, 0) AS bits_cb,
         |  coalesce(s.ppl_cb, -1) AS ppl_cb
         |FROM documents d LEFT JOIN sco s ON d.doc_id = s.doc_id
         |WHERE d.source = 'src19'
         |ORDER BY d.doc_id""".stripMargin),

    // perceptual AUDIO near-dup: REAL energy-difference fingerprint
    // over decoded 16-bit PCM samples (65 frame averages -> 64-bit
    // sketch), 8x8-bit hamming bands, exact bit_count verify — the
    // audio twin of x152 (narrower bands because a doc's two flipped
    // comparisons are adjacent bits that may straddle one boundary;
    // 8 bands always leave a clean one, so recall is exact). Oracle =
    // the construction-formula twin, never reading a sample (see
    // Multimodal.audioNearDup)
    Q.df("x158_audio_near_dup",
      (s, dir) => Multimodal.audioNearDup(
        Tables.load(s, dir, "documents").where(col("doc_id") % 10 < 2), 8),
      """WITH img AS (
        |  SELECT doc_id, doc_id % 8 AS g, (doc_id * 3) % 65 AS nf
        |  FROM documents WHERE doc_id % 10 < 2),
        |cells0 AS (
        |  SELECT gs.g, ff.f,
        |    CAST((CAST(gs.g * 1000 + 100 + ff.f AS HUGEINT)
        |      * 2654435761) % 4294967296 AS BIGINT) AS x
        |  FROM generate_series(0, 7) gs(g)
        |  CROSS JOIN generate_series(0, 64) ff(f)),
        |cells AS (
        |  SELECT g, f,
        |    CAST((CAST(xor(x, x >> 16) AS HUGEINT) * 2654435761) % 4294967296
        |      AS BIGINT) >> 24 AS v
        |  FROM cells0),
        |fl AS (
        |  SELECT i.doc_id, i.g,
        |    CASE WHEN i.nf >= 1 AND ((l.v < (c.v + 128) % 256) <> (l.v < c.v))
        |         THEN i.nf - 1 END AS b1,
        |    CASE WHEN i.nf <= 63 AND (((c.v + 128) % 256 < r.v) <> (c.v < r.v))
        |         THEN i.nf END AS b2
        |  FROM img i
        |  JOIN cells c ON c.g = i.g AND c.f = i.nf
        |  LEFT JOIN cells l ON l.g = i.g AND l.f = i.nf - 1
        |  LEFT JOIN cells r ON r.g = i.g AND r.f = i.nf + 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(
        |    (CASE WHEN a.b1 IS NOT NULL AND a.b1 IS DISTINCT FROM b.b1
        |          AND a.b1 IS DISTINCT FROM b.b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.b2 IS NOT NULL AND a.b2 IS DISTINCT FROM b.b1
        |          AND a.b2 IS DISTINCT FROM b.b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN b.b1 IS NOT NULL AND b.b1 IS DISTINCT FROM a.b1
        |          AND b.b1 IS DISTINCT FROM a.b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN b.b2 IS NOT NULL AND b.b2 IS DISTINCT FROM a.b1
        |          AND b.b2 IS DISTINCT FROM a.b2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS dist
        |FROM fl a JOIN fl b ON a.g = b.g AND a.doc_id < b.doc_id
        |WHERE dist <= 8
        |ORDER BY doc_a, doc_b""".stripMargin),

    // quality-aware near-dup keeper: keep the LONGEST document of each
    // cluster (ties: smallest id) instead of x71's first-crawled —
    // what real curation keeps; min_by bounded argmax over the labels,
    // no window over documents (see Dedup.keepBestInClusters)
    Q.df("x165_dedup_keep_best",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.keepBestInClusters(docs,
          Dedup.jaccardPairs(docs, 0.2, maxDocFreq = Some(2)))
      },
      s"""WITH RECURSIVE $duckTok, ${duckShinglesFiltered(2)}, $duckJaccardTail,
         |pairs AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
         |), edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION SELECT d2, d1 FROM pairs
         |), reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
         |), lab AS (
         |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
         |), m AS (
         |  SELECT l.cluster_id, d.doc_id, d.n_chars,
         |    row_number() OVER (PARTITION BY l.cluster_id
         |      ORDER BY d.n_chars DESC, d.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY l.cluster_id) AS n_members
         |  FROM lab l JOIN documents d ON l.doc_id = d.doc_id)
         |SELECT cluster_id, doc_id AS keep_id, n_chars AS keep_chars,
         |  CAST(n_members AS BIGINT) AS n_members
         |FROM m WHERE rn = 1 ORDER BY cluster_id""".stripMargin),

    // reproducible per-epoch shuffle order: epoch e ranks rows by
    // md5(e:key) — a pure function of (epoch, row), regenerable for
    // any shard on any cluster; materialized via range-partitioned
    // sort + zipWithIndex (the x132 shape), never a per-epoch
    // SinglePartition window (see Sampling.epochShuffle)
    Q.df("x164_epoch_shuffle",
      (s, dir) => Sampling.epochShuffle(
        Tables.load(s, dir, "documents"), "doc_id", 3),
      """WITH e AS (
        |  SELECT doc_id, ep.epoch
        |  FROM documents, (VALUES (0), (1), (2)) AS ep(epoch)),
        |h AS (
        |  SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
        |    md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM e)
        |SELECT epoch, doc_id,
        |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) - 1
        |    AS BIGINT) AS ord
        |FROM h ORDER BY epoch, ord""".stripMargin),

    // contamination PROVENANCE: per contaminated eval doc, WHICH train
    // document to delete — argmax train doc by shared rare shingles
    // (train-df <= 2 candidate generation, the sub-quadratic x77
    // contract; min_by argmax, no window over pair counts)
    Q.df("x163_contamination_provenance",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.contaminationProvenance(
          docs.where(col("source") === "src19"),
          docs.where(col("source") =!= "src19"))
      },
      s"""WITH $duckTok,
         |sh AS (
         |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
         |she AS (SELECT s.* FROM sh s JOIN documents d USING (doc_id)
         |        WHERE d.source = 'src19'),
         |sht AS (SELECT s.* FROM sh s JOIN documents d USING (doc_id)
         |        WHERE d.source <> 'src19'),
         |rare AS (SELECT shingle FROM sht GROUP BY shingle
         |         HAVING count(*) <= 2),
         |p AS (
         |  SELECT e.doc_id, t.doc_id AS src_doc, count(*) AS shared
         |  FROM she e
         |  JOIN (SELECT s.* FROM sht s JOIN rare USING (shingle)) t
         |    USING (shingle)
         |  GROUP BY 1, 2)
         |SELECT doc_id, src_doc, CAST(shared AS BIGINT) AS shared
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY shared DESC, src_doc) AS rn FROM p)
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin),

    // token-budget temperature mixing: sqrt-share targets in TOKENS
    // (what a pretraining mix actually allocates), filled greedily in
    // content-hash order with the running-sum-at-start admission rule
    // — deterministic, engine-exact (see Sampling.tokenBudgetMix)
    Q.df("x162_token_budget_mix",
      (s, dir) => Sampling.tokenBudgetMix(
        Tables.load(s, dir, "documents"), "source", "doc_id", "text", 10000L),
      """WITH c AS (SELECT source, count(*) AS n_raw
        |           FROM documents GROUP BY source),
        |w AS (SELECT source, CAST(floor(sqrt(n_raw)) AS BIGINT) AS w FROM c),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS w_tot FROM w),
        |g AS (SELECT source, (10000 * w) // w_tot AS target_tok FROM w, t),
        |r AS (SELECT source, doc_id,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |        md5(CAST(doc_id AS VARCHAR)) AS h
        |      FROM documents),
        |s AS (SELECT source, doc_id, n_tok,
        |        CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum
        |      FROM r)
        |SELECT s.source, s.doc_id, s.n_tok
        |FROM s JOIN g USING (source)
        |WHERE s.cum - s.n_tok < g.target_tok
        |ORDER BY s.source, s.doc_id""".stripMargin),

    // declarative session windows as a STREAM: session_window's
    // merging state (sessions coalesce when a bridging event arrives)
    // on the events backlog — the built-in spelling of x68's custom
    // state; equals the batch session_window agg, oracle = the
    // lag/running-sum session derivation (same as x65)
    Q.df("x161_stream_session_window",
      (s, dir) => Streaming.sessionWindowStream(s, dir),
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sessions AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked
        |)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS event_cnt
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin),

    // streaming CURATED ingest: the x154 live front door with the
    // C4-style quality gate composed in-row BEFORE the Bloom dedup —
    // completely stateless per batch (array lambdas, no streaming agg,
    // no watermark); equals the batch quality-gate -> incrementalNew
    // composition over the same backlog (see
    // Streaming.streamCuratedIngest)
    Q.df("x160_stream_curated_ingest",
      (s, dir) => Streaming.streamCuratedIngest(s, dir),
      """WITH nw AS (
        |  SELECT doc_id, text FROM documents WHERE source = 'src19'
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE source <> 'src19' AND doc_id % 10 = 4),
        |q AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |    FROM nw) x
        |  WHERE len(t) >= 20
        |    AND CAST(floor(10000.0 * len(list_filter(t,
        |          w -> w IN ('the','a','of','and','to','in'))) / len(t))
        |        AS BIGINT) >= 100
        |    AND CAST(floor(10000.0 * list_sum(list_transform(t,
        |          w -> length(w))) / len(t)) AS BIGINT)
        |        BETWEEN 30000 AND 80000)
        |SELECT n.doc_id FROM nw n JOIN q USING (doc_id)
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents o
        |  WHERE o.source <> 'src19'
        |    AND md5(trim(regexp_replace(lower(o.text), '\s+', ' ', 'g'))) =
        |        md5(trim(regexp_replace(lower(n.text), '\s+', ' ', 'g'))))
        |ORDER BY n.doc_id""".stripMargin),

    // the curation pipeline WITH the LM perplexity stage, judged as
    // ONE DAG end-to-end: quality gate -> x151 LM gate (bigram model
    // trained on the stage-1 survivors themselves, perplexity tail
    // dropped) -> exact dedup -> near-dup keeper -> decontamination ->
    // packing. The oracle is the x123 composition with the LM stage's
    // CTEs spliced in after base1 — catching any drift between the
    // judged standalone gate and its in-pipeline composition
    Q.df("x159_curation_lm_pipeline",
      (s, dir) => Curation.curate(Tables.load(s, dir, "documents"), 256,
        lmGate = true),
      """WITH RECURSIVE
        |tok0 AS MATERIALIZED (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
        |         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
        |  FROM documents
        |),
        |st AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n_tok,
        |    CAST(floor(10000.0 * sum(CASE WHEN w IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS stop_x10k,
        |    CAST(floor(10000.0 * sum(length(w)) / count(*)) AS BIGINT) AS avglen_x10k
        |  FROM tok0 GROUP BY doc_id
        |),
        |q AS (
        |  SELECT doc_id FROM st
        |  WHERE n_tok >= 20 AND stop_x10k >= 100
        |    AND avglen_x10k BETWEEN 30000 AND 80000
        |),
        |base1 AS MATERIALIZED (
        |  SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)
        |  WHERE d.source <> 'src19'
        |),
        |tokb1 AS MATERIALIZED (SELECT t.* FROM tok0 t JOIN base1 USING (doc_id)),
        |lmbig AS MATERIALIZED (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM tokb1 a JOIN tokb1 b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |),
        |lmbc AS MATERIALIZED (SELECT w1, w2, count(*) AS c2 FROM lmbig GROUP BY w1, w2),
        |lmpc AS MATERIALIZED (SELECT w1, count(*) AS c1 FROM lmbig GROUP BY w1),
        |lmv AS (SELECT count(DISTINCT w) AS v FROM tokb1),
        |lmterms AS (
        |  SELECT g.doc_id,
        |    (length(bin(p.c1 + v.v)) - 1) - (length(bin(b.c2 + 1)) - 1) AS nb
        |  FROM lmbig g JOIN lmbc b ON g.w1 = b.w1 AND g.w2 = b.w2
        |               JOIN lmpc p ON g.w1 = p.w1, lmv v
        |),
        |lmsc AS MATERIALIZED (
        |  SELECT doc_id,
        |    (100 * CAST(sum(nb) AS BIGINT)) // CAST(count(*) AS BIGINT) AS ppl
        |  FROM lmterms GROUP BY doc_id
        |),
        |lmn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lmsc),
        |lmh AS (SELECT ppl, count(*) AS c FROM lmsc GROUP BY ppl),
        |lmcum AS (SELECT ppl, CAST(sum(c) OVER (ORDER BY ppl) AS BIGINT) AS cum
        |          FROM lmh),
        |lmthr AS (SELECT min(CASE WHEN cum >= (2 * n + 2) // 3 THEN ppl END)
        |            AS t2 FROM lmcum, lmn),
        |base1b AS MATERIALIZED (
        |  SELECT b.* FROM base1 b JOIN lmsc s ON b.doc_id = s.doc_id, lmthr t
        |  WHERE s.ppl <= t.t2
        |),
        |ex AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM (SELECT doc_id,
        |          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |        FROM base1b)
        |  GROUP BY fp
        |),
        |base2 AS MATERIALIZED (SELECT b.* FROM base1b b JOIN ex USING (doc_id)),
        |tok AS MATERIALIZED (SELECT t.* FROM tok0 t JOIN base2 USING (doc_id)),
        |sh0 AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
        |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        |),
        |keep AS MATERIALIZED (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 2),
        |sh AS MATERIALIZED (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
        |sz AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS MATERIALIZED (
        |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS i
        |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |),
        |pairs AS MATERIALIZED (
        |  SELECT d1, d2 FROM inter
        |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
        |),
        |edges AS MATERIALIZED (
        |  SELECT d1 AS src, d2 AS dst FROM pairs
        |  UNION SELECT d2, d1 FROM pairs
        |),
        |reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM base2
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
        |),
        |labels AS MATERIALIZED (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
        |base3 AS MATERIALIZED (
        |  SELECT b.* FROM base2 b JOIN labels c ON b.doc_id = c.doc_id
        |  WHERE b.doc_id = c.cluster_id
        |),
        |nib AS MATERIALIZED (
        |  SELECT doc_id, j, instr('0123456789abcdef', substr(md5(w), j, 1)) - 1 AS v
        |  FROM tok0, range(1, 5) r(j)
        |),
        |bits AS MATERIALIZED (
        |  SELECT doc_id, (j - 1) * 4 + b.b AS pos,
        |    sum(CASE WHEN (v & b.mask) > 0 THEN 1 ELSE -1 END) AS s
        |  FROM nib, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) AS b(b, mask)
        |  GROUP BY doc_id, (j - 1) * 4 + b.b
        |),
        |sk AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s >= 0 THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id
        |),
        |base4 AS MATERIALIZED (
        |  SELECT b3.* FROM base3 b3
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM sk n JOIN sk o ON n.simhash = o.simhash
        |    JOIN documents dd ON o.doc_id = dd.doc_id
        |    WHERE n.doc_id = b3.doc_id AND dd.source = 'src19')
        |),
        |t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(instr('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
        |      AS bucket
        |  FROM base4
        |),
        |c AS (
        |  SELECT doc_id, bucket, n_tok,
        |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |),
        |p AS (
        |  SELECT doc_id, bucket, n_tok,
        |    CAST(floor((cum - n_tok) / 256.0) AS BIGINT) AS pack_id
        |  FROM c
        |)
        |SELECT bucket, pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tok,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY bucket, pack_id
        |ORDER BY bucket, pack_id""".stripMargin),

    // distributed BPE merge learning — tokenizer training: after ONE
    // corpus-scale word-frequency agg, each of the 8 merge rounds runs
    // on the vocabulary only (pair count + 1-row argmax collect +
    // codegen'd re-segmentation fold). Oracle: the same rounds unrolled
    // as materialized CTEs with list_reduce as the merge fold.
    Q.df("x166_bpe_merges",
      (s, dir) => Bpe.learnMerges(Tables.load(s, dir, "documents"), "text", 8),
      Bpe.oracleSql(8)),

    // leakage-safe train/valid/test split: the hash-split rule applied
    // to the near-dup CLUSTER id instead of the document id — every
    // cluster member inherits one split, so a training document's near
    // duplicates can never contaminate valid/test. Oracle: the x66
    // recursive-CTE clustering + the same md5 bucket rule.
    Q.df("x167_cluster_safe_split",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Sampling.clusterSafeSplit(
          Dedup.clusters(docs,
            Dedup.jaccardPairs(docs, 0.2, maxDocFreq = Some(2))), "doc_id")
      },
      s"""WITH RECURSIVE $duckTok, ${duckShinglesFiltered(2)}, $duckJaccardTail,
         |pairs AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
         |), edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION SELECT d2, d1 FROM pairs
         |), reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
         |), lab AS (
         |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
         |)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'cc'
         |         THEN 'train'
         |       WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'e6'
         |         THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM lab ORDER BY doc_id""".stripMargin),

    // Borda rank fusion of three incommensurable quality signals
    // (length, type-token ratio, digit density) — integer ranks summed,
    // no invented scale factors; each global rank is a range-partitioned
    // sort + zipWithIndex (x132 shape), never a SinglePartition window
    Q.df("x168_rank_fusion",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sig = docs.select(col("doc_id"), col("n_chars"),
            expr("size(array_distinct(regexp_extract_all(lower(text), " +
              "'[a-z0-9]+', 0)))").as("dt"),
            expr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))")
              .as("nt"),
            length(regexp_replace(col("text"), "[^0-9]", "")).as("dg"))
          .select(col("doc_id"), col("n_chars"),
            coalesce(expr("CAST(floor(10000.0 * dt / nt) AS BIGINT)"),
              lit(0L)).as("ttr_x10k"),
            expr("CAST(floor(10000.0 * dg / n_chars) AS BIGINT)")
              .as("digit_x10k"))
        TextStats.rankFusion(sig, "doc_id", Seq(
          ("n_chars", true), ("ttr_x10k", true), ("digit_x10k", false)))
      },
      s"""WITH $duckTok, agg AS (
         |  SELECT doc_id, count(*) AS nt, count(DISTINCT w) AS dt
         |  FROM tok GROUP BY 1
         |), sig AS (
         |  SELECT d.doc_id,
         |    d.n_chars,
         |    coalesce(CAST(floor(10000.0 * a.dt / a.nt) AS BIGINT), 0)
         |      AS ttr_x10k,
         |    CAST(floor(10000.0 *
         |      len(regexp_replace(d.text, '[^0-9]', '', 'g')) / d.n_chars)
         |      AS BIGINT) AS digit_x10k
         |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |), r AS (
         |  SELECT doc_id,
         |    row_number() OVER (ORDER BY n_chars DESC, doc_id)
         |      AS rank_n_chars,
         |    row_number() OVER (ORDER BY ttr_x10k DESC, doc_id)
         |      AS rank_ttr_x10k,
         |    row_number() OVER (ORDER BY digit_x10k ASC, doc_id)
         |      AS rank_digit_x10k
         |  FROM sig)
         |SELECT doc_id, rank_n_chars, rank_ttr_x10k, rank_digit_x10k,
         |  rank_n_chars + rank_ttr_x10k + rank_digit_x10k AS borda
         |FROM r ORDER BY doc_id""".stripMargin),

    // link-graph quality prior: integer-exact PageRank (damping 0.85,
    // 5 rounds, scaled-BIGINT truncating division — bit-identical
    // across partitionings and engines) on the symmetrized
    // customer-supplier graph. Oracle: the same rounds unrolled as
    // materialized CTEs.
    Q.df("x169_graph_pagerank",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        // checkpoint BEFORE mirroring: the union references the
        // expensive join+distinct subtree twice (same trap
        // Dedup.clusters guards against)
        val cs = graft.ext.CacheRegistry.checkpoint(
          li.join(ord, li("l_orderkey") === ord("o_orderkey"))
            .select(concat(lit("c"), col("o_custkey")).as("src"),
              concat(lit("s"), col("l_suppkey")).as("dst")).distinct())
        Graph.pageRank(
          cs.union(cs.select(col("dst").as("src"), col("src").as("dst"))), 5,
          allNodesReceive = true) // symmetric: every node receives
      },
      {
        val iters = 5
        val head =
          """WITH e0 AS MATERIALIZED (
            |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
            |                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
            |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            |), edges AS MATERIALIZED (
            |  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
            |), deg AS MATERIALIZED (
            |  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
            |  FROM edges GROUP BY 1
            |), nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
            |s0 AS MATERIALIZED (
            |  SELECT node,
            |    CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS score
            |  FROM deg)""".stripMargin
        val rounds = (0 until iters).map { i =>
          s""",
             |s${i + 1} AS MATERIALIZED (
             |  SELECT d.node,
             |    CAST((1000000000000 // (SELECT n FROM nn)) * 15 // 100
             |      + 85 * coalesce(c.c, 0) // 100 AS BIGINT) AS score
             |  FROM deg d LEFT JOIN (
             |    SELECT e.dst AS node, CAST(sum(s.score // g.deg) AS BIGINT) AS c
             |    FROM edges e JOIN s$i s ON e.src = s.node
             |    JOIN deg g ON g.node = e.src
             |    GROUP BY 1) c ON c.node = d.node)""".stripMargin
        }.mkString
        s"$head$rounds\nSELECT node, score FROM s$iters ORDER BY node"
      }),

    // streaming CDC apply — the live twin of x153: the classified
    // changeset arrives as micro-batches, foreachBatch journals every
    // change (tombstones included) with its batch id, and serve-time
    // compaction + one keyed full-outer apply reconstructs the new
    // snapshot. Oracle: the actual v2.
    Q.df("x170_stream_cdc_apply",
      (s, dir) => Streaming.streamCdcApply(s, dir),
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

    // DSIR-style importance selection: per-token whole-bit log ratio
    // of add-one unigram models (target slice vs raw pool), top
    // quartile kept via the integer histogram threshold — make the
    // corpus look like the target domain, engine-exact (x151 family)
    Q.df("x171_importance_select",
      (s, dir) => LmQuality.importanceSelect(
        Tables.load(s, dir, "documents"),
        col("source").isin("src0", "src1", "src2")),
      """WITH tok AS (
        |  SELECT doc_id, source IN ('src0', 'src1', 'src2') AS is_t,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents),
        |cr AS (SELECT w, count(*) AS cr FROM tok GROUP BY 1),
        |ct AS (SELECT w, count(*) AS ct FROM tok WHERE is_t GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nr,
        |          CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |          CAST(count(DISTINCT w) AS BIGINT) AS v FROM tok),
        |terms AS (
        |  SELECT t.doc_id,
        |    (length(bin(coalesce(c2.ct, 0) + 1)) - 1)
        |      + (length(bin(tt.nr + tt.v)) - 1)
        |      - (length(bin(c1.cr + 1)) - 1)
        |      - (length(bin(tt.nt + tt.v)) - 1) AS nb
        |  FROM tok t JOIN cr c1 ON t.w = c1.w
        |  LEFT JOIN ct c2 ON t.w = c2.w, tot tt),
        |scored AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |    CAST(sum(nb) AS BIGINT) AS wbits,
        |    (100 * CAST(sum(nb) AS BIGINT)) // CAST(count(*) AS BIGINT)
        |      AS wpt_cb
        |  FROM terms GROUP BY doc_id),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
        |hist AS (SELECT wpt_cb, count(*) AS c FROM scored GROUP BY 1),
        |cum AS (SELECT wpt_cb,
        |          CAST(sum(c) OVER (ORDER BY wpt_cb DESC) AS BIGINT) AS cum
        |        FROM hist),
        |thr AS (SELECT max(CASE WHEN cum >= (n + 3) // 4 THEN wpt_cb END)
        |          AS t FROM cum, n)
        |SELECT d.doc_id, coalesce(s.n_tok, 0) AS n_tok,
        |  coalesce(s.wbits, 0) AS wbits, s.wpt_cb AS wpt_cb,
        |  (s.wpt_cb IS NOT NULL AND s.wpt_cb >= t.t) AS keep
        |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id, thr t
        |ORDER BY d.doc_id""".stripMargin),

    // BPE ENCODE composed with x166's training: learn the 8 merges,
    // then tokenize the corpus with them (per-vocab-word codegen
    // folds + one token join + per-doc sum). The oracle re-derives
    // the merges AND the encoding, so a bug in either half fails.
    Q.df("x172_bpe_encode",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val merges = Bpe.learnMerges(docs, "text", 8).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        Bpe.encodePieces(docs, "text", merges)
      },
      Bpe.encodeOracleSql(8)),

    // greedy k-center diversity selection: each pick maximizes its
    // exact quantized-cosine distance to the selected set — the
    // coreset primitive, incremental (corpus x 1 per round) with one
    // bounded collect per pick. Oracle: the same greedy rounds
    // unrolled as materialized CTEs.
    Q.df("x173_kcenter_select",
      (s, dir) => Similarity.kCenterSelect(
        Tables.load(s, dir, "embeddings"), 8),
      {
        val k = 8
        def dnew(tag: String, centerSel: String): String =
          s"""d$tag AS MATERIALIZED (
             |  SELECT x.vec_id,
             |    10000 - CAST(floor(10000.0 * x.dq /
             |      sqrt(CAST(n1.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)))
             |      AS BIGINT) AS d
             |  FROM (SELECT a.vec_id, CAST(sum(a.qv * b.qv) AS BIGINT) AS dq
             |        FROM q a JOIN q b ON a.pos = b.pos
             |          AND b.vec_id = ($centerSel)
             |        GROUP BY 1) x
             |  JOIN n2 n1 ON n1.vec_id = x.vec_id
             |  CROSS JOIN (SELECT n2 FROM n2
             |              WHERE vec_id = ($centerSel)) nc)""".stripMargin
        val head =
          s"""WITH q AS MATERIALIZED (
             |  SELECT vec_id, i AS pos,
             |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
             |      AS qv
             |  FROM embeddings, range(1, 65) r(i)
             |), n2 AS MATERIALIZED (
             |  SELECT vec_id, CAST(sum(qv * qv) AS BIGINT) AS n2
             |  FROM q GROUP BY 1
             |), c1 AS MATERIALIZED (SELECT min(vec_id) AS vec_id FROM embeddings),
             |sel1 AS MATERIALIZED (SELECT vec_id FROM c1),
             |${dnew("1", "SELECT vec_id FROM c1")},
             |m1 AS MATERIALIZED (SELECT vec_id, d FROM d1)""".stripMargin
        val rounds = (2 to k).map { i =>
          val upd = if (i < k)
            s""",
               |${dnew(i.toString, s"SELECT vec_id FROM b$i")},
               |m$i AS MATERIALIZED (
               |  SELECT m.vec_id, least(m.d, dn.d) AS d
               |  FROM m${i - 1} m JOIN d$i dn USING (vec_id))""".stripMargin
          else ""
          s""",
             |b$i AS MATERIALIZED (
             |  SELECT vec_id, d FROM m${i - 1}
             |  WHERE vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
             |  ORDER BY d DESC, vec_id LIMIT 1),
             |sel$i AS MATERIALIZED (
             |  SELECT vec_id FROM sel${i - 1}
             |  UNION ALL SELECT vec_id FROM b$i)$upd""".stripMargin
        }.mkString
        val branches = (s"SELECT 1 AS sel_rank, vec_id," +
          s" CAST(-1 AS BIGINT) AS dist_x10k FROM c1") +:
          (2 to k).map(i => s"SELECT $i, vec_id, d FROM b$i")
        s"$head$rounds\nSELECT * FROM (${branches.mkString(" UNION ALL ")}) " +
          "ORDER BY sel_rank"
      }),

    // cross-source overlap matrix: the near-dup pair list rolled up to
    // an unordered source x source count — which sources re-publish
    // each other; diagonal = within-source duplication. A free
    // by-product of the dedup run's own candidate pairs.
    Q.df("x174_source_overlap",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.sourceOverlap(docs,
          Dedup.jaccardPairs(docs, 0.2, maxDocFreq = Some(2)))
      },
      s"""WITH $duckTok, ${duckShinglesFiltered(2)}, $duckJaccardTail,
         |pairs AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
         |), lab AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS source_a,
         |  greatest(a.source, b.source) AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pairs p JOIN lab a ON p.d1 = a.doc_id
         |             JOIN lab b ON p.d2 = b.doc_id
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin),

    // matched-control selection: for each eval-slice document, the
    // nearest-length corpus document within its language — ablation
    // control sets without a self-join (two IGNORE-NULLS running-last
    // windows per stratum), deterministic tie-break toward the
    // predecessor in the (covariate, doc_id) total order
    Q.df("x175_matched_controls",
      (s, dir) => Sampling.matchedControls(
        Tables.load(s, dir, "documents"),
        col("source") === "src19", "n_chars", "lang"),
      """WITH lab AS (
        |  SELECT lang, doc_id, n_chars, source = 'src19' AS is_t
        |  FROM documents
        |), wnd AS (
        |  SELECT lang, doc_id, n_chars, is_t,
        |    last_value(CASE WHEN NOT is_t
        |        THEN struct_pack(cv := n_chars, id := doc_id) END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY lang ORDER BY n_chars, doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS bef,
        |    last_value(CASE WHEN NOT is_t
        |        THEN struct_pack(cv := n_chars, id := doc_id) END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS aft
        |  FROM lab
        |)
        |SELECT lang, doc_id AS target_id, n_chars AS target_cv,
        |  CASE WHEN aft IS NULL OR (bef IS NOT NULL
        |            AND abs(bef.cv - n_chars) <= abs(aft.cv - n_chars))
        |       THEN bef.id ELSE aft.id END AS control_id,
        |  CASE WHEN aft IS NULL OR (bef IS NOT NULL
        |            AND abs(bef.cv - n_chars) <= abs(aft.cv - n_chars))
        |       THEN bef.cv ELSE aft.cv END AS control_cv
        |FROM wnd WHERE is_t ORDER BY lang, target_id""".stripMargin),

    // vocabulary growth curve (Heaps-law diagnostic): new distinct
    // word TRIGRAMS per 50-doc bucket of crawl order + running total —
    // the corpus-diversity audit (unigram vocabularies saturate in the
    // first bucket); one keyed first-occurrence agg, the only window
    // runs over the tiny bucket list
    Q.df("x176_vocab_growth",
      (s, dir) => TextStats.vocabGrowth(
        Tables.load(s, dir, "documents"), 50L, n = 3),
      s"""WITH $duckTok,
         |g AS (
         |  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS w
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
         |first AS (SELECT w, min(doc_id) AS first_doc FROM g GROUP BY 1),
         |buckets AS (
         |  SELECT first_doc // 50 AS bucket,
         |    CAST(count(*) AS BIGINT) AS new_tokens
         |  FROM first GROUP BY 1)
         |SELECT bucket, bucket * 50 AS first_doc,
         |  bucket * 50 + 49 AS last_doc, new_tokens,
         |  CAST(sum(new_tokens) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens
         |FROM buckets ORDER BY bucket""".stripMargin),

    // exact-budget proportional mix: largest-remainder apportionment
    // makes per-source quotas sum EXACTLY to the budget (independent
    // rounding drifts by one per stratum); selection by smallest
    // content hash — deterministic, growth-stable; apportionment
    // windows run over the per-source count table only
    Q.df("x177_quota_mix",
      (s, dir) => Sampling.quotaMix(
        Tables.load(s, dir, "documents"), "source", "doc_id", 100L),
      """WITH counts AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM counts),
        |q0 AS (SELECT source, c, (100 * c) // t AS q0, (100 * c) % t AS rem
        |       FROM counts, tot),
        |spare AS (SELECT CAST(100 - sum(q0) AS BIGINT) AS r FROM q0),
        |quotas AS (
        |  SELECT source,
        |    q0 + (CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
        |                    <= (SELECT r FROM spare)
        |          THEN 1 ELSE 0 END) AS q
        |  FROM q0),
        |sel AS (
        |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT s.source, s.doc_id, s.h
        |FROM sel s JOIN quotas q ON s.source = q.source
        |WHERE s.rn <= q.q ORDER BY s.source, s.doc_id""".stripMargin),

    // distribution-matched resampling: a 100-doc pool sample whose
    // LENGTH DISTRIBUTION matches the eval slice's — exact decile
    // edges (percentile_disc), budget apportioned by target bin
    // shares (largest remainder), smallest-hash fill per bin
    Q.df("x178_distribution_match",
      (s, dir) => Sampling.distributionMatch(
        Tables.load(s, dir, "documents"),
        col("source") === "src19", "n_chars", "doc_id", 100L),
      {
        val qs = (1 until 10).map(i =>
          s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY cv)")
          .mkString(", ")
        s"""WITH lab AS (
           |  SELECT doc_id, n_chars AS cv, source = 'src19' AS is_t
           |  FROM documents),
           |edges AS (SELECT [$qs] AS edges FROM lab WHERE is_t),
           |tb AS (
           |  SELECT l.doc_id,
           |    len(list_filter(e.edges, x -> l.cv > x)) AS bin
           |  FROM lab l, edges e WHERE l.is_t),
           |counts AS (SELECT bin, CAST(count(*) AS BIGINT) AS c
           |           FROM tb GROUP BY 1),
           |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM counts),
           |q0 AS (SELECT bin, (100 * c) // t AS q0, (100 * c) % t AS rem
           |       FROM counts, tot),
           |spare AS (SELECT CAST(100 - sum(q0) AS BIGINT) AS r FROM q0),
           |quotas AS (
           |  SELECT bin,
           |    q0 + (CASE WHEN row_number() OVER (ORDER BY rem DESC, bin)
           |                    <= (SELECT r FROM spare)
           |          THEN 1 ELSE 0 END) AS q
           |  FROM q0),
           |pool AS (
           |  SELECT l.doc_id, l.cv,
           |    len(list_filter(e.edges, x -> l.cv > x)) AS bin,
           |    md5(CAST(l.doc_id AS VARCHAR)) AS h
           |  FROM lab l, edges e WHERE NOT l.is_t),
           |sel AS (
           |  SELECT pool.*, row_number() OVER (PARTITION BY bin
           |    ORDER BY h, doc_id) AS rn FROM pool)
           |SELECT s.bin, s.doc_id, s.cv, s.h
           |FROM sel s JOIN quotas q ON s.bin = q.bin
           |WHERE s.rn <= q.q ORDER BY s.bin, s.doc_id""".stripMargin
      }),

    // fuzzy entity resolution: distinct part names within 2 edits,
    // multi-pass token blocking (names sharing a token are the only
    // candidates) + block purging; levenshtein verified on candidates
    // only — the match runs on the vocabulary-sized distinct-name
    // table, never on records; exact integer distance both engines
    Q.df("x179_fuzzy_entity_match",
      (s, dir) => Entity.fuzzyNameMatch(
        Tables.load(s, dir, "part"), "p_name", maxDist = 2),
      """WITH names AS (
        |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS cnt
        |  FROM part GROUP BY 1),
        |blk AS (
        |  SELECT name, cnt, unnest(string_split(name, ' ')) AS blk
        |  FROM names),
        |keep AS (SELECT blk FROM blk GROUP BY 1 HAVING count(*) <= 1000),
        |pruned AS (SELECT b.* FROM blk b JOIN keep USING (blk)
        |           WHERE b.blk <> ''),
        |cand AS (
        |  SELECT DISTINCT a.name AS name_a, b.name AS name_b,
        |    a.cnt AS cnt_a, b.cnt AS cnt_b
        |  FROM pruned a JOIN pruned b
        |    ON a.blk = b.blk AND a.name < b.name)
        |SELECT name_a, name_b,
        |  CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist,
        |  cnt_a, cnt_b
        |FROM cand WHERE levenshtein(name_a, name_b) <= 2
        |ORDER BY name_a, name_b""".stripMargin),

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

    // calendar densification + LOCF: one row per (user, day) across
    // each user's own span, gap days carry the last observed value
    // forward bit-exactly; per-key generated calendar (no global
    // cross join), equi-join on (key, day), single-row window state
    Q.df("x181_gap_fill",
      (s, dir) => TimeSeries.gapFillLocf(
          Tables.load(s, dir, "events"), "user_id", "ts", "value",
          "event_id")
        // DATE columns render differently in the two compare paths
        // (pandas datetime64 vs datetime.date) — ship the day as text
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd")),
      """WITH daily AS (
        |  SELECT user_id AS k, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    arg_max(value, event_id) AS v
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT k, min(day) AS a, max(day) AS b FROM daily GROUP BY 1),
        |cal AS (
        |  SELECT k, CAST(unnest(generate_series(CAST(a AS TIMESTAMP),
        |    CAST(b AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span WHERE date_diff('day', a, b) < 3700),
        |j AS (
        |  SELECT c.k, c.day, d.v FROM cal c
        |  LEFT JOIN daily d ON c.k = d.k AND c.day = d.day)
        |SELECT k AS user_id, strftime(day, '%Y-%m-%d') AS day,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS value_filled,
        |  CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap
        |FROM j ORDER BY user_id, day""".stripMargin),

    // k-anonymity by local recoding: 3-rung generalization ladder
    // (balance to 100s -> to 1000s -> segment only), each rung counted
    // over the RESIDUAL so every emitted class provably has >= k
    // members; leftovers suppressed with a flag, never dropped
    Q.df("x182_k_anonymity",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val nation = col("c_nationkey").cast("string")
        val seg = col("c_mktsegment")
        def bal(w: Int) =
          (floor(col("c_acctbal") / w).cast("long") * w).cast("string")
        Privacy.kAnonymize(c, "c_custkey",
          Seq("nation", "segment", "balance"),
          Seq(Seq(nation, seg, bal(100)),
            Seq(nation, seg, bal(1000)),
            Seq(lit("*"), seg, lit("*"))), k = 5L)
      },
      """WITH b AS (
        |  SELECT c_custkey AS id,
        |    CAST(c_nationkey AS VARCHAR) AS n, c_mktsegment AS seg,
        |    CAST(CAST(floor(c_acctbal/100) AS BIGINT)*100 AS VARCHAR)
        |      AS b100,
        |    CAST(CAST(floor(c_acctbal/1000) AS BIGINT)*1000 AS VARCHAR)
        |      AS b1000
        |  FROM customer),
        |c0 AS (SELECT n, seg, b100, count(*) AS c FROM b GROUP BY 1,2,3),
        |a0 AS (SELECT b.*, c0.c AS c0 FROM b JOIN c0 USING (n, seg, b100)),
        |r1 AS (SELECT * FROM a0 WHERE c0 < 5),
        |c1 AS (SELECT n, seg, b1000, count(*) AS c FROM r1 GROUP BY 1,2,3),
        |a1 AS (SELECT r1.*, c1.c AS c1 FROM r1
        |       JOIN c1 USING (n, seg, b1000)),
        |r2 AS (SELECT * FROM a1 WHERE c1 < 5),
        |c2 AS (SELECT seg, count(*) AS c FROM r2 GROUP BY 1),
        |a2 AS (SELECT r2.*, c2.c AS c2 FROM r2 JOIN c2 USING (seg)),
        |out AS (
        |  SELECT id, 0 AS level, n AS nation, seg AS segment,
        |    b100 AS balance FROM a0 WHERE c0 >= 5
        |  UNION ALL SELECT id, 1, n, seg, b1000 FROM a1 WHERE c1 >= 5
        |  UNION ALL SELECT id, 2, '*', seg, '*' FROM a2 WHERE c2 >= 5
        |  UNION ALL SELECT id, 3, '*', seg, '*' FROM a2 WHERE c2 < 5)
        |SELECT id, level, nation, segment, balance
        |FROM out ORDER BY id""".stripMargin),

    // community detection: deterministic label propagation (plurality
    // label, ties to the smallest) on the symmetrized customer-supplier
    // co-purchase graph — same per-round checkpoint shape as x169;
    // argmax is one min(struct(-count, label)) agg, no per-node window
    Q.df("x183_label_propagation",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val cs = graft.ext.CacheRegistry.checkpoint(
          li.join(ord, li("l_orderkey") === ord("o_orderkey"))
            .select(concat(lit("c"), col("o_custkey")).as("src"),
              concat(lit("s"), col("l_suppkey")).as("dst")).distinct())
        Graph.labelPropagation(
          cs.union(cs.select(col("dst").as("src"), col("src").as("dst"))), 4)
      },
      {
        val iters = 4
        val head =
          """WITH e0 AS MATERIALIZED (
            |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
            |                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
            |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            |), edges AS MATERIALIZED (
            |  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
            |), l0 AS MATERIALIZED (
            |  SELECT DISTINCT src AS node, src AS lbl FROM edges)""".stripMargin
        val rounds = (0 until iters).map { i =>
          s""",
             |l${i + 1} AS MATERIALIZED (
             |  SELECT dst AS node, lbl FROM (
             |    SELECT e.dst, l.lbl,
             |      row_number() OVER (PARTITION BY e.dst
             |        ORDER BY count(*) DESC, l.lbl) AS rn
             |    FROM edges e JOIN l$i l ON e.src = l.node
             |    GROUP BY e.dst, l.lbl) t
             |  WHERE rn = 1)""".stripMargin
        }.mkString
        head + rounds +
          s"\nSELECT node, lbl AS label FROM l$iters ORDER BY node"
      }),

    // linear multi-touch attribution: purchase cents split EXACTLY
    // (largest-remainder to the most recent touches) across the
    // view/click events of the prior 7 days, then rolled up per touch;
    // conversion-touch pairing is a keyed interval join, split windows
    // are per-conversion (bounded), rollup is one keyed sum
    Q.df("x184_attribution",
      (s, dir) => TimeSeries.linearAttribution(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_id",
        "event_type", "value", "purchase", Seq("view", "click"), 7),
      """WITH t AS (
        |  SELECT user_id AS k, event_id AS tid, ts AS tts
        |  FROM events WHERE event_type IN ('view', 'click')),
        |p AS (
        |  SELECT user_id AS k, event_id AS pid, ts AS pts,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.pid, p.cents, t.tid, t.k, t.tts
        |  FROM p JOIN t ON p.k = t.k
        |    AND t.tts <= p.pts AND t.tts > p.pts - INTERVAL 7 DAY),
        |w AS (
        |  SELECT pid, cents, tid, k,
        |    row_number() OVER (PARTITION BY pid
        |      ORDER BY tts DESC, tid DESC) AS rn,
        |    count(*) OVER (PARTITION BY pid) AS nk
        |  FROM j)
        |SELECT tid AS event_id, k AS user_id,
        |  CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(sum(cents // nk
        |    + CASE WHEN rn <= cents % nk THEN 1 ELSE 0 END) AS BIGINT)
        |    AS attributed_cents
        |FROM w GROUP BY 1, 2 ORDER BY event_id""".stripMargin),

    // asymmetric containment near-dup: flags quote/expansion pairs
    // (small doc inside big doc) that symmetric Jaccard misses; df<=2
    // rare-shingle candidates, both directed containments from one
    // undirected intersection count
    Q.df("x185_containment_dedup",
      (s, dir) => Dedup.containmentPairs(
        Tables.load(s, dir, "documents"), thresholdX10k = 5000L),
      s"""WITH $duckTok, ${duckShinglesFiltered(2)},
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |       FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT x.doc_id AS d1, y.doc_id AS d2,
         |    CAST(count(*) AS BIGINT) AS inter
         |  FROM sh x JOIN sh y
         |    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, inter, s1.n AS n1, s2.n AS n2,
         |  inter * 10000 // s1.n AS cont1_x10k,
         |  inter * 10000 // s2.n AS cont2_x10k
         |FROM inter JOIN sz s1 ON d1 = s1.doc_id
         |           JOIN sz s2 ON d2 = s2.doc_id
         |WHERE inter * 10000 // s1.n >= 5000
         |   OR inter * 10000 // s2.n >= 5000
         |ORDER BY d1, d2""".stripMargin),

    // tokenizer fertility by language: BPE pieces per whitespace word
    // (the tokenizer-equity audit — a tokenizer trained on one
    // language inflates another's sequence lengths), composed on the
    // x166/x172 merge machinery; the oracle re-derives the merges AND
    // the rollup, so drift in either half fails the compare
    Q.df("x186_tokenizer_fertility",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val merges = Bpe.learnMerges(docs, "text", 6).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        Bpe.encodePieces(docs, "text", merges)
          .join(docs.select("doc_id", "lang"), Seq("doc_id"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tok"),
            sum("n_pieces").as("n_pieces"))
          .select(col("lang"), col("n_docs"), col("n_tok"),
            col("n_pieces"),
            expr("n_pieces * 1000000L div n_tok").as("fertility_ppm"))
          .orderBy("lang")
      },
      Bpe.fertilityOracleSql(6)),

    // BM25 query-by-document retrieval: probe doc 7's rare shingles,
    // floor-log2 odds-ratio idf (length(bin(q))-1, exact both
    // engines), saturating-tf rational floor-scaled; candidates only
    // through the inverted index on the broadcast probe terms, top-k
    // via TakeOrderedAndProject
    Q.df("x187_bm25_retrieve",
      (s, dir) => TextStats.bm25DocRetrieve(
        Tables.load(s, dir, "documents"), queryDocId = 7L, k = 20),
      s"""WITH $duckTok,
         |g AS (
         |  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
         |tf AS (SELECT doc_id, s, CAST(count(*) AS BIGINT) AS tf
         |       FROM g GROUP BY 1, 2),
         |tot AS (
         |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS nn,
         |         (SELECT CAST(sum(tf) AS BIGINT) FROM tf) AS tt),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
         |       FROM tf GROUP BY 1),
         |dfv AS (SELECT s, CAST(count(*) AS BIGINT) AS df
         |        FROM tf GROUP BY 1),
         |q AS (
         |  SELECT t.s,
         |    CASE WHEN (2*nn - 2*df + 1) // (2*df + 1) >= 1
         |    THEN length(bin((2*nn - 2*df + 1) // (2*df + 1))) - 1
         |    ELSE 0 END AS idf_bits
         |  FROM tf t JOIN dfv USING (s) CROSS JOIN tot
         |  WHERE t.doc_id = 7 AND df <= 10),
         |h AS (
         |  SELECT f.doc_id, q.idf_bits *
         |    (f.tf * 22 * tt * 1000000
         |     // (10*tt*f.tf + 3*tt + 9*d.dl*nn)) AS ts
         |  FROM tf f JOIN q USING (s)
         |    JOIN dl d ON f.doc_id = d.doc_id CROSS JOIN tot
         |  WHERE f.doc_id <> 7)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST(sum(ts) AS BIGINT) AS score
         |FROM h GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),

    // entity canonicalization: fuzzy-match pairs -> connected
    // components on the DISTINCT-NAME graph (vocabulary-sized, via
    // the same Dedup.clusters frontier loop) -> every RECORD mapped to
    // its cluster's canonical (min) name; the record table is touched
    // only by the final equi-join
    Q.df("x188_entity_canonicalize",
      (s, dir) => {
        val parts = Tables.load(s, dir, "part")
        val pairs = Entity.fuzzyNameMatch(parts, "p_name", maxDist = 2)
          .select(col("name_a").as("d1"), col("name_b").as("d2"))
        val names = parts.select(col("p_name").as("doc_id")).distinct()
        val canon = Dedup.clusters(names, pairs)
        parts.join(canon, parts("p_name") === canon("doc_id"))
          .select(col("p_partkey"), col("p_name"),
            col("cluster_id").as("canonical"))
          .orderBy("p_partkey")
      },
      """WITH RECURSIVE names AS (
        |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS cnt
        |  FROM part GROUP BY 1),
        |blk AS (
        |  SELECT name, unnest(string_split(name, ' ')) AS blk FROM names),
        |keep AS (SELECT blk FROM blk GROUP BY 1 HAVING count(*) <= 1000),
        |pruned AS (SELECT b.* FROM blk b JOIN keep USING (blk)
        |           WHERE b.blk <> ''),
        |pairs AS (
        |  SELECT DISTINCT a.name AS d1, b.name AS d2
        |  FROM pruned a JOIN pruned b ON a.blk = b.blk AND a.name < b.name
        |  WHERE levenshtein(a.name, b.name) <= 2),
        |edges AS (
        |  SELECT d1 AS src, d2 AS dst FROM pairs
        |  UNION SELECT d2, d1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT name, name FROM names
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
        |canon AS (SELECT a AS name, min(b) AS canonical
        |          FROM reach GROUP BY a)
        |SELECT p.p_partkey, p.p_name, c.canonical
        |FROM part p JOIN canon c ON p.p_name = c.name
        |ORDER BY p_partkey""".stripMargin),

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

    // weekly cohort retention triangle: first-active-week cohorts x
    // week offsets, epoch-day div 7 buckets (integer, tz-free, no ISO
    // week drift); keyed distinct + min + join + grid agg, no windows
    Q.df("x190_retention_cohorts",
      (s, dir) => TimeSeries.cohortRetention(
        Tables.load(s, dir, "events"), "user_id", "ts"),
      """WITH a AS (
        |  SELECT DISTINCT user_id AS u,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
        |      AS wk
        |  FROM events),
        |c AS (SELECT u, min(wk) AS cw FROM a GROUP BY 1),
        |s AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size
        |      FROM c GROUP BY 1)
        |SELECT a.cw AS cohort_week, a.off AS week_offset,
        |  a.active_users, s.cohort_size,
        |  a.active_users * 1000000 // s.cohort_size AS retention_ppm
        |FROM (
        |  SELECT c.cw, x.wk - c.cw AS off,
        |    CAST(count(*) AS BIGINT) AS active_users
        |  FROM a x JOIN c USING (u) GROUP BY 1, 2) a
        |JOIN s USING (cw)
        |ORDER BY cohort_week, week_offset""".stripMargin),

    // per-node triangle counts on the co-purchase graph (parts linked
    // when >= 2 shared orders): degree-oriented wedge join — wedges
    // only at the lowest-degree apex, closure via canonical-pair
    // equi-join; each triangle counted once, credited to all corners
    Q.df("x191_triangle_count",
      (s, dir) => {
        val it = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
          .distinct()
        val edges = it.as("a")
          .join(it.as("c"), col("a.b") === col("c.b")
            && col("a.i") < col("c.i"))
          .groupBy(col("a.i").as("src"), col("c.i").as("dst"))
          .agg(count(lit(1)).as("w")).where(col("w") >= 2)
          .select("src", "dst")
        Graph.triangleCount(edges)
      },
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |e AS (
        |  SELECT a.i AS lo, c.i AS hi
        |  FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT lo AS node FROM e UNION ALL SELECT hi FROM e) u
        |  GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN (dl.deg, e.lo) < (dh.deg, e.hi)
        |           THEN e.lo ELSE e.hi END AS src,
        |         CASE WHEN (dl.deg, e.lo) < (dh.deg, e.hi)
        |           THEN e.hi ELSE e.lo END AS dst
        |  FROM e JOIN deg dl ON e.lo = dl.node
        |         JOIN deg dh ON e.hi = dh.node),
        |tri AS (
        |  SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
        |  FROM o w1 JOIN o w2 ON w1.src = w2.src AND w1.dst < w2.dst
        |  JOIN e ON least(w1.dst, w2.dst) = e.lo
        |        AND greatest(w1.dst, w2.dst) = e.hi)
        |SELECT node, CAST(count(*) AS BIGINT) AS triangles
        |FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |      UNION ALL SELECT c FROM tri) n
        |GROUP BY 1 ORDER BY node""".stripMargin),

    // streaming cohort-retention mart: distinct (user, week) activity
    // maintained as dropDuplicates state (bounded by keys x weeks,
    // not events), serve-time grid shared with batch x190 — the
    // drained stream must equal the batch triangle, which the oracle
    // (same SQL as x190) checks
    Q.df("x192_stream_retention",
      (s, dir) => Streaming.streamRetention(s, dir),
      """WITH a AS (
        |  SELECT DISTINCT user_id AS u,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
        |      AS wk
        |  FROM events),
        |c AS (SELECT u, min(wk) AS cw FROM a GROUP BY 1),
        |s AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size
        |      FROM c GROUP BY 1)
        |SELECT a.cw AS cohort_week, a.off AS week_offset,
        |  a.active_users, s.cohort_size,
        |  a.active_users * 1000000 // s.cohort_size AS retention_ppm
        |FROM (
        |  SELECT c.cw, x.wk - c.cw AS off,
        |    CAST(count(*) AS BIGINT) AS active_users
        |  FROM a x JOIN c USING (u) GROUP BY 1, 2) a
        |JOIN s USING (cw)
        |ORDER BY cohort_week, week_offset""".stripMargin),

    // weighted systematic sampling: EXACTLY 100 draws with inclusion
    // probability proportional to n_chars, deterministic (content-hash
    // order on the cumulative-weight line); heavy docs may be drawn
    // multiple times (copies column); global cumsum built from 16-way
    // bucket windows + a 16-row offset table, never one partition
    Q.df("x193_weighted_sample",
      (s, dir) => Sampling.weightedSystematic(
        Tables.load(s, dir, "documents"), "doc_id", col("n_chars"), 100L),
      """WITH b AS (
        |  SELECT doc_id AS id, n_chars AS w,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents WHERE n_chars > 0),
        |c AS (
        |  SELECT id, w, CAST(sum(w) OVER (ORDER BY h, id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS ce
        |  FROM b),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM b)
        |SELECT id AS doc_id, w,
        |  ce * 100 // tw - (ce - w) * 100 // tw AS copies
        |FROM c, t
        |WHERE ce * 100 // tw - (ce - w) * 100 // tw > 0
        |ORDER BY doc_id""".stripMargin),

    // PII inventory audit: what the scrub pass WOULD redact, counted
    // hierarchically in scrub's replacement order so each character
    // lands in one class; PII injected deterministically (the x117
    // formula-twin trick) so every class is exercised
    Q.df("x194_pii_audit",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .withColumn("t", concat(col("props"),
            when(col("event_id") % 5 === 0,
              concat(lit(" contact user"), col("user_id"),
                lit("@example.com now")))
              .when(col("event_id") % 5 === 1,
                concat(lit(" see https://host/p/"), col("event_id"),
                  lit(" next")))
              .otherwise(lit(""))))
        TextStats.piiAudit(ev, "event_type", "t")
      },
      """WITH ev AS (
        |  SELECT event_type,
        |    props || CASE
        |      WHEN event_id % 5 = 0 THEN ' contact user' ||
        |        CAST(user_id AS VARCHAR) || '@example.com now'
        |      WHEN event_id % 5 = 1 THEN ' see https://host/p/' ||
        |        CAST(event_id AS VARCHAR) || ' next'
        |      ELSE '' END AS t
        |  FROM events),
        |cl AS (
        |  SELECT event_type, t,
        |    regexp_replace(t, 'https?://[^ ]+', '<URL>', 'g') AS t1
        |  FROM ev),
        |c2 AS (
        |  SELECT event_type,
        |    CAST(len(regexp_extract_all(t, 'https?://[^ ]+')) AS BIGINT)
        |      AS u,
        |    CAST(len(regexp_extract_all(t1,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
        |      AS BIGINT) AS e,
        |    CAST(len(regexp_extract_all(regexp_replace(t1,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
        |      '<EMAIL>', 'g'), '[0-9]+')) AS BIGINT) AS n
        |  FROM cl)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN u + e + n > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS rows_with_pii,
        |  CAST(sum(u) AS BIGINT) AS urls,
        |  CAST(sum(e) AS BIGINT) AS emails,
        |  CAST(sum(n) AS BIGINT) AS numbers
        |FROM c2 GROUP BY 1 ORDER BY event_type""".stripMargin),

    // pairwise lexical drift: exact total-variation distance between
    // source unigram distributions (ppm), derived from the inner join
    // alone (missing-term mass recovered from the totals identity) —
    // the distribution-shift audit beside x174's document overlap
    Q.df("x195_source_drift",
      (s, dir) => TextStats.sourceDrift(
        Tables.load(s, dir, "documents")),
      s"""WITH tok AS (
         |  SELECT source AS src,
         |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
         |  FROM documents),
         |cnt AS (SELECT src, w, CAST(count(*) AS BIGINT) AS c
         |        FROM tok GROUP BY 1, 2),
         |tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS n
         |        FROM cnt GROUP BY 1),
         |cw AS (SELECT cnt.src, cnt.w, cnt.c, tot.n
         |       FROM cnt JOIN tot USING (src)),
         |sh AS (
         |  SELECT a.src AS src_a, b.src AS src_b,
         |    CAST(count(*) AS BIGINT) AS shared_terms,
         |    CAST(sum(abs(a.c * b.n - b.c * a.n)) AS BIGINT) AS sd,
         |    CAST(sum(a.c * b.n) AS BIGINT) AS s1,
         |    CAST(sum(b.c * a.n) AS BIGINT) AS s2
         |  FROM cw a JOIN cw b ON a.w = b.w AND a.src < b.src
         |  GROUP BY 1, 2)
         |SELECT sh.src_a, sh.src_b, sh.shared_terms,
         |  (sd + (t1.n * t2.n - s1) + (t1.n * t2.n - s2)) * 1000000
         |    // (2 * t1.n * t2.n) AS tv_ppm
         |FROM sh JOIN tot t1 ON sh.src_a = t1.src
         |        JOIN tot t2 ON sh.src_b = t2.src
         |ORDER BY src_a, src_b""".stripMargin),

    // golden-record survivorship: resolved part entities folded to one
    // master row each — plurality brand (ties to smallest), max price
    // and partkey; clustering stays on the distinct-name graph, the
    // record table sees one join + keyed aggregates
    Q.df("x196_golden_record",
      (s, dir) => Entity.goldenRecords(
        Tables.load(s, dir, "part"), "p_name", maxDist = 2,
        modeCol = "p_brand", maxCols = Seq("p_retailprice", "p_partkey")),
      """WITH RECURSIVE names AS (
        |  SELECT p_name AS name FROM part GROUP BY 1),
        |blk AS (
        |  SELECT name, unnest(string_split(name, ' ')) AS blk FROM names),
        |keep AS (SELECT blk FROM blk GROUP BY 1 HAVING count(*) <= 1000),
        |pruned AS (SELECT b.* FROM blk b JOIN keep USING (blk)
        |           WHERE b.blk <> ''),
        |pairs AS (
        |  SELECT DISTINCT a.name AS d1, b.name AS d2
        |  FROM pruned a JOIN pruned b ON a.blk = b.blk AND a.name < b.name
        |  WHERE levenshtein(a.name, b.name) <= 2),
        |edges AS (
        |  SELECT d1 AS src, d2 AS dst FROM pairs
        |  UNION SELECT d2, d1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT name, name FROM names
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
        |canon AS (SELECT a AS name, min(b) AS canonical
        |          FROM reach GROUP BY a),
        |rec AS (SELECT p.*, c.canonical
        |        FROM part p JOIN canon c ON p.p_name = c.name),
        |md AS (
        |  SELECT canonical, p_brand FROM (
        |    SELECT canonical, p_brand,
        |      row_number() OVER (PARTITION BY canonical
        |        ORDER BY count(*) DESC, p_brand) AS rn
        |    FROM rec GROUP BY canonical, p_brand) t
        |  WHERE rn = 1),
        |base AS (
        |  SELECT canonical, CAST(count(*) AS BIGINT) AS n_records,
        |    CAST(count(DISTINCT p_name) AS BIGINT) AS n_names,
        |    max(p_retailprice) AS max_p_retailprice,
        |    CAST(max(p_partkey) AS BIGINT) AS max_p_partkey
        |  FROM rec GROUP BY 1)
        |SELECT b.canonical, b.n_records, b.n_names, m.p_brand,
        |  b.max_p_retailprice, b.max_p_partkey
        |FROM base b JOIN md m USING (canonical)
        |ORDER BY canonical""".stripMargin),

    // data-contract expectation suite: nulls, key uniqueness, value
    // range, referential integrity — each one aggregate (or one
    // anti-join), reported as a violations ledger; (l_orderkey,
    // l_linenumber) is known non-unique in the synthetic lineitem, so
    // the suite demonstrably catches a real contract break
    Q.df("x197_data_expectations",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val ord = Tables.load(s, dir, "orders")
        Expectations.suite(Seq(
          Expectations.notNull(li, "l_shipdate"),
          Expectations.unique(ord, Seq("o_orderkey")),
          Expectations.unique(li, Seq("l_orderkey", "l_linenumber")),
          Expectations.inRange(li, "l_quantity", lit(1), lit(50)),
          Expectations.refIntegrity(li, "l_orderkey", ord, "o_orderkey")))
      },
      """WITH checks AS (
        |  SELECT 'not_null:l_shipdate' AS rule,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'unique:o_orderkey', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique:l_orderkey,l_linenumber', CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |      AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'in_range:l_quantity', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1
        |      END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'ref:l_orderkey',
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey)))
        |SELECT rule, n_rows, violations FROM checks ORDER BY rule""".stripMargin),

    // join-key skew audit: per-key count distribution (max, exact p50/
    // p99, max-over-avg ppm) for the three lineitem join keys — the
    // pre-shuffle hot-spot predictor; aggregation runs over the
    // key-cardinality count table only
    Q.df("x198_key_skew_profile",
      (s, dir) => Profile.skewProfile(
        Tables.load(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey")),
      {
        def one(c: String) =
          s"""SELECT '$c' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
             |  CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(max(c) AS BIGINT) AS max_cnt,
             |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c)
             |    AS BIGINT) AS p50_cnt,
             |  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY c)
             |    AS BIGINT) AS p99_cnt,
             |  CAST(max(c) AS BIGINT) * CAST(count(*) AS BIGINT) * 1000000
             |    // CAST(sum(c) AS BIGINT) AS skew_ppm
             |FROM (SELECT $c, CAST(count(*) AS BIGINT) AS c
             |      FROM lineitem GROUP BY 1) t""".stripMargin
        Seq("l_orderkey", "l_partkey", "l_suppkey").map(one)
          .mkString("", "\nUNION ALL\n", "\nORDER BY key_col")
      }),

    // corpus-level boilerplate removal: blocks recurring in >= 3
    // distinct docs are site chrome and stripped from EVERY document
    // (blockDedup's complement — zero copies, not first-copy-wins)
    Q.df("x199_boilerplate_strip",
      (s, dir) => Dedup.boilerplateStrip(
        Tables.load(s, dir, "documents"), 4, 3),
      s"""WITH $duckTok,
         |blk AS (
         |  SELECT doc_id, (pos - 1) // 4 AS blk,
         |         string_agg(w, ' ' ORDER BY pos) AS btxt
         |  FROM tok GROUP BY doc_id, (pos - 1) // 4
         |),
         |chrome AS (
         |  SELECT btxt FROM (SELECT DISTINCT btxt, doc_id FROM blk)
         |  GROUP BY btxt HAVING count(*) >= 3
         |),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks
         |        FROM blk GROUP BY doc_id),
         |srv AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |          md5(string_agg(btxt, ' ' ORDER BY blk)) AS kept_md5
         |        FROM blk WHERE btxt NOT IN (SELECT btxt FROM chrome)
         |        GROUP BY doc_id)
         |SELECT t.doc_id, t.n_blocks,
         |  CAST(coalesce(s.n_kept, 0) AS BIGINT) AS n_kept, s.kept_md5
         |FROM tot t LEFT JOIN srv s USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin),

    // first-order clickstream transition matrix: per-user lead(1)
    // window (no event-table self-join), 30-min session gap, exact
    // per-src probabilities in ppm
    Q.df("x200_event_transitions",
      (s, dir) => TimeSeries.transitionMatrix(
        Tables.load(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type", 30),
      """WITH s AS (
        |  SELECT event_type AS t, ts,
        |    lead(event_type) OVER w AS nt, lead(ts) OVER w AS nts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |),
        |c AS (
        |  SELECT t AS src_type, nt AS dst_type,
        |    CAST(count(*) AS BIGINT) AS n_trans
        |  FROM s
        |  WHERE nt IS NOT NULL AND nts <= ts + INTERVAL 30 MINUTE
        |  GROUP BY 1, 2)
        |SELECT src_type, dst_type, n_trans,
        |  n_trans * 1000000 // CAST(sum(n_trans) OVER
        |    (PARTITION BY src_type) AS BIGINT) AS p_ppm
        |FROM c ORDER BY src_type, dst_type""".stripMargin),

    // freshness-decayed activity ranking: integer halving decay
    // (cnt >> whole-half-lives-old) — exponential decay with zero
    // floats, bit-exact across engines
    Q.df("x201_decay_activity",
      (s, dir) => TimeSeries.decayActivity(
        Tables.load(s, dir, "events"), "user_id", "ts", 7, 50),
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(day) AS mx FROM daily)
        |SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events,
        |  CAST(sum(cnt >> (datediff('day', day, mx) // 7)) AS BIGINT)
        |    AS score
        |FROM daily, mx GROUP BY user_id
        |ORDER BY score DESC, user_id LIMIT 50""".stripMargin),

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

    // PMI-ranked collocations: independence ratio as exact ppm via
    // integer cross-multiplication (rank-equivalent to PMI, no float
    // log); bigrams from one per-doc lead window, margins broadcast
    Q.df("x203_pmi_bigrams",
      (s, dir) => TextStats.pmiBigrams(
        Tables.load(s, dir, "documents"), 5, 100),
      s"""WITH $duckTok,
         |bg AS (
         |  SELECT a.w AS w1, b.w AS w2
         |  FROM tok a JOIN tok b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         |cxy AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
         |        FROM bg GROUP BY 1, 2),
         |cx AS (SELECT w1, CAST(count(*) AS BIGINT) AS c_x
         |       FROM bg GROUP BY 1),
         |cy AS (SELECT w2, CAST(count(*) AS BIGINT) AS c_y
         |       FROM bg GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_bg FROM bg)
         |SELECT w1, w2, c_xy,
         |  c_xy * n_bg * 1000000 // (c_x * c_y) AS pmi_ppm
         |FROM cxy JOIN cx USING (w1) JOIN cy USING (w2), n
         |WHERE c_xy >= 5
         |ORDER BY pmi_ppm DESC, w1, w2 LIMIT 100""".stripMargin),

    // streaming rate-anomaly monitor: static baseline broadcast-joined
    // per micro-batch BEFORE the windowed agg (stateless enrichment),
    // integer cross-multiplied spike flag — no float rate anywhere
    Q.df("x204_stream_anomaly",
      (s, dir) => Streaming.streamRateAnomaly(s, dir, 150),
      """WITH base AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS base_total,
        |    CAST(count(DISTINCT date_trunc('hour', ts)) AS BIGINT)
        |      AS base_hours
        |  FROM events GROUP BY 1),
        |h AS (
        |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |      AS hour,
        |    event_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT h.hour, h.event_type, h.cnt, b.base_total, b.base_hours,
        |  CAST(CASE WHEN h.cnt * b.base_hours * 100
        |            >= b.base_total * 150 THEN 1 ELSE 0 END AS INTEGER)
        |    AS is_spike
        |FROM h JOIN base b USING (event_type)
        |ORDER BY hour, event_type""".stripMargin),

    // out-of-orderness audit (the watermark-sizing statistic): running
    // event-time max in a PLANTED deterministic arrival order (block +
    // content-hash scramble — the synthetic table arrives perfectly
    // sorted, so the scramble plants the disorder the operator
    // measures, like x194's planted PII), exact p50/p99/max lateness
    Q.df("x205_lateness_profile",
      (s, dir) => TimeSeries.latenessProfile(
        Tables.load(s, dir, "events"), "event_type", "ts",
        Seq(expr("event_id div 500"),
          md5(col("event_id").cast("string")), col("event_id"))),
      """WITH a AS (
        |  SELECT event_type AS k, epoch_us(ts) AS us,
        |    event_id // 500 AS arr0,
        |    md5(CAST(event_id AS VARCHAR)) AS arr1, event_id AS arr2
        |  FROM events),
        |r AS (
        |  SELECT k, (max(us) OVER (PARTITION BY k
        |      ORDER BY arr0, arr1, arr2
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - us)
        |      // 1000000 AS late_s
        |  FROM a)
        |SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY late_s)
        |    AS BIGINT) AS p50_late_s,
        |  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY late_s)
        |    AS BIGINT) AS p99_late_s,
        |  CAST(max(late_s) AS BIGINT) AS max_late_s
        |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin),

    // exact Jaccard join via LOSSLESS prefix filtering (PPJoin): the
    // sub-quadratic tier that provably misses no qualifying pair,
    // unlike x56's df-capped stop-shingle heuristic; oracle verifies
    // against the brute-force all-pairs shingle join
    Q.df("x206_ppjoin",
      (s, dir) => Dedup.ppjoinPairs(
        Tables.load(s, dir, "documents"), 300000L),
      s"""WITH $duckTok, $duckShingles,
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |       FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2,
         |    CAST(count(*) AS BIGINT) AS inter
         |  FROM sh a JOIN sh b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, inter, x.n AS n1, y.n AS n2,
         |  inter * 1000000 // (x.n + y.n - inter) AS jac_ppm
         |FROM inter JOIN sz x ON x.doc_id = d1 JOIN sz y ON y.doc_id = d2
         |WHERE inter * 1000000 >= (x.n + y.n - inter) * 300000
         |ORDER BY d1, d2""".stripMargin),

    // kNN label transfer: majority vote of the 5 nearest labeled
    // neighbors (quantized dot, bounded top-k heap agg), argmax via
    // min(struct(-votes, label)) — deterministic end to end
    Q.df("x208_knn_classify",
      (s, dir) => Similarity.knnClassify(
        Tables.load(s, dir, "embeddings"), 20, 5),
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe
        |           FROM embeddings WHERE vec_id < 20),
        |pairs AS (
        |  SELECT q.qid, e.vec_id, e.label,
        |    CAST(sum(CAST(floor(CAST(qe[i] AS DOUBLE) * 10000) AS BIGINT)
        |      * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000)
        |        AS BIGINT)) AS BIGINT) AS dot_q
        |  FROM q, embeddings e, range(1, 65) r(i)
        |  WHERE e.vec_id >= 20
        |  GROUP BY 1, 2, 3
        |),
        |ranked AS (
        |  SELECT qid, label, row_number() OVER (PARTITION BY qid
        |    ORDER BY dot_q DESC, vec_id) AS rn
        |  FROM pairs),
        |votes AS (
        |  SELECT qid, label, CAST(count(*) AS BIGINT) AS votes
        |  FROM ranked WHERE rn <= 5 GROUP BY 1, 2),
        |best AS (
        |  SELECT qid, label, votes, row_number() OVER (PARTITION BY qid
        |    ORDER BY votes DESC, label) AS vr
        |  FROM votes)
        |SELECT qid, label AS pred_label, votes
        |FROM best WHERE vr = 1 ORDER BY qid""".stripMargin),

    // streaming dead-letter queue: ONE foreachBatch routes each
    // micro-batch to accepted/quarantine sinks (reason-stamped,
    // batch-id idempotent); sum_chars pins row ROUTING, not just counts
    Q.df("x209_stream_dlq",
      (s, dir) => Streaming.streamDlq(s, dir),
      """WITH g AS (
        |  SELECT n_chars,
        |    CASE WHEN n_chars < 150 THEN 'too_short'
        |         WHEN n_chars > 450 THEN 'too_long'
        |         WHEN lang NOT IN ('en', 'de', 'fr') THEN 'bad_lang'
        |         ELSE 'ok' END AS reason
        |  FROM documents)
        |SELECT CASE WHEN reason = 'ok' THEN 'accepted' ELSE 'rejected'
        |         END AS disposition,
        |  reason, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM g GROUP BY 1, 2 ORDER BY disposition, reason""".stripMargin),

    // join-preserving pseudonymization: keyed deterministic surrogate
    // (md5(salt:id)) replaces the raw id; the audit proves cardinality
    // preservation (n_users == n_tokens) and pins token VALUES via min
    Q.df("x210_pseudonymize",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val raw = ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users_raw"))
        Privacy.pseudonymize(ev, "user_id", "s1")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id_token")).as("n_tokens"),
            min(col("user_id_token")).as("min_token"))
          .join(raw, Seq("event_type"))
          .select(col("event_type"), col("n_events"), col("n_users_raw"),
            col("n_tokens"),
            (col("n_users_raw") === col("n_tokens")).cast("int")
              .as("cardinality_kept"),
            col("min_token"))
          .orderBy("event_type")
      },
      """WITH t AS (
        |  SELECT event_type, user_id,
        |    md5('s1:' || CAST(user_id AS VARCHAR)) AS token
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_raw,
        |  CAST(count(DISTINCT token) AS BIGINT) AS n_tokens,
        |  CAST(CASE WHEN count(DISTINCT user_id) = count(DISTINCT token)
        |    THEN 1 ELSE 0 END AS INTEGER) AS cardinality_kept,
        |  min(token) AS min_token
        |FROM t GROUP BY 1 ORDER BY event_type""".stripMargin),

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

    // metadata-trust audit: declared lang vs content-detected lang as
    // a confusion matrix + Cohen's kappa in exact ppm — one integer
    // rational (N*agree - S) / (N^2 - S), no float ever exists
    Q.df("x212_lang_agreement",
      (s, dir) => TextStats.langAgreement(
        Tables.load(s, dir, "documents")),
      """WITH pred AS (
        |  SELECT lang,
        |    CASE WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_en THEN 'de'
        |         WHEN h_fr >= h_es AND h_fr >= h_en THEN 'fr'
        |         WHEN h_es >= h_en THEN 'es'
        |         ELSE 'en' END AS predicted
        |  FROM (
        |    SELECT lang,
        |      CAST((length(t) - length(replace(t, ' the ', ''))) / 5 AS BIGINT) AS h_en,
        |      CAST((length(t) - length(replace(t, ' der ', ''))) / 5 AS BIGINT) AS h_de,
        |      CAST((length(t) - length(replace(t, ' le ', ''))) / 4 AS BIGINT) AS h_fr,
        |      CAST((length(t) - length(replace(t, ' el ', ''))) / 4 AS BIGINT) AS h_es
        |    FROM (SELECT lang, ' ' || lower(text) || ' ' AS t FROM documents) x
        |  ) y),
        |cells AS (SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
        |          FROM pred GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS row_total
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT predicted, CAST(sum(n) AS BIGINT) AS col_total
        |       FROM cells GROUP BY 1),
        |sv AS (SELECT CAST(coalesce(sum(row_total * col_total), 0) AS BIGINT)
        |         AS s
        |       FROM rt JOIN ct ON rt.lang = ct.predicted),
        |tv AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
        |         CAST(sum(CASE WHEN lang = predicted THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_agree
        |       FROM pred)
        |SELECT c.lang, c.predicted, c.n, rt.row_total, ct.col_total,
        |  CAST(n_agree * 1000000 // n_total AS BIGINT) AS agree_ppm,
        |  CAST(CASE WHEN n_total * n_total <> s
        |    THEN (n_total * n_agree - s) * 1000000 // (n_total * n_total - s)
        |    ELSE 0 END AS BIGINT) AS kappa_ppm
        |FROM cells c JOIN rt USING (lang) JOIN ct USING (predicted),
        |  sv, tv
        |ORDER BY lang, predicted""".stripMargin),

    // dedup-adjusted token accounting: raw vs unique-text token volume
    // per source — the effective-tokens weights a mixture planner
    // needs; texts collapse to md5 keys map-side, text never shuffles
    Q.df("x213_effective_tokens",
      (s, dir) => TextStats.effectiveTokens(
        Tables.load(s, dir, "documents")),
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS n_tok,
        |    md5(text) AS h
        |  FROM documents),
        |raw AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |          CAST(sum(n_tok) AS BIGINT) AS raw_tokens
        |        FROM d GROUP BY 1),
        |u AS (SELECT source, h, CAST(min(n_tok) AS BIGINT) AS n_tok
        |      FROM d GROUP BY 1, 2),
        |uu AS (SELECT source, CAST(count(*) AS BIGINT) AS n_unique_docs,
        |         CAST(sum(n_tok) AS BIGINT) AS unique_tokens
        |       FROM u GROUP BY 1)
        |SELECT source, n_docs, raw_tokens, n_unique_docs, unique_tokens,
        |  CAST(CASE WHEN raw_tokens > 0
        |    THEN (raw_tokens - unique_tokens) * 1000000 // raw_tokens
        |    ELSE 0 END AS BIGINT) AS dup_token_ppm
        |FROM raw JOIN uu USING (source)
        |ORDER BY source""".stripMargin),

    // cross-source score calibration: exact per-source decile table
    // (percentile_disc boundaries of n_chars) — the lookup that makes
    // "top 10% quality" mean the same thing in every source
    Q.df("x214_score_deciles",
      (s, dir) => Profile.scoreDeciles(
        Tables.load(s, dir, "documents"), "source", col("n_chars")),
      """SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(n_chars) AS BIGINT) AS min_score,
        |  CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d1,
        |  CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d2,
        |  CAST(percentile_disc(0.3) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d3,
        |  CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d4,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d5,
        |  CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d6,
        |  CAST(percentile_disc(0.7) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d7,
        |  CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d8,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS d9,
        |  CAST(max(n_chars) AS BIGINT) AS max_score
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),

    // per-clip loudness audit over REAL decoded PCM: every 16-bit LE
    // sample read from the data chunk; the oracle re-derives sum/peak
    // from buildWav's closed form (byte i = i%256 => |sample| has a
    // 128-sample period summing 2088960) without seeing the bytes —
    // any offset/endianness/sign decode bug is a correctness failure
    Q.df("x215_audio_gain",
      (s, dir) => Multimodal.audioGain(
        Multimodal.withWavPayload(Tables.load(s, dir, "documents"))),
      """WITH p AS (
        |  SELECT doc_id,
        |    (1 + n_chars % 2) * (n_chars % 500 + 50) AS n_tot
        |  FROM documents),
        |s AS (SELECT doc_id, n_tot, n_tot // 128 AS f, n_tot % 128 AS r
        |      FROM p)
        |SELECT doc_id, CAST(n_tot AS BIGINT) AS n_total_samples,
        |  CAST(f * 2088960 +
        |    CASE WHEN r <= 64 THEN 257 * r * (r - 1) + 256 * r
        |         ELSE 1052608 + (r - 64) * 65280
        |              - 514 * (((r - 1) * r) // 2 - 2016)
        |    END AS BIGINT) AS sum_abs,
        |  CAST(CASE WHEN n_tot >= 64 THEN 32638
        |       ELSE 514 * (n_tot - 1) + 256 END AS BIGINT) AS peak_abs,
        |  CAST(300000000 // (CASE WHEN n_tot >= 64 THEN 32638
        |       ELSE 514 * (n_tot - 1) + 256 END) AS BIGINT) AS gain_x10k
        |FROM s ORDER BY doc_id""".stripMargin),

    // the dataset card: one-row corpus datasheet (docs/sources/langs,
    // exact-dup rate, token+char volume, length percentiles) in ONE
    // aggregation pass — texts enter as md5 keys, never shuffled
    Q.df("x216_dataset_card",
      (s, dir) => TextStats.datasetCard(
        Tables.load(s, dir, "documents")),
      """WITH tok AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS n_tok
        |  FROM documents)
        |SELECT
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
        |  CAST((count(*) - count(DISTINCT md5(text))) * 1000000
        |    // count(*) AS BIGINT) AS dup_doc_ppm,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST((SELECT sum(n_tok) FROM tok) AS BIGINT) AS total_tokens,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
        |    AS BIGINT) AS p50_chars,
        |  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars)
        |    AS BIGINT) AS p99_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents""".stripMargin),

    // per-source distribution drift vs the corpus: exact total-
    // variation distance over GLOBAL decile bins (no PSI/KL log —
    // one integer rational), missing bins charged at full global
    // mass via the zero-filled grid; worst_bin = deterministic argmax
    Q.df("x217_score_drift",
      (s, dir) => Profile.scoreDrift(
        Tables.load(s, dir, "documents"), "source", col("n_chars")),
      """WITH d AS (SELECT source AS s, n_chars AS x FROM documents),
        |e AS (SELECT
        |  CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e1,
        |  CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e2,
        |  CAST(percentile_disc(0.3) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e3,
        |  CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e4,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e5,
        |  CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e6,
        |  CAST(percentile_disc(0.7) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e7,
        |  CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e8,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e9
        |  FROM d),
        |b AS (
        |  SELECT s, CASE WHEN x <= e1 THEN 1 WHEN x <= e2 THEN 2
        |    WHEN x <= e3 THEN 3 WHEN x <= e4 THEN 4 WHEN x <= e5 THEN 5
        |    WHEN x <= e6 THEN 6 WHEN x <= e7 THEN 7 WHEN x <= e8 THEN 8
        |    WHEN x <= e9 THEN 9 ELSE 10 END AS bin
        |  FROM d, e),
        |per AS (SELECT s, bin, CAST(count(*) AS BIGINT) AS n_sb
        |        FROM b GROUP BY 1, 2),
        |gb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_gb
        |         FROM b GROUP BY 1),
        |ns AS (SELECT s, CAST(sum(n_sb) AS BIGINT) AS n_s
        |       FROM per GROUP BY 1),
        |ng AS (SELECT CAST(sum(n_gb) AS BIGINT) AS n_g FROM gb),
        |grid AS (
        |  SELECT ns.s, ns.n_s, gb.bin, gb.n_gb, ng.n_g,
        |    abs(coalesce(per.n_sb, 0) * ng.n_g - gb.n_gb * ns.n_s)
        |      AS dev
        |  FROM ns CROSS JOIN gb CROSS JOIN ng
        |  LEFT JOIN per ON per.s = ns.s AND per.bin = gb.bin),
        |ranked AS (
        |  SELECT s, n_s, n_g, bin, dev,
        |    row_number() OVER (PARTITION BY s ORDER BY dev DESC, bin)
        |      AS rn
        |  FROM grid)
        |SELECT g.s AS source, CAST(max(g.n_s) AS BIGINT) AS n_docs,
        |  CAST(sum(g.dev) * 1000000 // (2 * max(g.n_s) * max(g.n_g))
        |    AS BIGINT) AS tv_ppm,
        |  CAST(max(CASE WHEN r.rn = 1 THEN r.bin END) AS INTEGER)
        |    AS worst_bin
        |FROM grid g JOIN ranked r
        |  ON r.s = g.s AND r.bin = g.bin
        |GROUP BY g.s ORDER BY source""".stripMargin),

    // strict-order 3-step funnel: each stage's committed time is the
    // MINIMUM qualifying ts strictly after the previous stage's —
    // greedy-optimal and deterministic; per-type counts without the
    // order constraint answer a different (wrong) question
    Q.df("x218_funnel_steps",
      (s, dir) => TimeSeries.funnelSteps(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase")),
      """WITH s1 AS (
        |  SELECT user_id AS k, min(ts) AS t FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id AS k, min(e.ts) AS t
        |  FROM events e JOIN s1 ON s1.k = e.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id AS k, min(e.ts) AS t
        |  FROM events e JOIN s2 ON s2.k = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
        |c AS (
        |  SELECT 1 AS stage_no, 'signup' AS stage,
        |    (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_keys
        |  UNION ALL SELECT 2, 'view',
        |    (SELECT CAST(count(*) AS BIGINT) FROM s2)
        |  UNION ALL SELECT 3, 'purchase',
        |    (SELECT CAST(count(*) AS BIGINT) FROM s3)),
        |f AS (SELECT n_keys AS n_first FROM c WHERE stage_no = 1)
        |SELECT stage_no, stage, n_keys,
        |  CAST(CASE WHEN lag(n_keys) OVER (ORDER BY stage_no) IS NULL
        |         THEN 1000000
        |       WHEN lag(n_keys) OVER (ORDER BY stage_no) > 0
        |         THEN n_keys * 1000000 // lag(n_keys) OVER (ORDER BY stage_no)
        |       ELSE 1000000 END AS BIGINT) AS conv_from_prev_ppm,
        |  CAST(CASE WHEN f.n_first > 0
        |    THEN n_keys * 1000000 // f.n_first ELSE 0 END AS BIGINT)
        |    AS conv_from_first_ppm
        |FROM c, f ORDER BY stage_no""".stripMargin),

    // RFM lifecycle segmentation: per-key recency/frequency/monetary,
    // each cut at exact percentile_disc tertiles, rolled to the
    // 27-cell grid; corpus "today" = max activity day (reproducible,
    // no wall clock); all cents integer-floored on both engines
    Q.df("x219_rfm_segments",
      (s, dir) => TimeSeries.rfmSegments(
        Tables.load(s, dir, "events"), "user_id", "ts", "value"),
      """WITH per AS (
        |  SELECT user_id AS k,
        |    max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
        |      AS last_day,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |u AS (
        |  SELECT k, (SELECT max(last_day) FROM per) - last_day
        |      AS rec_days, freq, cents
        |  FROM per),
        |e AS (SELECT
        |  CAST(percentile_disc(0.33) WITHIN GROUP (ORDER BY rec_days) AS BIGINT) AS r33,
        |  CAST(percentile_disc(0.66) WITHIN GROUP (ORDER BY rec_days) AS BIGINT) AS r66,
        |  CAST(percentile_disc(0.33) WITHIN GROUP (ORDER BY freq) AS BIGINT) AS f33,
        |  CAST(percentile_disc(0.66) WITHIN GROUP (ORDER BY freq) AS BIGINT) AS f66,
        |  CAST(percentile_disc(0.33) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS m33,
        |  CAST(percentile_disc(0.66) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS m66
        |  FROM u)
        |SELECT
        |  CAST(CASE WHEN rec_days <= r33 THEN 3
        |       WHEN rec_days <= r66 THEN 2 ELSE 1 END AS INTEGER) AS r_tier,
        |  CAST(CASE WHEN freq <= f33 THEN 1
        |       WHEN freq <= f66 THEN 2 ELSE 3 END AS INTEGER) AS f_tier,
        |  CAST(CASE WHEN cents <= m33 THEN 1
        |       WHEN cents <= m66 THEN 2 ELSE 3 END AS INTEGER) AS m_tier,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM u, e GROUP BY 1, 2, 3 ORDER BY r_tier, f_tier, m_tier""".stripMargin),

    // streaming drift monitor: STATIC decile edges broadcast into each
    // micro-batch, state = the (source x 10) bin grid in complete
    // mode; served through the SAME driftFromBinned code as batch
    // x217 — the drained stream must equal the batch audit, which
    // this oracle (the x217 SQL) checks
    Q.df("x220_stream_drift",
      (s, dir) => Streaming.streamDriftMart(s, dir),
      """WITH d AS (SELECT source AS s, n_chars AS x FROM documents),
        |e AS (SELECT
        |  CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e1,
        |  CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e2,
        |  CAST(percentile_disc(0.3) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e3,
        |  CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e4,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e5,
        |  CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e6,
        |  CAST(percentile_disc(0.7) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e7,
        |  CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e8,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY x) AS BIGINT) AS e9
        |  FROM d),
        |b AS (
        |  SELECT s, CASE WHEN x <= e1 THEN 1 WHEN x <= e2 THEN 2
        |    WHEN x <= e3 THEN 3 WHEN x <= e4 THEN 4 WHEN x <= e5 THEN 5
        |    WHEN x <= e6 THEN 6 WHEN x <= e7 THEN 7 WHEN x <= e8 THEN 8
        |    WHEN x <= e9 THEN 9 ELSE 10 END AS bin
        |  FROM d, e),
        |per AS (SELECT s, bin, CAST(count(*) AS BIGINT) AS n_sb
        |        FROM b GROUP BY 1, 2),
        |gb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_gb
        |       FROM b GROUP BY 1),
        |ns AS (SELECT s, CAST(sum(n_sb) AS BIGINT) AS n_s
        |       FROM per GROUP BY 1),
        |ng AS (SELECT CAST(sum(n_gb) AS BIGINT) AS n_g FROM gb),
        |grid AS (
        |  SELECT ns.s, ns.n_s, gb.bin, gb.n_gb, ng.n_g,
        |    abs(coalesce(per.n_sb, 0) * ng.n_g - gb.n_gb * ns.n_s)
        |      AS dev
        |  FROM ns CROSS JOIN gb CROSS JOIN ng
        |  LEFT JOIN per ON per.s = ns.s AND per.bin = gb.bin),
        |ranked AS (
        |  SELECT s, n_s, n_g, bin, dev,
        |    row_number() OVER (PARTITION BY s ORDER BY dev DESC, bin)
        |      AS rn
        |  FROM grid)
        |SELECT g.s AS source, CAST(max(g.n_s) AS BIGINT) AS n_docs,
        |  CAST(sum(g.dev) * 1000000 // (2 * max(g.n_s) * max(g.n_g))
        |    AS BIGINT) AS tv_ppm,
        |  CAST(max(CASE WHEN r.rn = 1 THEN r.bin END) AS INTEGER)
        |    AS worst_bin
        |FROM grid g JOIN ranked r
        |  ON r.s = g.s AND r.bin = g.bin
        |GROUP BY g.s ORDER BY source""".stripMargin),

    // span-level code-switching audit: 20-token windows language-ID'd
    // with the x52 marker rule; per doc: dominant language (most
    // windows, smallest on ties), adjacent-window switches, minority
    // share ppm — the mixed-language hazard a doc-level tag hides
    Q.df("x221_code_switching",
      (s, dir) => TextStats.codeSwitching(
        Tables.load(s, dir, "documents"), 20),
      s"""WITH $duckTok,
         |ch AS (
         |  SELECT doc_id, (pos - 1) // 20 + 1 AS w_no,
         |    ' ' || string_agg(w, ' ' ORDER BY pos) || ' ' AS ct
         |  FROM tok GROUP BY doc_id, (pos - 1) // 20),
         |h AS (
         |  SELECT doc_id, w_no,
         |    (length(ct) - length(replace(ct, ' the ', ''))) / 5 AS h_en,
         |    (length(ct) - length(replace(ct, ' der ', ''))) / 5 AS h_de,
         |    (length(ct) - length(replace(ct, ' le ', ''))) / 4 AS h_fr,
         |    (length(ct) - length(replace(ct, ' el ', ''))) / 4 AS h_es
         |  FROM ch),
         |p AS (
         |  SELECT doc_id, w_no,
         |    CASE WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_en THEN 'de'
         |         WHEN h_fr >= h_es AND h_fr >= h_en THEN 'fr'
         |         WHEN h_es >= h_en THEN 'es'
         |         ELSE 'en' END AS pred
         |  FROM h),
         |sw AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         |    CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> pred
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_switches
         |  FROM (SELECT doc_id, pred,
         |          lag(pred) OVER (PARTITION BY doc_id ORDER BY w_no)
         |            AS prev
         |        FROM p) q GROUP BY 1),
         |dom AS (
         |  SELECT doc_id, pred AS dominant_lang,
         |    CAST(cnt AS BIGINT) AS n_dom
         |  FROM (SELECT doc_id, pred, count(*) AS cnt,
         |          row_number() OVER (PARTITION BY doc_id
         |            ORDER BY count(*) DESC, pred) AS rn
         |        FROM p GROUP BY doc_id, pred) q
         |  WHERE rn = 1)
         |SELECT sw.doc_id, sw.n_windows, dom.dominant_lang,
         |  sw.n_switches,
         |  (sw.n_windows - dom.n_dom) * 1000000 // sw.n_windows
         |    AS minority_ppm
         |FROM sw JOIN dom USING (doc_id)
         |ORDER BY doc_id""".stripMargin),

    // per-source Gini of document length: whole-distribution
    // inequality in exact ppm via the rank formula
    // (2*S1 - (n+1)*S0) / (n*S0) — complements the Pareto top-end cut
    Q.df("x222_gini_lengths",
      (s, dir) => Profile.giniConcentration(
        Tables.load(s, dir, "documents"), "source", col("n_chars")),
      """WITH r AS (
        |  SELECT source AS s, n_chars AS x,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars)
        |      AS i
        |  FROM documents)
        |SELECT s AS source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS total,
        |  CAST(CASE WHEN sum(x) > 0
        |    THEN (2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1000000
        |         // (count(*) * sum(x))
        |    ELSE 0 END AS BIGINT) AS gini_ppm
        |FROM r GROUP BY 1 ORDER BY source""".stripMargin),

    // calibration APPLY: each doc's score becomes its exact in-source
    // rank position ppm (ties broken on id — fully deterministic);
    // "top 10%" now means the same thing in every source
    Q.df("x223_score_normalize",
      (s, dir) => Profile.scoreNormalize(
        Tables.load(s, dir, "documents"), "source", "doc_id",
        col("n_chars")),
      """SELECT source, doc_id, CAST(n_chars AS BIGINT) AS score,
        |  CAST(CASE WHEN cnt > 1
        |    THEN (rn - 1) * 1000000 // (cnt - 1)
        |    ELSE 500000 END AS BIGINT) AS pct_ppm
        |FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM documents) t
        |ORDER BY source, doc_id""".stripMargin),

    // Benford first-digit audit per event type: observed cents
    // leading-digit distribution vs the Benford ppm constants
    // (fixed integers summing to exactly 1e6 — no log anywhere),
    // scored as exact TV ppm; the fabricated/capped-amounts smell test
    Q.df("x224_benford_audit",
      (s, dir) => Profile.benfordAudit(
        Tables.load(s, dir, "events"), "event_type",
        expr("CAST(floor(value * 100) AS BIGINT)")),
      """WITH v AS (
        |  SELECT event_type AS s, CAST(floor(value * 100) AS BIGINT)
        |      AS v
        |  FROM events),
        |d AS (SELECT s, CAST(substr(CAST(v AS VARCHAR), 1, 1)
        |        AS INTEGER) AS dig
        |      FROM v WHERE v > 0),
        |per AS (SELECT s, dig, CAST(count(*) AS BIGINT) AS n_sd
        |        FROM d GROUP BY 1, 2),
        |ns AS (SELECT s, CAST(sum(n_sd) AS BIGINT) AS n
        |       FROM per GROUP BY 1),
        |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091),
        |        (3, 124939), (4, 96910), (5, 79181), (6, 66947),
        |        (7, 57992), (8, 51153), (9, 45757)) AS t(dig, exp_ppm)),
        |g AS (
        |  SELECT ns.s, ns.n, e.dig,
        |    abs(coalesce(per.n_sd, 0) * 1000000 - e.exp_ppm * ns.n)
        |      AS dev
        |  FROM ns CROSS JOIN e
        |  LEFT JOIN per ON per.s = ns.s AND per.dig = e.dig),
        |rk AS (SELECT s, dig, dev,
        |         row_number() OVER (PARTITION BY s
        |           ORDER BY dev DESC, dig) AS rn
        |       FROM g)
        |SELECT g.s AS event_type, CAST(max(g.n) AS BIGINT) AS n,
        |  CAST(sum(g.dev) // (2 * max(g.n)) AS BIGINT) AS tv_ppm,
        |  CAST(max(CASE WHEN rk.rn = 1 THEN rk.dig END) AS INTEGER)
        |    AS worst_digit
        |FROM g JOIN rk ON rk.s = g.s AND rk.dig = g.dig
        |GROUP BY g.s ORDER BY event_type""".stripMargin),

    // NEAR-dup-adjusted effective tokens: each x66 connected-component
    // cluster charged ONCE, to its representative's source — a source
    // that only republishes reports unique_tokens 0 / ppm 1e6; the
    // composed dedup -> accounting pass a mixture planner actually runs
    Q.df("x225_effective_tokens_neardup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        TextStats.effectiveTokensByCluster(docs,
          Dedup.clusters(docs, Dedup.jaccardPairs(docs, 0.2,
            maxDocFreq = Some(2))))
      },
      s"""WITH RECURSIVE $duckTok, ${duckShinglesFiltered(2)}, $duckJaccardTail,
         |pairs AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
         |), edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION SELECT d2, d1 FROM pairs
         |), reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
         |), cl AS (
         |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
         |), tc AS (
         |  SELECT d.doc_id, d.source,
         |    CAST(coalesce(t.n_tok, 0) AS BIGINT) AS n_tok
         |  FROM documents d LEFT JOIN (
         |    SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1) t
         |    USING (doc_id)
         |), raw AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS raw_tokens
         |  FROM tc GROUP BY 1
         |), u AS (
         |  SELECT tc.source, CAST(count(*) AS BIGINT) AS n_reps,
         |    CAST(sum(tc.n_tok) AS BIGINT) AS unique_tokens
         |  FROM (SELECT DISTINCT cluster_id FROM cl) r
         |  JOIN tc ON tc.doc_id = r.cluster_id GROUP BY 1)
         |SELECT raw.source, raw.n_docs, raw.raw_tokens,
         |  CAST(coalesce(u.n_reps, 0) AS BIGINT) AS n_reps,
         |  CAST(coalesce(u.unique_tokens, 0) AS BIGINT) AS unique_tokens,
         |  CAST(CASE WHEN raw.raw_tokens > 0
         |    THEN (raw.raw_tokens - coalesce(u.unique_tokens, 0))
         |         * 1000000 // raw.raw_tokens
         |    ELSE 0 END AS BIGINT) AS dup_token_ppm
         |FROM raw LEFT JOIN u USING (source)
         |ORDER BY source""".stripMargin),

    // per-doc keyword extraction: top-3 terms by integer TF-IDF
    // (tf*1e6 div df, term tie-break) — model-free corpus tagging;
    // the top-k window is partitioned by doc, never global
    Q.df("x226_keywords",
      (s, dir) => TextStats.keywords(
        Tables.load(s, dir, "documents"), 3),
      s"""WITH $duckTok,
         |tf AS (SELECT doc_id, w AS term, CAST(count(*) AS BIGINT)
         |         AS tf
         |       FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |          FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT doc_id, term, tf, df,
         |    CAST(tf * 1000000 // df AS BIGINT) AS score
         |  FROM tf JOIN dfreq USING (term)),
         |rk AS (
         |  SELECT doc_id, term, tf, df, score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, term) AS rn
         |  FROM scored)
         |SELECT doc_id, term, tf, df, score
         |FROM rk WHERE rn <= 3
         |ORDER BY doc_id, score DESC, term""".stripMargin),

    // embedding-store quality gate: per-label vector counts, zero
    // vectors, min/median/max quantized squared norm — runs the same
    // codegen'd quant_dot arithmetic as the production kNN path
    Q.df("x227_embedding_audit",
      (s, dir) => Similarity.embeddingAudit(
        Tables.load(s, dir, "embeddings")),
      """WITH n AS (
        |  SELECT e.label, e.vec_id,
        |    CAST(sum(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000)
        |      AS BIGINT) * CAST(floor(CAST(e.embedding[i] AS DOUBLE)
        |      * 10000) AS BIGINT)) AS BIGINT) AS norm2
        |  FROM embeddings e, range(1, 65) r(i)
        |  GROUP BY 1, 2)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(CASE WHEN norm2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero,
        |  CAST(min(norm2) AS BIGINT) AS min_norm2,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY norm2)
        |    AS BIGINT) AS p50_norm2,
        |  CAST(max(norm2) AS BIGINT) AS max_norm2
        |FROM n GROUP BY label ORDER BY label""".stripMargin),

    // dedup diagnostic histogram: cluster-size distribution of the x66
    // connected components — singleton-dominated is healthy, one giant
    // cluster is a scrape accident, a fat 2-5 band is template spam
    Q.df("x228_cluster_size_histogram",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.clusterSizeHistogram(
          Dedup.clusters(docs, Dedup.jaccardPairs(docs, 0.2,
            maxDocFreq = Some(2))))
      },
      s"""WITH RECURSIVE $duckTok, ${duckShinglesFiltered(2)}, $duckJaccardTail,
         |pairs AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
         |), edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION SELECT d2, d1 FROM pairs
         |), reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
         |), cl AS (
         |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
         |), cs AS (
         |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM cl GROUP BY 1)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(cluster_size) AS BIGINT) AS n_docs
         |FROM cs GROUP BY 1 ORDER BY cluster_size""".stripMargin),

    // session-quality mart: the q41 gap-rule sessions summarized to
    // bounce rate (single-event sessions ppm) + exact median/max
    // session size — the daily engagement-health row
    Q.df("x229_session_quality",
      (s, dir) => TimeSeries.sessionQuality(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_id"),
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN date_diff('second',
        |           lag(ts) OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id), ts)
        |         > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |), sessions AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM marked
        |), sized AS (
        |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_ev
        |  FROM sessions GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bounces,
        |  CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS bounce_ppm,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_ev)
        |    AS BIGINT) AS p50_session_events,
        |  CAST(max(n_ev) AS BIGINT) AS max_session_events
        |FROM sized""".stripMargin),

    // label-cluster compactness + confusability: mean within-label
    // pair dot = S·S div n^2 with S the summed quantized vectors (one
    // algebraic identity, no pair join over members); nearest other
    // label by mean cross-pair dot names the confusable pair
    Q.df("x230_label_compactness",
      (s, dir) => Similarity.labelCompactness(
        Tables.load(s, dir, "embeddings")),
      """WITH comp AS (
        |  SELECT label, i,
        |    CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000)
        |      AS BIGINT)) AS BIGINT) AS s
        |  FROM embeddings, range(1, 65) r(i)
        |  GROUP BY 1, 2),
        |ns AS (SELECT label, CAST(count(*) AS BIGINT) AS n
        |       FROM embeddings GROUP BY 1),
        |self AS (
        |  SELECT c.label, ns.n AS n_vecs,
        |    CAST(sum(c.s * c.s) // (ns.n * ns.n) AS BIGINT)
        |      AS mean_pair_dot
        |  FROM comp c JOIN ns USING (label)
        |  GROUP BY c.label, ns.n),
        |cross_d AS (
        |  SELECT a.label, b.label AS other,
        |    CAST(sum(a.s * b.s) // (na.n * nb.n) AS BIGINT)
        |      AS mean_cross_dot
        |  FROM comp a JOIN comp b
        |    ON a.i = b.i AND a.label <> b.label
        |  JOIN ns na ON na.label = a.label
        |  JOIN ns nb ON nb.label = b.label
        |  GROUP BY a.label, b.label, na.n, nb.n),
        |nearest AS (
        |  SELECT label, other AS nearest_label,
        |    mean_cross_dot AS nearest_dot
        |  FROM (SELECT label, other, mean_cross_dot,
        |          row_number() OVER (PARTITION BY label
        |            ORDER BY mean_cross_dot DESC, other) AS rn
        |        FROM cross_d) t
        |  WHERE rn = 1)
        |SELECT s.label, s.n_vecs, s.mean_pair_dot,
        |  n.nearest_label, n.nearest_dot
        |FROM self s JOIN nearest n USING (label)
        |ORDER BY s.label""".stripMargin),

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

    // vocabulary-pruning sweep off the count histogram: per min-count
    // threshold, surviving types and covered token mass (the Zipf
    // cutoff decision); adding a threshold costs |distinct counts| rows
    Q.df("x232_vocab_pruning",
      (s, dir) => TextStats.vocabPruning(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |tc AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
         |       FROM tok GROUP BY 1),
         |hist AS (SELECT cnt, CAST(count(*) AS BIGINT) AS n_types
         |         FROM tc GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_types) AS BIGINT) AS all_types,
         |          CAST(sum(cnt * n_types) AS BIGINT) AS all_mass
         |        FROM hist),
         |th AS (SELECT * FROM (VALUES (1), (2), (4), (8), (16))
         |         AS t(min_count))
         |SELECT CAST(th.min_count AS BIGINT) AS min_count,
         |  CAST(sum(h.n_types) AS BIGINT) AS n_types_kept,
         |  CAST(sum(h.n_types) * 1000000 // max(tot.all_types)
         |    AS BIGINT) AS types_kept_ppm,
         |  CAST(sum(h.cnt * h.n_types) * 1000000 // max(tot.all_mass)
         |    AS BIGINT) AS mass_kept_ppm
         |FROM th JOIN hist h ON h.cnt >= th.min_count, tot
         |GROUP BY th.min_count ORDER BY min_count""".stripMargin),

    // per-source shingle novelty: share of a source's distinct
    // shingles appearing NOWHERE else — "is this source adding
    // anything", the absolute complement of the x174 overlap matrix;
    // one distinct projection + two keyed aggs, shingles never pair
    Q.df("x233_source_novelty",
      (s, dir) => Dedup.sourceNovelty(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok, $duckShingles,
         |ss AS (
         |  SELECT DISTINCT sh.shingle, d.source
         |  FROM sh JOIN documents d USING (doc_id)),
         |spread AS (
         |  SELECT shingle, CAST(count(*) AS BIGINT) AS n_sources
         |  FROM ss GROUP BY 1)
         |SELECT ss.source, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN spread.n_sources = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS unique_shingles,
         |  CAST(sum(CASE WHEN spread.n_sources = 1 THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS novelty_ppm
         |FROM ss JOIN spread USING (shingle)
         |GROUP BY ss.source ORDER BY ss.source""".stripMargin),

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

    // MinHash calibration curve: LSH candidates rolled up by their
    // 8-hash agreement count vs EXACT Jaccard — what a signature
    // agreement actually means on THIS corpus, checked before
    // trusting the sketch at scale
    Q.df("x235_minhash_calibration",
      (s, dir) => Dedup.minhashCalibration(
        Tables.load(s, dir, "documents")),
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
         |), $duckJaccardTail,
         |jacs AS (
         |  SELECT cand.d1, cand.d2,
         |    CAST(floor(10000.0 * i / (s1.n + s2.n - i)) AS BIGINT)
         |      AS jac
         |  FROM cand JOIN inter ON cand.d1 = inter.d1
         |    AND cand.d2 = inter.d2
         |  JOIN sz s1 ON cand.d1 = s1.doc_id
         |  JOIN sz s2 ON cand.d2 = s2.doc_id
         |), est AS (
         |  SELECT c.d1, c.d2,
         |    CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS BIGINT)
         |      AS est8
         |  FROM cand c JOIN mh a ON a.doc_id = c.d1
         |  JOIN mh b ON b.doc_id = c.d2 AND b.i = a.i
         |  GROUP BY 1, 2)
         |SELECT est8, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(jac) // count(*) AS BIGINT) AS mean_jac_x10k,
         |  CAST(min(jac) AS BIGINT) AS min_jac_x10k,
         |  CAST(max(jac) AS BIGINT) AS max_jac_x10k
         |FROM est JOIN jacs USING (d1, d2)
         |GROUP BY 1 ORDER BY est8""".stripMargin),

    // power-of-two activity histogram: per-user event counts bucketed
    // by floor(log2) via bit_length — the ten-row heavy-tail audit
    // that sizes state stores and salting thresholds; no float log
    Q.df("x236_activity_histogram",
      (s, dir) => Profile.activityHistogram(
        Tables.load(s, dir, "events"), "user_id"),
      """WITH per AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM per),
        |b AS (
        |  SELECT CAST(CAST(1 AS BIGINT) << (length(bin(c)) - 1)
        |      AS BIGINT) AS bucket_pow2, c
        |  FROM per)
        |SELECT bucket_pow2, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(c) AS BIGINT) AS n_events,
        |  CAST(sum(c) * 1000000 // max(tot.total) AS BIGINT)
        |    AS events_ppm
        |FROM b, tot GROUP BY 1 ORDER BY bucket_pow2""".stripMargin),

    // percent-of-parent drill-down: (region, nation) revenue with
    // exact basis-point shares of the parent region and of the total
    // — integer cross-multiplied, the fact table collapses to the
    // grid in one map-side-combinable agg
    Q.df("x237_hierarchy_shares",
      (s, dir) => {
        val fact = Tables.load(s, dir, "lineitem")
          .join(Tables.load(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.load(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.load(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.load(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
        Rollup.hierarchyShares(fact, "r_name", "n_name",
          expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100)" +
            " AS BIGINT)"))
      },
      """WITH per AS (
        |  SELECT r_name, n_name,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
        |      * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |l1 AS (SELECT r_name, CAST(sum(cents) AS BIGINT) AS l1_cents
        |       FROM per GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per)
        |SELECT per.r_name, per.n_name, per.cents,
        |  CAST(per.cents * 10000 // l1.l1_cents AS BIGINT)
        |    AS share_of_parent_bp,
        |  CAST(per.cents * 10000 // tot.total AS BIGINT)
        |    AS share_of_total_bp
        |FROM per JOIN l1 USING (r_name), tot
        |ORDER BY r_name, n_name""".stripMargin),

    // weekly growth accounting: active = new + retained + resurrected
    // (identity spec-pinned); churn attributed to the week AFTER the
    // last consecutive activity, capped at the corpus horizon
    Q.df("x238_growth_accounting",
      (s, dir) => TimeSeries.growthAccounting(
        Tables.load(s, dir, "events"), "user_id", "ts"),
      """WITH act AS (
        |  SELECT DISTINCT user_id AS u,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
        |      AS wk
        |  FROM events),
        |f AS (
        |  SELECT u, wk,
        |    min(wk) OVER (PARTITION BY u) AS first_wk,
        |    lag(wk) OVER (PARTITION BY u ORDER BY wk) AS prev_wk,
        |    lead(wk) OVER (PARTITION BY u ORDER BY wk) AS next_wk
        |  FROM act),
        |mx AS (SELECT max(wk) AS max_wk FROM act),
        |a AS (
        |  SELECT wk, CAST(count(*) AS BIGINT) AS n_active,
        |    CAST(sum(CASE WHEN wk = first_wk THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_new,
        |    CAST(sum(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN wk <> first_wk
        |      AND (prev_wk IS NULL OR prev_wk < wk - 1)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM f GROUP BY 1),
        |c AS (
        |  SELECT f.wk + 1 AS wk, CAST(count(*) AS BIGINT)
        |      AS n_churned_in
        |  FROM f, mx
        |  WHERE (f.next_wk IS NULL OR f.next_wk > f.wk + 1)
        |    AND f.wk + 1 <= mx.max_wk
        |  GROUP BY 1)
        |SELECT a.wk, a.n_active, a.n_new, a.n_retained,
        |  a.n_resurrected,
        |  CAST(coalesce(c.n_churned_in, 0) AS BIGINT) AS n_churned_in
        |FROM a LEFT JOIN c USING (wk)
        |ORDER BY a.wk""".stripMargin),

    // fulfillment-lag mart: ship-date minus order-date in whole days
    // per priority tier, exact percentile_disc p50/p99/max — the
    // supply-chain SLA report; also regression-covers BOTH re-encoded
    // parquet date columns end to end
    Q.df("x239_fulfillment_lag",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val o = Tables.load(s, dir, "orders")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority"),
            expr("datediff(to_date(l_shipdate), to_date(o_orderdate))")
              .cast("bigint").as("lag_days"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            expr("CAST(percentile_disc(0.5) WITHIN GROUP" +
              " (ORDER BY lag_days) AS BIGINT)").as("p50_lag_days"),
            expr("CAST(percentile_disc(0.99) WITHIN GROUP" +
              " (ORDER BY lag_days) AS BIGINT)").as("p99_lag_days"),
            max("lag_days").as("max_lag_days"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY
        |    date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE))) AS BIGINT) AS p50_lag_days,
        |  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY
        |    date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE))) AS BIGINT) AS p99_lag_days,
        |  CAST(max(date_diff('day', CAST(o_orderdate AS DATE),
        |    CAST(l_shipdate AS DATE))) AS BIGINT) AS max_lag_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),

    // streaming heavy-tail monitor: per-user counts as complete-mode
    // state, bucketed by bit_length at SERVE time (bucketing in the
    // stream would freeze early assignments) — drained == batch x236
    Q.df("x240_stream_activity",
      (s, dir) => Streaming.streamActivityHistogram(s, dir),
      """WITH per AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM per),
        |b AS (
        |  SELECT CAST(CAST(1 AS BIGINT) << (length(bin(c)) - 1)
        |      AS BIGINT) AS bucket_pow2, c
        |  FROM per)
        |SELECT bucket_pow2, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(c) AS BIGINT) AS n_events,
        |  CAST(sum(c) * 1000000 // max(tot.total) AS BIGINT)
        |    AS events_ppm
        |FROM b, tot GROUP BY 1 ORDER BY bucket_pow2""".stripMargin),

    // quality-mass concentration: which sources supply the corpus's
    // globally-top-decile (by length) documents, and what share of
    // each source's token mass that elite slice carries — exact
    // percentile edge broadcast, integer ppm shares
    Q.df("x241_top_decile_mass",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val d = docs.select(col("source"), col("n_chars"),
          size(TextStats.tokensCol(col("text"))).cast("bigint")
            .as("n_tok"))
        val edge = d.agg(expr("CAST(percentile_disc(0.9) WITHIN GROUP" +
          " (ORDER BY n_chars) AS BIGINT)").as("p90"))
        d.crossJoin(broadcast(edge))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("n_chars") > col("p90"), 1L).otherwise(0L))
              .as("n_top_docs"),
            sum("n_tok").as("tokens"),
            sum(when(col("n_chars") > col("p90"), col("n_tok"))
              .otherwise(0L)).as("top_tokens"))
          .select(col("source"), col("n_docs"), col("n_top_docs"),
            col("tokens"), col("top_tokens"),
            when(col("tokens") > 0,
              expr("top_tokens * 1000000L div tokens"))
              .otherwise(0L).as("top_mass_ppm"))
          .orderBy("source")
      },
      """WITH d AS (
        |  SELECT source, n_chars,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |e AS (SELECT CAST(percentile_disc(0.9) WITHIN GROUP
        |        (ORDER BY n_chars) AS BIGINT) AS p90 FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n_chars > e.p90 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_top_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS tokens,
        |  CAST(sum(CASE WHEN n_chars > e.p90 THEN n_tok ELSE 0 END)
        |    AS BIGINT) AS top_tokens,
        |  CAST(CASE WHEN sum(n_tok) > 0
        |    THEN sum(CASE WHEN n_chars > e.p90 THEN n_tok ELSE 0 END)
        |         * 1000000 // sum(n_tok)
        |    ELSE 0 END AS BIGINT) AS top_mass_ppm
        |FROM d, e GROUP BY source ORDER BY source""".stripMargin),

    // streaming NEAR-dup front door: arriving docs MinHash-banded
    // in-row, probed against the static corpus band table
    // (stream-static equi-join), exact-verified per row via
    // array_intersect — stateless per batch; the drained mart must
    // equal batch minhashLshPairs, so the oracle is x57's, verbatim
    Q.df("x242_stream_neardup",
      (s, dir) => Streaming.streamNearDup(s, dir),
      duckMinhash8x2Oracle),

    // one-vs-rest retrieval AUC per label: exact-integer Mann-Whitney
    // rank-sum with midranks over the quantized-dot scores against a
    // per-label exemplar — the threshold-free "can this embedding
    // space retrieve the class?" gate before trusting cosine ops;
    // window only over the (label, distinct-score) grid
    Q.df("x243_retrieval_auc",
      (s, dir) => Similarity.retrievalAuc(
        Tables.load(s, dir, "embeddings")),
      """WITH ex AS (
        |  SELECT label AS qlabel, min(vec_id) AS ex_id
        |  FROM embeddings GROUP BY 1
        |), exv AS (
        |  SELECT x.qlabel, x.ex_id, e.embedding AS qe
        |  FROM ex x JOIN embeddings e ON e.vec_id = x.ex_id
        |), scored AS (
        |  SELECT x.qlabel, x.ex_id, e.vec_id, e.label,
        |    CAST(sum(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000) AS BIGINT)
        |           * CAST(floor(CAST(x.qe[i] AS DOUBLE) * 10000) AS BIGINT))
        |      AS BIGINT) AS dot_q
        |  FROM exv x JOIN embeddings e ON e.vec_id <> x.ex_id,
        |       range(1, 65) r(i)
        |  GROUP BY 1, 2, 3, 4
        |), g AS (
        |  SELECT qlabel, ex_id, dot_q, CAST(count(*) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS np
        |  FROM scored GROUP BY 1, 2, 3
        |), w AS (
        |  SELECT qlabel, ex_id, dot_q, nt, np,
        |    CAST(coalesce(sum(nt) OVER (PARTITION BY qlabel ORDER BY dot_q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        |  FROM g
        |), agg AS (
        |  SELECT qlabel AS label, ex_id,
        |    CAST(sum(np) AS BIGINT) AS n_pos,
        |    CAST(sum(nt - np) AS BIGINT) AS n_neg,
        |    sum(CAST(np AS HUGEINT) * (2 * cb + nt + 1)) AS two_r
        |  FROM w GROUP BY 1, 2
        |)
        |SELECT label, ex_id, n_pos, n_neg,
        |  CAST((two_r - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000
        |       // (CAST(2 AS HUGEINT) * n_pos * n_neg) AS BIGINT) AS auc_ppm
        |FROM agg WHERE n_pos > 0 AND n_neg > 0
        |ORDER BY label""".stripMargin),

    // cross-source duplication audit: pairwise exact shingle-set
    // Jaccard between sources via per-shingle source-set explosion
    // (bounded by |sources|²) — never a shingle self-join; the full
    // matrix INCLUDING zero-overlap pairs, because "no overlap" is
    // the finding a mixing decision needs
    Q.df("x244_source_overlap",
      (s, dir) => Dedup.sourceOverlapMatrix(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok, $duckShingles,
         |ss AS (
         |  SELECT DISTINCT d.source, s.shingle
         |  FROM sh s JOIN documents d USING (doc_id)
         |), sz AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM ss GROUP BY 1
         |), it AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(count(*) AS BIGINT) AS inter
         |  FROM ss a JOIN ss b
         |    ON a.shingle = b.shingle AND a.source < b.source
         |  GROUP BY 1, 2
         |)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  a.n AS n_a, b.n AS n_b,
         |  CAST(coalesce(it.inter, 0) AS BIGINT) AS inter,
         |  CAST(1000000 * coalesce(it.inter, 0)
         |       // (a.n + b.n - coalesce(it.inter, 0)) AS BIGINT) AS jac_ppm
         |FROM sz a JOIN sz b ON a.source < b.source
         |LEFT JOIN it ON it.src_a = a.source AND it.src_b = b.source
         |ORDER BY src_a, src_b""".stripMargin),

    // split-leakage audit: x57 near-dup pairs straddling the x90
    // content-hash split — per straddling split pair, how many leaks,
    // the worst Jaccard, and the smallest (d1, d2) example to triage;
    // two equi-joins of the split assignment onto the pair table
    Q.df("x245_split_leakage",
      (s, dir) => Dedup.splitLeakage(Tables.load(s, dir, "documents")),
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
         |), $duckJaccardTail,
         |pr AS (
         |  SELECT cand.d1, cand.d2,
         |    CAST(floor(10000.0 * i / (s1.n + s2.n - i)) AS BIGINT) AS jac_x10k
         |  FROM cand JOIN inter ON cand.d1 = inter.d1 AND cand.d2 = inter.d2
         |  JOIN sz s1 ON cand.d1 = s1.doc_id JOIN sz s2 ON cand.d2 = s2.doc_id
         |), sp AS (
         |  SELECT doc_id,
         |    CASE WHEN h < 'cc' THEN 'train'
         |         WHEN h < 'e6' THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |          substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
         |        FROM documents) x
         |), st AS (
         |  SELECT least(a.split, b.split) AS split_a,
         |    greatest(a.split, b.split) AS split_b,
         |    pr.d1, pr.d2, pr.jac_x10k
         |  FROM pr JOIN sp a ON a.doc_id = pr.d1
         |          JOIN sp b ON b.doc_id = pr.d2
         |  WHERE a.split <> b.split
         |)
         |SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs,
         |  max(jac_x10k) AS worst_jac_x10k,
         |  CAST(min(d1) AS BIGINT) AS example_d1,
         |  min_by(d2, lpad(CAST(d1 AS VARCHAR), 20, '0') || ':'
         |             || lpad(CAST(d2 AS VARCHAR), 20, '0')) AS example_d2
         |FROM st GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin),

    // Tukey-fence outlier audit per event type: exact integer-cents
    // quartiles, 1.5×IQR fences, out-of-fence counts — the per-metric
    // data-quality gate; fences computed once per group then broadcast
    // back for one counting pass
    Q.df("x246_value_fences",
      (s, dir) => Profile.valueFences(
        Tables.load(s, dir, "events"), "event_type", col("value")),
      """WITH c AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), q AS (
        |  SELECT event_type,
        |    CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS q1,
        |    CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS q3
        |  FROM c GROUP BY 1
        |), f AS (
        |  SELECT event_type, q1, q3,
        |    q1 - (3 * (q3 - q1)) // 2 AS lo,
        |    q3 + (3 * (q3 - q1)) // 2 AS hi
        |  FROM q
        |)
        |SELECT c.event_type, CAST(count(*) AS BIGINT) AS n,
        |  f.q1, f.q3, f.lo, f.hi,
        |  CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_out_lo,
        |  CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_out_hi,
        |  min(cents) AS min_cents, max(cents) AS max_cents
        |FROM c JOIN f USING (event_type)
        |GROUP BY 1, f.q1, f.q3, f.lo, f.hi
        |ORDER BY event_type""".stripMargin),

    // leave-one-out 1-NN margin audit: per label, how many probes'
    // nearest neighbors are CROSS-label (easiest-positive minus
    // hardest-negative <= 0) — the embedding-space go/no-go for
    // neighbor-based dedup; conditional-max aggregates, no window
    Q.df("x247_nn_margin",
      (s, dir) => Similarity.nnMarginAudit(
        Tables.load(s, dir, "embeddings"), 200),
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qe, label AS qlabel
        |  FROM embeddings WHERE vec_id < 200
        |), pairs AS (
        |  SELECT q.qid, q.qlabel, e.vec_id, e.label,
        |    CAST(sum(CAST(floor(CAST(qe[i] AS DOUBLE) * 10000) AS BIGINT)
        |           * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000) AS BIGINT))
        |      AS BIGINT) AS dot_q
        |  FROM q, embeddings e, range(1, 65) r(i)
        |  WHERE e.vec_id <> q.qid
        |  GROUP BY 1, 2, 3, 4
        |), per AS (
        |  SELECT qid, qlabel,
        |    max(CASE WHEN label = qlabel THEN dot_q END) AS pos_best,
        |    max(CASE WHEN label <> qlabel THEN dot_q END) AS neg_best
        |  FROM pairs GROUP BY 1, 2
        |)
        |SELECT qlabel AS label, CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(CASE WHEN pos_best - neg_best <= 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_violations,
        |  min(pos_best - neg_best) AS worst_margin,
        |  CAST(sum(pos_best - neg_best) AS BIGINT) AS sum_margin
        |FROM per WHERE pos_best IS NOT NULL AND neg_best IS NOT NULL
        |GROUP BY 1 ORDER BY label""".stripMargin),

    // deterministic Poisson-bootstrap CI for mean chars per source:
    // weights = Poisson(1) inverse-CDF of md5(r:doc_id) hex (the
    // hashSplit trick), replicate means on the source × reps grid,
    // exact percentile_disc over 32 replicates — reproducible error
    // bars on every per-source average
    Q.df("x248_bootstrap_ci",
      (s, dir) => Sampling.bootstrapCi(
        Tables.load(s, dir, "documents"), "source", "doc_id",
        col("n_chars"), reps = 32),
      """WITH e AS (
        |  SELECT source, doc_id, n_chars, r.r AS r,
        |    substr(md5(CAST(r.r AS VARCHAR) || ':' ||
        |      CAST(doc_id AS VARCHAR)), 1, 6) AS h
        |  FROM documents, range(0, 32) r(r)
        |), w AS (
        |  SELECT source, r, n_chars,
        |    CASE WHEN h < '5e2d58' THEN 0 WHEN h < 'bc5ab1' THEN 1
        |         WHEN h < 'eb715e' THEN 2 WHEN h < 'fb2397' THEN 3
        |         WHEN h < 'ff1025' THEN 4 WHEN h < 'ffd90f' THEN 5
        |         ELSE 6 END AS w
        |  FROM e
        |), rm AS (
        |  SELECT source, r,
        |    CAST(10000 * sum(w * n_chars) // sum(w) AS BIGINT) AS mean_x10k
        |  FROM w GROUP BY 1, 2 HAVING sum(w) > 0
        |), ci AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_reps,
        |    CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY mean_x10k)
        |      AS BIGINT) AS lo95_x10k,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY mean_x10k)
        |      AS BIGINT) AS med_x10k,
        |    CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY mean_x10k)
        |      AS BIGINT) AS hi95_x10k
        |  FROM rm GROUP BY 1
        |), pt AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(10000 * sum(n_chars) // count(*) AS BIGINT) AS point_x10k
        |  FROM documents GROUP BY 1
        |)
        |SELECT p.source, p.n_rows, p.point_x10k,
        |  c.n_reps, c.lo95_x10k, c.med_x10k, c.hi95_x10k
        |FROM pt p JOIN ci c USING (source)
        |ORDER BY source""".stripMargin),

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

    // exact two-sample Kolmogorov-Smirnov drift per source vs the rest
    // of the corpus: sup-CDF-gap as one integer rational over the
    // strata × distinct-values grid — bin-free where x217's TV needs
    // decile edges; sup attained at a pooled point, so exact
    Q.df("x251_ks_drift",
      (s, dir) => Profile.ksDrift(
        Tables.load(s, dir, "documents"), "source", col("n_chars")),
      """WITH d AS (SELECT source AS s, n_chars AS x FROM documents),
        |per AS (SELECT s, x, count(*) AS c FROM d GROUP BY 1, 2),
        |vals AS (SELECT x, count(*) AS cg FROM d GROUP BY 1),
        |ns AS (SELECT s, count(*) AS n_s FROM d GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM d),
        |gcum AS (SELECT x, sum(cg) OVER (ORDER BY x) AS cum_g FROM vals),
        |grid AS (
        |  SELECT ns.s, ns.n_s, v.x, coalesce(per.c, 0) AS c
        |  FROM ns CROSS JOIN vals v
        |  LEFT JOIN per ON per.s = ns.s AND per.x = v.x),
        |cum AS (
        |  SELECT s, n_s, x,
        |    sum(c) OVER (PARTITION BY s ORDER BY x) AS cum_s
        |  FROM grid),
        |diff AS (
        |  SELECT c.s, c.n_s, t.n - c.n_s AS n_r, c.x,
        |    abs(c.cum_s * (t.n - c.n_s) - (g.cum_g - c.cum_s) * c.n_s)
        |      AS dn
        |  FROM cum c JOIN gcum g USING (x) CROSS JOIN tot t),
        |mx AS (SELECT s, max(dn) AS mdn FROM diff GROUP BY 1)
        |SELECT d.s AS source, CAST(max(d.n_s) AS BIGINT) AS n_source,
        |  CAST(max(d.n_r) AS BIGINT) AS n_rest,
        |  CAST(max(d.dn) * 1000000 // (max(d.n_s) * max(d.n_r))
        |    AS BIGINT) AS ks_ppm,
        |  CAST(min(CASE WHEN d.dn = m.mdn THEN d.x END) AS BIGINT)
        |    AS worst_x
        |FROM diff d JOIN mx m USING (s)
        |GROUP BY d.s ORDER BY source""".stripMargin),

    // lossless Pass-Join edit-distance self-join on supplier names:
    // segment-pigeonhole candidates (tau+1 even segments; one must
    // survive any tau-edit alignment verbatim, shifted <= tau), exact
    // levenshtein verify — matches the brute-force oracle bit-for-bit
    // with O(n) candidate keys, never an all-pairs comparison
    Q.df("x252_edit_passjoin",
      (s, dir) => Entity.passJoin(
        Tables.load(s, dir, "supplier"), "s_name", tau = 1),
      """WITH n AS (SELECT DISTINCT s_name AS name FROM supplier)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM n a JOIN n b
        |  ON a.name < b.name
        |  AND abs(length(a.name) - length(b.name)) <= 1
        |WHERE levenshtein(a.name, b.name) <= 1
        |ORDER BY name_a, name_b""".stripMargin),

    // per-user time-weighted average event value — the metering
    // aggregate: each reading holds until the next, weights are
    // epoch-micros durations, numerator in DECIMAL(38,0); the plain
    // mean sits beside it to expose burst bias
    Q.df("x253_time_weighted_avg",
      (s, dir) => TimeSeries.timeWeightedAvg(
        Tables.load(s, dir, "events"),
        "user_id", "ts", "event_id", "value"),
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tm, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), l AS (
        |  SELECT user_id, cents,
        |    lead(tm) OVER (PARTITION BY user_id ORDER BY tm, event_id)
        |      - tm AS dur
        |  FROM e
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(dur) // 1000000 AS BIGINT) AS span_s,
        |  CAST(sum(cents * dur) // sum(dur) AS BIGINT) AS twa_cents,
        |  CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
        |FROM l GROUP BY 1 HAVING sum(dur) > 0
        |ORDER BY user_id""".stripMargin),

    // quantile normalization across sources — the batch-effect
    // correction: row r of n_s maps to the global order statistic
    // ceil(r*N/n_s); the global statistic table is built by
    // zipWithIndex (x132 machinery), never a SinglePartition window;
    // judged as the per-source rollup (equal-size sources normalize
    // to provably identical rollups)
    Q.df("x254_quantile_normalize",
      (s, dir) => Profile.quantileNormalize(
        Tables.load(s, dir, "documents"), "source", "doc_id",
        col("n_chars")),
      """WITH d AS (SELECT source AS s, doc_id AS id, n_chars AS x
        |           FROM documents),
        |r AS (SELECT s, id, x,
        |    row_number() OVER (PARTITION BY s ORDER BY x, id) AS r,
        |    count(*) OVER (PARTITION BY s) AS n_s
        |  FROM d),
        |t AS (SELECT count(*) AS n FROM d),
        |g AS (SELECT x AS x_norm,
        |    row_number() OVER (ORDER BY x, id) AS j FROM d),
        |m AS (SELECT r.s, g.x_norm
        |      FROM r CROSS JOIN t
        |      JOIN g ON g.j = (r.r * t.n + r.n_s - 1) // r.n_s)
        |SELECT s AS source, CAST(count(*) AS BIGINT) AS n,
        |  min(x_norm) AS min_norm,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY x_norm)
        |    AS BIGINT) AS med_norm,
        |  max(x_norm) AS max_norm,
        |  CAST(sum(x_norm) AS BIGINT) AS sum_norm
        |FROM m GROUP BY 1 ORDER BY source""".stripMargin),

    // packing-efficiency audit: split-and-carry pack count IS the LP
    // lower bound ceil(tokens/window); the audit prices what that
    // optimality costs — split docs and carried tokens (attention
    // fragmentation) — per md5 bucket, before a tokenizer job runs
    Q.df("x255_packing_audit",
      (s, dir) => Pack.packingAudit(
        Tables.load(s, dir, "documents"), 96),
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(instr('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
        |      AS BIGINT) AS bucket
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, bucket, n_tok,
        |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |), p AS (
        |  SELECT bucket, n_tok, cum - n_tok AS off FROM c
        |), sp AS (
        |  SELECT bucket, n_tok, off,
        |    CASE WHEN (off + n_tok - 1) // 96 <> off // 96
        |      THEN 1 ELSE 0 END AS split,
        |    greatest(0, off + n_tok - (off // 96 + 1) * 96) AS carried
        |  FROM p
        |), a AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tok,
        |    CAST(sum(split) AS BIGINT) AS n_split_docs,
        |    CAST(sum(carried) AS BIGINT) AS carried_tok
        |  FROM sp GROUP BY 1)
        |SELECT bucket, n_docs, n_tok,
        |  (n_tok + 95) // 96 AS n_packs,
        |  (n_tok + 95) // 96 * 96 - n_tok AS pad_last,
        |  n_split_docs, carried_tok,
        |  carried_tok * 1000000 // n_tok AS carry_ppm
        |FROM a ORDER BY bucket""".stripMargin),

    // label-noise audit by leave-one-out 5-NN consensus: probes whose
    // neighborhood plurality label disagrees with their own are
    // flagged — the mislabeling-rate estimate per label; bounded
    // top-k heap per probe, never a window over scored pairs
    Q.df("x256_label_noise",
      (s, dir) => Similarity.labelNoiseAudit(
        Tables.load(s, dir, "embeddings"), 200, 5),
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlabel
        |           FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT q.qid, q.qlabel, e.vec_id, e.label,
        |    CAST(sum(CAST(floor(CAST(qe[i] AS DOUBLE) * 10000) AS BIGINT)
        |      * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000)
        |        AS BIGINT)) AS BIGINT) AS dot_q
        |  FROM q, embeddings e, range(1, 65) r(i)
        |  WHERE e.vec_id <> q.qid
        |  GROUP BY 1, 2, 3, 4),
        |ranked AS (
        |  SELECT qid, qlabel, label, row_number() OVER (PARTITION BY qid
        |    ORDER BY dot_q DESC, vec_id) AS rn
        |  FROM pairs),
        |votes AS (
        |  SELECT qid, qlabel, label, count(*) AS votes
        |  FROM ranked WHERE rn <= 5 GROUP BY 1, 2, 3),
        |best AS (
        |  SELECT qid, qlabel, label, row_number() OVER (PARTITION BY qid
        |    ORDER BY votes DESC, label) AS vr
        |  FROM votes),
        |f AS (
        |  SELECT qid, qlabel,
        |    CASE WHEN label <> qlabel THEN 1 ELSE 0 END AS flagged
        |  FROM best WHERE vr = 1)
        |SELECT qlabel AS label, CAST(count(*) AS BIGINT) AS n_probes,
        |  CAST(sum(flagged) AS BIGINT) AS n_flagged,
        |  CAST(sum(flagged) * 1000000 // count(*) AS BIGINT) AS flag_ppm,
        |  min(CASE WHEN flagged = 1 THEN qid END) AS example_qid
        |FROM f GROUP BY 1 ORDER BY label""".stripMargin),

    // exact OLS trend slope of weekly activity per event type over the
    // ZERO-FILLED week calendar (a missing week is zero activity);
    // sign and |slope| ppm emitted separately — Spark div truncates,
    // DuckDB // floors, and on the split both agree exactly
    Q.df("x257_trend_slope",
      (s, dir) => TimeSeries.trendSlope(
        Tables.load(s, dir, "events"), "event_type", "ts"),
      """WITH w AS (
        |  SELECT event_type AS g,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk
        |  FROM events),
        |per AS (SELECT g, wk, count(*) AS y FROM w GROUP BY 1, 2),
        |cal AS (
        |  SELECT g, a, unnest(generate_series(a, b)) AS wk
        |  FROM (SELECT g, min(wk) AS a, max(wk) AS b FROM per GROUP BY 1)),
        |f AS (
        |  SELECT cal.g, cal.wk - cal.a AS x, coalesce(per.y, 0) AS y
        |  FROM cal LEFT JOIN per ON per.g = cal.g AND per.wk = cal.wk),
        |st AS (
        |  SELECT g, count(*) AS n, CAST(sum(y) AS BIGINT) AS total,
        |    sum(x) AS sx, sum(x * x) AS sxx, sum(x * y) AS sxy
        |  FROM f GROUP BY 1),
        |r AS (
        |  SELECT g, n, total,
        |    n * sxy - sx * total AS num,
        |    n * sxx - sx * sx AS den
        |  FROM st)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n_weeks, total,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
        |    AS BIGINT) AS slope_sign,
        |  CAST(CASE WHEN den = 0 THEN 0
        |    ELSE abs(num) * 1000000 // den END AS BIGINT) AS slope_abs_ppm
        |FROM r ORDER BY event_type""".stripMargin),

    // content-defined chunking dedup accounting (LBFS/rsync boundaries
    // on token trigram hashes): insertion-resilient where blockDedup's
    // fixed grid shifts everywhere; per source, the chunks/tokens that
    // duplicate a chunk seen anywhere in the corpus
    Q.df("x258_content_chunks",
      (s, dir) => Dedup.contentChunkStats(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |fl AS (
         |  SELECT doc_id, pos, w,
         |    CASE WHEN pos >= 3 AND substr(md5(
         |        lag(w, 2) OVER w1 || ' ' || lag(w, 1) OVER w1
         |        || ' ' || w), 32, 1) = '0'
         |      THEN 1 ELSE 0 END AS b
         |  FROM tok WINDOW w1 AS (PARTITION BY doc_id ORDER BY pos)),
         |ch AS (
         |  SELECT doc_id, pos, w,
         |    coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cno
         |  FROM fl),
         |chunks AS (
         |  SELECT doc_id, cno, CAST(count(*) AS BIGINT) AS n_tok,
         |    md5(string_agg(w, ' ' ORDER BY pos)) AS fp
         |  FROM ch GROUP BY 1, 2),
         |gf AS (SELECT fp, count(*) AS c FROM chunks GROUP BY 1),
         |j AS (
         |  SELECT d.source, chunks.doc_id, chunks.n_tok, gf.c
         |  FROM chunks JOIN gf USING (fp)
         |  JOIN documents d USING (doc_id))
         |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tok,
         |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_chunks,
         |  CAST(sum(CASE WHEN c > 1 THEN n_tok ELSE 0 END) AS BIGINT)
         |    AS dup_tok,
         |  CAST(sum(CASE WHEN c > 1 THEN n_tok ELSE 0 END) * 1000000
         |    // sum(n_tok) AS BIGINT) AS dup_ppm
         |FROM j GROUP BY 1 ORDER BY source""".stripMargin),

    // personalized PageRank (TrustRank shape): teleport mass only on
    // the seed set (customers with custkey % 20 = 0), scores become
    // seed-proximity trust priors; same integer-exact generative
    // oracle as x169 with the base term per-node
    Q.df("x259_personalized_pagerank",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val cs = graft.ext.CacheRegistry.checkpoint(
          li.join(ord, li("l_orderkey") === ord("o_orderkey"))
            .select(concat(lit("c"), col("o_custkey")).as("src"),
              concat(lit("s"), col("l_suppkey")).as("dst")).distinct())
        val edges = cs.union(
          cs.select(col("dst").as("src"), col("src").as("dst")))
        val seeds = ord.where(col("o_custkey") % 20 === 0)
          .select(concat(lit("c"), col("o_custkey")).as("node")).distinct()
        Graph.personalizedPageRank(edges, seeds, 4)
      },
      {
        val iters = 4
        val head =
          """WITH e0 AS MATERIALIZED (
            |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
            |                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
            |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            |), edges AS MATERIALIZED (
            |  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
            |), deg AS MATERIALIZED (
            |  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
            |  FROM edges GROUP BY 1
            |), sd AS MATERIALIZED (
            |  SELECT node, deg,
            |    CASE WHEN node LIKE 'c%'
            |      AND CAST(substr(node, 2) AS BIGINT) % 20 = 0
            |      THEN 1 ELSE 0 END AS sd
            |  FROM deg
            |), ns AS MATERIALIZED (
            |  SELECT CAST(sum(sd) AS BIGINT) AS n FROM sd),
            |s0 AS MATERIALIZED (
            |  SELECT node,
            |    CAST(sd * (1000000000000 // (SELECT n FROM ns)) AS BIGINT)
            |      AS score
            |  FROM sd)""".stripMargin
        val rounds = (0 until iters).map { i =>
          s""",
             |s${i + 1} AS MATERIALIZED (
             |  SELECT d.node,
             |    CAST(d.sd * (((1000000000000 // (SELECT n FROM ns)) * 15)
             |        // 100)
             |      + 85 * coalesce(c.c, 0) // 100 AS BIGINT) AS score
             |  FROM sd d LEFT JOIN (
             |    SELECT e.dst AS node, CAST(sum(s.score // g.deg) AS BIGINT)
             |      AS c
             |    FROM edges e JOIN s$i s ON e.src = s.node
             |    JOIN deg g ON g.node = e.src
             |    GROUP BY 1) c ON c.node = d.node)""".stripMargin
        }.mkString
        s"$head$rounds\nSELECT node, score FROM s$iters ORDER BY node"
      }),

    // persisted near-dup index, build-once/serve-many: the corpus band
    // table + per-doc shingle arrays are stored once; a re-scrape
    // batch (doc_id % 7 = 0) is answered from the STORE — one
    // documents scan in the serve plan (the batch itself),
    // PlanSpec-guarded; verify is one in-row array_intersect per
    // candidate, the x242 discipline
    Q.df("x260_neardup_index_serve",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val (ib, ish) = Dedup.nearDupIndexAt(
          s, docIndexPath(dir, "nd8x2"), docs)
        Dedup.probeNearDupIndex(ib, ish,
          docs.where(col("doc_id") % 7 === 0))
      },
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
         |), bb AS (SELECT * FROM bands WHERE doc_id % 7 = 0),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bb b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id <> b.doc_id
         |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS i
         |  FROM sh x JOIN sh y ON x.shingle = y.shingle
         |    AND x.doc_id <> y.doc_id AND y.doc_id % 7 = 0
         |  GROUP BY 1, 2)
         |SELECT cand.d1, cand.d2,
         |  CAST(floor(10000.0 * i / (s1.n + s2.n - i)) AS BIGINT)
         |    AS jac_x10k
         |FROM cand JOIN inter ON cand.d1 = inter.d1 AND cand.d2 = inter.d2
         |JOIN sz s1 ON cand.d1 = s1.doc_id
         |JOIN sz s2 ON cand.d2 = s2.doc_id
         |ORDER BY cand.d1, cand.d2""".stripMargin),

    // TTL-window dedup: a (user, event_type) is admitted once per
    // 7-day tumbling window, earliest (ts, id) kept — the batch twin
    // of dropDuplicatesWithinWatermark's bounded state; one keyed
    // min(struct) aggregation, no window function
    Q.df("x261_ttl_dedup",
      (s, dir) => TimeSeries.windowedDedup(
        Tables.load(s, dir, "events"),
        Seq("user_id", "event_type"), "ts", "event_id", 7),
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS win,
        |    epoch_us(ts) AS tm, event_id
        |  FROM events),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type,
        |      win ORDER BY tm, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id, event_type, win)
        |      AS n_events
        |  FROM e)
        |SELECT user_id, event_type, win,
        |  CAST(n_events AS BIGINT) AS n_events, event_id AS kept_id
        |FROM r WHERE rn = 1
        |ORDER BY user_id, event_type, win""".stripMargin),

    // right-to-be-forgotten purge audit: victim customers
    // (c_custkey % 13 = 0) cascade through orders to lineitems, plus
    // the directly-keyed events table; per-table purge/retain counts
    // with DECIMAL(38,0) retained-key checksums — the GDPR erasure
    // ledger, computed with one broadcast victim list and one scan
    // per fact table
    Q.df("x262_purge_audit",
      (s, dir) => Privacy.purgeAudit(
        Tables.load(s, dir, "customer"), Tables.load(s, dir, "orders"),
        Tables.load(s, dir, "lineitem"), Tables.load(s, dir, "events"),
        Tables.load(s, dir, "customer")
          .where(col("c_custkey") % 13 === 0)
          .select(col("c_custkey").as("k"))),
      """WITH v AS (SELECT c_custkey AS k FROM customer
        |           WHERE c_custkey % 13 = 0),
        |po AS (SELECT o_orderkey FROM orders
        |       WHERE o_custkey IN (SELECT k FROM v))
        |SELECT * FROM (
        |  SELECT 'customer' AS tbl,
        |    CAST(sum(CASE WHEN c_custkey IN (SELECT k FROM v)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
        |    CAST(sum(CASE WHEN c_custkey IN (SELECT k FROM v)
        |      THEN 0 ELSE 1 END) AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN c_custkey IN (SELECT k FROM v)
        |      THEN 0 ELSE c_custkey END) AS BIGINT) AS retained_key_sum
        |  FROM customer
        |  UNION ALL
        |  SELECT 'orders',
        |    CAST(sum(CASE WHEN o_custkey IN (SELECT k FROM v)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(CASE WHEN o_custkey IN (SELECT k FROM v)
        |      THEN 0 ELSE 1 END) AS BIGINT),
        |    CAST(sum(CASE WHEN o_custkey IN (SELECT k FROM v)
        |      THEN 0 ELSE o_orderkey END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem',
        |    CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM po)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM po)
        |      THEN 0 ELSE 1 END) AS BIGINT),
        |    CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM po)
        |      THEN 0 ELSE l_orderkey * 7 + l_linenumber END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'events',
        |    CAST(sum(CASE WHEN user_id IN (SELECT k FROM v)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(CASE WHEN user_id IN (SELECT k FROM v)
        |      THEN 0 ELSE 1 END) AS BIGINT),
        |    CAST(sum(CASE WHEN user_id IN (SELECT k FROM v)
        |      THEN 0 ELSE event_id END) AS BIGINT)
        |  FROM events)
        |ORDER BY tbl""".stripMargin),

    // warm-start connected components: min-label propagation seeded
    // from yesterday's labels (docs with doc_id % 5 != 4) — under
    // edge/doc ADDITION the per-component min over prior labels is
    // still the min member id, so the answer equals cold-start
    // bit-for-bit (same recursive-CTE oracle shape as x66); rounds now
    // track graph CHANGE, not diameter (spec pins warm < cold on a
    // chain). Pairs come from the UNCAPPED thresholded generator: a
    // df-capped candidate set is not addition-monotone (growth deletes
    // edges via the global df statistic) — the sf0.1 spot-check caught
    // exactly that; see the clustersWarmStart scaladoc
    Q.df("x263_cc_warm_start",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val old = docs.where(col("doc_id") % 5 =!= 4)
        val prior = Dedup.clusters(old, Dedup.jaccardPairs(old, 0.2))
        Dedup.clustersWarmStart(docs,
          Dedup.jaccardPairs(docs, 0.2), prior)
      },
      s"""WITH RECURSIVE $duckTok, $duckShingles, $duckJaccardTail,
         |pairs AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2
         |), edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION SELECT d2, d1 FROM pairs
         |), reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
         |)
         |SELECT a AS doc_id, min(b) AS cluster_id
         |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin),

    // quantile-sketch accuracy audit — the x235 "trust the sketch"
    // gate for the x107 binned-quantile tier: per event type, the
    // 50-cent-bin estimates beside the exact percentiles, with the
    // REALIZED rank error in ppm (integer numerators; the only
    // division is a floor'd double quotient of exact integers). The
    // number that licenses replacing per-group sorts with the
    // mergeable histogram at scale.
    Q.sql("x264_sketch_accuracy",
      """WITH c AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |tot AS (SELECT event_type, count(*) AS nn FROM c GROUP BY 1),
        |b AS (
        |  SELECT event_type, cents - (cents % 50) AS bin_lo, count(*) AS cb
        |  FROM c GROUP BY 1, 2),
        |cm AS (
        |  SELECT event_type, bin_lo, cb,
        |    sum(cb) OVER (PARTITION BY event_type ORDER BY bin_lo) AS cum
        |  FROM b),
        |est AS (
        |  SELECT cm.event_type,
        |    min(CASE WHEN cum * 100 >= 50 * tot.nn
        |      THEN bin_lo + 49 END) AS p50_est,
        |    min(CASE WHEN cum * 100 >= 90 * tot.nn
        |      THEN bin_lo + 49 END) AS p90_est,
        |    min(CASE WHEN cum * 100 >= 99 * tot.nn
        |      THEN bin_lo + 49 END) AS p99_est
        |  FROM cm JOIN tot ON cm.event_type = tot.event_type
        |  GROUP BY 1),
        |ex AS (
        |  SELECT event_type,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS p50,
        |    CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS p90,
        |    CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS p99
        |  FROM c GROUP BY 1),
        |rk AS (
        |  SELECT c.event_type, count(*) AS nn,
        |    sum(CASE WHEN c.cents <= e.p50_est THEN 1 ELSE 0 END) AS r50,
        |    sum(CASE WHEN c.cents <= e.p90_est THEN 1 ELSE 0 END) AS r90,
        |    sum(CASE WHEN c.cents <= e.p99_est THEN 1 ELSE 0 END) AS r99
        |  FROM c JOIN est e ON c.event_type = e.event_type
        |  GROUP BY 1)
        |SELECT rk.event_type, CAST(rk.nn AS BIGINT) AS n,
        |  ex.p50, e.p50_est,
        |  CAST(floor(1000000.0 * abs(r50 * 100 - 50 * rk.nn)
        |    / (100 * rk.nn)) AS BIGINT) AS p50_err_ppm,
        |  ex.p90, e.p90_est,
        |  CAST(floor(1000000.0 * abs(r90 * 100 - 90 * rk.nn)
        |    / (100 * rk.nn)) AS BIGINT) AS p90_err_ppm,
        |  ex.p99, e.p99_est,
        |  CAST(floor(1000000.0 * abs(r99 * 100 - 99 * rk.nn)
        |    / (100 * rk.nn)) AS BIGINT) AS p99_err_ppm
        |FROM rk
        |JOIN ex ON rk.event_type = ex.event_type
        |JOIN est e ON rk.event_type = e.event_type
        |ORDER BY rk.event_type""".stripMargin),

    // exact Spearman rank correlation per event type between value and
    // time — the rank-robust twin of x257's OLS slope: unique
    // (ts,id)/(cents,id) tie-breaks make ranks permutations, so
    // rho = 1 - 6*sum(d^2)/(n(n^2-1)) holds exactly in integers
    Q.df("x265_rank_correlation",
      (s, dir) => TimeSeries.rankCorrelation(
        Tables.load(s, dir, "events"),
        "event_type", "ts", "event_id", "value"),
      """WITH e AS (
        |  SELECT event_type AS g, epoch_us(ts) AS tm, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT g,
        |    row_number() OVER (PARTITION BY g ORDER BY tm, event_id)
        |      AS rx,
        |    row_number() OVER (PARTITION BY g ORDER BY cents, event_id)
        |      AS ry
        |  FROM e),
        |a AS (
        |  SELECT g, count(*) AS n,
        |    sum((rx - ry) * (rx - ry)) AS sd2
        |  FROM r GROUP BY 1),
        |f AS (
        |  SELECT g, n, n * (n * n - 1) - 6 * sd2 AS num,
        |    n * (n * n - 1) AS den
        |  FROM a)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
        |    AS BIGINT) AS rho_sign,
        |  CAST(CASE WHEN den = 0 THEN 0
        |    ELSE abs(num) * 1000000 // den END AS BIGINT) AS rho_abs_ppm
        |FROM f ORDER BY event_type""".stripMargin),

    // streaming SCD2 enrichment: streamed clicks join the purchase-
    // history version active at their event time (stream-static
    // non-equi interval probe; dimension re-planned per micro-batch);
    // oracle = the batch interval join
    Q.df("x266_stream_scd2_enrich",
      (s, dir) => Streaming.streamScd2Enrich(s, dir),
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS eff_from,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    coalesce(lead(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
        |      9223372036854775807) AS eff_to
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'click')
        |SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_clicks,
        |  CAST(sum(p.cents) AS BIGINT) AS sum_active_cents
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND c.us >= p.eff_from AND c.us < p.eff_to
        |GROUP BY 1 ORDER BY c.user_id""".stripMargin),

    // frequency-weighted cosine between sources over token-count
    // vectors — x244's companion (phrases vs vocabulary distribution);
    // cos² as one exact integer rational, pair join keyed by token so
    // per-token work is bounded by |sources|²
    Q.df("x267_source_cosine",
      (s, dir) => TextStats.sourceCosineMatrix(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |tc AS (
         |  SELECT d.source, t.w, count(*) AS c
         |  FROM tok t JOIN documents d USING (doc_id) GROUP BY 1, 2),
         |norms AS (SELECT source, sum(c * c) AS nsq FROM tc GROUP BY 1),
         |dt AS (
         |  SELECT a.source AS s1, b.source AS s2, sum(a.c * b.c) AS dot
         |  FROM tc a JOIN tc b ON a.w = b.w AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT s1, s2,
         |  CAST(dot * dot * 10000 // (n1.nsq * n2.nsq) AS BIGINT)
         |    AS cos2_x10k
         |FROM dt JOIN norms n1 ON dt.s1 = n1.source
         |JOIN norms n2 ON dt.s2 = n2.source
         |ORDER BY s1, s2""".stripMargin),

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

    // weekly-percentile trend (SLO drift): OLS slope of the weekly p50
    // AND p90 of value per event type — the distribution trend a mean
    // hides; observed weeks only (an absent week has no percentile),
    // sign/|slope| split, DECIMAL(38,0) products
    Q.df("x269_percentile_trend",
      (s, dir) => TimeSeries.percentileTrend(
        Tables.load(s, dir, "events"), "event_type", "ts", "value"),
      """WITH w AS (
        |  SELECT event_type AS g,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |per AS (
        |  SELECT g, wk,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS p50,
        |    CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS p90
        |  FROM w GROUP BY 1, 2),
        |base AS (SELECT g, min(wk) AS wk0 FROM per GROUP BY 1),
        |xy AS (SELECT per.g, per.wk - base.wk0 AS x, p50, p90
        |       FROM per JOIN base ON per.g = base.g),
        |st AS (
        |  SELECT g, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
        |    sum(p50) AS sy50, sum(p90) AS sy90,
        |    sum(x * p50) AS sxy50, sum(x * p90) AS sxy90
        |  FROM xy GROUP BY 1),
        |r AS (
        |  SELECT g, n,
        |    n * sxy50 - sx * sy50 AS num50,
        |    n * sxy90 - sx * sy90 AS num90,
        |    n * sxx - sx * sx AS den
        |  FROM st)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n_weeks,
        |  CAST(CASE WHEN num50 > 0 THEN 1 WHEN num50 < 0 THEN -1
        |    ELSE 0 END AS BIGINT) AS p50_sign,
        |  CAST(CASE WHEN den = 0 THEN 0
        |    ELSE abs(num50) * 1000000 // den END AS BIGINT) AS p50_abs_ppm,
        |  CAST(CASE WHEN num90 > 0 THEN 1 WHEN num90 < 0 THEN -1
        |    ELSE 0 END AS BIGINT) AS p90_sign,
        |  CAST(CASE WHEN den = 0 THEN 0
        |    ELSE abs(num90) * 1000000 // den END AS BIGINT) AS p90_abs_ppm
        |FROM r ORDER BY event_type""".stripMargin),

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

    // exact integer CUSUM control chart per event type over zero-filled
    // weekly counts (Page 1954): the max-reset recursion is not a
    // prefix sum, but the week series is a bounded grid, so the whole
    // chart folds IN-ROW with aggregate()'s lambda; oracle = the same
    // recursion as a recursive CTE
    Q.df("x271_cusum_chart",
      (s, dir) => TimeSeries.cusumChart(
        Tables.load(s, dir, "events"), "event_type", "ts"),
      """WITH RECURSIVE w AS (
        |  SELECT event_type AS g,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk
        |  FROM events),
        |per AS (SELECT g, wk, count(*) AS y FROM w GROUP BY 1, 2),
        |sp AS (
        |  SELECT g, min(wk) AS a, max(wk) AS b, sum(y) AS tot,
        |    max(wk) - min(wk) + 1 AS nw,
        |    sum(y) // (max(wk) - min(wk) + 1) AS mu
        |  FROM per GROUP BY 1),
        |cal AS (
        |  SELECT g, a, mu, nw, unnest(generate_series(a, b)) AS wk
        |  FROM sp),
        |f AS (
        |  SELECT cal.g, cal.wk - cal.a AS x, coalesce(per.y, 0) AS y,
        |    cal.mu, cal.nw
        |  FROM cal LEFT JOIN per ON per.g = cal.g AND per.wk = cal.wk),
        |c(g, x, s, alarms, first_wk, maxs, mu, nw) AS (
        |  SELECT g, x, greatest(0, y - mu - mu // 10),
        |    CASE WHEN greatest(0, y - mu - mu // 10) > mu
        |      THEN 1 ELSE 0 END,
        |    CASE WHEN greatest(0, y - mu - mu // 10) > mu
        |      THEN x ELSE -1 END,
        |    greatest(0, y - mu - mu // 10), mu, nw
        |  FROM f WHERE x = 0
        |  UNION ALL
        |  SELECT f.g, f.x,
        |    greatest(0, c.s + f.y - f.mu - f.mu // 10),
        |    c.alarms + CASE WHEN greatest(0, c.s + f.y - f.mu
        |      - f.mu // 10) > f.mu THEN 1 ELSE 0 END,
        |    CASE WHEN c.first_wk >= 0 THEN c.first_wk
        |      WHEN greatest(0, c.s + f.y - f.mu - f.mu // 10) > f.mu
        |      THEN f.x ELSE -1 END,
        |    greatest(c.maxs, greatest(0, c.s + f.y - f.mu - f.mu // 10)),
        |    f.mu, f.nw
        |  FROM c JOIN f ON f.g = c.g AND f.x = c.x + 1)
        |SELECT g AS event_type, CAST(nw AS BIGINT) AS n_weeks,
        |  CAST(mu AS BIGINT) AS mu, CAST(alarms AS BIGINT) AS n_alarms,
        |  CAST(first_wk AS BIGINT) AS first_alarm_wk,
        |  CAST(maxs AS BIGINT) AS max_cusum
        |FROM c WHERE x = nw - 1 ORDER BY event_type""".stripMargin),

    // weekday-seasonality-adjusted outlier audit: each day compared to
    // its group's SAME-WEEKDAY mean by exact cross-multiplication over
    // the zero-filled calendar (a silent day is the outage case);
    // weekday = epoch-day mod 7, engine-neutral
    Q.df("x272_seasonal_outliers",
      (s, dir) => TimeSeries.seasonalOutliers(
        Tables.load(s, dir, "events"), "event_type", "ts"),
      """WITH d AS (
        |  SELECT event_type AS g,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS ep
        |  FROM events),
        |per AS (SELECT g, ep, count(*) AS n FROM d GROUP BY 1, 2),
        |cal AS (
        |  SELECT g, unnest(generate_series(a, b)) AS ep
        |  FROM (SELECT g, min(ep) AS a, max(ep) AS b FROM per GROUP BY 1)),
        |f AS (
        |  SELECT cal.g, cal.ep, cal.ep % 7 AS dow, coalesce(per.n, 0) AS n
        |  FROM cal LEFT JOIN per ON per.g = cal.g AND per.ep = cal.ep),
        |prof AS (SELECT g, dow, sum(n) AS tot_w, count(*) AS days_w
        |         FROM f GROUP BY 1, 2),
        |x AS (
        |  SELECT f.g, f.ep, f.n, p.tot_w, p.days_w,
        |    (f.n * p.days_w > 2 * p.tot_w) AS hi,
        |    (2 * f.n * p.days_w < p.tot_w) AS lo,
        |    CASE WHEN p.tot_w > 0
        |      THEN f.n * p.days_w * 1000000 // p.tot_w END AS ratio_ppm
        |  FROM f JOIN prof p ON p.g = f.g AND p.dow = f.dow),
        |mx AS (SELECT g, max(CASE WHEN hi THEN ratio_ppm END) AS mr
        |       FROM x GROUP BY 1)
        |SELECT x.g AS event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
        |  CAST(sum(CASE WHEN lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(min(CASE WHEN hi AND x.ratio_ppm = mx.mr THEN x.ep END)
        |    AS BIGINT) AS worst_hi_day
        |FROM x JOIN mx ON mx.g = x.g
        |GROUP BY 1 ORDER BY event_type""".stripMargin),

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

    // matryoshka truncation-recall curve: exact top-5 retrieval with
    // only the first d dims scored, vs the full-width truth — the
    // dimension-budget sizing curve; one pinned pair materialization
    // carrying all prefix dots, bounded top-k heaps, oracle-exact
    // (deterministic quantized dots, unlike the IVF family)
    Q.df("x274_matryoshka_recall",
      (s, dir) => Similarity.matryoshkaRecall(
        Tables.load(s, dir, "embeddings"), 200, 5, Seq(8, 16, 32, 64)),
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe
        |           FROM embeddings WHERE vec_id < 200),
        |pr AS (
        |  SELECT q.qid, e.vec_id, r.i,
        |    CAST(floor(CAST(q.qe[r.i] AS DOUBLE) * 10000) AS BIGINT)
        |      * CAST(floor(CAST(e.embedding[r.i] AS DOUBLE) * 10000)
        |        AS BIGINT) AS p
        |  FROM q, embeddings e, range(1, 65) r(i)
        |  WHERE e.vec_id <> q.qid),
        |pairs AS (
        |  SELECT qid, vec_id,
        |    CAST(sum(CASE WHEN i <= 8 THEN p ELSE 0 END) AS BIGINT)
        |      AS dot_8,
        |    CAST(sum(CASE WHEN i <= 16 THEN p ELSE 0 END) AS BIGINT)
        |      AS dot_16,
        |    CAST(sum(CASE WHEN i <= 32 THEN p ELSE 0 END) AS BIGINT)
        |      AS dot_32,
        |    CAST(sum(p) AS BIGINT) AS dot_64
        |  FROM pr GROUP BY 1, 2),
        |t8 AS (SELECT qid, vec_id FROM (
        |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |    ORDER BY dot_8 DESC, vec_id) rn FROM pairs) WHERE rn <= 5),
        |t16 AS (SELECT qid, vec_id FROM (
        |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |    ORDER BY dot_16 DESC, vec_id) rn FROM pairs) WHERE rn <= 5),
        |t32 AS (SELECT qid, vec_id FROM (
        |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |    ORDER BY dot_32 DESC, vec_id) rn FROM pairs) WHERE rn <= 5),
        |t64 AS (SELECT qid, vec_id FROM (
        |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |    ORDER BY dot_64 DESC, vec_id) rn FROM pairs) WHERE rn <= 5),
        |h AS (
        |  SELECT 8 AS dim, count(*) AS hits
        |  FROM t8 JOIN t64 USING (qid, vec_id)
        |  UNION ALL SELECT 16, count(*)
        |  FROM t16 JOIN t64 USING (qid, vec_id)
        |  UNION ALL SELECT 32, count(*)
        |  FROM t32 JOIN t64 USING (qid, vec_id)
        |  UNION ALL SELECT 64, count(*) FROM t64),
        |np AS (SELECT count(DISTINCT qid) AS n FROM pairs)
        |SELECT CAST(h.dim AS BIGINT) AS dim,
        |  CAST(np.n AS BIGINT) AS n_probes, CAST(5 AS BIGINT) AS k,
        |  CAST(h.hits AS BIGINT) AS hits,
        |  CAST(h.hits * 1000000 // (np.n * 5) AS BIGINT) AS recall_ppm
        |FROM h CROSS JOIN np ORDER BY dim""".stripMargin),

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

    // near-dup evidence: per judged pair, the three RAREST shared
    // shingles — the review-queue forensics ("they share these exact
    // phrases"); evidence joins only the pair set back to the
    // inverted index, bounded by per-pair shared counts
    Q.df("x276_neardup_evidence",
      (s, dir) => Dedup.neardupEvidence(
        Tables.load(s, dir, "documents"), 0.2, 2),
      s"""WITH $duckTok, ${duckShinglesFiltered(2)}, $duckJaccardTail,
         |pairs AS (
         |  SELECT d1, d2,
         |    CAST(floor(10000.0 * i / (s1.n + s2.n - i)) AS BIGINT)
         |      AS jac_x10k
         |  FROM inter JOIN sz s1 ON d1 = s1.doc_id
         |  JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2),
         |dfreq AS (SELECT shingle, count(*) AS df FROM sh0 GROUP BY 1),
         |shared AS (
         |  SELECT p.d1, p.d2, p.jac_x10k, x.shingle, f.df
         |  FROM pairs p JOIN sh0 x ON x.doc_id = p.d1
         |  JOIN sh0 y ON y.doc_id = p.d2 AND y.shingle = x.shingle
         |  JOIN dfreq f ON f.shingle = x.shingle),
         |rk AS (
         |  SELECT d1, d2, jac_x10k, shingle,
         |    row_number() OVER (PARTITION BY d1, d2
         |      ORDER BY df, shingle) AS rn,
         |    count(*) OVER (PARTITION BY d1, d2) AS n_shared
         |  FROM shared)
         |SELECT d1, d2, max(jac_x10k) AS jac_x10k,
         |  CAST(max(n_shared) AS BIGINT) AS n_shared,
         |  max(CASE WHEN rn = 1 THEN shingle END) AS ev1,
         |  max(CASE WHEN rn = 2 THEN shingle END) AS ev2,
         |  max(CASE WHEN rn = 3 THEN shingle END) AS ev3
         |FROM rk GROUP BY d1, d2 ORDER BY d1, d2""".stripMargin),

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

    // cross-modal consistency: text near-dup pairs full-outer-joined
    // with real-payload image-dup pairs — both/text_only/image_only
    // route to different curation policies; a ratio shift is a
    // pipeline bug (e.g. a thumbnailer collapsing distinct images);
    // oracle: image equality == the x142 dimension-formula collision
    Q.df("x278_multimodal_consistency",
      (s, dir) => Multimodal.multimodalConsistency(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok, ${duckShinglesFiltered(2)}, $duckJaccardTail,
         |tp AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2),
         |img AS (SELECT doc_id, n_chars % 64 AS iw, n_chars % 37 AS ih
         |        FROM documents),
         |ip AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM img a JOIN img b
         |    ON a.iw = b.iw AND a.ih = b.ih AND a.doc_id < b.doc_id),
         |cl AS (
         |  SELECT coalesce(tp.d1, ip.d1) AS d1,
         |    coalesce(tp.d2, ip.d2) AS d2,
         |    CASE WHEN tp.d1 IS NOT NULL AND ip.d1 IS NOT NULL
         |        THEN 'both'
         |      WHEN tp.d1 IS NOT NULL THEN 'text_only'
         |      ELSE 'image_only' END AS category
         |  FROM tp FULL JOIN ip ON tp.d1 = ip.d1 AND tp.d2 = ip.d2),
         |ag AS (
         |  SELECT category, CAST(count(*) AS BIGINT) AS n_pairs,
         |    min(d1) AS e1,
         |    min_by(d2, lpad(CAST(d1 AS VARCHAR), 20, '0') || ':'
         |               || lpad(CAST(d2 AS VARCHAR), 20, '0')) AS e2
         |  FROM cl GROUP BY 1),
         |cats AS (SELECT unnest(['both', 'image_only', 'text_only'])
         |           AS category)
         |SELECT cats.category, coalesce(ag.n_pairs, 0) AS n_pairs,
         |  ag.e1 AS example_d1, ag.e2 AS example_d2
         |FROM cats LEFT JOIN ag USING (category)
         |ORDER BY cats.category""".stripMargin),

    // token-bucket admission replay per user (rate 1/h, burst 1): the
    // capacity-planning audit run BEFORE a limiter ships; sequential
    // clamp state folded IN-ROW over each user's time-sorted events
    // (the x271 bounded-recursion discipline at per-key granularity);
    // oracle = the same machine as a recursive CTE
    Q.df("x279_token_bucket",
      (s, dir) => TimeSeries.tokenBucketAudit(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_id",
        ratePerHour = 1L, burst = 1L),
      """WITH RECURSIVE e AS (
        |  SELECT user_id AS k, epoch_us(ts) AS tm, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS ne
        |  FROM events),
        |c(k, rn, s, pt, adm, rej, first, ne) AS (
        |  SELECT k, rn, CAST(0 AS BIGINT), tm, CAST(1 AS BIGINT),
        |    CAST(0 AS BIGINT), CAST(-1 AS BIGINT), ne
        |  FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.k, e.rn,
        |    CASE WHEN least(3600000000, c.s + (e.tm - c.pt))
        |        >= 3600000000
        |      THEN least(3600000000, c.s + (e.tm - c.pt)) - 3600000000
        |      ELSE least(3600000000, c.s + (e.tm - c.pt)) END,
        |    e.tm,
        |    c.adm + CASE WHEN least(3600000000, c.s + (e.tm - c.pt))
        |      >= 3600000000 THEN 1 ELSE 0 END,
        |    c.rej + CASE WHEN least(3600000000, c.s + (e.tm - c.pt))
        |      >= 3600000000 THEN 0 ELSE 1 END,
        |    CASE WHEN c.first >= 0 THEN c.first
        |      WHEN least(3600000000, c.s + (e.tm - c.pt)) >= 3600000000
        |      THEN -1 ELSE e.event_id END,
        |    c.ne
        |  FROM c JOIN e ON e.k = c.k AND e.rn = c.rn + 1)
        |SELECT k AS user_id, CAST(ne AS BIGINT) AS n_events,
        |  CAST(adm AS BIGINT) AS n_admitted,
        |  CAST(rej AS BIGINT) AS n_rejected,
        |  CAST(first AS BIGINT) AS first_rejected_id
        |FROM c WHERE rn = ne ORDER BY user_id""".stripMargin),

    // weighted median price per return flag, weighted by quantity —
    // "the price at which half the VOLUME trades"; exact
    // cross-multiplied threshold on the group-partitioned cumulative
    Q.df("x280_weighted_median",
      (s, dir) => Profile.weightedMedian(
        Tables.load(s, dir, "lineitem"), "l_returnflag",
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"),
        col("l_quantity"), col("l_orderkey")),
      """WITH d AS (
        |  SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(l_quantity AS BIGINT) AS w, l_orderkey AS tb
        |  FROM lineitem),
        |c AS (
        |  SELECT g, v, w,
        |    sum(w) OVER (PARTITION BY g ORDER BY v, tb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(w) OVER (PARTITION BY g) AS totw,
        |    count(*) OVER (PARTITION BY g) AS n
        |  FROM d)
        |SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(totw) AS BIGINT) AS tot_weight, min(v) AS wmedian
        |FROM c WHERE cumw * 2 >= totw
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin),

    // time-to-convert percentile mart: per signup-week cohort, exact
    // p50/p90 of the signup→first-purchase delay — the funnel-latency
    // number growth teams quote; two keyed min-aggregates, never an
    // event-pair join
    Q.df("x281_time_to_convert",
      (s, dir) => TimeSeries.timeToConvert(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_type",
        "signup", "purchase"),
      """WITH e AS (
        |  SELECT user_id AS k, event_type AS t, epoch_us(ts) AS tm
        |  FROM events),
        |f AS (SELECT k, min(tm) AS t0 FROM e WHERE t = 'signup'
        |      GROUP BY 1),
        |cv AS (
        |  SELECT e.k, min(e.tm - f.t0) AS delta_us
        |  FROM e JOIN f ON e.k = f.k
        |  WHERE e.t = 'purchase' AND e.tm > f.t0
        |  GROUP BY 1),
        |d AS (
        |  SELECT f.t0 // 604800000000 AS cohort_wk,
        |    cv.delta_us // 1000000 AS delta_s
        |  FROM f LEFT JOIN cv ON f.k = cv.k)
        |SELECT cohort_wk, CAST(count(*) AS BIGINT) AS n_signups,
        |  CAST(count(delta_s) AS BIGINT) AS n_converted,
        |  CAST(count(delta_s) * 1000000 // count(*) AS BIGINT)
        |    AS conv_ppm,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY delta_s)
        |    AS BIGINT) AS p50_s,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY delta_s)
        |    AS BIGINT) AS p90_s
        |FROM d GROUP BY 1 ORDER BY cohort_wk""".stripMargin),

    // hapax-legomena ratio per source: the Zipf-tail lexical-richness
    // gate that separates natural prose from templated text; one
    // (source, token) count + one rollup, integer exact
    Q.df("x282_hapax_ratio",
      (s, dir) => TextStats.hapaxRatio(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |tc AS (
         |  SELECT d.source, t.w, count(*) AS c
         |  FROM tok t JOIN documents d USING (doc_id) GROUP BY 1, 2)
         |SELECT source, CAST(sum(c) AS BIGINT) AS n_tok,
         |  CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hapax,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS hapax_ppm
         |FROM tc GROUP BY 1 ORDER BY source""".stripMargin),

    // activity streaks (gaps-and-islands, distributed): epoch-day
    // minus per-key rank is constant along a consecutive run — one
    // window + one keyed agg, no self-join; longest streak per user
    Q.df("x283_activity_streaks",
      (s, dir) => TimeSeries.activityStreaks(
        Tables.load(s, dir, "events"), "user_id", "ts"),
      """WITH act AS (
        |  SELECT DISTINCT user_id AS k,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS ep
        |  FROM events),
        |g AS (
        |  SELECT k, ep,
        |    ep - row_number() OVER (PARTITION BY k ORDER BY ep) AS grp
        |  FROM act),
        |runs AS (
        |  SELECT k, grp, count(*) AS len, min(ep) AS start
        |  FROM g GROUP BY 1, 2)
        |SELECT k AS user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  CAST(max(len) AS BIGINT) AS longest_streak,
        |  CAST(min(CASE WHEN len = ml THEN start END) AS BIGINT)
        |    AS streak_start
        |FROM (SELECT runs.*, max(len) OVER (PARTITION BY k) AS ml
        |      FROM runs)
        |GROUP BY 1 ORDER BY user_id""".stripMargin),

    // exact trailing 28-day active users per day: each activity pair
    // feeds <= 28 window ends, so sliding DISTINCT becomes
    // explode+dedupe+count — O(activity*window), no sketch error
    Q.df("x284_rolling_active",
      (s, dir) => TimeSeries.rollingActiveUsers(
        Tables.load(s, dir, "events"), "user_id", "ts", 28),
      """WITH act AS (
        |  SELECT DISTINCT user_id AS k,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS ep
        |  FROM events),
        |sp AS (SELECT min(ep) AS a, max(ep) AS b FROM act),
        |dau AS (SELECT ep, CAST(count(*) AS BIGINT) AS dau
        |        FROM act GROUP BY 1),
        |contrib AS (
        |  SELECT DISTINCT k, unnest(generate_series(ep,
        |    least(ep + 27, sp.b))) AS ep
        |  FROM act, sp),
        |wau AS (SELECT ep, CAST(count(*) AS BIGINT) AS wau
        |        FROM contrib GROUP BY 1),
        |cal AS (SELECT unnest(generate_series(a, b)) AS ep FROM sp)
        |SELECT CAST(cal.ep AS BIGINT) AS ep,
        |  coalesce(dau.dau, 0) AS dau, coalesce(wau.wau, 0) AS wau
        |FROM cal LEFT JOIN dau ON dau.ep = cal.ep
        |LEFT JOIN wau ON wau.ep = cal.ep
        |ORDER BY ep""".stripMargin),

    // next-event predictability: the first-order Markov argmax
    // evaluated in-sample — per type, the modal next event and the
    // ppm of transitions it gets right (the ceiling a sequence model
    // must beat; near-uniform means unpredictable, not under-modeled)
    Q.df("x285_next_event_accuracy",
      (s, dir) => TimeSeries.nextEventAccuracy(
        Tables.load(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type"),
      """WITH e AS (
        |  SELECT user_id AS k, epoch_us(ts) AS tm, event_id,
        |    event_type AS cur
        |  FROM events),
        |tr AS (
        |  SELECT cur, lead(cur) OVER (PARTITION BY k
        |    ORDER BY tm, event_id) AS nxt
        |  FROM e),
        |grid AS (SELECT cur, nxt, count(*) AS c FROM tr
        |         WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |pred AS (
        |  SELECT cur, CAST(sum(c) AS BIGINT) AS n_transitions,
        |    min_by(nxt, lpad(CAST(1000000000 - c AS VARCHAR), 12, '0')
        |      || ':' || nxt) AS predicted_next
        |  FROM grid GROUP BY 1)
        |SELECT g.cur AS event_type, p.n_transitions, p.predicted_next,
        |  CAST(sum(CASE WHEN g.nxt = p.predicted_next THEN g.c
        |    ELSE 0 END) AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN g.nxt = p.predicted_next THEN g.c
        |    ELSE 0 END) * 1000000 // p.n_transitions AS BIGINT)
        |    AS acc_ppm
        |FROM grid g JOIN pred p ON g.cur = p.cur
        |GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin),

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

    // sliding-HLL rolling actives: the approx tier beside exact x253 —
    // per-day sketches merged over the trailing window, so the window
    // slide replicates days x window SKETCHES, not activity x window
    // rows. DataSketches estimates are engine-specific -> rows-only;
    // the <=5% error bound vs the exact tier is spec-gated (ExtSpec)
    Q.dfOnly("x287_rolling_active_approx",
      (s, dir) => TimeSeries.rollingActiveUsersApprox(
        Tables.load(s, dir, "events"), "user_id", "ts", 7)),

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

    // phrase search over a positional inverted index: the corpus's
    // top-3 bigrams answered in exact-adjacency (quoted phrase) and
    // within-3 proximity (NEAR) modes — postings equi-joins with the
    // query list broadcast, never a corpus scan; the retrieval SERVE
    // shape, distinct from x89's PMI statistics
    Q.df("x289_phrase_search",
      (s, dir) => TextStats.phraseSearch(
        Tables.load(s, dir, "documents"), 3),
      s"""WITH $duckTok,
         |adj AS (
         |  SELECT a.doc_id, a.pos AS p1, a.w AS w1, b.w AS w2
         |  FROM tok a JOIN tok b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         |top AS (
         |  SELECT w1, w2 FROM (
         |    SELECT w1, w2, count(*) AS c FROM adj GROUP BY 1, 2)
         |  ORDER BY c DESC, w1, w2 LIMIT 3),
         |hits AS (
         |  SELECT t.w1, t.w2, p.doc_id, p.pos AS p1, q.pos AS p2
         |  FROM top t JOIN tok p ON p.w = t.w1
         |  JOIN tok q ON q.doc_id = p.doc_id AND q.w = t.w2
         |    AND q.pos > p.pos AND q.pos <= p.pos + 3)
         |SELECT w1, w2,
         |  CAST(sum(CASE WHEN p2 = p1 + 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_occ_exact,
         |  CAST(count(DISTINCT CASE WHEN p2 = p1 + 1 THEN doc_id END)
         |    AS BIGINT) AS n_docs_exact,
         |  CAST(count(*) AS BIGINT) AS n_occ_within3,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_within3
         |FROM hits GROUP BY 1, 2 ORDER BY w1, w2""".stripMargin),

    // curriculum ordering: easy-first tiers (n_chars div 100),
    // deterministic md5 shuffle within tier, global position via the
    // distributed zipWithIndex shape — judged on every 97th position
    // so the oracle checks the whole ORDER, not tier totals
    Q.df("x290_curriculum_order",
      (s, dir) => Sampling.curriculumOrder(
        Tables.load(s, dir, "documents"), "doc_id",
        expr("n_chars div 100"), "42"),
      """WITH d AS (
        |  SELECT doc_id, n_chars // 100 AS tier,
        |    md5('42' || ':' || doc_id) AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, tier,
        |    row_number() OVER (ORDER BY tier, h, doc_id) AS rank
        |  FROM d)
        |SELECT CAST(rank AS BIGINT) AS rank, doc_id,
        |  CAST(tier AS BIGINT) AS tier
        |FROM r WHERE (rank - 1) % 97 = 0 ORDER BY rank""".stripMargin),

    // blocking-quality audit: last-4-chars blocking on supplier names
    // scored against the LOSSLESS tau=2 truth set (passJoin) on the
    // two record-linkage axes — reduction ratio (cost) and pair
    // completeness (recall); the quadratic all-pairs is priced
    // arithmetically, never materialized
    Q.df("x291_blocking_quality",
      (s, dir) => Entity.blockingQuality(
        Tables.load(s, dir, "supplier"), "s_name", 2,
        expr("right(name, 4)")),
      """WITH names AS (SELECT DISTINCT s_name AS name FROM supplier),
        |truth AS (
        |  SELECT a.name AS name_a, b.name AS name_b
        |  FROM names a JOIN names b ON a.name < b.name
        |  WHERE levenshtein(a.name, b.name) <= 2),
        |blk AS (SELECT name, right(name, 4) AS b FROM names),
        |cand AS (
        |  SELECT x.name AS name_a, y.name AS name_b
        |  FROM blk x JOIN blk y ON x.b = y.b AND x.name < y.name),
        |found AS (SELECT * FROM cand INTERSECT SELECT * FROM truth),
        |m AS (SELECT
        |  (SELECT count(*) FROM names) AS nn,
        |  (SELECT count(*) FROM cand) AS nc,
        |  (SELECT count(*) FROM truth) AS nt,
        |  (SELECT count(*) FROM found) AS nf)
        |SELECT CAST(nn AS BIGINT) AS n_names,
        |  CAST(nn * (nn - 1) // 2 AS BIGINT) AS n_all_pairs,
        |  CAST(nc AS BIGINT) AS n_candidates,
        |  CAST(nt AS BIGINT) AS n_true, CAST(nf AS BIGINT) AS n_found,
        |  CAST((nn * (nn - 1) // 2 - nc) * 1000000
        |    // (nn * (nn - 1) // 2) AS BIGINT) AS reduction_ppm,
        |  CAST(CASE WHEN nt = 0 THEN NULL
        |    ELSE nf * 1000000 // nt END AS BIGINT) AS completeness_ppm
        |FROM m""".stripMargin),

    // sample-level audio QA: clipping + amplitude envelope read from
    // every 16-bit PCM word (real decode in mapPartitions; media
    // bytes never shuffle); oracle = the synthetic capture's sample
    // pattern re-derived in SQL, so a byte-order or offset bug is a
    // hash failure, not silent skew
    Q.df("x292_audio_clipping",
      (s, dir) => Multimodal.audioClippingAudit(
        Multimodal.withWavPayload(Tables.load(s, dir, "documents"))),
      """WITH d AS (
        |  SELECT doc_id,
        |    (n_chars % 500 + 50) * (1 + n_chars % 2) AS words
        |  FROM documents),
        |g AS (
        |  SELECT r.range AS j,
        |    CASE WHEN r.range >= 64 THEN 514 * r.range + 256 - 65536
        |      ELSE 514 * r.range + 256 END AS v
        |  FROM range(0, 128) r),
        |f AS (SELECT doc_id, words, words // 128 AS np,
        |        words % 128 AS rem FROM d)
        |SELECT f.doc_id, CAST(f.words AS BIGINT) AS n_words,
        |  CAST(sum(CASE WHEN abs(g.v) >= 32000
        |    THEN f.np + CASE WHEN g.j < f.rem THEN 1 ELSE 0 END
        |    ELSE 0 END) AS BIGINT) AS n_clipped,
        |  CAST(max(CASE WHEN g.j < f.rem OR f.np > 0
        |    THEN abs(g.v) END) AS BIGINT) AS max_abs,
        |  CAST(min(CASE WHEN g.j < f.rem OR f.np > 0
        |    THEN abs(g.v) END) AS BIGINT) AS min_abs
        |FROM f, g GROUP BY 1, 2 ORDER BY doc_id""".stripMargin),

    // embedding-space drift between label populations: pairwise L2^2
    // of per-label INTEGER centroids (floor(x*1e4) quantization, sum
    // div n) — one corpus explode + keyed agg, pair join on the
    // labels x dims grid only; oracle-exact, no float summation order
    Q.df("x293_label_centroid_drift",
      (s, dir) => Similarity.labelCentroidDrift(
        Tables.load(s, dir, "embeddings")),
      """WITH q AS (
        |  SELECT label, r.i AS i,
        |    CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 10000)
        |      AS BIGINT) AS qv
        |  FROM embeddings, range(1, 65) r(i)),
        |c AS (SELECT label, i, CAST(sum(qv) AS BIGINT) AS s,
        |        CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1, 2),
        |ce AS (SELECT label, i, s // n AS cd, n FROM c)
        |SELECT CAST(a.label AS BIGINT) AS label_a,
        |  CAST(b.label AS BIGINT) AS label_b,
        |  max(a.n) AS n_a, max(b.n) AS n_b,
        |  CAST(sum((a.cd - b.cd) * (a.cd - b.cd)) AS BIGINT) AS l2sq
        |FROM ce a JOIN ce b ON a.i = b.i AND a.label < b.label
        |GROUP BY 1, 2 ORDER BY label_a, label_b""".stripMargin),

    // l-diversity audit: the homogeneity-attack check k-anonymity
    // misses — per QI class, size AND distinct sensitive values, one
    // keyed agg + 1-row rollup; k=5, l=3 on (nation, segment) with
    // the acctbal-thousands bucket as the sensitive attribute
    Q.df("x294_l_diversity",
      (s, dir) => Privacy.lDiversityAudit(
        Tables.load(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"),
        expr("CAST(floor(c_acctbal / 1000) AS BIGINT)"), 5L, 3L),
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(count(*) AS BIGINT) AS sz,
        |    CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |      AS BIGINT) AS ldiv
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS k_violating_classes,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk_k,
        |  CAST(sum(CASE WHEN ldiv < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS l_violating_classes,
        |  CAST(sum(CASE WHEN ldiv < 3 THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk_l,
        |  min(sz) AS min_class_size, min(ldiv) AS min_l
        |FROM cls""".stripMargin),

    // EWMA control chart: integer fixed-point level tracker
    // (e' = (y + 7e) div 8) over the zero-filled daily calendar,
    // alarm on the exact doubling rule — sequential state folded
    // in-row (x271's shape); oracle = recursive CTE, bit-identical
    Q.df("x295_ewma_chart",
      (s, dir) => TimeSeries.ewmaChart(
        Tables.load(s, dir, "events"), "event_type", "ts"),
      """WITH RECURSIVE per AS (
        |  SELECT event_type AS g,
        |    (CAST(ts AS DATE) - DATE '1970-01-01') AS ep,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |cal AS (
        |  SELECT g, a, unnest(generate_series(a, b)) AS ep
        |  FROM (SELECT g, min(ep) AS a, max(ep) AS b FROM per
        |        GROUP BY 1)),
        |ser AS (
        |  SELECT cal.g, cal.ep - cal.a AS x, coalesce(per.y, 0) AS y,
        |    count(*) OVER (PARTITION BY cal.g) AS nd
        |  FROM cal LEFT JOIN per ON per.g = cal.g AND per.ep = cal.ep),
        |c(g, x, e, alarms, first_x, nd) AS (
        |  SELECT g, x, y, CAST(0 AS BIGINT), CAST(-1 AS BIGINT), nd
        |  FROM ser WHERE x = 0
        |  UNION ALL
        |  SELECT s.g, s.x,
        |    (s.y + 7 * c.e) // 8,
        |    c.alarms + CASE WHEN c.e > 0 AND s.y > 2 * c.e
        |      THEN 1 ELSE 0 END,
        |    CASE WHEN c.first_x >= 0 THEN c.first_x
        |      WHEN c.e > 0 AND s.y > 2 * c.e THEN s.x ELSE -1 END,
        |    c.nd
        |  FROM c JOIN ser s ON s.g = c.g AND s.x = c.x + 1)
        |SELECT g AS event_type, CAST(nd AS BIGINT) AS n_days,
        |  CAST(alarms AS BIGINT) AS n_alarms,
        |  CAST(first_x AS BIGINT) AS first_alarm_x,
        |  CAST(e AS BIGINT) AS final_ewma
        |FROM c WHERE x = nd - 1 ORDER BY event_type""".stripMargin),

    // count-min calibration: every event type's exact count beside
    // its depth-4 x width-64 sketch estimate (md5-derived buckets,
    // min over rows) — est >= exact structurally; the d x w sketch is
    // the mergeable partial that ships; oracle re-derives buckets
    // with a hex fold and matches hash-exact
    Q.df("x296_countmin_calibration",
      (s, dir) => graft.ext.Rollup.countMinCalibration(
        Tables.load(s, dir, "events"), "event_type"),
      """WITH k AS (SELECT CAST(event_type AS VARCHAR) AS t FROM events),
        |b AS (
        |  SELECT t, seed,
        |    CAST(list_aggregate(list_transform(range(1, 9),
        |      i -> (strpos('0123456789abcdef',
        |              substr(md5(seed || ':' || t), CAST(i AS INTEGER), 1))
        |            - 1) * 16 ** (8 - i)), 'sum') AS BIGINT) % 64 AS bk
        |  FROM k, (SELECT unnest(generate_series(0, 3)) AS seed)),
        |sketch AS (
        |  SELECT seed, bk, CAST(count(*) AS BIGINT) AS c
        |  FROM b GROUP BY 1, 2),
        |exact AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS exact_cnt
        |  FROM k GROUP BY 1),
        |tb AS (SELECT DISTINCT t, seed, bk FROM b)
        |SELECT tb.t AS event_type, max(e.exact_cnt) AS exact_cnt,
        |  CAST(min(sk.c) AS BIGINT) AS est_cnt
        |FROM tb JOIN sketch sk ON sk.seed = tb.seed AND sk.bk = tb.bk
        |JOIN exact e ON e.t = tb.t
        |GROUP BY 1 ORDER BY event_type""".stripMargin),

    // Bradley-Terry preference ranking: consecutive-event duels ->
    // win grid -> 3 integer fixed-point MM rounds (Hunter 2004) — the
    // RLHF reward-data aggregation with strength-of-schedule, exact
    // in both engines because every op is a truncating BIGINT div
    Q.df("x297_bradley_terry",
      (s, dir) => graft.ext.Preference.bradleyTerry(
        Tables.load(s, dir, "events"), 3),
      btOracleSql(3)),

    // hash-negative mining for contrastive training: per anchor, k
    // reproducible different-label negatives by md5 order — selected
    // with the bounded bottom-k-by-hash aggregate, never a
    // corpus-partition window; regenerable on any cluster
    Q.df("x298_contrastive_negatives",
      (s, dir) => Similarity.contrastiveNegatives(
        Tables.load(s, dir, "embeddings"), 50, 3),
      """WITH a AS (SELECT vec_id AS anchor_id, label AS al
        |           FROM embeddings WHERE vec_id < 50),
        |c AS (SELECT vec_id AS cand_id, label AS cl FROM embeddings),
        |h AS (
        |  SELECT a.anchor_id, c.cand_id, c.cl,
        |    md5(a.anchor_id || ':' || c.cand_id) AS hh
        |  FROM a JOIN c ON c.cl <> a.al),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY anchor_id
        |    ORDER BY hh, CAST(cand_id AS VARCHAR)) AS rn
        |  FROM h)
        |SELECT anchor_id, CAST(rn AS BIGINT) AS neg_rank,
        |  cand_id AS neg_id, CAST(cl AS BIGINT) AS neg_label
        |FROM r WHERE rn <= 3 ORDER BY anchor_id, neg_rank""".stripMargin),

    // RAG chunk manifest: 32-token windows advancing by 24 (overlap
    // 8), integer ceil arithmetic, boundary tokens via postings
    // equi-joins — text never shuffles; the stable span ledger every
    // embedding/serving index traces back to
    Q.df("x299_rag_chunks",
      (s, dir) => TextStats.ragChunks(
        Tables.load(s, dir, "documents"), 32, 8),
      s"""WITH $duckTok,
         |nt AS (SELECT doc_id, max(pos) AS n_tok FROM tok GROUP BY 1),
         |m AS (
         |  SELECT doc_id, n_tok, unnest(generate_series(0,
         |    CASE WHEN n_tok <= 32 THEN 0
         |      ELSE (n_tok - 32 + 23) // 24 END)) AS chunk_id
         |  FROM nt),
         |c AS (
         |  SELECT doc_id, chunk_id, chunk_id * 24 + 1 AS start_pos,
         |    least(32, n_tok - chunk_id * 24) AS chunk_len
         |  FROM m)
         |SELECT c.doc_id, CAST(c.chunk_id AS BIGINT) AS chunk_id,
         |  CAST(c.start_pos AS BIGINT) AS start_pos,
         |  CAST(c.chunk_len AS BIGINT) AS chunk_len,
         |  f.w AS first_token, l.w AS last_token
         |FROM c
         |JOIN tok f ON f.doc_id = c.doc_id AND f.pos = c.start_pos
         |JOIN tok l ON l.doc_id = c.doc_id
         |  AND l.pos = c.start_pos + c.chunk_len - 1
         |ORDER BY c.doc_id, c.chunk_id""".stripMargin),

    // snapshot drift audit: schema + column-profile diff between two
    // versions (orders vs a mutated v2: rows filtered, a column
    // dropped, a column added, planted nulls) — one scan per side,
    // exact ppm null rates, -1 marks column-absent
    Q.df("x300_snapshot_drift",
      (s, dir) => {
        val v1 = Tables.load(s, dir, "orders")
        val v2 = v1.where(col("o_orderkey") % 5 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 7 === 0, lit(null).cast("double"))
              .otherwise(col("o_totalprice")))
          .drop("o_orderpriority")
          .withColumn("o_flag", (col("o_orderkey") % 3).cast("bigint"))
        Profile.snapshotDrift(v1, v2)
      },
      """WITH v2 AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderkey % 3 AS o_flag
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |p1 AS (
        |  SELECT 'o_orderkey' AS c, count(*) AS r,
        |    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn,
        |    count(DISTINCT o_orderkey) AS d FROM orders
        |  UNION ALL SELECT 'o_custkey', count(*),
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_custkey) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', count(*),
        |    sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL SELECT 'o_totalprice', count(*),
        |    sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_totalprice) FROM orders
        |  UNION ALL SELECT 'o_orderdate', count(*),
        |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_orderdate) FROM orders
        |  UNION ALL SELECT 'o_orderpriority', count(*),
        |    sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_orderpriority) FROM orders),
        |p2 AS (
        |  SELECT 'o_orderkey' AS c, count(*) AS r,
        |    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn,
        |    count(DISTINCT o_orderkey) AS d FROM v2
        |  UNION ALL SELECT 'o_custkey', count(*),
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_custkey) FROM v2
        |  UNION ALL SELECT 'o_orderstatus', count(*),
        |    sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_orderstatus) FROM v2
        |  UNION ALL SELECT 'o_totalprice', count(*),
        |    sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_totalprice) FROM v2
        |  UNION ALL SELECT 'o_orderdate', count(*),
        |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_orderdate) FROM v2
        |  UNION ALL SELECT 'o_flag', count(*),
        |    sum(CASE WHEN o_flag IS NULL THEN 1 ELSE 0 END),
        |    count(DISTINCT o_flag) FROM v2)
        |SELECT coalesce(p1.c, p2.c) AS col_name,
        |  CASE WHEN p1.c IS NULL THEN 'added'
        |    WHEN p2.c IS NULL THEN 'removed'
        |    ELSE 'common' END AS status,
        |  CAST(coalesce(p1.r, -1) AS BIGINT) AS rows_v1,
        |  CAST(coalesce(p2.r, -1) AS BIGINT) AS rows_v2,
        |  CAST(coalesce(CASE WHEN p1.r = 0 THEN 0
        |    ELSE p1.nn * 1000000 // p1.r END, -1) AS BIGINT)
        |    AS null_ppm_v1,
        |  CAST(coalesce(CASE WHEN p2.r = 0 THEN 0
        |    ELSE p2.nn * 1000000 // p2.r END, -1) AS BIGINT)
        |    AS null_ppm_v2,
        |  CAST(coalesce(p1.d, -1) AS BIGINT) AS dist_v1,
        |  CAST(coalesce(p2.d, -1) AS BIGINT) AS dist_v2
        |FROM p1 FULL OUTER JOIN p2 ON p1.c = p2.c
        |ORDER BY col_name""".stripMargin),

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

    // per-entity provenance fingerprints: each key's event-id history
    // in (ts, id) order folds to one md5 — the 16-byte settle-the-
    // dispute ledger; any gap, reorder, or injection flips it
    Q.df("x302_provenance_chains",
      (s, dir) => Expectations.provenanceChains(
        Tables.load(s, dir, "events"), "user_id", "ts", "event_id"),
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  md5(string_agg(CAST(event_id AS VARCHAR), ','
        |    ORDER BY epoch_us(ts), event_id)) AS chain_hash
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin),

    // exact prefix-containment (truncation) dedup via the sorted-
    // successor trick; the corpus is seeded with deterministic
    // truncated copies (same derivation in the oracle) so the
    // operator is exercised for real, not on an empty natural set
    Q.df("x303_truncation_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val trunc = docs
          .where(col("doc_id") % 7 === 0 && col("n_chars") >= 40)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            expr("substring(text, 1, CAST(n_chars div 2 AS INT))").as("text"))
        Dedup.truncationDupes(
          docs.select("doc_id", "text").unionByName(trunc))
      },
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(text, 1, CAST(n_chars // 2 AS INT))
        |  FROM documents WHERE doc_id % 7 = 0 AND n_chars >= 40),
        |own AS (SELECT text AS t, min(doc_id) AS owner FROM corpus GROUP BY 1),
        |srt AS (SELECT t, owner, lead(t) OVER (ORDER BY t) AS nxt,
        |        lead(owner) OVER (ORDER BY t) AS nxt_owner FROM own),
        |flag AS (SELECT t, nxt_owner FROM srt
        |         WHERE nxt IS NOT NULL AND starts_with(nxt, t))
        |SELECT c.doc_id AS doc_id,
        |  CAST(length(c.text) AS BIGINT) AS n_chars_trunc,
        |  f.nxt_owner AS container_id
        |FROM corpus c JOIN flag f ON c.text = f.t
        |ORDER BY doc_id""".stripMargin),

    // MAD robust outliers: discrete-median absolute deviation, the
    // 50%-breakdown twin of the IQR fences (x224's percentile_disc
    // parity rule, verified n=1..12 both engines)
    Q.df("x304_mad_outliers",
      (s, dir) => Profile.madOutliers(
        Tables.load(s, dir, "events"), "event_type", col("value")),
      """WITH c AS (SELECT event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |med AS (SELECT event_type,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS med_cents FROM c GROUP BY 1),
        |dev AS (SELECT c.event_type, cents, med_cents,
        |    abs(cents - med_cents) AS d FROM c JOIN med USING (event_type)),
        |mad AS (SELECT event_type,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d)
        |      AS BIGINT) AS mad_cents FROM dev GROUP BY 1)
        |SELECT dev.event_type AS event_type, CAST(count(*) AS BIGINT) AS n,
        |  max(med_cents) AS med_cents, max(mad_cents) AS mad_cents,
        |  CAST(sum(CASE WHEN d > 3 * mad_cents THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  max(d) AS max_dev_cents
        |FROM dev JOIN mad USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // retrieval MRR: rank of the first same-label neighbor under the
    // quantized dot, computed rank-free (1 + count of strictly-better
    // neighbors) — no top-k window over the pair set
    Q.df("x305_retrieval_mrr",
      (s, dir) => Similarity.retrievalMrr(
        Tables.load(s, dir, "embeddings"), 100),
      """WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qe
        |           FROM embeddings WHERE vec_id % 100 = 0),
        |pairs AS (
        |  SELECT q.qid, q.qlabel, e.vec_id, e.label,
        |    CAST(sum(CAST(floor(CAST(qe[i] AS DOUBLE) * 10000) AS BIGINT)
        |           * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000)
        |               AS BIGINT)) AS BIGINT) AS dot_q
        |  FROM q, embeddings e, range(1, 65) r(i)
        |  WHERE q.qid <> e.vec_id GROUP BY 1, 2, 3, 4),
        |best AS (
        |  SELECT qid, dot_q AS bd, vec_id AS bid FROM (
        |    SELECT qid, dot_q, vec_id, row_number() OVER (
        |        PARTITION BY qid ORDER BY dot_q DESC, vec_id) AS rn
        |    FROM pairs WHERE label = qlabel) x WHERE rn = 1)
        |SELECT qid, qlabel, first_rank,
        |  CAST(1000000 // first_rank AS BIGINT) AS rr_ppm
        |FROM (
        |  SELECT p.qid AS qid, max(p.qlabel) AS qlabel,
        |    CAST(1 + sum(CASE WHEN p.dot_q > b.bd OR
        |        (p.dot_q = b.bd AND p.vec_id < b.bid) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS first_rank
        |  FROM pairs p JOIN best b USING (qid) GROUP BY p.qid) y
        |ORDER BY qid""".stripMargin),

    // split-conformal coverage: parity-split calibration, discrete 0.9
    // threshold (a data point — exact BIGINT), held-out coverage ppm
    Q.df("x306_conformal_coverage",
      (s, dir) => Profile.conformalCoverage(
        Tables.load(s, dir, "events"), "event_type", col("value"),
        col("event_id")),
      """WITH c AS (SELECT event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    event_id % 2 = 0 AS is_cal FROM events),
        |thr AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
        |    CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS thr_cents
        |  FROM c WHERE is_cal GROUP BY 1)
        |SELECT c.event_type AS event_type, max(n_cal) AS n_cal,
        |  CAST(count(*) AS BIGINT) AS n_test, max(thr_cents) AS thr_cents,
        |  CAST(sum(CASE WHEN cents <= thr_cents THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_covered,
        |  CAST(sum(CASE WHEN cents <= thr_cents THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS coverage_ppm
        |FROM c JOIN thr USING (event_type) WHERE NOT is_cal
        |GROUP BY 1 ORDER BY 1""".stripMargin),

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

    // epoch waterfilling: closed-form capped token-budget allocation
    // over the per-source mass table, exact-integer water level +
    // largest-remainder top-up
    Q.df("x308_epoch_waterfill",
      (s, dir) => Sampling.epochWaterfill(
        Tables.load(s, dir, "documents"), "source", col("n_chars"),
        3, 17L, 10L),
      """WITH sizes AS (SELECT source AS s, CAST(sum(n_chars) AS BIGINT) AS n
        |               FROM documents GROUP BY 1),
        |caps AS (SELECT s, n, 3 * n AS cap FROM sizes),
        |tot AS (SELECT CAST(sum(n) * 17 // 10 AS BIGINT) AS bud,
        |               CAST(count(*) AS BIGINT) AS m FROM sizes),
        |st AS (SELECT s, n, cap, bud, m,
        |    CAST(row_number() OVER (ORDER BY cap, s) AS BIGINT) AS k,
        |    CAST(sum(cap) OVER (ORDER BY cap, s ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS sk
        |  FROM caps, tot),
        |flags AS (SELECT *, (sk + (m - k) * cap <= bud) AS ok FROM st),
        |kst AS (SELECT CAST(coalesce(sum(CASE WHEN ok THEN 1 END), 0)
        |      AS BIGINT) AS kstar,
        |    CAST(coalesce(max(CASE WHEN ok THEN sk END), 0) AS BIGINT)
        |      AS skstar FROM flags),
        |based AS (SELECT f.*, kstar, skstar,
        |    CASE WHEN kstar < m THEN (bud - skstar) // (m - kstar) END AS lam,
        |    CASE WHEN k <= kstar THEN cap ELSE least(cap,
        |      CASE WHEN kstar < m THEN (bud - skstar) // (m - kstar) END)
        |    END AS base
        |  FROM flags f, kst),
        |sp AS (SELECT CAST(max(bud) - sum(base) AS BIGINT) AS r FROM based),
        |bumped AS (SELECT b.*, r,
        |    (k > kstar AND cap > lam) AS eligible,
        |    CAST(sum(CASE WHEN (k > kstar AND cap > lam) THEN 1 ELSE 0 END)
        |      OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND
        |        CURRENT ROW) AS BIGINT) AS brank
        |  FROM based b, sp)
        |SELECT s AS source, n AS native_tokens, cap AS cap_tokens,
        |  CAST(base + CASE WHEN eligible AND brank <= r THEN 1 ELSE 0 END
        |    AS BIGINT) AS alloc_tokens,
        |  CAST((base + CASE WHEN eligible AND brank <= r THEN 1 ELSE 0 END)
        |    * 1000 // n AS BIGINT) AS epochs_x1000
        |FROM bumped ORDER BY source""".stripMargin),

    // linear-interpolation gap fill (the flow-series sibling of x184's
    // LOCF): integer-cents ramp between observed neighbors
    Q.df("x309_gapfill_interp",
      (s, dir) => TimeSeries.gapFillInterp(
          Tables.load(s, dir, "events").where(col("user_id") % 5 === 0)
            .withColumn("k2",
              concat_ws("|", col("user_id"), col("event_type"))),
          "k2", "ts", "value", "event_id")
        // DATE columns render differently in the two compare paths
        // (pandas datetime64 vs datetime.date) — ship the day as text
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd")),
      """WITH ev AS (SELECT user_id || '|' || event_type AS k2, ts, value,
        |            event_id FROM events WHERE user_id % 5 = 0),
        |daily AS (SELECT k2, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(max_by(CAST(floor(value * 100) AS BIGINT), event_id)
        |      AS BIGINT) AS v
        |  FROM ev GROUP BY 1, 2),
        |span AS (SELECT k2, min(day) AS a, max(day) AS b FROM daily
        |         GROUP BY 1),
        |cal AS (SELECT k2,
        |    unnest(generate_series(a, b, INTERVAL 1 DAY))::DATE AS day
        |  FROM span),
        |j AS (SELECT c.k2, c.day, d.v FROM cal c
        |      LEFT JOIN daily d ON d.k2 = c.k2 AND d.day = c.day),
        |f AS (SELECT k2, day, v,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER w AS pd,
        |    last_value(v IGNORE NULLS) OVER w AS pv,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER w2 AS nd,
        |    first_value(v IGNORE NULLS) OVER w2 AS nv
        |  FROM j WINDOW
        |    w AS (PARTITION BY k2 ORDER BY day ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW),
        |    w2 AS (PARTITION BY k2 ORDER BY day ROWS BETWEEN CURRENT ROW
        |      AND UNBOUNDED FOLLOWING))
        |SELECT k2, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(CASE WHEN v IS NOT NULL THEN v
        |    ELSE pv + ((nv - pv) * date_diff('day', pd, day))
        |      // date_diff('day', pd, nd) END AS BIGINT) AS cents_filled,
        |  CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_interp
        |FROM f ORDER BY k2, day""".stripMargin),

    // 2-D Pareto frontier over (type-token ratio, token count): the
    // non-dominated docs of the quality-vs-length tradeoff
    Q.df("x310_pareto_frontier",
      (s, dir) => Curation.paretoFrontier(
        TextStats.stats(Tables.load(s, dir, "documents")),
        "doc_id", col("ttr_x10k"), col("n_tok")),
      s"""WITH $duckTok,
         |st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |    CAST(floor(10000.0 * count(DISTINCT w) / count(*)) AS BIGINT)
         |      AS a
         |  FROM tok GROUP BY doc_id),
         |pts AS (SELECT doc_id AS id, a, n_tok AS b FROM st),
         |bya AS (SELECT a, max(b) AS mb FROM pts GROUP BY 1),
         |fr AS (SELECT a, mb AS b FROM (
         |    SELECT a, mb, max(mb) OVER (ORDER BY a DESC ROWS BETWEEN
         |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS better FROM bya) z
         |  WHERE better IS NULL OR mb > better)
         |SELECT p.a AS a, p.b AS b, CAST(min(id) AS BIGINT) AS doc_id,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM pts p JOIN fr ON p.a = fr.a AND p.b = fr.b
         |GROUP BY 1, 2 ORDER BY a""".stripMargin),

    // segment-level exact dedup: non-overlapping 3-word chunks; a
    // chunk is duplicated when its text occurs in >= 2 distinct docs
    Q.df("x311_segment_dedup",
      (s, dir) => Dedup.segmentDupes(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |seg AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS seg
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
         |  WHERE a.pos % 3 = 1),
         |multi AS (SELECT seg FROM seg GROUP BY 1
         |          HAVING count(DISTINCT doc_id) >= 2)
         |SELECT s.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_segments,
         |  CAST(count(m.seg) AS BIGINT) AS n_dup_segments,
         |  CAST(count(m.seg) * 1000000 // count(*) AS BIGINT) AS dup_ppm
         |FROM seg s LEFT JOIN multi m USING (seg)
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Gopher-style intra-doc repetition audit: duplicate-word /
    // top-word / duplicate-bigram fractions, exact ppm
    Q.df("x312_repetition_audit",
      (s, dir) => TextStats.repetitionAudit(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
         |wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         |    CAST(count(*) AS BIGINT) AS n_types,
         |    CAST(max(c) AS BIGINT) AS top_c FROM wc GROUP BY 1),
         |bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS b
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
         |ba AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         |    CAST(count(*) AS BIGINT) AS n_bitypes FROM bc GROUP BY 1)
         |SELECT wa.doc_id AS doc_id, n_words, n_types,
         |  (n_words - n_types) * 1000000 // n_words AS dup_word_ppm,
         |  top_c * 1000000 // n_words AS top_word_ppm,
         |  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce((n_bigrams - n_bitypes) * 1000000 // n_bigrams, 0)
         |    AS BIGINT) AS dup_bigram_ppm
         |FROM wa LEFT JOIN ba ON wa.doc_id = ba.doc_id
         |ORDER BY 1""".stripMargin),

    // Cohen's kappa per event_type: rater B is a deterministic noisy
    // copy of rater A; po/pe/kappa in exact ppm off the bounded
    // (group, a, b) cell table
    Q.df("x313_cohen_kappa",
      (s, dir) => Profile.cohenKappa(Tables.load(s, dir, "events")),
      """WITH r AS (SELECT event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    event_id AS eid FROM events),
        |ab AS (SELECT event_type,
        |    CASE WHEN cents < 2000 THEN 0 WHEN cents < 6000 THEN 1
        |      ELSE 2 END AS ra,
        |    CASE WHEN cents + (eid * 37) % 1000 - 500 < 2000 THEN 0
        |      WHEN cents + (eid * 37) % 1000 - 500 < 6000 THEN 1
        |      ELSE 2 END AS rb FROM r),
        |cells AS (SELECT event_type, ra, rb, count(*) AS c
        |  FROM ab GROUP BY 1, 2, 3),
        |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN ra = rb THEN c ELSE 0 END) AS BIGINT) AS agree
        |  FROM cells GROUP BY 1),
        |ma AS (SELECT event_type, ra AS cls, sum(c) AS na
        |  FROM cells GROUP BY 1, 2),
        |mb AS (SELECT event_type, rb AS cls, sum(c) AS nb
        |  FROM cells GROUP BY 1, 2),
        |pe AS (SELECT ma.event_type, CAST(sum(na * nb) AS BIGINT) AS prod
        |  FROM ma JOIN mb ON ma.event_type = mb.event_type
        |    AND ma.cls = mb.cls GROUP BY 1),
        |base AS (SELECT t.event_type, n,
        |    agree * 1000000 // n AS po_ppm,
        |    prod * 1000000 // (n * n) AS pe_ppm
        |  FROM tot t JOIN pe ON t.event_type = pe.event_type)
        |SELECT event_type, n, po_ppm, pe_ppm,
        |  CASE WHEN pe_ppm >= 1000000 THEN 1000000
        |    ELSE (po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm)
        |  END AS kappa_ppm
        |FROM base ORDER BY 1""".stripMargin),

    // labeled precision@10 for every 100th vector, judged against the
    // window top-k formulation
    Q.df("x314_precision_at_k",
      (s, dir) => Similarity.precisionAtK(
        Tables.load(s, dir, "embeddings"), 100, 10),
      """WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qe
        |           FROM embeddings WHERE vec_id % 100 = 0),
        |pairs AS (
        |  SELECT q.qid, q.qlabel, e.vec_id, e.label,
        |    CAST(sum(CAST(floor(CAST(qe[i] AS DOUBLE) * 10000) AS BIGINT)
        |           * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000)
        |               AS BIGINT)) AS BIGINT) AS dot_q
        |  FROM q, embeddings e, range(1, 65) r(i)
        |  WHERE q.qid <> e.vec_id GROUP BY 1, 2, 3, 4),
        |top AS (SELECT qid, qlabel, label FROM (
        |    SELECT qid, qlabel, label, row_number() OVER (
        |        PARTITION BY qid ORDER BY dot_q DESC, vec_id) AS rn
        |    FROM pairs) z WHERE rn <= 10)
        |SELECT qid, max(qlabel) AS qlabel,
        |  CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hits,
        |  CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) * 1000000
        |    // 10 AS BIGINT) AS p_at_k_ppm
        |FROM top GROUP BY qid ORDER BY qid""".stripMargin),

    // corpus novelty-decay curve: per 50-doc arrival bucket, the
    // fraction of distinct shingles never seen in an earlier doc
    Q.df("x315_novelty_curve",
      (s, dir) => Curation.noveltyCurve(Tables.load(s, dir, "documents")),
      s"""WITH $duckTok, $duckShingles,
         |own AS (SELECT shingle, min(doc_id) AS owner FROM sh GROUP BY 1),
         |per AS (SELECT sh.doc_id, count(*) AS n_sh,
         |    sum(CASE WHEN own.owner = sh.doc_id THEN 1 ELSE 0 END) AS n_novel
         |  FROM sh JOIN own USING (shingle) GROUP BY 1)
         |SELECT CAST(doc_id // 50 AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_sh) AS BIGINT) AS n_shingles,
         |  CAST(sum(n_novel) AS BIGINT) AS n_novel,
         |  CAST(sum(n_novel) * 1000000 // sum(n_sh) AS BIGINT) AS novelty_ppm
         |FROM per GROUP BY 1 ORDER BY 1""".stripMargin),

    // exact 1-Wasserstein length drift of every source vs src0, on the
    // global value grid, scaled integers
    Q.df("x316_wasserstein_drift",
      (s, dir) => Profile.wassersteinDrift(Tables.load(s, dir, "documents")),
      """WITH vc AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
        |    count(*) AS c FROM documents GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT v FROM vc),
        |srcs AS (SELECT DISTINCT source FROM vc WHERE source <> 'src0'),
        |basec AS (SELECT v, c AS cb FROM vc WHERE source = 'src0'),
        |grid AS (SELECT s.source, vals.v, coalesce(vc.c, 0) AS c,
        |    coalesce(b.cb, 0) AS cb
        |  FROM srcs s CROSS JOIN vals
        |  LEFT JOIN vc ON vc.source = s.source AND vc.v = vals.v
        |  LEFT JOIN basec b ON b.v = vals.v),
        |st AS (SELECT source, v,
        |    sum(c) OVER (PARTITION BY source ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY source ORDER BY v) AS cumb,
        |    lead(v) OVER (PARTITION BY source ORDER BY v) AS nv
        |  FROM grid),
        |tota AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_a FROM vc
        |  WHERE source <> 'src0' GROUP BY 1),
        |totb AS (SELECT CAST(sum(cb) AS BIGINT) AS n_b FROM basec)
        |SELECT st.source AS source, n_a, n_b,
        |  CAST(sum(abs(cuma * n_b - cumb * n_a) * (nv - v)) AS BIGINT)
        |    AS w1_scaled,
        |  CAST(CAST(sum(abs(cuma * n_b - cumb * n_a) * (nv - v)) AS HUGEINT)
        |    * 1000000 // (n_a * n_b) AS BIGINT) AS w1_micro
        |FROM st JOIN tota USING (source) CROSS JOIN totb
        |WHERE nv IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin),

    // cross-source shingle contamination matrix: shared distinct
    // 3-gram counts + exact Jaccard ppm per source pair
    Q.df("x317_contamination_matrix",
      (s, dir) => Curation.contaminationMatrix(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |st AS (SELECT DISTINCT d.source,
         |    a.w || ' ' || b.w || ' ' || c.w AS s
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
         |             JOIN documents d ON d.doc_id = a.doc_id),
         |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
         |  FROM st GROUP BY 1),
         |shared AS (SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM st a JOIN st b ON a.s = b.s AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, n_shared,
         |  n_shared * 1000000 // (sa.n + sb.n - n_shared) AS jaccard_ppm
         |FROM shared JOIN sizes sa ON sa.source = src_a
         |            JOIN sizes sb ON sb.source = src_b
         |ORDER BY src_a, src_b""".stripMargin),

    // inverse-frequency length-balancing sampling weights per
    // 50-char bucket
    Q.df("x318_length_balance",
      (s, dir) => Sampling.lengthBalanceWeights(
        Tables.load(s, dir, "documents")),
      """WITH b AS (SELECT CAST(n_chars // 50 AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |    CAST(count(*) AS BIGINT) AS n_buckets FROM b)
        |SELECT bucket, n_docs,
        |  n_docs * 1000000 // n_total AS share_ppm,
        |  n_total * 1000000 // (n_buckets * n_docs) AS weight_ppm
        |FROM b CROSS JOIN t ORDER BY bucket""".stripMargin),

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

    // class-balance audit: effective class count (inverse Simpson,
    // milli) + max/min imbalance over the embeddings labels
    Q.df("x320_class_balance",
      (s, dir) => Profile.classBalance(Tables.load(s, dir, "embeddings")),
      """WITH l AS (SELECT label, CAST(count(*) AS BIGINT) AS c
        |  FROM embeddings GROUP BY 1),
        |a AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_classes,
        |    CAST(sum(c * c) AS BIGINT) AS sumsq,
        |    CAST(max(c) AS BIGINT) AS max_n,
        |    CAST(min(c) AS BIGINT) AS min_n FROM l)
        |SELECT n_rows, n_classes,
        |  CAST(CAST(n_rows AS HUGEINT) * n_rows * 1000 // sumsq
        |    AS BIGINT) AS eff_classes_milli,
        |  max_n, min_n, max_n * 1000 // min_n AS imbalance_milli
        |FROM a""".stripMargin),

    // per-source lexical divergence from the corpus in whole-bit
    // surprise (the flog2 quantization of the perplexity tiers)
    Q.df("x321_vocab_divergence",
      (s, dir) => TextStats.vocabDivergence(Tables.load(s, dir, "documents")),
      """WITH tok AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents),
        |sc AS (SELECT d.source, t.w, CAST(count(*) AS BIGINT) AS c
        |  FROM tok t JOIN documents d USING (doc_id) GROUP BY 1, 2),
        |corpus AS (SELECT w, CAST(sum(c) AS BIGINT) AS cc
        |  FROM sc GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s
        |  FROM sc GROUP BY 1),
        |nt AS (SELECT CAST(sum(cc) AS BIGINT) AS n_tot FROM corpus),
        |agg AS (SELECT sc.source, ns.n_s,
        |    CAST(sum(c * ((length(bin(n_tot)) - 1)
        |      - (length(bin(cc)) - 1))) AS BIGINT) AS cross_bits,
        |    CAST(sum(c * ((length(bin(ns.n_s)) - 1)
        |      - (length(bin(c)) - 1))) AS BIGINT) AS self_bits
        |  FROM sc JOIN corpus USING (w) JOIN ns USING (source)
        |  CROSS JOIN nt GROUP BY 1, 2)
        |SELECT source, n_s AS n_tokens, cross_bits, self_bits,
        |  cross_bits - self_bits AS div_bits,
        |  (cross_bits - self_bits) * 1000 // n_s AS div_millibits_per_tok
        |FROM agg ORDER BY source""".stripMargin),

    // burstiness audit: variance-to-mean of daily counts per event
    // type over the global day span, exact milli
    Q.df("x322_dispersion_index",
      (s, dir) => TimeSeries.dispersionIndex(Tables.load(s, dir, "events")),
      """WITH daily AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |span AS (SELECT CAST(max(d) - min(d) + 1 AS BIGINT) AS m_days
        |  FROM daily),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_active_days,
        |    CAST(sum(c) AS BIGINT) AS n_events,
        |    CAST(sum(c * c) AS BIGINT) AS sumsq FROM daily GROUP BY 1)
        |SELECT event_type, m_days, n_active_days, n_events,
        |  (m_days * sumsq - n_events * n_events) * 1000
        |    // (m_days * n_events) AS disp_milli
        |FROM g CROSS JOIN span ORDER BY event_type""".stripMargin),

    // inter-arrival cadence profile: whole-second gap count / discrete
    // median / discrete p90 / max per event type
    Q.df("x323_inter_arrival",
      (s, dir) => TimeSeries.interArrival(Tables.load(s, dir, "events")),
      """WITH e AS (SELECT event_type, user_id, event_id,
        |    epoch_us(ts) AS ts_us FROM events WHERE user_id IS NOT NULL),
        |g AS (SELECT event_type, (ts_us - lag(ts_us) OVER
        |    (PARTITION BY event_type, user_id ORDER BY ts_us, event_id))
        |    // 1000000 AS gap_s
        |  FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_s)
        |    AS BIGINT) AS med_gap_s,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_s)
        |    AS BIGINT) AS p90_gap_s,
        |  CAST(max(gap_s) AS BIGINT) AS max_gap_s
        |FROM g WHERE gap_s IS NOT NULL
        |GROUP BY 1 ORDER BY event_type""".stripMargin),

    // t-closeness of the value distribution per event_type vs global:
    // ordered EMD over the global cents grid, exact ppm
    Q.df("x324_t_closeness",
      (s, dir) => Privacy.tCloseness(Tables.load(s, dir, "events"),
        "event_type", expr("CAST(floor(value * 100) AS BIGINT)")),
      """WITH vc AS (SELECT event_type AS qi,
        |    CAST(floor(value * 100) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |gdist AS (SELECT v, CAST(sum(c) AS BIGINT) AS cg
        |  FROM vc GROUP BY 1),
        |qis AS (SELECT DISTINCT qi FROM vc),
        |grid AS (SELECT q.qi, g.v, g.cg, coalesce(vc.c, 0) AS c
        |  FROM qis q CROSS JOIN gdist g
        |  LEFT JOIN vc ON vc.qi = q.qi AND vc.v = g.v),
        |st AS (SELECT qi, v,
        |    sum(c) OVER (PARTITION BY qi ORDER BY v) AS cum_q,
        |    sum(cg) OVER (PARTITION BY qi ORDER BY v) AS cum_g
        |  FROM grid),
        |ng AS (SELECT qi, CAST(sum(c) AS BIGINT) AS n_g
        |  FROM vc GROUP BY 1),
        |tot AS (SELECT CAST(sum(cg) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS m FROM gdist)
        |SELECT st.qi AS qi, n_g AS n_rows,
        |  CAST(CAST(sum(abs(cum_q * n - cum_g * n_g)) AS HUGEINT)
        |    * 1000000 // (n_g * n * (m - 1)) AS BIGINT) AS emd_ppm
        |FROM st JOIN ng USING (qi) CROSS JOIN tot
        |GROUP BY 1, 2, n, m ORDER BY qi""".stripMargin),

    // per-user contribution bounding audit: discrete p99 clamp and
    // exactly how many rows it would drop, per event_type
    Q.df("x325_contribution_bounds",
      (s, dir) => Privacy.contributionBounds(
        Tables.load(s, dir, "events"), "event_type", "user_id"),
      """WITH cu AS (SELECT event_type AS cell, user_id AS u,
        |    CAST(count(*) AS BIGINT) AS c FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |st AS (SELECT cell, CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(max(c) AS BIGINT) AS max_rows_user,
        |    CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY c)
        |      AS BIGINT) AS p99_rows
        |  FROM cu GROUP BY 1)
        |SELECT st.cell AS cell, n_rows, n_users, max_rows_user, p99_rows,
        |  CAST(sum(greatest(c - p99_rows, 0)) AS BIGINT) AS excess_rows,
        |  CAST(sum(greatest(c - p99_rows, 0)) * 1000000 // n_rows
        |    AS BIGINT) AS excess_ppm
        |FROM cu JOIN st USING (cell)
        |GROUP BY 1, 2, 3, 4, 5 ORDER BY cell""".stripMargin),

    // exact lag-1..7 autocorrelation of daily counts per event type —
    // zero days counted via algebra, never materialized
    Q.df("x326_autocorr_daily",
      (s, dir) => TimeSeries.autocorrDaily(Tables.load(s, dir, "events")),
      """WITH daily AS (SELECT event_type AS g,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |span AS (SELECT CAST(min(d) AS BIGINT) AS dmin,
        |    CAST(max(d) AS BIGINT) AS dmax,
        |    CAST(max(d) - min(d) + 1 AS BIGINT) AS m FROM daily),
        |stats AS (SELECT g, CAST(sum(c) AS BIGINT) AS s,
        |    CAST(sum(c * c) AS BIGINT) AS sumsq FROM daily GROUP BY 1),
        |lags AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS k),
        |p AS (SELECT a.g, l.k, CAST(sum(a.c * b.c) AS BIGINT) AS p
        |  FROM daily a CROSS JOIN lags l
        |  JOIN daily b ON b.g = a.g AND b.d = a.d + l.k GROUP BY 1, 2),
        |ab AS (SELECT dl.g, dl.k,
        |    CAST(sum(CASE WHEN dl.d <= span.dmax - dl.k THEN dl.c
        |      ELSE 0 END) AS BIGINT) AS a_sum,
        |    CAST(sum(CASE WHEN dl.d >= span.dmin + dl.k THEN dl.c
        |      ELSE 0 END) AS BIGINT) AS b_sum
        |  FROM (SELECT daily.*, lags.k FROM daily CROSS JOIN lags) dl
        |  CROSS JOIN span GROUP BY 1, 2)
        |SELECT stats.g AS event_type, lags.k AS lag,
        |  m - lags.k AS n_pairs,
        |  CAST((m * m * coalesce(p.p, 0) - m * s * (a_sum + b_sum)
        |      + (m - lags.k) * s * s) * 1000
        |    // nullif(m * m * sumsq - m * s * s, 0) AS BIGINT)
        |    AS acf_milli
        |FROM stats CROSS JOIN lags
        |JOIN ab ON ab.g = stats.g AND ab.k = lags.k
        |LEFT JOIN p ON p.g = stats.g AND p.k = lags.k
        |CROSS JOIN span
        |ORDER BY event_type, lag""".stripMargin),

    // character-class profile per source: lower/upper/digit/space/
    // other fractions of all characters, exact ppm
    Q.df("x327_charclass_profile",
      (s, dir) => TextStats.charClassProfile(Tables.load(s, dir, "documents")),
      """WITH p AS (SELECT source, CAST(length(text) AS BIGINT) AS n,
        |    CAST(length(text) - length(regexp_replace(text, '[a-z]',
        |      '', 'g')) AS BIGINT) AS lo,
        |    CAST(length(text) - length(regexp_replace(text, '[A-Z]',
        |      '', 'g')) AS BIGINT) AS up,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]',
        |      '', 'g')) AS BIGINT) AS di,
        |    CAST(length(text) - length(regexp_replace(text, '[ \t\n\r]',
        |      '', 'g')) AS BIGINT) AS sp
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_chars,
        |  CAST(sum(lo) * 1000000 // sum(n) AS BIGINT) AS lower_ppm,
        |  CAST(sum(up) * 1000000 // sum(n) AS BIGINT) AS upper_ppm,
        |  CAST(sum(di) * 1000000 // sum(n) AS BIGINT) AS digit_ppm,
        |  CAST(sum(sp) * 1000000 // sum(n) AS BIGINT) AS space_ppm,
        |  CAST((sum(n) - sum(lo) - sum(up) - sum(di) - sum(sp))
        |    * 1000000 // sum(n) AS BIGINT) AS other_ppm
        |FROM p GROUP BY 1 ORDER BY source""".stripMargin),

    // k-core peeling trajectory (k=18, 5 rounds) on the symmetrized
    // customer-supplier graph (x169's edge set); round 1 peels the
    // low-degree customers, the flat tail proves the 18-core is
    // reached in-band. Oracle = the rounds unrolled.
    Q.df("x328_kcore_trajectory",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val cs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey")).as("src"),
            concat(lit("s"), col("l_suppkey")).as("dst"))
        // one orientation only — the operator symmetrizes internally
        Graph.kCoreTrajectory(cs, 18, 5)
      },
      kcoreOracleSql(18, 5)),

    // Zipf-curve audit: corpus frequencies at power-of-two ranks with
    // whole-bit drops per doubling
    Q.df("x329_zipf_audit",
      (s, dir) => TextStats.zipfAudit(Tables.load(s, dir, "documents")),
      """WITH tok AS (SELECT
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents),
        |counts AS (SELECT w, CAST(count(*) AS BIGINT) AS freq
        |  FROM tok GROUP BY 1),
        |r AS (SELECT w, freq, CAST(row_number() OVER
        |    (ORDER BY freq DESC, w) AS BIGINT) AS rank FROM counts),
        |pw AS (SELECT rank, w, freq,
        |    CAST(length(bin(freq)) - 1 AS BIGINT) AS flog2_freq
        |  FROM r WHERE rank <= 1024 AND (rank & (rank - 1)) = 0)
        |SELECT rank, w AS word, freq, flog2_freq,
        |  lag(flog2_freq) OVER (ORDER BY rank) - flog2_freq AS drop_bits
        |FROM pw ORDER BY rank""".stripMargin),

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

    // exact 10%-trimmed mean of order value per priority — rank-free,
    // off the bounded (group, cents) histogram
    Q.df("x331_trimmed_mean",
      (s, dir) => Profile.trimmedMean(Tables.load(s, dir, "orders"),
        "o_orderpriority",
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)"), 10),
      """WITH vc AS (SELECT o_orderpriority AS g,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c FROM orders GROUP BY 1, 2),
        |cumt AS (SELECT g, v, c,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
        |      AS cum FROM vc),
        |tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM vc GROUP BY 1),
        |k AS (SELECT cumt.g, v, c, cum, n, n * 10 // 100 AS t
        |  FROM cumt JOIN tot USING (g)),
        |kept AS (SELECT g, v, n,
        |    greatest(least(cum, n - t) - greatest(cum - c, t), 0) AS keep
        |  FROM k)
        |SELECT g AS o_orderpriority, n,
        |  CAST(sum(keep) AS BIGINT) AS n_kept,
        |  CAST(sum(v * keep) AS BIGINT) AS sum_kept,
        |  CAST(sum(v * keep) * 100 // sum(keep) AS BIGINT) AS mean_x100
        |FROM kept GROUP BY 1, 2 ORDER BY 1""".stripMargin),

    // hour-of-day whole-bit entropy + peak share per event type: the
    // cron-vs-organic traffic separator
    Q.df("x332_hour_entropy",
      (s, dir) => TimeSeries.hourEntropy(Tables.load(s, dir, "events")),
      """WITH hc AS (SELECT event_type AS g, CAST(hour(ts) AS BIGINT) AS h,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |a AS (SELECT g, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(c * (length(bin(c)) - 1)) AS BIGINT) AS self_bits
        |  FROM hc GROUP BY 1),
        |peak AS (SELECT g, h AS peak_hour, c AS pc FROM (
        |    SELECT g, h, c, row_number() OVER
        |      (PARTITION BY g ORDER BY c DESC, h) AS rn FROM hc)
        |  WHERE rn = 1)
        |SELECT a.g AS event_type, n AS n_events,
        |  CAST((n * (length(bin(n)) - 1) - self_bits) * 1000 // n
        |    AS BIGINT) AS entropy_millibits,
        |  peak_hour, CAST(pc * 1000000 // n AS BIGINT) AS peak_ppm
        |FROM a JOIN peak USING (g) ORDER BY 1""".stripMargin),

    // tokenizer vocab-sizing curve: exact OOV token mass at
    // power-of-two vocab sizes
    Q.df("x333_oov_curve",
      (s, dir) => TextStats.oovCurve(Tables.load(s, dir, "documents")),
      """WITH tok AS (SELECT
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents),
        |counts AS (SELECT w, CAST(count(*) AS BIGINT) AS freq
        |  FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS n_tokens FROM counts),
        |r AS (SELECT w, freq,
        |    CAST(row_number() OVER (ORDER BY freq DESC, w) AS BIGINT)
        |      AS rank,
        |    CAST(sum(freq) OVER (ORDER BY freq DESC, w
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS covered
        |  FROM counts)
        |SELECT rank AS vocab_size, covered AS covered_tokens,
        |  n_tokens - covered AS oov_tokens,
        |  (n_tokens - covered) * 1000000 // n_tokens AS oov_ppm
        |FROM r CROSS JOIN tot
        |WHERE rank <= 1024 AND (rank & (rank - 1)) = 0
        |ORDER BY 1""".stripMargin),

    // duplication-vs-length calibration: exact-dup rate per rank-free
    // length decile
    Q.df("x334_dup_length_decile",
      (s, dir) => Curation.dupByLengthDecile(
        Tables.load(s, dir, "documents")),
      """WITH dupc AS (SELECT text, CAST(count(*) AS BIGINT) AS n_copies
        |  FROM documents GROUP BY 1),
        |hist AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS hc
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(hc) AS BIGINT) AS n_total FROM hist),
        |dec AS (SELECT n_chars,
        |    (CAST(sum(hc) OVER (ORDER BY n_chars) AS BIGINT) - hc)
        |      * 10 // n_total AS decile
        |  FROM hist CROSS JOIN tot)
        |SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dup_docs,
        |  CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS dup_ppm
        |FROM documents JOIN dupc USING (text) JOIN dec USING (n_chars)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // KMV distinct sketch judged against its own ground truth: exact
    // distinct users, the k=64 minimum 32-bit hash, the estimate, and
    // its error — deterministic, unlike the HLL tiers
    Q.df("x335_kmv_distinct",
      (s, dir) => Profile.kmvDistinct(Tables.load(s, dir, "events"),
        "event_type", "user_id", 64),
      """WITH dk AS (SELECT DISTINCT event_type AS g,
        |    CAST(user_id AS VARCHAR) AS u FROM events
        |  WHERE user_id IS NOT NULL),
        |h AS (SELECT g, u, md5(u) AS h FROM dk),
        |rn AS (SELECT g, u, h, row_number() OVER
        |    (PARTITION BY g ORDER BY h, u) AS rn FROM h),
        |ex AS (SELECT g, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM dk GROUP BY 1),
        |kth AS (SELECT g, CAST(list_aggregate(list_transform(range(1, 9),
        |    i -> (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |      * 16 ** (8 - i)), 'sum') AS BIGINT) AS vk_32
        |  FROM rn WHERE rn = 64)
        |SELECT ex.g AS event_type, n_exact,
        |  CAST(least(n_exact, 64) AS BIGINT) AS n_sketch,
        |  CAST(coalesce(vk_32, 0) AS BIGINT) AS vk_32,
        |  CAST(CASE WHEN n_exact < 64 THEN n_exact
        |    ELSE 63 * 4294967296 // vk_32 END AS BIGINT) AS est_distinct,
        |  CAST(abs((CASE WHEN n_exact < 64 THEN n_exact
        |      ELSE 63 * 4294967296 // vk_32 END) - n_exact) * 1000000
        |    // n_exact AS BIGINT) AS err_ppm
        |FROM ex LEFT JOIN kth USING (g) ORDER BY 1""".stripMargin),

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

    // coverage-floor sample: >= 2 docs per (source, lang) cell
    // guaranteed, hash-ordered top-up to 400
    Q.df("x337_coverage_floor",
      (s, dir) => Sampling.coverageFloorSample(
        Tables.load(s, dir, "documents"), 2, 400),
      """WITH b AS (SELECT doc_id, source, lang,
        |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |rn AS (SELECT b.*, row_number() OVER
        |    (PARTITION BY source, lang ORDER BY h, doc_id) AS rn
        |  FROM b),
        |fl AS (SELECT doc_id, source, lang FROM rn WHERE rn <= 2),
        |g AS (SELECT count(*) AS ng FROM fl),
        |rest AS (SELECT b.* FROM b
        |  WHERE doc_id NOT IN (SELECT doc_id FROM fl)),
        |grn AS (SELECT doc_id, source, lang, row_number() OVER
        |    (ORDER BY h, doc_id) AS rn2 FROM rest)
        |SELECT doc_id, source, lang, 'floor' AS picked_by FROM fl
        |UNION ALL
        |SELECT doc_id, source, lang, 'topup' FROM grn CROSS JOIN g
        |WHERE rn2 <= 400 - ng
        |ORDER BY doc_id""".stripMargin),

    // near-dup graph transitivity: wedge closure rate on the 60-bit
    // simhash pair graph — the CC over-merge audit
    Q.df("x338_dedup_transitivity",
      (s, dir) => Dedup.nearDupTransitivity(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |nib AS (
         |  SELECT doc_id, j,
         |    instr('0123456789abcdef', substr(md5(w), j, 1)) - 1 AS v
         |  FROM tok, range(1, 16) r(j)
         |), bits AS (
         |  SELECT doc_id, (j - 1) * 4 + b.b AS pos,
         |    sum(CASE WHEN (v & b.mask) > 0 THEN 1 ELSE -1 END) AS s
         |  FROM nib, (VALUES (0, 1), (1, 2), (2, 4), (3, 8)) AS b(b, mask)
         |  GROUP BY doc_id, (j - 1) * 4 + b.b
         |), sk AS (
         |  SELECT doc_id, CAST(sum(CASE WHEN s >= 0
         |    THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT)
         |    AS simhash
         |  FROM bits GROUP BY doc_id
         |), bands AS (
         |  SELECT doc_id, simhash, b,
         |    (simhash >> (b * 15)) & 32767 AS nib
         |  FROM sk, range(0, 4) r(b)
         |), pr AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.b = b.b AND a.nib = b.nib AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |), sym AS (
         |  SELECT d1 AS s, d2 AS t FROM pr
         |  UNION ALL SELECT d2, d1 FROM pr
         |), w AS (
         |  SELECT e1.t AS d1, e2.t AS d2 FROM sym e1
         |  JOIN sym e2 ON e1.s = e2.s AND e1.t < e2.t
         |), cl AS (SELECT count(*) AS n_closed FROM w
         |  WHERE EXISTS (SELECT 1 FROM pr
         |    WHERE pr.d1 = w.d1 AND pr.d2 = w.d2))
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM pr) AS n_pairs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM w) AS n_wedges,
         |  CAST(cl.n_closed AS BIGINT) AS n_closed,
         |  CAST(cl.n_closed * 1000000
         |    // nullif((SELECT count(*) FROM w), 0) AS BIGINT)
         |    AS closure_ppm
         |FROM cl""".stripMargin),

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

    // head-shingle-drop contamination tier: universal boilerplate
    // pruned before the pair join, dropped count carried in-band
    Q.df("x342_contamination_pruned",
      (s, dir) => Curation.contaminationMatrixPruned(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok,
         |st AS (SELECT DISTINCT d.source,
         |    a.w || ' ' || b.w || ' ' || c.w AS s
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
         |             JOIN documents d ON d.doc_id = a.doc_id),
         |hot AS (SELECT s FROM st GROUP BY s HAVING count(*) >= 3),
         |drp AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped FROM hot),
         |pr AS (SELECT source, s FROM st
         |  WHERE s NOT IN (SELECT s FROM hot)),
         |sizes AS (SELECT st.source,
         |    CAST(count(CASE WHEN hot.s IS NULL THEN 1 END) AS BIGINT)
         |      AS n
         |  FROM st LEFT JOIN hot ON st.s = hot.s GROUP BY 1),
         |shared AS (SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM pr a JOIN pr b ON a.s = b.s AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT sa.source AS src_a, sb.source AS src_b,
         |  sa.n AS n_a, sb.n AS n_b,
         |  coalesce(n_shared, 0) AS n_shared,
         |  coalesce(coalesce(n_shared, 0) * 1000000
         |    // nullif(sa.n + sb.n - coalesce(n_shared, 0), 0), 0)
         |    AS jaccard_ppm,
         |  n_dropped
         |FROM sizes sa JOIN sizes sb ON sa.source < sb.source
         |  LEFT JOIN shared
         |    ON shared.src_a = sa.source AND shared.src_b = sb.source
         |  CROSS JOIN drp
         |ORDER BY src_a, src_b""".stripMargin),

    // simplified silhouette per label: centroid-based, exact milli —
    // the label-quality audit with the misassignment counter
    Q.df("x343_silhouette",
      (s, dir) => Similarity.silhouette(
        Tables.load(s, dir, "embeddings")),
      """WITH comp AS (
        |  SELECT vec_id, label, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
        |      AS q
        |  FROM embeddings, range(1, 65) r(i)),
        |cent AS (
        |  SELECT label AS clabel, i,
        |    CAST(sum(q) // count(*) AS BIGINT) AS c
        |  FROM comp GROUP BY 1, 2),
        |d2 AS (
        |  SELECT comp.vec_id, comp.label, cent.clabel,
        |    CAST(sum((q - c) * (q - c)) AS BIGINT) AS d2
        |  FROM comp JOIN cent USING (i)
        |  GROUP BY 1, 2, 3),
        |ab AS (
        |  SELECT vec_id, label,
        |    max(CASE WHEN label = clabel THEN d2 END) AS a,
        |    min(CASE WHEN label <> clabel THEN d2 END) AS b
        |  FROM d2 GROUP BY 1, 2),
        |sm AS (
        |  SELECT label,
        |    coalesce((b - a) * 1000 // nullif(greatest(a, b), 0), 0)
        |      AS s
        |  FROM ab)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(s) // count(*) AS BIGINT) AS avg_s_milli,
        |  CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_negative
        |FROM sm GROUP BY 1 ORDER BY 1""".stripMargin),

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

    // Theil-Sen robust daily-trend slope vs OLS, exact micro units
    Q.df("x345_theil_sen",
      (s, dir) => TimeSeries.theilSenTrend(
        Tables.load(s, dir, "events")),
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |mn AS (SELECT min(d) AS d0 FROM daily),
        |base AS (SELECT d - d0 AS d, y FROM daily CROSS JOIN mn),
        |pairs AS (SELECT (b.y - a.y) * 1000000 // (b.d - a.d) AS slope
        |  FROM base a JOIN base b ON a.d < b.d),
        |ts AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)
        |    AS BIGINT) AS theilsen_micro FROM pairs),
        |ols AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(CAST(count(*) * sum(d * y) - sum(d) * sum(y) AS HUGEINT)
        |    * 1000000
        |    // (count(*) * sum(d * d) - sum(d) * sum(d)) AS BIGINT)
        |    AS ols_micro FROM base)
        |SELECT n_days, n_pairs, theilsen_micro, ols_micro
        |FROM ols CROSS JOIN ts""".stripMargin),

    // discrete hazard curve of user lifetime — retention-cliff audit
    Q.df("x346_hazard_curve",
      (s, dir) => TimeSeries.hazardCurve(
        Tables.load(s, dir, "events")),
      """WITH ls AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(max(ts) AS DATE)) AS BIGINT) AS k
        |  FROM events GROUP BY 1),
        |h AS (SELECT k, CAST(count(*) AS BIGINT) AS n_churned
        |  FROM ls GROUP BY 1),
        |c AS (SELECT k, n_churned,
        |    CAST(sum(n_churned) OVER (ORDER BY k DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_at_risk
        |  FROM h)
        |SELECT k, n_churned, n_at_risk,
        |  n_churned * 1000000 // n_at_risk AS hazard_ppm
        |FROM c ORDER BY k""".stripMargin),

    // per-dimension variance utilization — the anisotropy audit
    Q.df("x347_dim_utilization",
      (s, dir) => Similarity.dimUtilization(
        Tables.load(s, dir, "embeddings")),
      """WITH comp AS (
        |  SELECT i AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
        |      AS q
        |  FROM embeddings, range(1, 65) r(i)),
        |mom AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(q) AS BIGINT) AS s1,
        |    sum(CAST(q AS HUGEINT) * q) AS s2
        |  FROM comp GROUP BY 1),
        |mv AS (SELECT CAST(dim AS BIGINT) AS dim,
        |    s1 // n AS mean_q,
        |    CAST((n * s2 - CAST(s1 AS HUGEINT) * s1)
        |      // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_q
        |  FROM mom),
        |tot AS (SELECT CAST(sum(var_q) AS BIGINT) AS tv FROM mv)
        |SELECT dim, mean_q, var_q,
        |  coalesce(var_q * 1000000 // nullif(tv, 0), 0)
        |    AS var_share_ppm,
        |  coalesce(CAST(sum(var_q) OVER (ORDER BY var_q DESC, dim
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) * 1000000 // nullif(tv, 0), 0)
        |    AS cum_share_ppm
        |FROM mv CROSS JOIN tot
        |ORDER BY var_q DESC, dim""".stripMargin),

    // population stability index per source vs the rest, whole-bit
    // log quantization with Laplace smoothing — the category-mix
    // drift monitor
    Q.df("x348_psi_drift",
      (s, dir) => Profile.psiDrift(Tables.load(s, dir, "documents")),
      """WITH vc AS (SELECT source, lang AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT v FROM vc),
        |srcs AS (SELECT DISTINCT source FROM vc),
        |grid AS (SELECT srcs.source, vals.v, coalesce(vc.c, 0) AS c
        |  FROM srcs CROSS JOIN vals
        |  LEFT JOIN vc ON vc.source = srcs.source AND vc.v = vals.v),
        |gt AS (SELECT v, sum(c) AS g FROM vc GROUP BY 1),
        |ta AS (SELECT source, sum(c) AS n_a FROM vc GROUP BY 1),
        |corp AS (SELECT sum(c) AS n_corpus, count(DISTINCT v) AS nv
        |  FROM vc),
        |t AS (SELECT grid.source, ta.n_a, grid.c + 1 AS a,
        |    gt.g - grid.c + 1 AS b, ta.n_a + corp.nv AS taa,
        |    corp.n_corpus - ta.n_a + corp.nv AS tb
        |  FROM grid JOIN gt USING (v)
        |  JOIN ta ON ta.source = grid.source CROSS JOIN corp)
        |SELECT source, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(sum((a * 1000000 // taa - b * 1000000 // tb)
        |    * ((length(bin(a * tb)) - 1) - (length(bin(b * taa)) - 1)))
        |    AS BIGINT) AS psi_ppm_bits
        |FROM t GROUP BY 1, 2 ORDER BY source""".stripMargin),

    // Mann-Whitney U per event type vs the rest: doubled midranks
    // from the value histogram, rank-biserial effect size in ppm
    Q.df("x349_mann_whitney",
      (s, dir) => Profile.mannWhitney(Tables.load(s, dir, "events")),
      """WITH h AS (SELECT event_type AS grp,
        |    CAST(floor(value * 10) AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS ca
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |gq AS (SELECT q, sum(ca) AS gc FROM h GROUP BY 1),
        |m AS (SELECT q, 2 * coalesce(sum(gc) OVER (ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + gc + 1 AS midrank2 FROM gq),
        |s AS (SELECT grp, sum(ca) AS n_a,
        |    sum(ca * midrank2) AS sumrank2
        |  FROM h JOIN m USING (q) GROUP BY 1),
        |tot AS (SELECT sum(ca) AS n_all FROM h)
        |SELECT grp AS event_type, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n_all - n_a AS BIGINT) AS n_b,
        |  CAST(sumrank2 - n_a * (n_a + 1) AS BIGINT) AS u2_a,
        |  CAST(CAST(sumrank2 - n_a * (n_a + 1) AS HUGEINT) * 1000000
        |    // (n_a * (n_all - n_a)) - 1000000 AS BIGINT) AS rbc_ppm
        |FROM s CROSS JOIN tot ORDER BY event_type""".stripMargin),

    // degree assortativity of the co-purchase graph (x191's edge
    // construction): sqrt-free Pearson r via orientation symmetry
    Q.df("x350_degree_assortativity",
      (s, dir) => {
        val it = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
          .distinct()
        val edges = it.as("a")
          .join(it.as("c"), col("a.b") === col("c.b")
            && col("a.i") < col("c.i"))
          .groupBy(col("a.i").as("src"), col("c.i").as("dst"))
          .agg(count(lit(1)).as("w")).where(col("w") >= 2)
          .select("src", "dst")
        Graph.degreeAssortativity(edges)
      },
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |e AS (
        |  SELECT a.i AS lo, c.i AS hi
        |  FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |arcs AS (SELECT DISTINCT src, dst FROM (
        |  SELECT lo AS src, hi AS dst FROM e
        |  UNION ALL SELECT hi, lo FROM e) u),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |  FROM arcs GROUP BY 1),
        |j AS (SELECT arcs.src, dx.deg AS dx, dy.deg AS dy
        |  FROM arcs JOIN deg dx ON arcs.src = dx.node
        |  JOIN deg dy ON arcs.dst = dy.node),
        |mo AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
        |    CAST(count(*) AS BIGINT) AS n_arcs,
        |    CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
        |    CAST(sum(dx * dx) AS BIGINT) AS sxx,
        |    CAST(sum(dx * dy) AS BIGINT) AS sxy
        |  FROM j)
        |SELECT n_nodes, n_arcs,
        |  CAST((CAST(n_arcs AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
        |    * 1000000 // nullif(CAST(n_arcs AS HUGEINT) * sxx
        |    - CAST(sx AS HUGEINT) * sx, 0) AS BIGINT) AS r_ppm
        |FROM mo""".stripMargin),

    // pooled Flesch reading ease per language, exact milli from three
    // regex counts — the prose-vs-boilerplate mix audit
    Q.df("x351_readability",
      (s, dir) => TextStats.readability(Tables.load(s, dir, "documents")),
      """WITH d AS (SELECT lang,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
        |      AS w,
        |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT), 1) AS s,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS y
        |  FROM documents),
        |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(w) AS BIGINT) AS words,
        |    CAST(sum(s) AS BIGINT) AS sentences,
        |    CAST(sum(y) AS BIGINT) AS syllables
        |  FROM d GROUP BY 1)
        |SELECT lang, n_docs, words, sentences, syllables,
        |  words * 1000 // sentences AS words_per_sentence_milli,
        |  syllables * 1000 // words AS syllables_per_word_milli,
        |  206835 - CAST(CAST(1015 AS HUGEINT) * words // sentences
        |      AS BIGINT)
        |    - CAST(CAST(84600 AS HUGEINT) * syllables // words
        |      AS BIGINT) AS flesch_milli
        |FROM a ORDER BY lang""".stripMargin),

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

    // chi-square independence of lang x source over the full margin
    // grid (zero cells included), term-truncating micro units
    Q.df("x353_chi_square",
      (s, dir) => Profile.chiSquareIndependence(
        Tables.load(s, dir, "documents")),
      """WITH vc AS (SELECT lang AS rv, source AS cv,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |rm AS (SELECT rv, sum(o) AS r FROM vc GROUP BY 1),
        |cm AS (SELECT cv, sum(o) AS c FROM vc GROUP BY 1),
        |nn AS (SELECT sum(o) AS n FROM vc),
        |grid AS (SELECT rm.rv, cm.cv, rm.r, cm.c, coalesce(vc.o, 0) AS o
        |  FROM rm CROSS JOIN cm LEFT JOIN vc USING (rv, cv))
        |SELECT CAST(max(n) AS BIGINT) AS n,
        |  CAST(count(DISTINCT rv) AS BIGINT) AS n_row_cats,
        |  CAST(count(DISTINCT cv) AS BIGINT) AS n_col_cats,
        |  CAST((count(DISTINCT rv) - 1) * (count(DISTINCT cv) - 1)
        |    AS BIGINT) AS dof,
        |  CAST(sum((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |    * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |    * 1000000 // (CAST(n AS HUGEINT) * r * c)) AS BIGINT)
        |    AS chi2_micro
        |FROM grid CROSS JOIN nn""".stripMargin),

    // whole-bit mutual information + marginal entropies + uncertainty
    // coefficients of lang x source — chi-square's "how much" twin
    Q.df("x354_mutual_information",
      (s, dir) => Profile.mutualInformation(
        Tables.load(s, dir, "documents")),
      """WITH vc AS (SELECT lang AS rv, source AS cv,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |rm AS (SELECT rv, CAST(sum(o) AS BIGINT) AS r FROM vc GROUP BY 1),
        |cm AS (SELECT cv, CAST(sum(o) AS BIGINT) AS c FROM vc GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM vc),
        |mi AS (SELECT CAST(sum(o * ((length(bin(o * n)) - 1)
        |      - (length(bin(r * c)) - 1))) AS BIGINT) AS mi_bits_scaled
        |  FROM vc JOIN rm USING (rv) JOIN cm USING (cv) CROSS JOIN nn),
        |hr AS (SELECT CAST(sum(r * ((length(bin(n)) - 1)
        |      - (length(bin(r)) - 1))) AS BIGINT) AS h_row_bits_scaled
        |  FROM rm CROSS JOIN nn),
        |hc AS (SELECT CAST(sum(c * ((length(bin(n)) - 1)
        |      - (length(bin(c)) - 1))) AS BIGINT) AS h_col_bits_scaled
        |  FROM cm CROSS JOIN nn)
        |SELECT n, mi_bits_scaled, h_row_bits_scaled, h_col_bits_scaled,
        |  mi_bits_scaled * 1000000 // nullif(h_row_bits_scaled, 0)
        |    AS u_row_ppm,
        |  mi_bits_scaled * 1000000 // nullif(h_col_bits_scaled, 0)
        |    AS u_col_ppm
        |FROM nn CROSS JOIN mi CROSS JOIN hr CROSS JOIN hc""".stripMargin),

    // forecast calibration bins + ECE: value min-max-normalized to
    // ppm, ten equal-width bins, mean score vs purchase rate
    Q.df("x355_calibration_bins",
      (s, dir) => Experiment.calibrationBins(
        Tables.load(s, dir, "events"), col("event_type") === "purchase"),
      """WITH q AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS q,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |mm AS (SELECT min(q) AS qlo, max(q) AS qhi FROM q),
        |b AS (SELECT
        |    least(9, (q - qlo) * 10 // greatest(qhi - qlo, 1)) AS bin,
        |    (q - qlo) * 1000000 // greatest(qhi - qlo, 1) AS s_ppm, y
        |  FROM q CROSS JOIN mm),
        |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(s_ppm) AS BIGINT) AS ss,
        |    CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM b GROUP BY 1),
        |r AS (SELECT CAST(bin AS BIGINT) AS bin, n,
        |    ss // n AS mean_score_ppm,
        |    n_pos * 1000000 // n AS pos_rate_ppm FROM g),
        |r2 AS (SELECT *, abs(mean_score_ppm - pos_rate_ppm) AS gap_ppm
        |  FROM r),
        |e AS (SELECT CAST(sum(CAST(n AS HUGEINT) * gap_ppm) // sum(n)
        |    AS BIGINT) AS ece_ppm FROM r2)
        |SELECT bin, n, mean_score_ppm, pos_rate_ppm, gap_ppm, ece_ppm
        |FROM r2 CROSS JOIN e ORDER BY bin""".stripMargin),

    // difference-in-differences: user-parity treatment, mid-month
    // cutover, all four cell means exact milli
    Q.df("x356_diff_in_diff",
      (s, dir) => Experiment.diffInDiff(Tables.load(s, dir, "events"),
        col("user_id") % 2 === 0,
        col("ts") >= lit("2024-01-16").cast("timestamp")),
      """WITH t AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS q,
        |    (user_id % 2 = 0) AS t,
        |    (ts >= TIMESTAMP '2024-01-16') AS p
        |  FROM events)
        |SELECT
        |  CAST(count(CASE WHEN t AND NOT p THEN 1 END) AS BIGINT)
        |    AS n_t_pre,
        |  CAST(count(CASE WHEN t AND p THEN 1 END) AS BIGINT)
        |    AS n_t_post,
        |  CAST(count(CASE WHEN NOT t AND NOT p THEN 1 END) AS BIGINT)
        |    AS n_c_pre,
        |  CAST(count(CASE WHEN NOT t AND p THEN 1 END) AS BIGINT)
        |    AS n_c_post,
        |  CAST(sum(CASE WHEN t AND NOT p THEN q END)
        |    // count(CASE WHEN t AND NOT p THEN 1 END) AS BIGINT)
        |    AS mean_t_pre_milli,
        |  CAST(sum(CASE WHEN t AND p THEN q END)
        |    // count(CASE WHEN t AND p THEN 1 END) AS BIGINT)
        |    AS mean_t_post_milli,
        |  CAST(sum(CASE WHEN NOT t AND NOT p THEN q END)
        |    // count(CASE WHEN NOT t AND NOT p THEN 1 END) AS BIGINT)
        |    AS mean_c_pre_milli,
        |  CAST(sum(CASE WHEN NOT t AND p THEN q END)
        |    // count(CASE WHEN NOT t AND p THEN 1 END) AS BIGINT)
        |    AS mean_c_post_milli,
        |  (CAST(sum(CASE WHEN t AND p THEN q END)
        |     // count(CASE WHEN t AND p THEN 1 END) AS BIGINT)
        |   - CAST(sum(CASE WHEN t AND NOT p THEN q END)
        |     // count(CASE WHEN t AND NOT p THEN 1 END) AS BIGINT))
        |  - (CAST(sum(CASE WHEN NOT t AND p THEN q END)
        |     // count(CASE WHEN NOT t AND p THEN 1 END) AS BIGINT)
        |   - CAST(sum(CASE WHEN NOT t AND NOT p THEN q END)
        |     // count(CASE WHEN NOT t AND NOT p THEN 1 END) AS BIGINT))
        |    AS did_milli
        |FROM t""".stripMargin),

    // CUPED variance reduction: per-user pre/post means, pooled theta,
    // adjusted post-period difference
    Q.df("x357_cuped",
      (s, dir) => Experiment.cuped(Tables.load(s, dir, "events"),
        col("user_id") % 2 === 0,
        col("ts") >= lit("2024-01-16").cast("timestamp")),
      """WITH t AS (SELECT user_id,
        |    CAST(floor(value * 1000) AS BIGINT) AS q,
        |    (user_id % 2 = 0) AS t,
        |    (ts >= TIMESTAMP '2024-01-16') AS p
        |  FROM events),
        |u AS (SELECT user_id, t,
        |    count(CASE WHEN NOT p THEN 1 END) AS n_pre,
        |    sum(CASE WHEN NOT p THEN q END) AS s_pre,
        |    count(CASE WHEN p THEN 1 END) AS n_post,
        |    sum(CASE WHEN p THEN q END) AS s_post
        |  FROM t GROUP BY 1, 2
        |  HAVING count(CASE WHEN NOT p THEN 1 END) > 0
        |    AND count(CASE WHEN p THEN 1 END) > 0),
        |v AS (SELECT t, CAST(s_pre // n_pre AS BIGINT) AS x,
        |    CAST(s_post // n_post AS BIGINT) AS y FROM u),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS n_treated,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    CAST(sum(CASE WHEN t THEN x END) AS BIGINT) AS sx_t,
        |    CAST(sum(CASE WHEN NOT t THEN x END) AS BIGINT) AS sx_c,
        |    CAST(sum(CASE WHEN t THEN y END) AS BIGINT) AS sy_t,
        |    CAST(sum(CASE WHEN NOT t THEN y END) AS BIGINT) AS sy_c
        |  FROM v),
        |f AS (SELECT n_users, n_treated,
        |    CAST((CAST(n_users AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy) * 1000000
        |      // nullif(CAST(n_users AS HUGEINT) * sxx
        |      - CAST(sx AS HUGEINT) * sx, 0) AS BIGINT) AS theta_ppm,
        |    sy_t * 1000 // n_treated
        |      - sy_c * 1000 // (n_users - n_treated) AS raw_diff_micro,
        |    sx_t * 1000 // n_treated
        |      - sx_c * 1000 // (n_users - n_treated) AS x_diff_micro
        |  FROM m)
        |SELECT n_users, n_treated, theta_ppm, raw_diff_micro,
        |  raw_diff_micro - CAST(CAST(theta_ppm AS HUGEINT)
        |    * x_diff_micro // 1000000 AS BIGINT) AS adj_diff_micro
        |FROM f""".stripMargin),

    // top event trigrams with Markov-1 lift: is the process
    // memoryless at depth 2?
    Q.df("x358_event_trigrams",
      (s, dir) => TimeSeries.eventTrigrams(Tables.load(s, dir, "events")),
      """WITH s AS (SELECT user_id, event_type AS a,
        |    lead(event_type, 1) OVER w AS b,
        |    lead(event_type, 2) OVER w AS c
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |bi AS (SELECT a AS b1, b AS b2, CAST(count(*) AS BIGINT) AS n_bc
        |  FROM s WHERE b IS NOT NULL GROUP BY 1, 2),
        |bo AS (SELECT b1, CAST(sum(n_bc) AS BIGINT) AS n_b_out
        |  FROM bi GROUP BY 1),
        |tri AS (SELECT a, b, c, CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE c IS NOT NULL GROUP BY 1, 2, 3),
        |tp AS (SELECT a, b, CAST(sum(n) AS BIGINT) AS n_ab
        |  FROM tri GROUP BY 1, 2)
        |SELECT tri.a, tri.b, tri.c, tri.n,
        |  tri.n * 1000000 // tp.n_ab AS p_cond_ppm,
        |  bi.n_bc * 1000000 // bo.n_b_out AS p1_ppm,
        |  (tri.n * 1000000 // tp.n_ab) * 1000
        |    // nullif(bi.n_bc * 1000000 // bo.n_b_out, 0) AS lift_milli
        |FROM tri JOIN tp ON tri.a = tp.a AND tri.b = tp.b
        |JOIN bi ON tri.b = bi.b1 AND tri.c = bi.b2
        |JOIN bo ON tri.b = bo.b1
        |ORDER BY tri.n DESC, tri.a, tri.b, tri.c
        |LIMIT 20""".stripMargin),

    // Q-Q decile drift per event type vs the corpus: WHERE the slice
    // moved, not just whether (oracle ranks rows, Spark folds the
    // histogram — independent shapes, same type-1 quantile)
    Q.df("x359_qq_drift",
      (s, dir) => Profile.qqDrift(Tables.load(s, dir, "events")),
      """WITH r AS (SELECT event_type AS grp,
        |    CAST(floor(value * 10) AS BIGINT) AS q,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY floor(value * 10)) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL),
        |d AS (SELECT unnest(range(1, 10)) AS decile),
        |gq AS (SELECT grp, d.decile, min(q) AS grp_q
        |  FROM r CROSS JOIN d WHERE rn * 10 >= d.decile * n
        |  GROUP BY 1, 2),
        |ra AS (SELECT CAST(floor(value * 10) AS BIGINT) AS q,
        |    row_number() OVER (ORDER BY floor(value * 10)) AS rn,
        |    count(*) OVER () AS n
        |  FROM events WHERE value IS NOT NULL),
        |cq AS (SELECT d.decile, min(q) AS corpus_q
        |  FROM ra CROSS JOIN d WHERE rn * 10 >= d.decile * n
        |  GROUP BY 1)
        |SELECT gq.grp AS event_type, CAST(gq.decile AS BIGINT) AS decile,
        |  gq.grp_q, cq.corpus_q, gq.grp_q - cq.corpus_q AS delta_q
        |FROM gq JOIN cq USING (decile)
        |ORDER BY event_type, decile""".stripMargin),

    // streaming PSI monitor: complete-mode (source, lang) count state
    // drained into the batch serve-time arithmetic — oracle is x348's
    // SQL verbatim (drained == batch)
    Q.df("x360_stream_psi",
      (s, dir) => Streaming.streamPsi(s, dir),
      """WITH vc AS (SELECT source, lang AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT v FROM vc),
        |srcs AS (SELECT DISTINCT source FROM vc),
        |grid AS (SELECT srcs.source, vals.v, coalesce(vc.c, 0) AS c
        |  FROM srcs CROSS JOIN vals
        |  LEFT JOIN vc ON vc.source = srcs.source AND vc.v = vals.v),
        |gt AS (SELECT v, sum(c) AS g FROM vc GROUP BY 1),
        |ta AS (SELECT source, sum(c) AS n_a FROM vc GROUP BY 1),
        |corp AS (SELECT sum(c) AS n_corpus, count(DISTINCT v) AS nv
        |  FROM vc),
        |t AS (SELECT grid.source, ta.n_a, grid.c + 1 AS a,
        |    gt.g - grid.c + 1 AS b, ta.n_a + corp.nv AS taa,
        |    corp.n_corpus - ta.n_a + corp.nv AS tb
        |  FROM grid JOIN gt USING (v)
        |  JOIN ta ON ta.source = grid.source CROSS JOIN corp)
        |SELECT source, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(sum((a * 1000000 // taa - b * 1000000 // tb)
        |    * ((length(bin(a * tb)) - 1) - (length(bin(b * taa)) - 1)))
        |    AS BIGINT) AS psi_ppm_bits
        |FROM t GROUP BY 1, 2 ORDER BY source""".stripMargin),

    // leave-one-day-out jackknife of the purchase-value ratio metric
    Q.df("x361_jackknife_ratio",
      (s, dir) => Experiment.jackknifeRatio(Tables.load(s, dir, "events"),
        col("event_type") === "purchase"),
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 1000) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS s_i,
        |    CAST(count(*) AS BIGINT) AS n_i
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(s_i) AS BIGINT) AS s,
        |    CAST(sum(n_i) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS dd FROM daily),
        |reps AS (SELECT dd,
        |    CAST(CAST(s AS HUGEINT) * 1000000 // n AS BIGINT)
        |      AS theta_ppm,
        |    CAST(CAST(s - s_i AS HUGEINT) * 1000000 // (n - n_i)
        |      AS BIGINT) AS theta_i
        |  FROM daily CROSS JOIN tot)
        |SELECT dd AS n_days, theta_ppm,
        |  CAST(sum(theta_i) // count(*) AS BIGINT) AS theta_dot_ppm,
        |  CAST((dd - 1) * (dd * sum(CAST(theta_i AS HUGEINT) * theta_i)
        |    - CAST(sum(theta_i) AS HUGEINT) * sum(theta_i))
        |    // (CAST(dd AS HUGEINT) * dd) AS BIGINT) AS jk_var_ppm2
        |FROM reps GROUP BY 1, 2""".stripMargin),

    // sample-ratio-mismatch trajectory: daily and cumulative
    // chi-square vs 50/50 under the parity assignment
    Q.df("x362_srm_trajectory",
      (s, dir) => Experiment.srmTrajectory(Tables.load(s, dir, "events"),
        col("user_id") % 2 === 0),
      """WITH b AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t
        |  FROM events),
        |g AS (SELECT d, CAST(sum(t) AS BIGINT) AS n_t,
        |    CAST(sum(1 - t) AS BIGINT) AS n_c FROM b GROUP BY 1),
        |c AS (SELECT *,
        |    CAST(sum(n_t) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_t,
        |    CAST(sum(n_c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c FROM g)
        |SELECT d, n_t, n_c,
        |  (n_t - n_c) * (n_t - n_c) * 1000000 // (n_t + n_c)
        |    AS chi2_micro,
        |  cum_t, cum_c,
        |  (cum_t - cum_c) * (cum_t - cum_c) * 1000000
        |    // (cum_t + cum_c) AS cum_chi2_micro
        |FROM c ORDER BY d""".stripMargin),

    // local clustering coefficient per node on the co-purchase graph
    // (x191's edges): community cores vs pure hubs
    Q.df("x363_local_clustering",
      (s, dir) => {
        val it = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
          .distinct()
        val edges = it.as("a")
          .join(it.as("c"), col("a.b") === col("c.b")
            && col("a.i") < col("c.i"))
          .groupBy(col("a.i").as("src"), col("c.i").as("dst"))
          .agg(count(lit(1)).as("w")).where(col("w") >= 2)
          .select("src", "dst")
        Graph.localClustering(edges)
      },
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |e AS (
        |  SELECT a.i AS lo, c.i AS hi
        |  FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT lo AS node FROM e UNION ALL SELECT hi FROM e) u
        |  GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN (dl.deg, e.lo) < (dh.deg, e.hi)
        |           THEN e.lo ELSE e.hi END AS src,
        |         CASE WHEN (dl.deg, e.lo) < (dh.deg, e.hi)
        |           THEN e.hi ELSE e.lo END AS dst
        |  FROM e JOIN deg dl ON e.lo = dl.node
        |         JOIN deg dh ON e.hi = dh.node),
        |tri AS (
        |  SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
        |  FROM o w1 JOIN o w2 ON w1.src = w2.src AND w1.dst < w2.dst
        |  JOIN e ON least(w1.dst, w2.dst) = e.lo
        |        AND greatest(w1.dst, w2.dst) = e.hi),
        |tc AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles
        |  FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |        UNION ALL SELECT c FROM tri) n
        |  GROUP BY 1)
        |SELECT deg.node, deg.deg, coalesce(tc.triangles, 0) AS triangles,
        |  2 * coalesce(tc.triangles, 0) * 1000000
        |    // (deg.deg * (deg.deg - 1)) AS lcc_ppm
        |FROM deg LEFT JOIN tc USING (node)
        |WHERE deg.deg >= 2 ORDER BY node""".stripMargin),

    // int8 scalar-quantization audit per embedding dimension: the
    // zero-codebook baseline beside the PQ tiers
    Q.df("x364_int8_quant_audit",
      (s, dir) => Similarity.int8QuantAudit(
        Tables.load(s, dir, "embeddings")),
      """WITH comp AS (SELECT CAST(i AS BIGINT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
        |      AS q
        |  FROM embeddings, range(1, 65) r(i)),
        |sc AS (SELECT dim, CAST(max(abs(q)) AS BIGINT) AS max_abs_q,
        |    CAST(greatest(1, (max(abs(q)) + 126) // 127) AS BIGINT)
        |      AS scale
        |  FROM comp GROUP BY 1),
        |j AS (SELECT comp.dim, scale, max_abs_q, q,
        |    q - (q // scale) * scale AS r
        |  FROM comp JOIN sc USING (dim))
        |SELECT dim, scale, max_abs_q,
        |  CAST(sum(CAST(r AS HUGEINT) * r) // count(*) AS BIGINT)
        |    AS mse_q,
        |  CAST(sum(CAST(q AS HUGEINT) * q) // count(*) AS BIGINT)
        |    AS energy_q,
        |  CAST(sum(CAST(r AS HUGEINT) * r) * 1000000
        |    // nullif(sum(CAST(q AS HUGEINT) * q), 0) AS BIGINT)
        |    AS nsr_ppm
        |FROM j GROUP BY 1, 2, 3 ORDER BY dim""".stripMargin),

    // post-stratified treatment effect: power-of-two activity strata,
    // per-stratum diff + count-weighted ATE
    Q.df("x365_post_stratified",
      (s, dir) => Experiment.postStratifiedEffect(
        Tables.load(s, dir, "events"), col("user_id") % 2 === 0,
        col("ts") >= lit("2024-01-16").cast("timestamp")),
      """WITH t AS (SELECT user_id,
        |    CAST(floor(value * 1000) AS BIGINT) AS q,
        |    (user_id % 2 = 0) AS t,
        |    (ts >= TIMESTAMP '2024-01-16') AS p
        |  FROM events),
        |u AS (SELECT user_id, t,
        |    count(CASE WHEN NOT p THEN 1 END) AS n_pre,
        |    count(CASE WHEN p THEN 1 END) AS n_post,
        |    sum(CASE WHEN p THEN q END) AS s_post
        |  FROM t GROUP BY 1, 2
        |  HAVING count(CASE WHEN p THEN 1 END) > 0),
        |v AS (SELECT t, CAST(length(bin(n_pre)) - 1 AS BIGINT)
        |      AS stratum,
        |    CAST(s_post // n_post AS BIGINT) AS y FROM u),
        |s AS (SELECT stratum,
        |    CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS n_t,
        |    CAST(count(CASE WHEN NOT t THEN 1 END) AS BIGINT) AS n_c,
        |    sum(CASE WHEN t THEN y END) AS sy_t,
        |    sum(CASE WHEN NOT t THEN y END) AS sy_c
        |  FROM v GROUP BY 1),
        |d AS (SELECT stratum, n_t, n_c,
        |    CASE WHEN n_t > 0 THEN CAST(sy_t * 1000 // n_t AS BIGINT)
        |      END AS mean_t_micro,
        |    CASE WHEN n_c > 0 THEN CAST(sy_c * 1000 // n_c AS BIGINT)
        |      END AS mean_c_micro
        |  FROM s),
        |d2 AS (SELECT *, mean_t_micro - mean_c_micro AS diff_micro
        |  FROM d),
        |a AS (SELECT CAST(sum(CAST(n_t + n_c AS HUGEINT) * diff_micro)
        |    // sum(n_t + n_c) AS BIGINT) AS ate_micro
        |  FROM d2 WHERE diff_micro IS NOT NULL)
        |SELECT stratum, n_t, n_c, mean_t_micro, mean_c_micro,
        |  diff_micro, ate_micro
        |FROM d2 CROSS JOIN a ORDER BY stratum""".stripMargin),

    // term burstiness: stopword-vs-template separator over the top-20
    // tokens (occurrences per containing doc vs document frequency)
    Q.df("x366_term_burstiness",
      (s, dir) => TextStats.termBurstiness(
        Tables.load(s, dir, "documents")),
      """WITH tok AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
        |      AS term
        |  FROM documents),
        |td AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
        |  FROM tok WHERE length(term) > 0 GROUP BY 1, 2),
        |terms AS (SELECT term, CAST(sum(c) AS BIGINT) AS n_total,
        |    CAST(count(*) AS BIGINT) AS n_docs FROM td GROUP BY 1),
        |alld AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
        |    AS n_all_docs FROM documents)
        |SELECT term, n_total, n_docs,
        |  n_total * 1000 // n_docs AS burst_milli,
        |  n_docs * 1000000 // n_all_docs AS df_ppm
        |FROM terms CROSS JOIN alld
        |ORDER BY n_total DESC, term LIMIT 20""".stripMargin),

    // whole-bit Markov entropy rate of the event-type chain vs the
    // marginal entropy — how much memory does the process have
    Q.df("x367_markov_entropy",
      (s, dir) => TimeSeries.markovEntropy(Tables.load(s, dir, "events")),
      """WITH s AS (SELECT event_type AS bsrc,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS bdst
        |  FROM events),
        |bi AS (SELECT bsrc, bdst, CAST(count(*) AS BIGINT) AS n_bc
        |  FROM s WHERE bdst IS NOT NULL GROUP BY 1, 2),
        |marg AS (SELECT bsrc, CAST(sum(n_bc) AS BIGINT) AS n_b
        |  FROM bi GROUP BY 1),
        |nn AS (SELECT CAST(sum(n_b) AS BIGINT) AS n_pairs FROM marg),
        |hm AS (SELECT CAST(sum(n_b * ((length(bin(n_pairs)) - 1)
        |      - (length(bin(n_b)) - 1))) AS BIGINT) AS h_marginal_scaled
        |  FROM marg CROSS JOIN nn),
        |hc AS (SELECT CAST(sum(n_bc * ((length(bin(n_b)) - 1)
        |      - (length(bin(n_bc)) - 1))) AS BIGINT) AS h_cond_scaled
        |  FROM bi JOIN marg USING (bsrc))
        |SELECT n_pairs, h_marginal_scaled, h_cond_scaled,
        |  h_cond_scaled * 1000000 // nullif(h_marginal_scaled, 0)
        |    AS cond_vs_marginal_ppm
        |FROM nn CROSS JOIN hm CROSS JOIN hc""".stripMargin),

    // nearest-centroid confusion matrix: which labels bleed into
    // which (deterministic ties to the smaller label)
    Q.df("x368_centroid_confusion",
      (s, dir) => Similarity.centroidConfusion(
        Tables.load(s, dir, "embeddings")),
      """WITH comp AS (
        |  SELECT vec_id, label, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
        |      AS q
        |  FROM embeddings, range(1, 65) r(i)),
        |cent AS (
        |  SELECT label AS clabel, i,
        |    CAST(sum(q) // count(*) AS BIGINT) AS c
        |  FROM comp GROUP BY 1, 2),
        |d2 AS (
        |  SELECT comp.vec_id, comp.label, cent.clabel,
        |    CAST(sum((q - c) * (q - c)) AS BIGINT) AS d2
        |  FROM comp JOIN cent USING (i)
        |  GROUP BY 1, 2, 3),
        |asg AS (SELECT vec_id, label, clabel AS assigned,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel)
        |      AS rk FROM d2),
        |cells AS (SELECT label, assigned, CAST(count(*) AS BIGINT) AS n
        |  FROM asg WHERE rk = 1 GROUP BY 1, 2),
        |rws AS (SELECT label, sum(n) AS n_row FROM cells GROUP BY 1)
        |SELECT cells.label, assigned, n,
        |  CAST(n * 1000000 // n_row AS BIGINT) AS row_share_ppm
        |FROM cells JOIN rws USING (label)
        |ORDER BY label, assigned""".stripMargin),

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

    // document-level co-occurrence lift of the top-10 df terms —
    // which words travel together vs repel
    Q.df("x370_term_cooccurrence",
      (s, dir) => TextStats.termCooccurrence(
        Tables.load(s, dir, "documents")),
      """WITH pres AS (SELECT DISTINCT doc_id, term FROM (
        |    SELECT doc_id,
        |      unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
        |        AS term
        |    FROM documents) u WHERE length(term) > 0),
        |dfb AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |  FROM pres GROUP BY 1),
        |top AS (SELECT term, df FROM dfb
        |  ORDER BY df DESC, term LIMIT 10),
        |kept AS (SELECT pres.doc_id, pres.term, top.df
        |  FROM pres JOIN top USING (term)),
        |alln AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
        |    AS n_all FROM documents)
        |SELECT x.term AS t1, y.term AS t2,
        |  CAST(count(*) AS BIGINT) AS n_both,
        |  x.df AS df1, y.df AS df2,
        |  CAST(CAST(count(*) AS HUGEINT) * max(n_all) * 1000
        |    // (CAST(x.df AS HUGEINT) * y.df) AS BIGINT) AS lift_milli
        |FROM kept x JOIN kept y
        |  ON x.doc_id = y.doc_id AND x.term < y.term
        |CROSS JOIN alln
        |GROUP BY 1, 2, 4, 5
        |ORDER BY n_both DESC, t1, t2""".stripMargin),

    // peaks-over-threshold doubling curve of the value tail
    Q.df("x371_tail_index",
      (s, dir) => Profile.tailIndexCurve(Tables.load(s, dir, "events")),
      """WITH h AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |mx AS (SELECT max(q) AS vmax FROM h),
        |lv AS (SELECT CAST(j AS BIGINT) AS j,
        |    CAST(vmax // (1 << j) AS BIGINT) AS threshold_q
        |  FROM (SELECT unnest(range(1, 11)) AS j) js CROSS JOIN mx),
        |ag AS (SELECT j, threshold_q, CAST(sum(c) AS BIGINT) AS n_above
        |  FROM lv JOIN h ON h.q > lv.threshold_q GROUP BY 1, 2)
        |SELECT j, threshold_q, n_above,
        |  n_above * 1000 // lag(n_above) OVER (ORDER BY j)
        |    AS ratio_milli
        |FROM ag ORDER BY j""".stripMargin),

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

    // rich-club trajectory of the co-purchase graph: does the hub
    // set densify as the degree cutoff rises
    Q.df("x373_rich_club",
      (s, dir) => {
        val it = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
          .distinct()
        val edges = it.as("a")
          .join(it.as("c"), col("a.b") === col("c.b")
            && col("a.i") < col("c.i"))
          .groupBy(col("a.i").as("src"), col("c.i").as("dst"))
          .agg(count(lit(1)).as("w")).where(col("w") >= 2)
          .select("src", "dst")
        Graph.richClub(edges)
      },
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |e AS (
        |  SELECT a.i AS lo, c.i AS hi
        |  FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |arcs AS (SELECT DISTINCT src, dst FROM (
        |  SELECT lo AS src, hi AS dst FROM e
        |  UNION ALL SELECT hi, lo FROM e) u),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |  FROM arcs GROUP BY 1),
        |jn AS (SELECT arcs.src, arcs.dst, dx.deg AS dx, dy.deg AS dy
        |  FROM arcs JOIN deg dx ON arcs.src = dx.node
        |  JOIN deg dy ON arcs.dst = dy.node),
        |lv AS (SELECT CAST((1 << jj) AS BIGINT) AS k
        |  FROM (SELECT unnest(range(0, 16)) AS jj) q),
        |ag AS (SELECT k, CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
        |    CAST(count(*) AS BIGINT) AS n_arcs
        |  FROM lv JOIN jn ON jn.dx > lv.k AND jn.dy > lv.k
        |  GROUP BY 1)
        |SELECT k, n_nodes, n_arcs,
        |  n_arcs * 1000000 // (n_nodes * (n_nodes - 1)) AS phi_ppm
        |FROM ag WHERE n_nodes >= 2 ORDER BY k""".stripMargin),

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

    // stratified mutual information: does the lang-source association
    // survive inside each length band (Simpson's-paradox check)
    Q.df("x375_stratified_mi",
      (s, dir) => Profile.stratifiedMi(Tables.load(s, dir, "documents")),
      """WITH vc AS (SELECT
        |    CAST(length(bin(CAST(n_chars AS BIGINT))) - 1 AS BIGINT)
        |      AS z,
        |    lang AS rv, source AS cv, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2, 3),
        |rm AS (SELECT z, rv, sum(o) AS r FROM vc GROUP BY 1, 2),
        |cm AS (SELECT z, cv, sum(o) AS c FROM vc GROUP BY 1, 2),
        |nz AS (SELECT z, CAST(sum(o) AS BIGINT) AS n_band
        |  FROM vc GROUP BY 1)
        |SELECT z AS band, n_band,
        |  CAST(sum(o * ((length(bin(o * n_band)) - 1)
        |    - (length(bin(r * c)) - 1))) AS BIGINT) AS mi_bits_scaled
        |FROM vc JOIN rm USING (z, rv) JOIN cm USING (z, cv)
        |  JOIN nz USING (z)
        |GROUP BY 1, 2 ORDER BY band""".stripMargin),

    // streaming SRM monitor: complete-mode per-day arrival-count
    // state drained into the batch running-chi-square arithmetic —
    // oracle is x362's SQL verbatim (drained == batch)
    Q.df("x376_stream_srm",
      (s, dir) => Streaming.streamSrm(s, dir),
      """WITH b AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t
        |  FROM events),
        |g AS (SELECT d, CAST(sum(t) AS BIGINT) AS n_t,
        |    CAST(sum(1 - t) AS BIGINT) AS n_c FROM b GROUP BY 1),
        |c AS (SELECT *,
        |    CAST(sum(n_t) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_t,
        |    CAST(sum(n_c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c FROM g)
        |SELECT d, n_t, n_c,
        |  (n_t - n_c) * (n_t - n_c) * 1000000 // (n_t + n_c)
        |    AS chi2_micro,
        |  cum_t, cum_c,
        |  (cum_t - cum_c) * (cum_t - cum_c) * 1000000
        |    // (cum_t + cum_c) AS cum_chi2_micro
        |FROM c ORDER BY d""".stripMargin),

    // Kish effective sample size of inverse-frequency source
    // balancing — what the weighted corpus is worth in unweighted rows
    Q.df("x377_effective_sample_size",
      (s, dir) => Sampling.effectiveSampleSize(
        Tables.load(s, dir, "documents")),
      """WITH src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_sources FROM src),
        |wtab AS (SELECT n, n_sources, n_s,
        |    n * 1000000 // (n_sources * n_s) AS w
        |  FROM src CROSS JOIN tot),
        |ag AS (SELECT n, n_sources, CAST(max(w) AS BIGINT) AS max_w_ppm,
        |    CAST(sum(n_s * w) AS BIGINT) AS sw,
        |    sum(CAST(n_s AS HUGEINT) * w * w) AS sww
        |  FROM wtab GROUP BY 1, 2)
        |SELECT n, n_sources, max_w_ppm,
        |  CAST(CAST(sw AS HUGEINT) * sw // sww AS BIGINT) AS ess,
        |  CAST(CAST(sw AS HUGEINT) * sw // sww AS BIGINT) * 1000000
        |    // n AS ess_ratio_ppm
        |FROM ag""".stripMargin),

    // shingle saturation curve: distinct/total per word-shingle size
    // — measures the dedup family's k knee on the real corpus
    Q.df("x378_shingle_saturation",
      (s, dir) => TextStats.shingleSaturation(
        Tables.load(s, dir, "documents")),
      """WITH t AS (SELECT list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    x -> length(x) > 0) AS t FROM documents),
        |s1 AS (SELECT unnest(CASE WHEN len(t) >= 1 THEN
        |    list_transform(range(1, len(t) + 1),
        |      i -> array_to_string(t[i:i], ' '))
        |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM t),
        |s2 AS (SELECT unnest(CASE WHEN len(t) >= 2 THEN
        |    list_transform(range(1, len(t)),
        |      i -> array_to_string(t[i:i+1], ' '))
        |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM t),
        |s3 AS (SELECT unnest(CASE WHEN len(t) >= 3 THEN
        |    list_transform(range(1, len(t) - 1),
        |      i -> array_to_string(t[i:i+2], ' '))
        |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM t),
        |s4 AS (SELECT unnest(CASE WHEN len(t) >= 4 THEN
        |    list_transform(range(1, len(t) - 2),
        |      i -> array_to_string(t[i:i+3], ' '))
        |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM t),
        |s5 AS (SELECT unnest(CASE WHEN len(t) >= 5 THEN
        |    list_transform(range(1, len(t) - 3),
        |      i -> array_to_string(t[i:i+4], ' '))
        |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM t),
        |s6 AS (SELECT unnest(CASE WHEN len(t) >= 6 THEN
        |    list_transform(range(1, len(t) - 4),
        |      i -> array_to_string(t[i:i+5], ' '))
        |    ELSE CAST([] AS VARCHAR[]) END) AS s FROM t),
        |u AS (
        |  SELECT CAST(1 AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS n_shingles,
        |    CAST(count(DISTINCT s) AS BIGINT) AS n_distinct FROM s1
        |  UNION ALL SELECT 2, CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT s) AS BIGINT) FROM s2
        |  UNION ALL SELECT 3, CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT s) AS BIGINT) FROM s3
        |  UNION ALL SELECT 4, CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT s) AS BIGINT) FROM s4
        |  UNION ALL SELECT 5, CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT s) AS BIGINT) FROM s5
        |  UNION ALL SELECT 6, CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT s) AS BIGINT) FROM s6)
        |SELECT k, n_shingles, n_distinct,
        |  n_distinct * 1000000 // n_shingles AS distinct_ppm
        |FROM u ORDER BY k""".stripMargin),

    // seasonal-naive vs persistence backtest — the baselines a
    // capacity forecast must beat, exact MAE/MAPE
    Q.df("x379_seasonal_naive_backtest",
      (s, dir) => TimeSeries.seasonalNaiveBacktest(
        Tables.load(s, dir, "events")),
      """WITH daily AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |l AS (SELECT d, n,
        |    max(n) OVER (ORDER BY d RANGE BETWEEN 1 PRECEDING
        |      AND 1 PRECEDING) AS p1,
        |    max(n) OVER (ORDER BY d RANGE BETWEEN 7 PRECEDING
        |      AND 7 PRECEDING) AS p7
        |  FROM daily),
        |f AS (SELECT * FROM l WHERE p1 IS NOT NULL AND p7 IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_scored,
        |  CAST(sum(abs(n - p1)) * 1000 // count(*) AS BIGINT)
        |    AS mae_p_milli,
        |  CAST(sum(abs(n - p1) * 1000000 // n) // count(*) AS BIGINT)
        |    AS mape_p_ppm,
        |  CAST(sum(abs(n - p7)) * 1000 // count(*) AS BIGINT)
        |    AS mae_w_milli,
        |  CAST(sum(abs(n - p7) * 1000000 // n) // count(*) AS BIGINT)
        |    AS mape_w_ppm
        |FROM f""".stripMargin),

    // changepoint localization: argmax cross-multiplied mean gap
    // over the daily series — WHERE the level shifted
    Q.df("x380_changepoint_locate",
      (s, dir) => TimeSeries.changepointLocate(
        Tables.load(s, dir, "events")),
      """WITH daily AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |pre AS (SELECT d, n,
        |    sum(n) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS ns,
        |    row_number() OVER (ORDER BY d) AS ds
        |  FROM daily),
        |tot AS (SELECT max(ns) AS s_all, max(ds) AS d_all FROM pre),
        |sc AS (SELECT d, ns, ds, s_all, d_all,
        |    abs(CAST(ns AS HUGEINT) * d_all
        |      - CAST(s_all AS HUGEINT) * ds) AS score
        |  FROM pre CROSS JOIN tot WHERE ds < d_all),
        |best AS (SELECT * FROM sc ORDER BY score DESC, d LIMIT 1)
        |SELECT CAST(d AS BIGINT) AS split_d,
        |  CAST(d_all AS BIGINT) AS n_days,
        |  CAST(ns * 1000 // ds AS BIGINT) AS mean_left_milli,
        |  CAST((s_all - ns) * 1000 // (d_all - ds) AS BIGINT)
        |    AS mean_right_milli,
        |  CAST(score AS BIGINT) AS gap_score
        |FROM best""".stripMargin),

    // Chao1 vocabulary richness + Good-Turing coverage — how much of
    // the language has this corpus actually seen
    Q.df("x381_chao1_richness",
      (s, dir) => TextStats.chao1Richness(
        Tables.load(s, dir, "documents")),
      """WITH tf AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text),
        |      '[^a-z0-9]+')) AS term FROM documents) u
        |  WHERE length(term) > 0 GROUP BY 1),
        |a AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS v_obs,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2
        |  FROM tf)
        |SELECT n_tokens, v_obs, n1, n2,
        |  v_obs + n1 * n1 // nullif(2 * n2, 0) AS chao1,
        |  v_obs + n1 * (n1 - 1) // (2 * (n2 + 1)) AS chao1_bc,
        |  1000000 - n1 * 1000000 // n_tokens AS coverage_ppm
        |FROM a""".stripMargin),

    // hubness audit: k-occurrence histogram over step-sampled probes,
    // anti-hub zero bucket included — the high-dim kNN pathology check
    Q.df("x382_hubness_audit",
      (s, dir) => Similarity.hubnessAudit(
        Tables.load(s, dir, "embeddings")),
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe
        |  FROM embeddings WHERE vec_id % 4 = 0),
        |pairs AS (
        |  SELECT q.qid, e.vec_id,
        |    CAST(sum(CAST(floor(CAST(qe[i] AS DOUBLE) * 10000)
        |        AS BIGINT)
        |      * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000)
        |        AS BIGINT)) AS BIGINT) AS dot_q
        |  FROM q, embeddings e, range(1, 65) r(i)
        |  WHERE q.qid <> e.vec_id
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT vec_id,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY dot_q DESC, vec_id) AS rn
        |  FROM pairs),
        |occ AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS occ
        |  FROM ranked WHERE rn <= 10 GROUP BY 1),
        |hist AS (SELECT occ, CAST(count(*) AS BIGINT) AS n_points
        |  FROM occ GROUP BY 1),
        |alln AS (SELECT CAST(count(*) AS BIGINT) AS n_all
        |  FROM embeddings),
        |z AS (SELECT CAST(0 AS BIGINT) AS occ,
        |    CAST(n_all - (SELECT sum(n_points) FROM hist) AS BIGINT)
        |      AS n_points
        |  FROM alln)
        |SELECT occ, n_points FROM (
        |  SELECT * FROM hist
        |  UNION ALL SELECT occ, n_points FROM z WHERE n_points > 0) u
        |ORDER BY occ""".stripMargin),

    // streaming partition-completeness monitor: per-day count state
    // drained into the batch median arithmetic — oracle is x372's SQL
    // verbatim (drained == batch)
    Q.df("x383_stream_completeness",
      (s, dir) => Streaming.streamCompleteness(s, dir),
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

    // Lorenz ownership curve: value share of the top 1/2/5/10/25/50%
    // of users — Spark folds the per-total histogram, the oracle
    // ranks every user (independent shapes, identical cuts)
    Q.df("x384_lorenz_curve",
      (s, dir) => Profile.lorenzCurve(Tables.load(s, dir, "events")),
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM events GROUP BY 1),
        |r AS (SELECT v,
        |    row_number() OVER (ORDER BY v DESC, user_id) AS rn,
        |    sum(v) OVER (ORDER BY v DESC, user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_v
        |  FROM u),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS u_all,
        |    CAST(sum(v) AS BIGINT) AS v_all FROM u),
        |p AS (SELECT unnest([1, 2, 5, 10, 25, 50]) AS pct),
        |c AS (SELECT CAST(pct AS BIGINT) AS pct,
        |    CAST((pct * u_all + 99) // 100 AS BIGINT) AS k_users,
        |    v_all
        |  FROM p CROSS JOIN tot)
        |SELECT c.pct, c.k_users,
        |  CAST(r.cum_v AS BIGINT) AS top_value_milli,
        |  CAST(CAST(r.cum_v AS HUGEINT) * 1000000 // c.v_all
        |    AS BIGINT) AS share_ppm
        |FROM c JOIN r ON r.rn = c.k_users
        |ORDER BY c.pct""".stripMargin),

    // association-strength edges: squared-cosine normalization of
    // co-purchase counts — pairs above their popularity prediction
    Q.df("x385_edge_strength",
      (s, dir) => Graph.edgeStrength(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))),
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |cnt AS (SELECT i AS node, CAST(count(*) AS BIGINT) AS n_node
        |  FROM it GROUP BY 1),
        |e AS (SELECT a.i AS src, c.i AS dst,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT e.src, e.dst, e.w, s.n_node AS n_src, d.n_node AS n_dst,
        |  e.w * e.w * 1000000 // (s.n_node * d.n_node)
        |    AS strength2_ppm
        |FROM e JOIN cnt s ON e.src = s.node
        |JOIN cnt d ON e.dst = d.node
        |ORDER BY strength2_ppm DESC, w DESC, src, dst
        |LIMIT 20""".stripMargin),

    // two-NN ratio profile: integer Facco raw material — is the
    // embedding space's neighbor contrast collapsing
    Q.df("x386_two_nn_ratio",
      (s, dir) => Similarity.twoNnRatio(
        Tables.load(s, dir, "embeddings")),
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe
        |  FROM embeddings WHERE vec_id % 4 = 0),
        |pairs AS (
        |  SELECT q.qid, e.vec_id,
        |    CAST(sum((CAST(floor(CAST(qe[i] AS DOUBLE) * 10000)
        |        AS BIGINT)
        |      - CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000)
        |        AS BIGINT))
        |      * (CAST(floor(CAST(qe[i] AS DOUBLE) * 10000) AS BIGINT)
        |      - CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000)
        |        AS BIGINT))) AS BIGINT) AS d2
        |  FROM q, embeddings e, range(1, 65) r(i)
        |  WHERE q.qid <> e.vec_id
        |  GROUP BY 1, 2),
        |rk AS (SELECT qid, d2, row_number() OVER (PARTITION BY qid
        |    ORDER BY d2, vec_id) AS rn FROM pairs),
        |t2 AS (SELECT qid,
        |    max(CASE WHEN rn = 1 THEN d2 END) AS d1sq,
        |    max(CASE WHEN rn = 2 THEN d2 END) AS d2sq
        |  FROM rk WHERE rn <= 2 GROUP BY 1),
        |rat AS (SELECT qid,
        |    CASE WHEN d1sq > 0 THEN d2sq * 1000 // d1sq END AS r
        |  FROM t2),
        |h AS (SELECT r, count(*) AS c FROM rat WHERE r IS NOT NULL
        |  GROUP BY 1),
        |hc AS (SELECT r, sum(c) OVER (ORDER BY r ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h),
        |nn AS (SELECT max(cum) AS n FROM hc),
        |st AS (SELECT
        |    CAST(min(CASE WHEN cum * 10 >= n * 5 THEN r END)
        |      AS BIGINT) AS median_ratio_milli,
        |    CAST(min(CASE WHEN cum * 10 >= n * 9 THEN r END)
        |      AS BIGINT) AS p90_ratio_milli
        |  FROM hc CROSS JOIN nn),
        |cnts AS (SELECT CAST(count(*) AS BIGINT) AS n_probes,
        |    CAST(sum(CASE WHEN r IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_degenerate FROM rat)
        |SELECT n_probes, n_degenerate, median_ratio_milli,
        |  p90_ratio_milli
        |FROM cnts CROSS JOIN st""".stripMargin),

    // daily co-movement of event-type pairs: sqrt-free signed r² in
    // ppm — "these two alerts are one incident"
    Q.df("x387_daily_comovement",
      (s, dir) => TimeSeries.dailyCoMovement(
        Tables.load(s, dir, "events")),
      """WITH daily AS (SELECT event_type AS t,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |p AS (SELECT a.t AS ta, b.t AS tb, a.n AS x, b.n AS y
        |  FROM daily a JOIN daily b ON a.d = b.d AND a.t < b.t),
        |m AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy FROM p GROUP BY 1, 2),
        |v AS (SELECT ta, tb, m,
        |    m * sxy - CAST(sx AS HUGEINT) * sy AS cov,
        |    m * sxx - CAST(sx AS HUGEINT) * sx AS va,
        |    m * syy - CAST(sy AS HUGEINT) * sy AS vb FROM m)
        |SELECT ta AS type_a, tb AS type_b, m AS n_days,
        |  CAST(CASE WHEN va = 0 OR vb = 0 THEN NULL ELSE
        |    (CASE WHEN cov < 0 THEN -1 ELSE 1 END)
        |    * (cov * cov * 1000000 // (va * vb)) END AS BIGINT)
        |    AS signed_r2_ppm
        |FROM v ORDER BY type_a, type_b""".stripMargin),

    // ship-lag profile per order priority: histogram-folded median
    // and type-1 p90 lag + late rate — the fulfillment-SLA audit
    Q.df("x388_ship_lag",
      (s, dir) => TimeSeries.shipLag(Tables.load(s, dir, "lineitem"),
        Tables.load(s, dir, "orders")),
      """WITH h AS (SELECT o_orderpriority AS pri,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
        |      AS BIGINT) AS lag,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |cum AS (SELECT pri, lag, c, sum(c) OVER (PARTITION BY pri
        |    ORDER BY lag ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS cum FROM h),
        |tot AS (SELECT pri, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN lag > 30 THEN c ELSE 0 END) AS BIGINT)
        |      AS n_late
        |  FROM h GROUP BY 1)
        |SELECT cum.pri AS o_orderpriority, tot.n,
        |  CAST(min(CASE WHEN cum * 10 >= n * 5 THEN lag END)
        |    AS BIGINT) AS median_lag,
        |  CAST(min(CASE WHEN cum * 10 >= n * 9 THEN lag END)
        |    AS BIGINT) AS p90_lag,
        |  max(n_late) * 1000000 // tot.n AS late_ppm
        |FROM cum JOIN tot ON cum.pri = tot.pri
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin),

    // ---- adversarial-skew fixture family (x390-x392): the corpus
    // rebuilt with the two dedup killers web text actually has — a
    // 47-char boilerplate prefix on half the docs and a universal
    // footer on ALL of them (one shingle in every document). Derived
    // identically in both engines (skewDocs / duckSkew), so each
    // documented skew mitigation is JUDGED on the corpus shape it
    // exists for, not just described.

    // MinHash LSH on the skewed corpus through the stop-shingle
    // prefilter (maxDocFreq=10): without it the universal footer wins
    // min for some hash indices corpus-wide and one band bucket goes
    // O(n²); with it, signatures and the verify Jaccard run on content
    // shingles only. Oracle = the full filtered pipeline re-derived.
    Q.df("x390_skew_minhash_stopfiltered",
      (s, dir) => Dedup.minhashLshPairs(
        skewDocs(Tables.load(s, dir, "documents")),
        maxDocFreq = Some(10)),
      s"""WITH $duckSkew, $duckSkewTok, ${duckSkewShinglesFiltered(10)},
         |mh AS MATERIALIZED (
         |  SELECT doc_id, i, min(md5(CAST(i AS STRING) || ':' || shingle)) AS m
         |  FROM sh, range(0, 8) r(i) GROUP BY doc_id, i
         |), bands AS MATERIALIZED (
         |  SELECT doc_id, i % 2 AS band,
         |    md5(min(CASE WHEN CAST(floor(i/2.0) AS BIGINT) = 0 THEN m END) || ':' ||
         |        min(CASE WHEN CAST(floor(i/2.0) AS BIGINT) = 1 THEN m END) || ':' ||
         |        min(CASE WHEN CAST(floor(i/2.0) AS BIGINT) = 2 THEN m END) || ':' ||
         |        min(CASE WHEN CAST(floor(i/2.0) AS BIGINT) = 3 THEN m END)) AS sig
         |  FROM mh GROUP BY doc_id, i % 2
         |), cand AS MATERIALIZED (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |), sz AS MATERIALIZED (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS MATERIALIZED (
         |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS i
         |  FROM sh x JOIN sh y ON x.shingle = y.shingle
         |    AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT cand.d1, cand.d2,
         |  CAST(floor(10000.0 * i / (s1.n + s2.n - i)) AS BIGINT)
         |    AS jac_x10k
         |FROM cand JOIN inter ON cand.d1 = inter.d1 AND cand.d2 = inter.d2
         |JOIN sz s1 ON cand.d1 = s1.doc_id
         |JOIN sz s2 ON cand.d2 = s2.doc_id
         |ORDER BY cand.d1, cand.d2""".stripMargin),

    // truncation dedup on the prefix-collapsed corpus at the DOCUMENTED
    // knob setting: prefixLen=64 clears the 47-char boilerplate so the
    // successor windows re-shard on content (at the default 8 every
    // boilerplate doc lands in ONE window partition); planted truncated
    // copies (some shorter than 64 -> the broadcast short-text path
    // runs for real) are derived identically in the oracle
    Q.df("x391_skew_truncation",
      (s, dir) => {
        val skew = skewDocs(Tables.load(s, dir, "documents"))
          .select("doc_id", "text")
        val planted = skew
          .where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            expr("substring(text, 1, 40 + CAST(doc_id % 37 AS INT))")
              .as("text"))
        Dedup.truncationDupes(skew.unionByName(planted), prefixLen = 64)
      },
      s"""WITH $duckSkew,
         |corpus AS MATERIALIZED (
         |  SELECT doc_id, text FROM skew
         |  UNION ALL
         |  SELECT doc_id + 1000000, substr(text, 1, 40 + CAST(doc_id % 37 AS INT))
         |  FROM skew WHERE doc_id % 5 = 0),
         |own AS MATERIALIZED (
         |  SELECT text AS t, min(doc_id) AS owner FROM corpus GROUP BY 1),
         |srt AS (SELECT t, owner, lead(t) OVER (ORDER BY t) AS nxt,
         |        lead(owner) OVER (ORDER BY t) AS nxt_owner FROM own),
         |flag AS (SELECT t, nxt_owner FROM srt
         |         WHERE nxt IS NOT NULL AND starts_with(nxt, t))
         |SELECT c.doc_id AS doc_id,
         |  CAST(length(c.text) AS BIGINT) AS n_chars_trunc,
         |  f.nxt_owner AS container_id
         |FROM corpus c JOIN flag f ON c.text = f.t
         |ORDER BY doc_id""".stripMargin),

    // contamination matrix on the skewed corpus through x342's pruning
    // tier: the planted universal footer/boilerplate shingles cross
    // EVERY source pair, so without the >=3-source drop the matrix
    // saturates; the pruned tier prices them in n_dropped and measures
    // content overlap only
    Q.df("x392_skew_contamination_pruned",
      (s, dir) => Curation.contaminationMatrixPruned(
        skewDocs(Tables.load(s, dir, "documents"))),
      s"""WITH $duckSkew, $duckSkewTok,
         |st AS MATERIALIZED (SELECT DISTINCT d.source,
         |    a.w || ' ' || b.w || ' ' || c.w AS s
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |             JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
         |             JOIN skew d ON d.doc_id = a.doc_id),
         |hot AS MATERIALIZED (SELECT s FROM st GROUP BY s HAVING count(*) >= 3),
         |drp AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped FROM hot),
         |pr AS MATERIALIZED (SELECT source, s FROM st
         |  WHERE s NOT IN (SELECT s FROM hot)),
         |sizes AS MATERIALIZED (SELECT st.source,
         |    CAST(count(CASE WHEN hot.s IS NULL THEN 1 END) AS BIGINT)
         |      AS n
         |  FROM st LEFT JOIN hot ON st.s = hot.s GROUP BY 1),
         |shared AS MATERIALIZED (SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM pr a JOIN pr b ON a.s = b.s AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT sa.source AS src_a, sb.source AS src_b,
         |  sa.n AS n_a, sb.n AS n_b,
         |  coalesce(n_shared, 0) AS n_shared,
         |  coalesce(coalesce(n_shared, 0) * 1000000
         |    // nullif(sa.n + sb.n - coalesce(n_shared, 0), 0), 0)
         |    AS jaccard_ppm,
         |  n_dropped
         |FROM sizes sa JOIN sizes sb ON sa.source < sb.source
         |  LEFT JOIN shared
         |    ON shared.src_a = sa.source AND shared.src_b = sb.source
         |  CROSS JOIN drp
         |ORDER BY src_a, src_b""".stripMargin),

    // streaming shape #24: NATIVE dropDuplicatesWithinWatermark TTL
    // dedup — (user, event_type) admitted once per 7-day window with
    // watermark-evicted per-key state; drained key set == batch
    // DISTINCT over the backlog (x261's windowedDedup is the batch
    // twin carrying counts; the native state op emits keys only)
    Q.df("x389_stream_ttl_dedup",
      (s, dir) => Streaming.streamTtlDedup(s, dir),
      """SELECT DISTINCT user_id, event_type,
        |  (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS win
        |FROM events
        |ORDER BY user_id, event_type, win""".stripMargin),

    // exact 13-gram eval decontamination (the published GPT-3/PaLM
    // rule) — windows built in-row, joined on md5 digests; the corpus
    // is seeded with deterministic leaked copies so the rule fires for
    // real (same derivation in the oracle)
    Q.df("x393_ngram_decontaminate",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val eval0 = docs.where(col("source") === "src19")
        val train = docs.where(col("source") =!= "src19")
          .select("doc_id", "text")
          .unionByName(eval0.where(col("doc_id") % 3 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(lit("press syndication wire copy "), col("text"),
                lit(" republished with permission")).as("text")))
        Curation.ngramDecontaminate(train, eval0)
      },
      """WITH ev AS MATERIALIZED (
        |  SELECT doc_id, text FROM documents WHERE source = 'src19'),
        |tr AS MATERIALIZED (
        |  SELECT doc_id, text FROM documents WHERE source <> 'src19'
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    concat('press syndication wire copy ', text,
        |           ' republished with permission')
        |  FROM ev WHERE doc_id % 3 = 0),
        |tw AS MATERIALIZED (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |      range(1, len(t) - 11),
        |      i -> md5(array_to_string(t[i:i+12], ' '))))) AS g
        |  FROM (SELECT doc_id,
        |          regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |        FROM tr)
        |  WHERE len(t) >= 13),
        |ew AS MATERIALIZED (
        |  SELECT doc_id AS eval_id, unnest(list_distinct(list_transform(
        |      range(1, len(t) - 11),
        |      i -> md5(array_to_string(t[i:i+12], ' '))))) AS g
        |  FROM (SELECT doc_id,
        |          regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |        FROM ev)
        |  WHERE len(t) >= 13)
        |SELECT tw.doc_id,
        |  CAST(count(DISTINCT g) AS BIGINT) AS n_shared,
        |  min(eval_id) AS first_eval_id
        |FROM tw JOIN ew USING (g)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // one-pass column-pair correlation matrix over lineitem numerics:
    // every Σx/Σx²/Σxy in ONE aggregation, per-pair signed r² milli on
    // the exploded single row — one corpus pass for the whole matrix
    Q.df("x394_correlation_matrix",
      (s, dir) => Profile.correlationMatrix(
        Tables.load(s, dir, "lineitem"),
        Seq(
          "disc" -> expr("CAST(floor(l_discount * 100) AS BIGINT)"),
          "price" -> expr("CAST(floor(l_extendedprice) AS BIGINT)"),
          "qty" -> expr("CAST(l_quantity AS BIGINT)"),
          "tax" -> expr("CAST(floor(l_tax * 100) AS BIGINT)"))),
      """WITH b AS (SELECT
        |    CAST(floor(l_discount * 100) AS HUGEINT) AS disc,
        |    CAST(floor(l_extendedprice) AS HUGEINT) AS price,
        |    CAST(l_quantity AS HUGEINT) AS qty,
        |    CAST(floor(l_tax * 100) AS HUGEINT) AS tax
        |  FROM lineitem),
        |mo AS (SELECT CAST(count(*) AS HUGEINT) AS m,
        |    sum(disc) AS sd, sum(price) AS sp, sum(qty) AS sq,
        |    sum(tax) AS st,
        |    sum(disc*disc) AS pdd, sum(disc*price) AS pdp,
        |    sum(disc*qty) AS pdq, sum(disc*tax) AS pdt,
        |    sum(price*price) AS ppp, sum(price*qty) AS ppq,
        |    sum(price*tax) AS ppt, sum(qty*qty) AS pqq,
        |    sum(qty*tax) AS pqt, sum(tax*tax) AS ptt
        |  FROM b),
        |pairs AS (
        |  SELECT 'disc' AS col_a, 'price' AS col_b, m,
        |    m*pdp - sd*sp AS cov, m*pdd - sd*sd AS va,
        |    m*ppp - sp*sp AS vb FROM mo
        |  UNION ALL SELECT 'disc', 'qty', m, m*pdq - sd*sq,
        |    m*pdd - sd*sd, m*pqq - sq*sq FROM mo
        |  UNION ALL SELECT 'disc', 'tax', m, m*pdt - sd*st,
        |    m*pdd - sd*sd, m*ptt - st*st FROM mo
        |  UNION ALL SELECT 'price', 'qty', m, m*ppq - sp*sq,
        |    m*ppp - sp*sp, m*pqq - sq*sq FROM mo
        |  UNION ALL SELECT 'price', 'tax', m, m*ppt - sp*st,
        |    m*ppp - sp*sp, m*ptt - st*st FROM mo
        |  UNION ALL SELECT 'qty', 'tax', m, m*pqt - sq*st,
        |    m*pqq - sq*sq, m*ptt - st*st FROM mo)
        |SELECT col_a, col_b, CAST(m AS BIGINT) AS n,
        |  CAST(CASE WHEN va = 0 OR vb = 0 THEN NULL
        |    WHEN abs(cov) >= 310000000000000000
        |      OR va >= 10000000000000000000
        |      OR vb >= 10000000000000000000 THEN NULL
        |    ELSE (CASE WHEN cov < 0 THEN -1 ELSE 1 END)
        |      * (cov * cov * 1000 // (va * vb)) END AS BIGINT)
        |    AS signed_r2_milli
        |FROM pairs ORDER BY col_a, col_b""".stripMargin),

    // encoding-damage audit (U+FFFD, mojibake digraphs, HTML entities,
    // C0 controls) per source — the corpus is seeded with deterministic
    // damage (same derivation in the oracle) so every counter fires
    Q.df("x395_encoding_damage",
      (s, dir) => TextStats.encodingDamage(
        Tables.load(s, dir, "documents")
          .select(col("source"),
            when(col("doc_id") % 13 === 0,
              concat(col("text"),
                lit("Ã© &amp; &#233; x�")))
              .otherwise(col("text")).as("text"))),
      """WITH dmg AS (SELECT source,
        |    CASE WHEN doc_id % 13 = 0 THEN
        |      concat(text, chr(195), chr(169), ' &amp; &#233; x',
        |             chr(65533))
        |    ELSE text END AS text
        |  FROM documents),
        |c AS (SELECT source,
        |    CAST(len(regexp_extract_all(text, chr(65533))) AS BIGINT)
        |      AS r,
        |    CAST(len(regexp_extract_all(text, chr(195) || '.'))
        |      AS BIGINT) AS m,
        |    CAST(len(regexp_extract_all(text,
        |      '&(amp|lt|gt|quot|apos|#[0-9]+);')) AS BIGINT) AS e,
        |    CAST(len(regexp_extract_all(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT) AS ct
        |  FROM dmg)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(r) AS BIGINT) AS n_replacement,
        |  CAST(sum(m) AS BIGINT) AS n_mojibake,
        |  CAST(sum(e) AS BIGINT) AS n_entity,
        |  CAST(sum(ct) AS BIGINT) AS n_ctrl,
        |  CAST(sum(CASE WHEN r + m + e + ct > 0 THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS damaged_ppm
        |FROM c GROUP BY source ORDER BY source""".stripMargin),

    // bounded-probe harmonic centrality (3 hops) on the customer-
    // supplier graph: exact per-distance counts + integer-milli
    // harmonic score for every 200th customer — oracle = the three
    // frontier hops unrolled as materialized anti-joined CTEs. Node
    // ids are BIGINT (cust*2 / supp*2+1): the hop joins and distincts
    // stream |probes|×paths rows, and an 8-byte key halves that
    // shuffle vs 'c123'-style strings — the probe density is the
    // other cost knob (the x382 sampling discipline)
    Q.df("x396_harmonic_centrality",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val cs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
        val probes = Tables.load(s, dir, "customer")
          .where(col("c_custkey") % 200 === 0)
          .select((col("c_custkey") * 2).as("node"))
        Graph.harmonicCentralityBounded(cs, probes)
      },
      """WITH arcs0 AS MATERIALIZED (
        |  SELECT DISTINCT o_custkey * 2 AS src,
        |    l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |arcs AS MATERIALIZED (
        |  SELECT src, dst FROM arcs0
        |  UNION SELECT dst, src FROM arcs0),
        |p AS MATERIALIZED (
        |  SELECT c_custkey * 2 AS probe FROM customer
        |  WHERE c_custkey % 200 = 0),
        |h1 AS MATERIALIZED (
        |  SELECT DISTINCT p.probe, a.dst AS node
        |  FROM p JOIN arcs a ON a.src = p.probe
        |  WHERE a.dst <> p.probe),
        |h2 AS MATERIALIZED (
        |  SELECT DISTINCT h1.probe, a.dst AS node
        |  FROM h1 JOIN arcs a ON a.src = h1.node
        |  WHERE a.dst <> h1.probe
        |    AND NOT EXISTS (SELECT 1 FROM h1 v
        |      WHERE v.probe = h1.probe AND v.node = a.dst)),
        |h3 AS MATERIALIZED (
        |  SELECT DISTINCT h2.probe, a.dst AS node
        |  FROM h2 JOIN arcs a ON a.src = h2.node
        |  WHERE a.dst <> h2.probe
        |    AND NOT EXISTS (SELECT 1 FROM h1 v
        |      WHERE v.probe = h2.probe AND v.node = a.dst)
        |    AND NOT EXISTS (SELECT 1 FROM h2 v
        |      WHERE v.probe = h2.probe AND v.node = a.dst)),
        |c1 AS (SELECT probe, CAST(count(*) AS BIGINT) AS n1
        |       FROM h1 GROUP BY 1),
        |c2 AS (SELECT probe, CAST(count(*) AS BIGINT) AS n2
        |       FROM h2 GROUP BY 1),
        |c3 AS (SELECT probe, CAST(count(*) AS BIGINT) AS n3
        |       FROM h3 GROUP BY 1)
        |SELECT p.probe AS node, c1.n1,
        |  coalesce(c2.n2, 0) AS n2, coalesce(c3.n3, 0) AS n3,
        |  c1.n1 * 1000 + coalesce(c2.n2, 0) * 500
        |    + coalesce(c3.n3, 0) * 333 AS harmonic_milli
        |FROM p JOIN c1 ON c1.probe = p.probe
        |LEFT JOIN c2 ON c2.probe = p.probe
        |LEFT JOIN c3 ON c3.probe = p.probe
        |ORDER BY node""".stripMargin),
    // pixel-histogram audit on REAL decoded bytes: per-image 256-bin
    // byte histogram folded inside the decode loop (payloads never
    // shuffle), summarized as exact integers; the oracle closed-forms
    // the histogram from the capture rule (byte i = i % 256 over the
    // 4-aligned region), so any decode bug is a hash failure
    Q.df("x398_image_histogram",
      (s, dir) => Multimodal.pixelHistogramAudit(
        Multimodal.withBmpPayload(Tables.load(s, dir, "documents"))),
      s"""WITH $duckBmpGeom
         |SELECT doc_id, CAST(px AS BIGINT) AS px_bytes,
         |  CAST(least(px, 256) AS BIGINT) AS n_distinct_vals,
         |  CAST(0 AS BIGINT) AS modal_val,
         |  CAST(px // 256 + CASE WHEN px % 256 > 0 THEN 1 ELSE 0 END
         |    AS BIGINT) AS modal_count,
         |  CAST((px // 256 + CASE WHEN px % 256 > 0 THEN 1 ELSE 0 END)
         |    * 1000000 // px AS BIGINT) AS modal_ppm
         |FROM g ORDER BY doc_id""".stripMargin),

    // suffix-containment dedup (the truncation mirror): strict-suffix
    // docs flagged via the prefix machinery over reversed text; the
    // corpus is seeded with deterministic tail slices (doc_id % 7 = 3,
    // right 40 + id % 37 chars) so both window and short-text paths run
    Q.df("x399_suffix_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "text")
        val planted = docs
          .where(col("doc_id") % 7 === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            expr("right(text, 40 + CAST(doc_id % 37 AS INT))").as("text"))
        Dedup.suffixDupes(docs.unionByName(planted))
      },
      """WITH corpus AS MATERIALIZED (
        |  SELECT doc_id, reverse(text) AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    substr(reverse(text), 1, 40 + CAST(doc_id % 37 AS INT))
        |  FROM documents WHERE doc_id % 7 = 3),
        |own AS MATERIALIZED (
        |  SELECT t, min(doc_id) AS owner FROM corpus GROUP BY 1),
        |srt AS (SELECT t, owner, lead(t) OVER (ORDER BY t) AS nxt,
        |        lead(owner) OVER (ORDER BY t) AS nxt_owner FROM own),
        |flag AS (SELECT t, nxt_owner FROM srt
        |         WHERE nxt IS NOT NULL AND starts_with(nxt, t))
        |SELECT c.doc_id AS doc_id,
        |  CAST(length(c.t) AS BIGINT) AS n_chars_trunc,
        |  f.nxt_owner AS container_id
        |FROM corpus c JOIN flag f ON c.t = f.t
        |ORDER BY doc_id""".stripMargin),

    // quantile treatment effects: treated-minus-control gap at each
    // outcome decile (type-1 cents via the histogram fold) — the
    // distributional reading a mean difference hides
    Q.df("x400_quantile_effects",
      (s, dir) => Experiment.quantileEffects(
        Tables.load(s, dir, "events"), col("user_id") % 2 === 0),
      """WITH c AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |h AS (SELECT t, cents, CAST(count(*) AS BIGINT) AS c
        |      FROM c GROUP BY 1, 2),
        |cm AS (SELECT t, cents, c, sum(c) OVER (PARTITION BY t
        |    ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS cum FROM h),
        |tot AS (SELECT t, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |q AS (SELECT cm.t, k.k,
        |    CAST(min(CASE WHEN cum * 10 >= k.k * n THEN cents END)
        |      AS BIGINT) AS q
        |  FROM cm JOIN tot ON cm.t = tot.t
        |  CROSS JOIN range(1, 10) k(k)
        |  GROUP BY 1, 2)
        |SELECT qt.k AS decile, qt.q AS q_t_cents, qc.q AS q_c_cents,
        |  qt.q - qc.q AS qte_cents
        |FROM q qt JOIN q qc ON qt.k = qc.k AND qt.t = 1 AND qc.t = 0
        |ORDER BY decile""".stripMargin),

    // streaming shape #26: the QTE monitor — in-row arm/cents scoring,
    // complete-mode value-grid histogram state, drained through the
    // batch decile arithmetic; same oracle as x400
    Q.df("x401_stream_qte",
      (s, dir) => Streaming.streamQte(s, dir),
      """WITH c AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |h AS (SELECT t, cents, CAST(count(*) AS BIGINT) AS c
        |      FROM c GROUP BY 1, 2),
        |cm AS (SELECT t, cents, c, sum(c) OVER (PARTITION BY t
        |    ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS cum FROM h),
        |tot AS (SELECT t, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |q AS (SELECT cm.t, k.k,
        |    CAST(min(CASE WHEN cum * 10 >= k.k * n THEN cents END)
        |      AS BIGINT) AS q
        |  FROM cm JOIN tot ON cm.t = tot.t
        |  CROSS JOIN range(1, 10) k(k)
        |  GROUP BY 1, 2)
        |SELECT qt.k AS decile, qt.q AS q_t_cents, qc.q AS q_c_cents,
        |  qt.q - qc.q AS qte_cents
        |FROM q qt JOIN q qc ON qt.k = qc.k AND qt.t = 1 AND qc.t = 0
        |ORDER BY decile""".stripMargin),

    // streaming shape #25: the encoding-damage monitor — in-row damage
    // scoring, complete-mode per-source counter state, drained through
    // the batch finishing stage; same oracle as x395
    Q.df("x397_stream_damage",
      (s, dir) => Streaming.streamDamage(s, dir),
      """WITH dmg AS (SELECT source,
        |    CASE WHEN doc_id % 13 = 0 THEN
        |      concat(text, chr(195), chr(169), ' &amp; &#233; x',
        |             chr(65533))
        |    ELSE text END AS text
        |  FROM documents),
        |c AS (SELECT source,
        |    CAST(len(regexp_extract_all(text, chr(65533))) AS BIGINT)
        |      AS r,
        |    CAST(len(regexp_extract_all(text, chr(195) || '.'))
        |      AS BIGINT) AS m,
        |    CAST(len(regexp_extract_all(text,
        |      '&(amp|lt|gt|quot|apos|#[0-9]+);')) AS BIGINT) AS e,
        |    CAST(len(regexp_extract_all(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT) AS ct
        |  FROM dmg)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(r) AS BIGINT) AS n_replacement,
        |  CAST(sum(m) AS BIGINT) AS n_mojibake,
        |  CAST(sum(e) AS BIGINT) AS n_entity,
        |  CAST(sum(ct) AS BIGINT) AS n_ctrl,
        |  CAST(sum(CASE WHEN r + m + e + ct > 0 THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS damaged_ppm
        |FROM c GROUP BY source ORDER BY source""".stripMargin)
  )

  /** DuckDB twin of [[graft.ext.Graph.kCoreTrajectory]] on the
    * customer-supplier graph: the peel rounds unrolled as materialized
    * CTE triples (n_r, e_r, r_r) — same contract (degree >= k on the
    * symmetrized distinct arc list, counts after restriction). */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
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
  private def btOracleSql(iters: Int): String = {
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
