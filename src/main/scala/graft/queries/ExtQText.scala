package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming
import graft.queries.ExtShared._

/** §2.8 judged queries — text analysis: stats, lang-id, n-grams, TF-IDF, BPE, vocab, quality. */
private[queries] object ExtQText {

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


    // distributed BPE merge learning — tokenizer training: after ONE
    // corpus-scale word-frequency agg, each of the 8 merge rounds runs
    // on the vocabulary only (pair count + 1-row argmax collect +
    // codegen'd re-segmentation fold). Oracle: the same rounds unrolled
    // as materialized CTEs with list_reduce as the merge fold.
    Q.df("x166_bpe_merges",
      (s, dir) => Bpe.learnMerges(Tables.load(s, dir, "documents"), "text", 8),
      Bpe.oracleSql(8)),


    // BPE ENCODE composed with x166's training: learn the 8 merges,
    // then tokenize the corpus with them (per-vocab-word codegen
    // folds + one token join + per-doc sum). The oracle re-derives
    // the merges AND the encoding, so a bug in either half fails.
    Q.df("x172_bpe_encode",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        // memoized fit (Bpe.fitCache): a repeat execution re-encodes
        // but never re-runs the k-round merge learning
        val merges = Bpe.learnMergesCollected(docs, "text", 8)
        Bpe.encodePieces(docs, "text", merges)
      },
      Bpe.encodeOracleSql(8)),


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


    // tokenizer fertility by language: BPE pieces per whitespace word
    // (the tokenizer-equity audit — a tokenizer trained on one
    // language inflates another's sequence lengths), composed on the
    // x166/x172 merge machinery; the oracle re-derives the merges AND
    // the rollup, so drift in either half fails the compare
    Q.df("x186_tokenizer_fertility",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        // memoized fit — see x172; closes the p1/p2 cache-share gap
        // BENCH_NOTES r15 adjudicated for this query
        val merges = Bpe.learnMergesCollected(docs, "text", 6)
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

  )
}
