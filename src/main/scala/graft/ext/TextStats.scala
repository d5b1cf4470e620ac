package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over a corpus DataFrame(doc_id, text, ...).
  *
  * Beyond-reference surface (SURVEY.md §2.8): the reference engine has no
  * text operators; these are the LLM-pipeline additions, designed
  * distributed-first:
  *  - tokenization is a per-row narrow map (no shuffle);
  *  - per-doc stats are a single hash aggregation keyed by doc_id — the
  *    natural partitioning key, no skew (docs are the unit of work);
  *  - corpus-level token counts shuffle once on the token, with map-side
  *    partial aggregation, so traffic is O(distinct tokens per partition),
  *    not O(total tokens).
  *
  * Determinism contract (driver hash-compares vs DuckDB): ratios are
  * emitted as floor(10000*a/b) BIGINTs — floor of a double quotient of
  * exact integers is engine-portable, unlike round() on binary doubles.
  */
object TextStats {

  val TokenPattern = "[a-z0-9]+"

  /** Tokens of one text column as an array<string> column. */
  def tokensCol(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokenPattern), lit(0))

  /** One row per (doc_id, token) with 1-based position. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(tokensCol(col("text"))).as(Seq("pos0", "w")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("w"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Per-document stats: token count, type count, type-token ratio,
    * stopword ratio, mean token length (all ratios as x10k BIGINTs). */
  def stats(docs: DataFrame): DataFrame =
    tokens(docs)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tok"),
        countDistinct(col("w")).as("n_types"),
        sum(length(col("w"))).as("n_chars_tok"),
        sum(when(col("w").isin(stopwords: _*), 1).otherwise(0)).as("n_stop"))
      .select(col("doc_id"), col("n_tok"), col("n_types"),
        floor(lit(10000.0) * col("n_types") / col("n_tok")).cast("bigint").as("ttr_x10k"),
        floor(lit(10000.0) * col("n_stop") / col("n_tok")).cast("bigint").as("stop_x10k"),
        floor(lit(10000.0) * col("n_chars_tok") / col("n_tok")).cast("bigint").as("avglen_x10k"))
      .orderBy("doc_id")

  /** Marker-phrase hit count: occurrences of ` marker ` in the padded,
    * lowercased text, via the length-delta trick (pure narrow ops). */
  private def hits(padded: Column, marker: String): Column =
    ((length(padded) - length(regexp_replace(padded, marker, ""))) / marker.length)
      .cast("bigint")

  /** Heuristic language ID from function-word markers. Argmax with a fixed
    * tie-break order (de > fr > es > en) so results are deterministic. */
  def langId(docs: DataFrame): DataFrame = {
    val t = concat(lit(" "), lower(col("text")), lit(" "))
    docs.select(col("doc_id"), col("lang"),
        hits(t, " the ").as("h_en"), hits(t, " der ").as("h_de"),
        hits(t, " le ").as("h_fr"), hits(t, " el ").as("h_es"))
      .withColumn("predicted",
        when(col("h_de") >= col("h_fr") && col("h_de") >= col("h_es") &&
             col("h_de") >= col("h_en"), "de")
        .when(col("h_fr") >= col("h_es") && col("h_fr") >= col("h_en"), "fr")
        .when(col("h_es") >= col("h_en"), "es")
        .otherwise("en"))
      .select("doc_id", "lang", "predicted")
      .orderBy("doc_id")
  }

  /** Corpus-wide top-k tokens: one shuffle on the token key with partial
    * (map-side) aggregation; top-k picked by TakeOrderedAndProject. */
  def topTokens(docs: DataFrame, k: Int): DataFrame =
    tokens(docs).groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(k)

  /** Corpus-wide top-k word n-grams (language-model co-occurrence
    * statistics). n-grams are formed inside each row's token array — a
    * narrow transform, zero shuffles — then counted with one keyed
    * aggregation exactly like [[topTokens]]. Counts OCCURRENCES
    * (including repeats within a document), unlike the dedup shingle
    * index which is per-doc distinct. */
  def topNgrams(docs: DataFrame, n: Int, k: Int): DataFrame = {
    require(n >= 2, s"use topTokens for n=1; got n=$n")
    val parts = (0 until n).map(j => s"element_at(t, i + $j)").mkString(", ' ', ")
    docs.select(TextStats.tokensCol(col("text")).as("t"))
      .select(explode(expr(
        s"""CASE WHEN size(t) < $n THEN array()
           |ELSE transform(sequence(1, size(t) - ${n - 1}),
           |  i -> concat($parts))
           |END""".stripMargin)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram")).limit(k)
  }

  /** Per-document out-of-vocabulary rate against the CORPUS-DERIVED
    * top-`vocabSize` vocabulary — the "is this text mostly normal
    * language" gate run before expensive model-based quality scoring.
    * Documents whose token occurrences fall outside the corpus head
    * vocabulary beyond `maxOovX10k` are flagged (gibberish, boilerplate
    * in another charset, extraction failures).
    *
    * Scale shape: the two-pass corpus-statistic pattern — pass 1 derives
    * the vocabulary with one keyed aggregation + bounded top-k
    * (deterministic tie-break on the token), pass 2 joins the tiny
    * vocab back (broadcast: vocabSize rows regardless of corpus size)
    * and re-aggregates per document. Nothing corpus-sized ever
    * concentrates.
    * Output: (doc_id, n_tok, n_oov, oov_x10k, keep). */
  def oovRate(docs: DataFrame, vocabSize: Int,
              maxOovX10k: Long): DataFrame = {
    val vocab = tokens(docs).groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1).as("in_vocab"))
    tokens(docs)
      .join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tok"), col("n_oov"),
        floor(lit(10000.0) * col("n_oov") / col("n_tok"))
          .cast("bigint").as("oov_x10k"))
      .withColumn("keep", (col("oov_x10k") <= maxOovX10k).cast("int"))
      .orderBy("doc_id")
  }

  /** Top TF-IDF-style term per document. The score is
    * floor(10000 * tf * N / (n_tok * df)) — normalized term frequency
    * times an inverse-document-frequency RATIO rather than the textbook
    * log idf: a floored quotient of exact integers is bit-identical in
    * every engine, while ln() differs in the last ulp between libm
    * implementations (the q43 lesson). Rank order within a document is
    * the same monotone idf story.
    *
    * Scale shape: two keyed aggregations (term-frequency by (doc, term),
    * document-frequency by term), one scalar corpus count, and a
    * min_by argmax per doc — partial-aggregated, no per-doc window sort.
    * Output: (doc_id, top_term, score_x10k). */
  def tfidfTopTerm(docs: DataFrame): DataFrame = {
    val tok = tokens(docs)
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val ntok = tok.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val n = docs.count() // one scalar aggregate; broadcast as a literal
    val scored = tf.join(ntok, "doc_id").join(dfreq, "w")
      .select(col("doc_id"), col("w"),
        floor(lit(10000.0) * col("tf") * lit(n) / (col("n_tok") * col("df")))
          .cast("bigint").as("score"))
    // argmax by (score desc, term asc) == min_by over (-score, term)
    scored.groupBy("doc_id")
      .agg(min_by(struct(col("w"), col("score")),
        struct((-col("score")).as("ns"), col("w"))).as("best"))
      .select(col("doc_id"), col("best.w").as("top_term"),
        col("best.score").as("score_x10k"))
      .orderBy("doc_id")
  }

  /** Token-window chunking with overlap — the context-window packing
    * prep step (long document -> training sequences): chunk i covers
    * tokens [i*stride+1, i*stride+window]. Entirely narrow (the windows
    * of one document are sliced from its own token array in-row — zero
    * shuffles, unlike a position self-join); the chunk content is
    * carried as an md5 so downstream exact-dedup of chunks joins on 16
    * bytes. Output: (doc_id, chunk_no, chunk_len, chunk_hash). */
  def chunk(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window >= stride && stride >= 1,
      s"need window >= stride >= 1, got window=$window stride=$stride")
    docs.select(col("doc_id"), tokensCol(col("text")).as("t"))
      .select(col("doc_id"), posexplode(expr(
        s"""CASE WHEN size(t) = 0 THEN array()
           |ELSE transform(
           |  sequence(0, CAST(floor((size(t) - 1) / $stride) AS INT)),
           |  i -> slice(t, i * $stride + 1, $window))
           |END""".stripMargin)).as(Seq("c0", "chunk")))
      .select(col("doc_id"), (col("c0") + 1).cast("bigint").as("chunk_no"),
        size(col("chunk")).cast("bigint").as("chunk_len"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
      .orderBy("doc_id", "chunk_no")
  }

  /** BPE-ish piece pattern: letter runs, single digits, single
    * punctuation marks — the GPT-2-style pre-tokenization shape (letters
    * merge, digits don't). A portable regex both engines count the same
    * way; the real BPE merge table is a model artifact, not an engine
    * operator. */
  val PiecePattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"

  /** C4-style quality gate, fully distributed (one narrow projection +
    * one keyed aggregation — the same shape as [[stats]]):
    *   keep = enough tokens AND stopword ratio above floor AND mean
    *   token length in a sane band — the classic boilerplate/garbage
    *   heuristics from the C4 paper's cleaning pipeline, over exact
    *   integer ratios so the decision is engine-portable.
    * Output: (doc_id, n_tok, n_pieces, stop_x10k, avglen_x10k, keep). */
  def qualityFilter(docs: DataFrame, minTokens: Long = 20,
                    minStopX10k: Long = 100,
                    avgLenBandX10k: (Long, Long) = (30000L, 80000L)): DataFrame = {
    val pieces = docs.select(col("doc_id"),
      size(regexp_extract_all(lower(col("text")), lit(PiecePattern), lit(0)))
        .cast("bigint").as("n_pieces"))
    stats(docs).join(pieces, "doc_id")
      .select(col("doc_id"), col("n_tok"), col("n_pieces"),
        col("stop_x10k"), col("avglen_x10k"),
        (col("n_tok") >= minTokens && col("stop_x10k") >= minStopX10k &&
         col("avglen_x10k") >= avgLenBandX10k._1 &&
         col("avglen_x10k") <= avgLenBandX10k._2).as("keep"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition stats — the "is this document mostly one
    * phrase repeated" signal (duplicate-fraction heuristics from the
    * Gopher/MassiveText cleaning rules): per document, the fraction of
    * tokens accounted for by the single most frequent token, and the
    * fraction of bigram occurrences accounted for by the most frequent
    * bigram. High values = boilerplate/spam; a training pipeline drops
    * or down-weights them.
    *
    * Scale shape: two keyed aggregations per signal ((doc, term) counts,
    * then a per-doc max+sum), all partial-aggregated on the natural
    * doc_id key — no windows, no self-joins. Ratios are floor-scaled
    * exact-integer quotients (engine-portable).
    * Output: (doc_id, n_tok, top_token_x10k, top_bigram_x10k). */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val tf = tokens(docs).groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val t1 = tf.groupBy("doc_id")
      .agg(max("tf").as("max_tf"), sum("tf").as("n_tok"))
    val bf = docs.select(col("doc_id"), tokensCol(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(t) < 2 THEN array()
          |ELSE transform(sequence(1, size(t) - 1),
          |  i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))
          |END""".stripMargin)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("bf"))
    val b1 = bf.groupBy("doc_id")
      .agg(max("bf").as("max_bf"), sum("bf").as("n_bg"))
    t1.join(b1, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        floor(lit(10000.0) * col("max_tf") / col("n_tok"))
          .cast("bigint").as("top_token_x10k"),
        coalesce(floor(lit(10000.0) * col("max_bf") / col("n_bg"))
          .cast("bigint"), lit(0L)).as("top_bigram_x10k"))
      .orderBy("doc_id")
  }

  /** PII-style scrubbing: redact digit runs, emails, and bare URLs from
    * a string column — the privacy pass a corpus runs before training.
    * Pure narrow regexp_replace chain (whole-stage codegen, no shuffle);
    * patterns chosen engine-portable (POSIX-ish classes only). */
  /** Pairwise lexical drift between strata: exact total-variation
    * distance between per-stratum unigram distributions, floor-scaled
    * ppm. Complements the near-dup overlap matrix (x174): overlap
    * finds shared DOCUMENTS, drift measures distributional shift even
    * with zero shared documents — the audit for "did this source's
    * language change between crawls / differ from that source".
    *
    * TV(p, q) = (1/2) sum_w |p_w - q_w| over the union vocabulary,
    * computed EXACTLY from the inner join alone: with c1, c2 raw
    * counts and N1, N2 totals,
    *   sum_union |c1*N2 - c2*N1|
    *     = sum_shared |c1*N2 - c2*N1|
    *       + (N1*N2 - sum_shared c1*N2)   (terms only in s1)
    *       + (N1*N2 - sum_shared c2*N1)   (terms only in s2)
    * so no outer join and no null handling; tv_ppm = that * 1e6 div
    * (2*N1*N2), all BIGINT.
    *
    * Scale shape: one corpus-scale keyed count, then everything runs
    * on the (stratum x vocabulary) count table; the pair join is
    * keyed on the term. Pairs sharing NO term are omitted (their TV
    * is trivially 1e6 and the inner join never sees them). Output:
    * (src_a, src_b, shared_terms, tv_ppm), src_a < src_b, ordered. */
  def sourceDrift(docs: DataFrame, stratum: String = "source"): DataFrame = {
    val tok = docs.select(col(stratum).as("src"),
        explode(tokensCol(col("text"))).as("w"))
    val cnt = tok.groupBy("src", "w").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("src").agg(sum("c").as("n"))
    val cw = cnt.join(broadcast(tot), "src")
    val shared = cw.as("a")
      .join(cw.as("b"), col("a.w") === col("b.w")
        && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("shared_terms"),
        sum(abs(col("a.c") * col("b.n") - col("b.c") * col("a.n")))
          .as("sd"),
        sum(col("a.c") * col("b.n")).as("s1"),
        sum(col("b.c") * col("a.n")).as("s2"))
    shared
      .join(broadcast(tot.select(col("src").as("src_a"),
        col("n").as("n1"))), "src_a")
      .join(broadcast(tot.select(col("src").as("src_b"),
        col("n").as("n2"))), "src_b")
      .select(col("src_a"), col("src_b"), col("shared_terms"),
        expr("(sd + (n1 * n2 - s1) + (n1 * n2 - s2)) * 1000000L " +
          "div (2 * n1 * n2)").as("tv_ppm"))
      .orderBy("src_a", "src_b")
  }

  /** Pre-scrub PII inventory: per group, how much would [[scrub]]
    * redact — rows scanned, rows carrying any PII, and per-class hit
    * counts. The classes are counted HIERARCHICALLY in scrub's
    * replacement order (emails on the url-stripped text, numbers on
    * the email-stripped text), so each character is attributed to
    * exactly one class and the counts equal what scrub would redact —
    * the audit a pipeline runs to size the redaction pass before
    * committing to it. One narrow projection + one keyed agg.
    * Output: (group, n_rows, rows_with_pii, urls, emails, numbers). */
  def piiAudit(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val urlRe = "https?://[^ ]+"
    val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val stripped = regexp_replace(col("t"), urlRe, "<URL>")
    val stripped2 = regexp_replace(stripped, emailRe, "<EMAIL>")
    def cnt(c: Column, re: String) =
      size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
    df.select(col(groupCol).as("g"), col(textCol).as("t"))
      .select(col("g"), cnt(col("t"), urlRe).as("u"),
        cnt(stripped, emailRe).as("e"), cnt(stripped2, "[0-9]+").as("n"))
      .groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("u") + col("e") + col("n") > 0, 1L).otherwise(0L))
          .as("rows_with_pii"),
        sum("u").as("urls"), sum("e").as("emails"), sum("n").as("numbers"))
      .orderBy(groupCol)
  }

  def scrub(c: Column): Column = {
    val noUrl = regexp_replace(c, "https?://[^ ]+", "<URL>")
    val noEmail = regexp_replace(noUrl,
      "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "[0-9]+", "<N>")
  }

  /** Normalization fingerprint: md5 of the whitespace-collapsed,
    * lowercased text — the exact-dedup key for near-identical formatting. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("cnt"), min("doc_id").as("keep_id"))
      .orderBy("fp")

  /** Per-stratum DISTINCTIVE term by integer lift — the
    * domain-signature extractor of corpus curation: which token is
    * most over-represented in each source relative to the corpus?
    * Lift is the exponential-form pointwise mutual information,
    * P(w|source) / P(w), computed as the exact integer ratio
    * (100 * O * n) div (R * C) where O = (source, token) occurrences,
    * R = source tokens, C = corpus occurrences of the token, n = total
    * tokens — no logs, no floats, engine-bit-identical (the same
    * ln-avoidance as TF-IDF x84 / Gini-Simpson diversity). Tokens
    * below `minCount` occurrences in the stratum are excluded (lift of
    * a hapax is noise).
    *
    * Scale shape: three keyed aggregations + one scalar, joined back
    * on their own keys; the per-stratum argmax is min_by (partial
    * aggregation), never a window over the raw counts.
    * Output: (stratum, top_term, lift_x100). */
  def distinctiveTerms(docs: DataFrame, stratum: String = "source",
                       minCount: Long = 5): DataFrame = {
    val st = docs.select(col(stratum),
        posexplode(tokensCol(col("text"))).as(Seq("pos0", "w")))
      .select(col(stratum), col("w"))
    val o = st.groupBy(stratum, "w").agg(count(lit(1)).as("o"))
    val r = st.groupBy(stratum).agg(count(lit(1)).as("r"))
    val c = st.groupBy("w").agg(count(lit(1)).as("c"))
    val n = st.agg(count(lit(1)).as("n"))
    val scored = o.where(col("o") >= minCount)
      .join(r, stratum).join(c, "w").crossJoin(broadcast(n))
      .select(col(stratum), col("w"),
        expr("(100 * o * n) div (r * c)").as("lift_x100"))
    scored.groupBy(stratum)
      .agg(min_by(struct(col("w"), col("lift_x100")),
        struct((-col("lift_x100")).as("nl"), col("w"))).as("best"))
      .select(col(stratum), col("best.w").as("top_term"),
        col("best.lift_x100").as("lift_x100"))
      .orderBy(stratum)
  }

  /** Per-document lexical diversity as the Gini-Simpson index — the
    * probability two random tokens of the doc differ. The usual
    * spelling (Shannon entropy) needs ln, whose libm rounding differs
    * across engines (the q43 lesson); Gini-Simpson is a pure integer
    * statistic: 1 - sum(c_i^2)/n^2, emitted as the exact BIGINT
    * (10000 * (n^2 - sum c_i^2)) div n^2. Low values flag repetitive /
    * boilerplate text (complements the Gopher occupancy signals x89).
    *
    * Scale shape: two keyed aggregations ((doc, token) then doc), both
    * partial-aggregated; nothing quadratic, no window.
    * Output: (doc_id, n_tok, gini_x10k). */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tok"), sum(col("c") * col("c")).as("s2"))
      .select(col("doc_id"), col("n_tok"),
        expr("(10000 * (n_tok * n_tok - s2)) div (n_tok * n_tok)")
          .as("gini_x10k"))
      .orderBy("doc_id")

  /** Per-doc word-3-gram shingle occurrence counts, built narrowly
    * in-row (transform over the token array — zero shuffles), then one
    * keyed aggregation. The TERM SPACE of [[tfidfPairs]]: shingles,
    * not unigrams, because a bounded vocabulary (as in any natural
    * corpus head) leaves no rare unigrams, while the shingle space
    * keeps growing with content and carries phrase-level signal. */
  private def shingleTf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokensCol(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(t) < 3 THEN array()
          |ELSE transform(sequence(1, size(t) - 2),
          |  i -> concat(element_at(t, i), ' ', element_at(t, i + 1),
          |              ' ', element_at(t, i + 2)))
          |END""".stripMargin)).as("s"))
      .groupBy("doc_id", "s").agg(count(lit(1)).as("tf"))

  /** BM25 query-by-document retrieval over the word-3-gram shingle
    * space: rank the corpus against the shingles of one probe
    * document (k1 = 1.2, b = 0.75) — the lexical retrieval twin of
    * the embedding kNN family, and the "find the sources of this
    * passage" primitive.
    *
    * Everything is integer-exact:
    *  - idf is the floor-log2 of the Robertson odds ratio,
    *    floor(log2((2N - 2df + 1) div (2df + 1))) via length(bin(q)) - 1
    *    (exact in both engines; terms with df > N/2 clamp to 0);
    *  - the saturating tf component is the BM25 rational with
    *    k1 = 6/5, b = 3/4 multiplied out over avgdl = T/N:
    *    tfc = tf*22*T*1e6 div (10*T*tf + 3*T + 9*dl*N), floor-scaled
    *    (T = total shingle occurrences; BIGINT-safe to ~1e11 tokens —
    *    beyond that, rescale S);
    *  - score = sum over matched terms of idf_bits * tfc.
    *
    * `maxDocFreq` drops boilerplate probe shingles BEFORE retrieval
    * (the query-side stop filter — a df-10k term would pull the whole
    * corpus as candidates). Scale shape: the probe's term list is
    * broadcast with precomputed idf; candidates are generated only
    * through the inverted index on those rare terms; per-doc length
    * and the final sum are keyed aggs; top-k is a
    * TakeOrderedAndProject, never a global sort.
    *
    * Output: (doc_id, n_terms, score), probe excluded, ordered by
    * (score DESC, doc_id), k rows. */
  def bm25DocRetrieve(docs: DataFrame, queryDocId: Long, k: Int,
                      maxDocFreq: Int = 10): DataFrame = {
    require(k >= 1, "k must be positive")
    val tf = CacheRegistry.pin(shingleTf(docs))
    val tot = docs.agg(count(lit(1)).as("nn"))
      .crossJoin(tf.agg(sum("tf").as("tt")))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val df = tf.groupBy("s").agg(count(lit(1)).as("df"))
    val qterms = tf.where(col("doc_id") === queryDocId).select("s")
      .join(df, "s").where(col("df") <= maxDocFreq)
    val q = broadcast(qterms.crossJoin(broadcast(tot))
      .select(col("s"), expr(
        """CASE WHEN (2*nn - 2*df + 1) div (2*df + 1) >= 1
          |THEN length(bin((2*nn - 2*df + 1) div (2*df + 1))) - 1
          |ELSE 0 END""".stripMargin).cast("long").as("idf_bits")))
    tf.join(q, "s")
      .where(col("doc_id") =!= queryDocId)
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), (col("idf_bits") * expr(
        "tf * 22 * tt * 1000000L div (10 * tt * tf + 3 * tt + 9 * dl * nn)"))
        .as("ts"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("ts").as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Sparse TF-IDF cosine candidate pairs — the document-similarity
    * join over the inverted index: docs are sparse TF-IDF vectors in
    * the word-3-gram shingle space, candidate pairs are generated ONLY
    * through shared rare shingles (document frequency <= maxDocFreq —
    * the same stop-filter that keeps jaccardPairs sub-quadratic:
    * ubiquitous terms pair everything with everything and carry no
    * signal), and each pair's cosine NUMERATOR plus both pruned-space
    * norms are returned as exact BIGINTs. No floats anywhere: idf is
    * the integer ratio (100 * N) div df, weights tf * idf, so the
    * result is engine-bit-identical; callers derive cosine =
    * num / sqrt(n1sq * n2sq) in whatever precision they need.
    *
    * Scale shape: inverted-index self-join keyed on the (rare) term,
    * partial-aggregated pair sums — traffic is sum over rare terms of
    * df^2 <= maxDocFreq * postings, linear in the index, never
    * corpus^2. Output: (d1, d2, num, n1sq, n2sq). */
  def tfidfPairs(docs: DataFrame, maxDocFreq: Int = 2): DataFrame = {
    // pin the (doc, shingle, tf) table AND the rare-filtered weight
    // table: tf is consumed by the df aggregate and the weight join,
    // wts by the norms aggregate and BOTH self-join sides — unpinned,
    // the tokenize pipeline executed twice and its exchange was read
    // four times in the warm plan (round-16 StageProbe; the round-15
    // pin-when-multi-consumed discipline, guide §2.4/§5)
    val tf = CacheRegistry.pin(shingleTf(docs))
    val nn = docs.agg(count(lit(1)).as("n"))
    val rare = tf.groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDocFreq)
    val wts = CacheRegistry.pin(
      tf.join(rare, "s").crossJoin(broadcast(nn))
        .select(col("doc_id"), col("s"),
          (col("tf") * expr("(100 * n) div df")).as("wt")))
    val norms = wts.groupBy("doc_id")
      .agg(sum(col("wt") * col("wt")).as("nsq"))
    val a = wts.as("a"); val b = wts.as("b")
    val num = a.join(b, col("a.s") === col("b.s") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        (col("a.wt") * col("b.wt")).as("p"))
      .groupBy("d1", "d2").agg(sum("p").as("num"))
    num.join(norms.withColumnRenamed("doc_id", "d1")
        .withColumnRenamed("nsq", "n1sq"), "d1")
      .join(norms.withColumnRenamed("doc_id", "d2")
        .withColumnRenamed("nsq", "n2sq"), "d2")
      .select(col("d1"), col("d2"), col("num"), col("n1sq"), col("n2sq"))
      .orderBy("d1", "d2")
  }

  /** Vocabulary growth curve (Heaps-law diagnostic): how many NEW
    * distinct tokens each successive bucket of documents contributes,
    * in doc_id (crawl) order. A healthy diverse corpus keeps adding
    * vocabulary; a curve that flattens early means the tail of the
    * crawl is repetitive — the cheap corpus-diversity audit run before
    * committing a crawl slice to training.
    *
    * Shape: one keyed agg (first-occurrence doc per n-gram — min over
    * the n-gram key), a bucket rollup, and a running sum over the TINY
    * bucket list (cardinality = corpus/bucketSize, the only window).
    * `n` sets the vocabulary unit: 1 = unigrams, 3 = word trigrams
    * (the unit real coverage curves use — unigram vocabularies
    * saturate almost immediately).
    * Output: (bucket, first_doc, last_doc, new_tokens, cum_tokens). */
  def vocabGrowth(docs: DataFrame, bucketSize: Long, n: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketSize >= 1, "bucketSize must be positive")
    require(n >= 1 && n <= 5, s"n must be in [1, 5]; got $n")
    val grams =
      if (n == 1)
        docs.select(col("doc_id"), explode(tokensCol(col("text"))).as("w"))
      else
        docs.select(col("doc_id"), tokensCol(col("text")).as("t"))
          .select(col("doc_id"), explode(expr(
            s"""CASE WHEN size(t) < $n THEN array() ELSE
               |transform(sequence(1, size(t) - ${n - 1}),
               |  i -> array_join(slice(t, i, $n), ' ')) END""".stripMargin))
            .as("w"))
    val first = grams.groupBy("w").agg(min("doc_id").as("first_doc"))
    // integer div, not double `/`: a double round-trip loses exactness
    // for ids beyond 2^53 — real at web scale
    val buckets = first
      .groupBy(expr(s"first_doc div $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("new_tokens"))
    buckets
      .select(col("bucket"),
        (col("bucket") * bucketSize).as("first_doc"),
        (col("bucket") * bucketSize + bucketSize - 1).as("last_doc"),
        col("new_tokens"),
        sum("new_tokens").over(
          Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_tokens"))
      .orderBy("bucket")
  }

  /** Borda rank fusion of quality signals: each signal contributes its
    * global 1-based rank (direction-aware; ties broken by `key` so
    * every rank is a total order), and a document's fused score is the
    * SUM of its ranks — lower is better. Rank fusion is how production
    * curation combines incommensurable signals (length, diversity,
    * LM score...) without inventing scale factors, and the integer
    * ranks keep the result engine-exact where weighted float blends
    * would not be.
    *
    * `signals`: (column, higherIsBetter). Scale shape: one
    * range-partitioned sort + zipWithIndex PER SIGNAL (the x132 global
    * id shape — no SinglePartition window), then an n-way equi-join on
    * the key. Output: (key, rank_<sig>..., borda) ordered by key. */
  def rankFusion(df: DataFrame, key: String,
                 signals: Seq[(String, Boolean)]): DataFrame = {
    require(signals.nonEmpty, "rankFusion needs at least one signal")
    val ranked = signals.map { case (sig, higherBetter) =>
      val ord =
        if (higherBetter) Seq(col(sig).desc, col(key))
        else Seq(col(sig).asc, col(key))
      Ids.rankByOrder(df.select(key, sig), ord, Seq(key), s"rank_$sig")
    }
    val joined = ranked.reduce(_.join(_, key))
    val rankCols = signals.map { case (sig, _) => col(s"rank_$sig") }
    joined
      .withColumn("borda", rankCols.reduce(_ + _))
      .orderBy(key)
  }

  /** PMI-ranked collocations over adjacent token bigrams — the
    * classic "which word pairs co-occur far more than chance"
    * extractor (phrase mining, tokenizer-merge candidates, NER
    * gazetteer seeds). The association score is the independence
    * ratio P(xy) / (P(x)P(y)) as exact ppm via integer cross-
    * multiplication: c_xy * N * 1e6 div (c_x * c_y) — monotone in
    * true PMI (log of it), so the RANKING is identical to ranking by
    * PMI while never touching a float log. Margins c_x / c_y are the
    * bigram-table margins (first-slot / second-slot counts), so the
    * three counts live on the same sample space and the ratio's
    * numerator can never be inflated by edge tokens.
    *
    * Scale shape: bigrams come from ONE per-doc lead(1) window (the
    * token table never self-joins); everything after is vocabulary-
    * sized — two margin aggregates broadcast back onto the pair
    * counts, a 1-row total, and a top-k sort of pairs that passed
    * `minCount`. Intermediate bound: c_xy * N * 1e6 needs c_xy * N <
    * 9.2e12 — at larger corpora drop the ppm factor to 1e3 or rank by
    * (c_xy * N, c_x * c_y) lexicographically.
    *
    * Output: (w1, w2, c_xy, pmi_ppm), top `topK` by (pmi_ppm desc,
    * w1, w2). */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5,
                 topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minCount >= 1 && topK >= 1, "minCount/topK must be positive")
    val perDoc = Window.partitionBy("doc_id").orderBy("pos")
    val bg = tokens(docs)
      .withColumn("w2", lead("w", 1).over(perDoc))
      .where(col("w2").isNotNull)
      .select(col("w").as("w1"), col("w2"))
    val cxy = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    val cx = bg.groupBy("w1").agg(count(lit(1)).as("c_x"))
    val cy = bg.groupBy("w2").agg(count(lit(1)).as("c_y"))
    val n = bg.agg(count(lit(1)).as("n_bg"))
    cxy.join(broadcast(cx), Seq("w1"))
      .join(broadcast(cy), Seq("w2"))
      .crossJoin(broadcast(n))
      .where(col("c_xy") >= minCount)
      .select(col("w1"), col("w2"), col("c_xy"),
        expr("c_xy * n_bg * 1000000L div (c_x * c_y)").as("pmi_ppm"))
      .orderBy(col("pmi_ppm").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Declared-vs-detected language agreement: the confusion matrix
    * between the metadata `lang` column and [[langId]]'s content-based
    * prediction, with chance-corrected agreement (Cohen's kappa) in
    * exact ppm. This is the METADATA-TRUST audit of a curation
    * pipeline: scraped language tags are wrong often enough that
    * routing 100 TB by them without this check mislabels whole
    * sources; kappa near zero says the tag column carries no signal.
    *
    * kappa = (po - pe) / (1 - pe) with po = agree/N and
    * pe = Σ_l row_l·col_l / N², computed as ONE integer rational:
    * kappa_ppm = (N·agree - S)·1e6 div (N² - S) where
    * S = Σ_l row_l·col_l — no float ever exists, and a negative kappa
    * (worse than chance) truncates toward zero in both engines.
    * Intermediate bound: N²·1e6 needs N < 3e6 docs per audited slice;
    * audit per-source slices (the useful granularity) beyond that.
    *
    * Scale shape: one narrow scan for the prediction, a |labels|²-
    * bounded cell aggregation, label-sized marginal joins, and two
    * 1-row broadcasts — nothing scales with corpus size after the
    * first aggregation.
    *
    * Output: (lang, predicted, n, row_total, col_total, agree_ppm,
    * kappa_ppm), ordered by (lang, predicted); agree/kappa are
    * corpus-level constants repeated per cell. */
  def langAgreement(docs: DataFrame): DataFrame = {
    val p = langId(docs).select(col("lang"), col("predicted"))
    val cells = p.groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
    val rowT = cells.groupBy("lang").agg(sum("n").as("row_total"))
    val colT = cells.groupBy("predicted").agg(sum("n").as("col_total"))
    val s = rowT.join(colT, rowT("lang") === colT("predicted"))
      .agg(coalesce(sum(col("row_total") * col("col_total")), lit(0L))
        .as("s"))
    val tot = p.agg(count(lit(1)).as("n_total"),
      sum(when(col("lang") === col("predicted"), 1L).otherwise(0L))
        .as("n_agree"))
    cells.join(rowT, Seq("lang")).join(colT, Seq("predicted"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(s))
      .select(col("lang"), col("predicted"), col("n"),
        col("row_total"), col("col_total"),
        expr("n_agree * 1000000L div n_total").as("agree_ppm"),
        when(col("n_total") * col("n_total") =!= col("s"),
          expr("(n_total * n_agree - s) * 1000000L" +
            " div (n_total * n_total - s)"))
          .otherwise(0L).as("kappa_ppm"))
      .orderBy("lang", "predicted")
  }

  /** Dedup-adjusted token accounting per source: raw token volume vs
    * the volume that survives exact text dedup WITHIN the source —
    * the "effective tokens" a mixture planner must weight by, because
    * a source whose 100 TB is 40% copies contributes far fewer unique
    * training tokens than its raw size claims. Each distinct text is
    * charged once (identical texts have identical token counts, so
    * min() per hash is exact, not a choice).
    *
    * Scale shape: texts collapse map-side to 16-byte md5 keys with
    * their token counts; one (source, hash) aggregation then one
    * source-level rollup — the full text shuffles nowhere.
    *
    * Output: (source, n_docs, raw_tokens, n_unique_docs,
    * unique_tokens, dup_token_ppm), ordered by source. */
  def effectiveTokens(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"),
      size(tokensCol(col("text"))).cast("bigint").as("n_tok"),
      md5(col("text")).as("h"))
    val raw = d.groupBy("source").agg(count(lit(1)).as("n_docs"),
      sum("n_tok").as("raw_tokens"))
    val uniq = d.groupBy("source", "h").agg(min("n_tok").as("n_tok"))
      .groupBy("source").agg(count(lit(1)).as("n_unique_docs"),
        sum("n_tok").as("unique_tokens"))
    raw.join(uniq, Seq("source"))
      .select(col("source"), col("n_docs"), col("raw_tokens"),
        col("n_unique_docs"), col("unique_tokens"),
        when(col("raw_tokens") > 0,
          expr("(raw_tokens - unique_tokens) * 1000000L div raw_tokens"))
          .otherwise(0L).as("dup_token_ppm"))
      .orderBy("source")
  }

  /** Within-document code-switching detection: the document is cut
    * into non-overlapping `window`-token chunks, each chunk language-
    * identified with the [[langId]] marker rule, and the doc reports
    * its window count, dominant predicted language (most windows,
    * alphabetically-smallest on ties), adjacent-window switch count,
    * and minority share in exact ppm. Mixed-language documents are a
    * classic curation hazard — a doc-level language tag hides them,
    * which is exactly why the span-level audit exists (and why this
    * composes with x212's tag-trust audit).
    *
    * Scale shape: chunking + marker counting are narrow per-row
    * transforms; the switch count is a lag window PARTITIONED BY
    * doc (bounded by the doc's own window count); dominant/minority
    * are keyed aggregations. Docs with zero tokens produce no chunks
    * and are absent from the output (nothing to classify).
    *
    * Output: (doc_id, n_windows, dominant_lang, n_switches,
    * minority_ppm), ordered by doc_id. */
  def codeSwitching(docs: DataFrame, window: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 1, s"window must be positive; got $window")
    val chunks = docs.select(col("doc_id"), tokensCol(col("text")).as("t"))
      .select(col("doc_id"), posexplode(expr(
        s"""CASE WHEN size(t) = 0 THEN array()
           |ELSE transform(
           |  sequence(0, CAST(floor((size(t) - 1) / $window) AS INT)),
           |  i -> slice(t, i * $window + 1, $window))
           |END""".stripMargin)).as(Seq("w0", "chunk")))
      .select(col("doc_id"), (col("w0") + 1).as("w_no"),
        concat(lit(" "), concat_ws(" ", col("chunk")), lit(" ")).as("ct"))
    val pred = chunks.select(col("doc_id"), col("w_no"),
        hits(col("ct"), " the ").as("h_en"),
        hits(col("ct"), " der ").as("h_de"),
        hits(col("ct"), " le ").as("h_fr"),
        hits(col("ct"), " el ").as("h_es"))
      .withColumn("pred",
        when(col("h_de") >= col("h_fr") && col("h_de") >= col("h_es") &&
             col("h_de") >= col("h_en"), "de")
        .when(col("h_fr") >= col("h_es") && col("h_fr") >= col("h_en"), "fr")
        .when(col("h_es") >= col("h_en"), "es")
        .otherwise("en"))
      .select("doc_id", "w_no", "pred")
    val byDoc = Window.partitionBy("doc_id").orderBy("w_no")
    val switches = pred
      .withColumn("prev", lag("pred", 1).over(byDoc))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("prev").isNotNull && col("prev") =!= col("pred"), 1L)
          .otherwise(0L)).as("n_switches"))
    val dominant = pred.groupBy("doc_id", "pred")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(min(struct((-col("cnt")).as("nc"), col("pred").as("p")))
        .as("w"))
      .select(col("doc_id"), col("w.p").as("dominant_lang"),
        (-col("w.nc")).as("n_dom"))
    switches.join(dominant, Seq("doc_id"))
      .select(col("doc_id"), col("n_windows"), col("dominant_lang"),
        col("n_switches"),
        expr("(n_windows - n_dom) * 1000000L div n_windows")
          .as("minority_ppm"))
      .orderBy("doc_id")
  }

  /** NEAR-dup-adjusted token accounting: [[effectiveTokens]] counts a
    * verbatim copy once but still double-counts paraphrases/near-
    * copies; here each near-dup CLUSTER (from `Dedup.clusters`) is
    * charged once, to the source of its representative (the cluster-
    * min doc) — so a source that only republishes another source's
    * content reports unique_tokens 0 and dup_token_ppm 1e6, which is
    * exactly the mixture-planning signal. Pass `clusters` as
    * (doc_id, cluster_id = cluster-min doc_id).
    *
    * Scale shape: one narrow token-count projection, the cluster
    * join keyed on doc_id, rollups keyed on source; the text column
    * never shuffles (counts and 8-byte ids do).
    *
    * Output: (source, n_docs, raw_tokens, n_reps, unique_tokens,
    * dup_token_ppm), ordered by source. */
  def effectiveTokensByCluster(docs: DataFrame,
                               clusters: DataFrame): DataFrame = {
    val tc = docs.select(col("doc_id"), col("source"),
      size(tokensCol(col("text"))).cast("bigint").as("n_tok"))
    val raw = tc.groupBy("source").agg(count(lit(1)).as("n_docs"),
      sum("n_tok").as("raw_tokens"))
    val reps = clusters.select(col("cluster_id").as("doc_id")).distinct()
    val uniq = reps.join(tc, Seq("doc_id"))
      .groupBy("source").agg(count(lit(1)).as("n_reps"),
        sum("n_tok").as("unique_tokens"))
    raw.join(uniq, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("raw_tokens"),
        coalesce(col("n_reps"), lit(0L)).as("n_reps"),
        coalesce(col("unique_tokens"), lit(0L)).as("unique_tokens"))
      .select(col("source"), col("n_docs"), col("raw_tokens"),
        col("n_reps"), col("unique_tokens"),
        when(col("raw_tokens") > 0,
          expr("(raw_tokens - unique_tokens) * 1000000L div raw_tokens"))
          .otherwise(0L).as("dup_token_ppm"))
      .orderBy("source")
  }

  /** Per-document keyword extraction: the top-k terms by integer
    * TF-IDF score (tf·1e6 div df — rank-equivalent to tf/df with a
    * deterministic truncation both engines share; ties break on the
    * term). The tagging pass that turns a raw corpus into something
    * filterable ("give me the docs about X") without any model.
    *
    * Scale shape: term counts are one (doc, term) aggregation; doc
    * frequencies one term-keyed aggregation joined back (vocabulary-
    * sized); the top-k window is PARTITIONED BY doc — bounded by each
    * doc's own vocabulary, never global.
    *
    * Output: (doc_id, term, tf, df, score), top `k` per doc, ordered
    * by (doc_id, score desc, term). */
  def keywords(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be positive; got $k")
    val tf = tokens(docs).groupBy("doc_id", "w")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, Seq("w"))
      .select(col("doc_id"), col("w").as("term"), col("tf"), col("df"),
        expr("tf * 1000000L div df").as("score"))
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(byDoc))
      .where(col("rn") <= k)
      .drop("rn")
      .orderBy(col("doc_id"), col("score").desc, col("term"))
  }

  /** Vocabulary-pruning impact sweep: for each candidate min-count
    * threshold, how many term TYPES survive and what share of the
    * corpus TOKEN MASS they still cover — the two numbers that decide
    * a tokenizer/feature-vocabulary cutoff ("min-count 8 keeps 4% of
    * types but 97% of mass" is the classic Zipf answer). Computed
    * off the count HISTOGRAM, so the sweep costs |distinct counts| ×
    * |thresholds| rows after one vocabulary aggregation — adding a
    * threshold is free.
    *
    * Output: (min_count, n_types_kept, types_kept_ppm,
    * mass_kept_ppm), ordered by min_count. */
  def vocabPruning(docs: DataFrame,
                   thresholds: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L))
      : DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = tokens(docs).groupBy("w").agg(count(lit(1)).as("cnt"))
      .groupBy("cnt").agg(count(lit(1)).as("n_types"))
    val tot = hist.agg(sum("n_types").as("all_types"),
      sum(col("cnt") * col("n_types")).as("all_mass"))
    val th = thresholds.toDF("min_count")
    th.crossJoin(hist).where(col("cnt") >= col("min_count"))
      .groupBy("min_count")
      .agg(sum("n_types").as("n_types_kept"),
        sum(col("cnt") * col("n_types")).as("mass_kept"))
      .crossJoin(broadcast(tot))
      .select(col("min_count"), col("n_types_kept"),
        expr("n_types_kept * 1000000L div all_types").as("types_kept_ppm"),
        expr("mass_kept * 1000000L div all_mass").as("mass_kept_ppm"))
      .orderBy("min_count")
  }

  /** One-row corpus datasheet — the "dataset card" numbers every
    * release publishes (docs, sources, languages, exact-dup rate,
    * token/char volume, length percentiles), computed in ONE
    * aggregation pass. Texts enter the distinct count as md5 keys so
    * the full text never shuffles; percentiles are percentile_disc
    * members of the data, engine-exact.
    *
    * Scale note: the multi-DISTINCT agg plans via Expand (input
    * replicated once per distinct column before the shuffle) — the
    * deliberate trade for a 4-distinct card in one pass; at 100 TB
    * swap countDistinct for approx_count_distinct exactly like
    * [[Profile.profileApprox]] if the Expand dominates. */
  def datasetCard(docs: DataFrame): DataFrame =
    docs.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"),
        sum(col("n_chars").cast("bigint")).as("total_chars"),
        sum(size(tokensCol(col("text"))).cast("bigint"))
          .as("total_tokens"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)" +
          " AS BIGINT)").as("p50_chars"),
        expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars)" +
          " AS BIGINT)").as("p99_chars"),
        max(col("n_chars").cast("bigint")).as("max_chars"))
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("n_distinct_texts"),
        expr("(n_docs - n_distinct_texts) * 1000000L div n_docs")
          .as("dup_doc_ppm"),
        col("total_chars"), col("total_tokens"),
        col("p50_chars"), col("p99_chars"), col("max_chars"))

  /** Frequency-weighted cosine similarity between SOURCES over their
    * token-count vectors — the companion of the x244 shingle-Jaccard
    * overlap matrix: Jaccard sees shared PHRASES, cosine sees shared
    * VOCABULARY DISTRIBUTION, and a source pair high on one but not
    * the other is exactly the mirror-vs-same-register distinction a
    * mixing policy cares about. Emitted as cos²·1e4 — dot²/(‖a‖²‖b‖²)
    * needs no square root, so the whole statistic is one exact
    * integer rational (counts are non-negative, cos² is monotone in
    * cos). All products in DECIMAL(38,0).
    *
    * Scale shape: per-(source, token) counts are one keyed agg; the
    * pair join is keyed by TOKEN, so per-token work is bounded by
    * |sources|² (the x244 discipline), never corpus². Pairs sharing
    * no token are absent (cos = 0). Output: (s1, s2, cos2_x10k),
    * s1 < s2, ordered. */
  def sourceCosineMatrix(docs: DataFrame): DataFrame = {
    val tc = tokens(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val norms = tc.groupBy("source")
      .agg(sum((col("c").cast("decimal(38,0)") * col("c"))).as("nsq"))
    val dot = tc.as("a").join(tc.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(sum(col("a.c").cast("decimal(38,0)") * col("b.c")).as("dot"))
    dot
      .join(norms.select(col("source").as("s1"), col("nsq").as("n1")),
        Seq("s1"))
      .join(norms.select(col("source").as("s2"), col("nsq").as("n2")),
        Seq("s2"))
      .select(col("s1"), col("s2"),
        expr("CAST(dot * dot * 10000 div (n1 * n2) AS BIGINT)")
          .as("cos2_x10k"))
      .orderBy("s1", "s2")
  }

  /** Hapax-legomena ratio per source: the share of each source's
    * vocabulary occurring exactly once — the classic lexical-richness
    * signal that separates natural prose (hapax-heavy, Zipf tail
    * intact) from templated/generated text (hapax-poor: the generator
    * reuses its phrasebook). Complements the type-token ratio
    * ([[stats]]) which conflates richness with length, and the
    * Gini-Simpson diversity (x139) which weights the HEAD of the
    * distribution where hapax measures the TAIL.
    *
    * One (source, token) keyed count, one source rollup — integer
    * exact. Output: (source, n_tok, n_types, n_hapax, hapax_ppm),
    * ordered by source. */
  def hapaxRatio(docs: DataFrame): DataFrame = {
    val counts = tokens(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    counts.groupBy("source")
      .agg(sum("c").as("n_tok"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tok"), col("n_types"), col("n_hapax"),
        expr("n_hapax * 1000000 div n_types").as("hapax_ppm"))
      .orderBy("source")
  }

  /** RAG CHUNK MANIFEST: fixed-size token windows with overlap — the
    * retrieval-pipeline chunker (split every document into
    * `chunkTokens`-token chunks advancing by chunkTokens − overlap),
    * as a STABLE manifest: (doc, chunk, start, length, first/last
    * token), a pure function of the text, so embeddings and serving
    * indexes built from it can always be traced back to exact spans
    * and regenerated bit-identically.
    *
    * Chunk count is INTEGER arithmetic — ceil((n_tok − N)/step) via
    * (a + step − 1) div step, no floats — and the boundary-token
    * lookups are postings equi-joins on (doc, pos): document text
    * never shuffles; only the manifest rows move. The last chunk
    * keeps its natural short length (>= overlap + 1), never padded,
    * never dropped — the two classic chunker bugs.
    *
    * Output: (doc_id, chunk_id 0-based, start_pos 1-based, chunk_len,
    * first_token, last_token), ordered by (doc_id, chunk_id);
    * zero-token documents have no chunks. */
  def ragChunks(docs: DataFrame, chunkTokens: Int,
                overlap: Int): DataFrame = {
    require(chunkTokens >= 2 && overlap >= 0 && overlap < chunkTokens,
      s"need 2 <= chunkTokens and 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    val post = CacheRegistry.pin(tokens(docs))
    val nt = post.groupBy("doc_id").agg(max("pos").as("n_tok"))
    val manifest = nt.select(col("doc_id"), col("n_tok"),
        explode(expr(s"sequence(0, IF(n_tok <= $chunkTokens, 0, " +
          s"(n_tok - $chunkTokens + ${step - 1}) div $step))"))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("bigint").as("chunk_id"),
        (col("chunk_id") * step + 1).cast("bigint").as("start_pos"),
        least(lit(chunkTokens.toLong),
          col("n_tok") - col("chunk_id") * step).as("chunk_len"))
    val f = post.select(col("doc_id").as("fd"), col("pos").as("fp"),
      col("w").as("first_token"))
    val l = post.select(col("doc_id").as("ld"), col("pos").as("lp"),
      col("w").as("last_token"))
    manifest
      .join(f, col("fd") === col("doc_id") &&
        col("fp") === col("start_pos"))
      .join(l, col("ld") === col("doc_id") &&
        col("lp") === col("start_pos") + col("chunk_len") - 1)
      .select(col("doc_id"), col("chunk_id"), col("start_pos"),
        col("chunk_len"), col("first_token"), col("last_token"))
      .orderBy("doc_id", "chunk_id")
  }

  /** PHRASE SEARCH over a positional inverted index — the retrieval
    * serve shape (distinct from the x89 PMI statistics and the dedup
    * family's shingle DETECTION): the corpus is indexed ONCE as
    * (term, doc, pos) postings, and a phrase query then touches only
    * its terms' postings — two bounded equi-joins, never a corpus
    * scan. Queried here with the corpus's own top-`topN` bigrams
    * (deterministic: ties to the lexicographically smallest), each
    * answered in two modes a search engine serves:
    *  - exact adjacency (pos2 = pos1 + 1 — the quoted-phrase match);
    *  - proximity within 3 (0 < pos2 - pos1 <= 3 — the NEAR operator;
    *    a superset of exact by construction).
    *
    * Scale shape: postings build is one narrow posexplode; the top-N
    * pick is a TakeOrdered over the bigram grid; each query joins
    * postings ON (doc, pos) equi-keys with the tiny query list
    * broadcast into BOTH probes. At 100 TB the postings table is the
    * serve index you'd persist (x260's build-once discipline); query
    * cost is postings-of-terms, not corpus.
    *
    * Output: (w1, w2, n_occ_exact, n_docs_exact, n_occ_within3,
    * n_docs_within3), ordered by (w1, w2). */
  def phraseSearch(docs: DataFrame, topN: Int): DataFrame = {
    require(topN >= 1 && topN <= 100, s"topN in [1,100]; got $topN")
    val post = CacheRegistry.pin(tokens(docs))
    val adj = post.as("a").join(post.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") === col("a.pos") + 1)
      .select(col("a.w").as("w1"), col("b.w").as("w2"))
    val top = adj.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1"), col("w2")).limit(topN)
      .select("w1", "w2")
    val q1 = post.join(broadcast(top), col("w") === col("w1"))
      .select(col("w1"), col("w2"), col("doc_id").as("d"),
        col("pos").as("p1"))
    val p2 = post.select(col("doc_id").as("d2"), col("w").as("wq"),
      col("pos").as("p2"))
    val hits = q1.join(p2,
        col("d2") === col("d") && col("wq") === col("w2") &&
          col("p2") > col("p1") && col("p2") <= col("p1") + 3)
      .select(col("w1"), col("w2"), col("d"),
        (col("p2") === col("p1") + 1).as("exact"))
    hits.groupBy("w1", "w2")
      .agg(sum(when(col("exact"), 1L).otherwise(0L)).as("n_occ_exact"),
        countDistinct(when(col("exact"), col("d"))).as("n_docs_exact"),
        count(lit(1)).as("n_occ_within3"),
        countDistinct(col("d")).as("n_docs_within3"))
      .orderBy("w1", "w2")
  }

  /** Intra-document repetition audit — the Gopher-style "repetitious
    * document" quality rule: per doc the duplicate-word fraction
    * (1 - types/tokens), the most-frequent-word share, and the
    * duplicate-bigram fraction, each as an exact ppm. A doc whose
    * top word dominates or whose bigrams collapse onto a few types
    * is boilerplate/spam, not prose — these three columns are the
    * standard filter inputs.
    *
    * Scale shape: tokens and bigrams are built in-row (transform over
    * the token array), then two map-side-combinable keyed aggregates
    * per doc — the shuffle carries (doc_id, term) counts, never text
    * pair sets. Output one row per doc. */
  def repetitionAudit(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id").cast("bigint").as("doc_id"),
      tokensCol(col("text")).as("t"))
    val wordAgg = toks
      .select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"), count(lit(1)).as("n_types"),
        max("c").as("top_c"))
    val biAgg = toks
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(t) < 2 THEN array()
          |ELSE transform(sequence(1, size(t) - 1),
          |  i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))
          |END""".stripMargin)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), count(lit(1)).as("n_bitypes"))
    wordAgg.join(biAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_types"),
        expr("(n_words - n_types) * 1000000 div n_words").as("dup_word_ppm"),
        expr("top_c * 1000000 div n_words").as("top_word_ppm"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("(n_bigrams - n_bitypes) * 1000000 div n_bigrams"),
          lit(0L)).as("dup_bigram_ppm"))
      .orderBy("doc_id")
  }

  /** Per-source vocabulary divergence from the corpus in WHOLE-BIT
    * surprise (the flog2 = length(bin n) - 1 quantization the
    * perplexity tiers use — engine-identical, no floating log): for
    * each word occurrence, the corpus-model surprise
    * flog2(N) - flog2(c_corpus) minus the source-model surprise
    * flog2(n_s) - flog2(c_s), summed — a KL-divergence analog telling
    * which sources are lexically OFF-DISTRIBUTION and need their own
    * mixing weight. Whole-bit quantization means individual terms can
    * be negative; the aggregate ranks sources correctly and is exact.
    *
    * Scale shape: one (source, word) count (map-side combinable), one
    * word-keyed corpus rollup, everything after on those bounded
    * vocabulary tables; the scalar total is broadcast back. */
  def vocabDivergence(docs: DataFrame): DataFrame = {
    def flog2(c: Column): Column = (length(bin(c)) - 1).cast("bigint")
    val sc = docs
      .select(col("source"), explode(tokensCol(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val corpus = sc.groupBy("w").agg(sum("c").as("cc"))
    val nS = sc.groupBy("source").agg(sum("c").as("n_s"))
    val nTot = corpus.agg(sum("cc").as("n_tot"))
    sc.join(corpus, Seq("w"))
      .join(broadcast(nS), Seq("source"))
      .crossJoin(broadcast(nTot))
      .groupBy(col("source"), col("n_s"))
      .agg(sum(col("c") * (flog2(col("n_tot")) - flog2(col("cc"))))
          .as("cross_bits"),
        sum(col("c") * (flog2(col("n_s")) - flog2(col("c"))))
          .as("self_bits"))
      .select(col("source"), col("n_s").as("n_tokens"), col("cross_bits"),
        col("self_bits"),
        (col("cross_bits") - col("self_bits")).as("div_bits"),
        expr("(cross_bits - self_bits) * 1000 div n_s")
          .as("div_millibits_per_tok"))
      .orderBy("source")
  }

  /** CHARACTER-CLASS profile per source: lowercase / uppercase /
    * digit / whitespace / other fractions of all characters, exact
    * ppm — the first-glance encoding-and-genre audit (code corpora
    * run punctuation-heavy, shouty scraped text runs uppercase-heavy,
    * table dumps run digit-heavy), and the cheap canary for mojibake
    * (the "other" bucket absorbs every non-ASCII byte sequence).
    * Class counts come from length deltas under class-targeted
    * regexp_replace — no per-character explode, no UDF; identical
    * RE2/Java character-class semantics both engines.
    *
    * Scale shape: one narrow projection computing five integer
    * lengths per doc in-row (whole-stage codegen), then a single
    * map-side-combinable keyed aggregate. Output: (source, n_docs,
    * n_chars, lower_ppm, upper_ppm, digit_ppm, space_ppm, other_ppm),
    * ordered by source. */
  def charClassProfile(docs: DataFrame): DataFrame = {
    def cnt(cls: String): Column =
      length(col("text")) - length(regexp_replace(col("text"), cls, ""))
    docs.select(col("source"), length(col("text")).as("n"),
        cnt("[a-z]").as("lo"), cnt("[A-Z]").as("up"),
        cnt("[0-9]").as("di"), cnt("[ \\t\\n\\r]").as("sp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("n_chars"),
        sum("lo").as("lo"), sum("up").as("up"), sum("di").as("di"),
        sum("sp").as("sp"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        expr("lo * 1000000 div n_chars").as("lower_ppm"),
        expr("up * 1000000 div n_chars").as("upper_ppm"),
        expr("di * 1000000 div n_chars").as("digit_ppm"),
        expr("sp * 1000000 div n_chars").as("space_ppm"),
        expr("(n_chars - lo - up - di - sp) * 1000000 div n_chars")
          .as("other_ppm"))
      .orderBy("source")
  }

  /** ZIPF-CURVE audit in whole bits: corpus word frequencies at
    * power-of-two ranks (1, 2, 4, …, 2^maxDoubling), each with its
    * flog2 and the bit DROP from the previous power — a Zipfian
    * corpus loses ~1 bit per rank doubling; a flat curve (synthetic /
    * template text) or a cliff (boilerplate spam) shows immediately.
    * Ties rank deterministically by (freq desc, word asc); everything
    * integer, so the curve is oracle-exact.
    *
    * Scale shape: one map-side-combinable word count, then a bounded
    * TOP-2^maxDoubling take (TakeOrderedAndProject — never a global
    * sort of the vocabulary) and a |2^maxDoubling|-row local window.
    *
    * Output: (rank, word, freq, flog2_freq, drop_bits — NULL at
    * rank 1), ordered by rank. */
  def zipfAudit(docs: DataFrame, maxDoubling: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxDoubling >= 1 && maxDoubling <= 20,
      s"maxDoubling must be in [1, 20]; got $maxDoubling")
    val top = (1 << maxDoubling)
    val counts = docs
      .select(explode(tokensCol(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(top)
    val wr = Window.orderBy(col("freq").desc, col("w"))
    counts
      .withColumn("rank", row_number().over(wr).cast("bigint"))
      .where(expr("(rank & (rank - 1)) = 0")) // powers of two
      .withColumn("flog2_freq", (length(bin(col("freq"))) - 1).cast("bigint"))
      .withColumn("drop_bits",
        lag("flog2_freq", 1).over(Window.orderBy("rank")) - col("flog2_freq"))
      .select(col("rank"), col("w").as("word"), col("freq"),
        col("flog2_freq"), col("drop_bits"))
      .orderBy("rank")
  }

  /** VOCABULARY-SIZING curve: for each candidate vocab size 2^j
    * (top-2^j words by frequency, ties by word asc), the exact
    * fraction of corpus TOKEN OCCURRENCES left out-of-vocabulary —
    * the tokenizer-budget tradeoff read directly (double the vocab,
    * watch the OOV mass halve or not). The cum machinery runs only
    * over the top-2^maxDoubling slice, never the full vocabulary.
    *
    * Scale shape: one map-side-combinable word count, a bounded
    * TOP-2^maxDoubling take (TakeOrderedAndProject), a cum window
    * over those <= 2^maxDoubling rows, and the scalar total broadcast
    * back. Output: (vocab_size, covered_tokens, oov_tokens, oov_ppm),
    * ordered by vocab_size; sizes past the actual vocabulary are
    * absent. */
  def oovCurve(docs: DataFrame, maxDoubling: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxDoubling >= 1 && maxDoubling <= 20,
      s"maxDoubling must be in [1, 20]; got $maxDoubling")
    val counts = docs
      .select(explode(tokensCol(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val tot = counts.agg(sum("freq").as("n_tokens"))
    val top = counts.orderBy(col("freq").desc, col("w"))
      .limit(1 << maxDoubling)
    val wr = Window.orderBy(col("freq").desc, col("w"))
    top
      .withColumn("rank", row_number().over(wr).cast("bigint"))
      .withColumn("covered", sum("freq").over(
        wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(expr("(rank & (rank - 1)) = 0"))
      .crossJoin(broadcast(tot))
      .select(col("rank").as("vocab_size"),
        col("covered").as("covered_tokens"),
        (col("n_tokens") - col("covered")).as("oov_tokens"),
        expr("(n_tokens - covered) * 1000000 div n_tokens").as("oov_ppm"))
      .orderBy("vocab_size")
  }

  /** READABILITY AUDIT per language: corpus-pooled Flesch reading
    * ease in exact milli units from three regex counts per document —
    * words = latin-letter runs, sentences = terminal-punctuation runs
    * (floored at 1 per doc), syllables = vowel-group runs in the
    * lowercased text (the standard public heuristic; exact syllable
    * counting needs a dictionary). Pooled, not per-doc-averaged:
    * flesch_milli = 206835 - 1015·W div S - 84600·Y div W over the
    * per-language sums, with both numerators widened to
    * DECIMAL(38,0) (DuckDB twin: HUGEINT) — 84600·Y wraps BIGINT
    * near ~1e14 syllables, inside 100 TB range. The training-mix
    * knob: a source whose flesch collapses is OCR garbage or legal
    * boilerplate, not prose.
    *
    * Scale shape: ONE corpus pass computing the three codegen'd
    * regexp_count columns, one map-side-combinable per-lang sum;
    * nothing else touches the corpus.
    *
    * Output: (lang, n_docs, words, sentences, syllables,
    * words_per_sentence_milli, syllables_per_word_milli,
    * flesch_milli) ordered by lang. */
  def readability(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        expr("regexp_count(text, '[A-Za-z]+')").cast("bigint").as("w"),
        greatest(expr("regexp_count(text, '[.!?]+')").cast("bigint"),
          lit(1L)).as("s"),
        expr("regexp_count(lower(text), '[aeiouy]+')").cast("bigint")
          .as("y"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("words"),
        sum("s").as("sentences"), sum("y").as("syllables"))
      .select(col("lang"), col("n_docs"), col("words"),
        col("sentences"), col("syllables"),
        expr("words * 1000 div sentences")
          .as("words_per_sentence_milli"),
        expr("syllables * 1000 div words")
          .as("syllables_per_word_milli"),
        expr("206835 - CAST(CAST(1015 AS DECIMAL(38,0)) * words" +
          " div sentences AS BIGINT)" +
          " - CAST(CAST(84600 AS DECIMAL(38,0)) * syllables" +
          " div words AS BIGINT)").as("flesch_milli"))
      .orderBy("lang")

  /** TERM BURSTINESS (Katz's observation, public IR statistic): for
    * the k most frequent tokens, occurrences-per-containing-document
    * in milli (burst_milli = n_total·1000 div n_docs) beside document
    * frequency in ppm — a term that is frequent because EVERY doc
    * mentions it once (df high, burst ≈ 1000) behaves like a
    * stopword; one that is frequent because a few docs repeat it
    * (df low, burst high) is topical or boilerplate. The
    * stopword-vs-template separator run before trusting TF-IDF
    * weights or building [[vocabPruning]] lists.
    *
    * Scale shape: one tokenize+explode pass aggregated twice
    * map-side ((term, doc) then term — the same envelope as
    * [[topTokens]]); the doc total is one broadcast scalar; top-k is
    * a TakeOrdered, never a global sort.
    *
    * Output: (term, n_total, n_docs, burst_milli, df_ppm) — top k by
    * (n_total desc, term). */
  def termBurstiness(docs: DataFrame, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be positive; got $k")
    val td = docs
      .select(col("doc_id"), explode(split(lower(col("text")),
        "[^a-z0-9]+")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("term", "doc_id").agg(count(lit(1)).as("c"))
    val terms = td.groupBy("term")
      .agg(sum("c").as("n_total"), count(lit(1)).as("n_docs"))
    terms.crossJoin(broadcast(
        docs.agg(countDistinct("doc_id").as("n_all_docs"))))
      .select(col("term"), col("n_total"), col("n_docs"),
        expr("n_total * 1000 div n_docs").as("burst_milli"),
        expr("n_docs * 1000000 div n_all_docs").as("df_ppm"))
      .orderBy(col("n_total").desc, col("term"))
      .limit(k)
  }

  /** DOCUMENT-LEVEL TERM CO-OCCURRENCE with independence lift for the
    * top-m terms by document frequency: for each ordered pair
    * (t1 < t2), n_both = docs containing both, and lift_milli =
    * n_both·N·1000 div (df1·df2) — the expected co-occurrence under
    * independence is df1·df2/N, so lift 1000 = independent, ≫1000 =
    * the terms travel together (topic or template), ≪1000 = they
    * repel (register separation). The document-level companion to the
    * adjacency-window [[pmiBigrams]]; the n_both·N product is widened
    * to DECIMAL(38,0) (DuckDB twin: HUGEINT).
    *
    * Scale shape: the top-m vocabulary is a broadcast TakeOrdered;
    * the per-doc presence table is then at most m rows per doc
    * (left-semi against the broadcast), and the pair join is an
    * equi-join ON doc_id of that m-bounded table — corpus-sized
    * input, m²-bounded output, never a token×token blowup.
    *
    * Output: (t1, t2, n_both, df1, df2, lift_milli) ordered by
    * (n_both desc, t1, t2), observed pairs only. */
  def termCooccurrence(docs: DataFrame, m: Int = 10): DataFrame = {
    require(m >= 2 && m <= 1000, s"m must be in [2, 1000]; got $m")
    val presence = docs
      .select(col("doc_id"), explode(split(lower(col("text")),
        "[^a-z0-9]+")).as("term"))
      .where(length(col("term")) > 0)
      .distinct()
    val dfTab = presence.groupBy("term").agg(count(lit(1)).as("df"))
    val top = dfTab.orderBy(col("df").desc, col("term")).limit(m)
    val kept = presence
      .join(broadcast(top), Seq("term"))
      .select(col("doc_id"), col("term"), col("df"))
    kept.as("x")
      .join(kept.as("y"), col("x.doc_id") === col("y.doc_id")
        && col("x.term") < col("y.term"))
      .groupBy(col("x.term").as("t1"), col("y.term").as("t2"),
        col("x.df").as("df1"), col("y.df").as("df2"))
      .agg(count(lit(1)).as("n_both"))
      .crossJoin(broadcast(
        docs.agg(countDistinct("doc_id").as("n_all"))))
      .select(col("t1"), col("t2"), col("n_both"), col("df1"),
        col("df2"),
        expr("CAST(CAST(n_both AS DECIMAL(38,0)) * n_all * 1000" +
          " div (CAST(df1 AS DECIMAL(38,0)) * df2) AS BIGINT)")
          .as("lift_milli"))
      .orderBy(col("n_both").desc, col("t1"), col("t2"))
  }

  /** SHINGLE SATURATION CURVE: for k = 1..maxK, the total and
    * distinct word-k-shingle counts and distinct_ppm — the curve
    * that picks the MinHash/containment shingle size: at small k the
    * space saturates (distinct_ppm tiny — everything collides, LSH
    * bands are all noise), at large k shingles approach uniqueness
    * (distinct_ppm → 1e6 — dedup recall dies). The knee is the k the
    * dedup family should run at; this measures it on the real corpus
    * instead of folklore (k=5..9 for web text).
    *
    * Scale shape: per k, one explode of in-row k-gram arrays (built
    * with transform/slice — no self-join) into a distinct count;
    * the k loop is over a literal ≤8 — each pass is
    * map-side-combinable and the union table has maxK rows.
    *
    * Output: (k, n_shingles, n_distinct, distinct_ppm) ordered by k. */
  def shingleSaturation(docs: DataFrame, maxK: Int = 6): DataFrame = {
    require(maxK >= 1 && maxK <= 8, s"maxK must be in [1, 8]; got $maxK")
    val toks = docs.select(split(lower(col("text")), "[^a-z0-9]+")
      .as("t")).select(expr("filter(t, x -> length(x) > 0)").as("t"))
    val perK = (1 to maxK).map { k =>
      toks
        // sequence(1, 0) DESCENDS in Spark — the short-doc branch
        // must return an empty array explicitly
        .select(explode(expr(
          s"CASE WHEN size(t) >= $k THEN" +
            s" transform(sequence(1, size(t) - $k + 1)," +
            s" i -> array_join(slice(t, i, $k), ' '))" +
            " ELSE array() END")).as("s"))
        .agg(count(lit(1)).as("n_shingles"),
          countDistinct("s").as("n_distinct"))
        .select(lit(k.toLong).as("k"), col("n_shingles"),
          col("n_distinct"),
          expr("n_distinct * 1000000 div n_shingles")
            .as("distinct_ppm"))
    }
    perK.reduce(_ unionAll _).orderBy("k")
  }

  /** CHAO1 VOCABULARY RICHNESS (one row): observed vocabulary V,
    * singleton/doubleton counts n1/n2, the Chao1 lower-bound estimate
    * of the TRUE vocabulary V + n1² div (2·n2) (Chao 1984 — public
    * estimator; the classic bias-corrected (n1(n1−1)) div (2(n2+1))
    * rides along and stays finite at n2 = 0), and Good-Turing sample
    * coverage 1e6 − n1·1e6 div N ppm — "how much of the language have
    * we actually seen", the number that says whether MORE DATA will
    * keep growing the vocab ([[vocabGrowth]] measures the curve;
    * this estimates its asymptote). All integer-exact.
    *
    * Scale shape: one tokenize+count pass to the (term, count)
    * table, one aggregate over it. n1² stays BIGINT — exact to ~3e9
    * singletons.
    *
    * Output: (n_tokens, v_obs, n1, n2, chao1, chao1_bc,
    * coverage_ppm). */
  def chao1Richness(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(explode(split(lower(col("text")), "[^a-z0-9]+"))
        .as("term"))
      .where(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("c"))
    tf.agg(sum("c").as("n_tokens"), count(lit(1)).as("v_obs"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("n_tokens"), col("v_obs"), col("n1"), col("n2"),
        expr("v_obs + n1 * n1 div nullif(2 * n2, 0)").as("chao1"),
        expr("v_obs + n1 * (n1 - 1) div (2 * (n2 + 1))")
          .as("chao1_bc"),
        expr("1000000 - n1 * 1000000 div n_tokens")
          .as("coverage_ppm"))
  }

  /** ENCODING-DAMAGE audit per source — the crawl-hygiene check run
    * before any tokenizer sees the text: counts of the four classic
    * damage signatures (U+FFFD replacement characters from decode
    * failures; 'Ã'-led mojibake digraphs from UTF-8 read as Latin-1;
    * unescaped HTML entities from half-done extraction; raw C0 control
    * characters) plus the share of documents carrying ANY of them.
    * Damaged text poisons BPE merges and n-gram statistics silently —
    * this audit prices it per source so the fix lands at the ingester
    * that caused it.
    *
    * Scale shape: four regexp counts in one narrow projection (no
    * shuffle), one keyed aggregate by source.
    *
    * Output: (source, n_docs, n_replacement, n_mojibake, n_entity,
    * n_ctrl, damaged_ppm), ordered by source. */
  def encodingDamage(docs: DataFrame): DataFrame =
    encodingDamageFromCounts(
      damageCounts(docs)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("r").as("n_replacement"), sum("m").as("n_mojibake"),
          sum("e").as("n_entity"), sum("c").as("n_ctrl"),
          sum(when(col("r") + col("m") + col("e") + col("c") > 0, 1L)
            .otherwise(0L)).as("dmg")))

  /** Per-document damage counters (source, r, m, e, c) — the narrow
    * in-row stage shared by the batch audit and the streaming monitor
    * (each arriving document is scored once, state carries only the
    * per-source sums). */
  private[graft] def damageCounts(docs: DataFrame): DataFrame = {
    def cnt(re: String) =
      size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long")
    val entityRe = "&(amp|lt|gt|quot|apos|#[0-9]+);"
    val ctrlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
    docs.select(col("source"),
      cnt("\\uFFFD").as("r"), cnt("\\u00C3.").as("m"),
      cnt(entityRe).as("e"), cnt(ctrlRe).as("c"))
  }

  /** Serve-time finishing stage over the bounded per-source counter
    * table — exposed so the streaming monitor
    * ([[graft.streaming.Streaming.streamDamage]]) drains its
    * complete-mode state into the SAME arithmetic (drained == batch,
    * checked by the shared oracle). */
  def encodingDamageFromCounts(agg: DataFrame): DataFrame =
    agg
      .select(col("source"), col("n_docs"), col("n_replacement"),
        col("n_mojibake"), col("n_entity"), col("n_ctrl"),
        expr("dmg * 1000000 div n_docs").as("damaged_ppm"))
      .orderBy("source")
}
