package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality gate (beyond-reference,
  * SURVEY.md §2.8): score every document by how "LM-likely" its token
  * stream is under a bigram model TRAINED ON THE CORPUS ITSELF, then
  * bucket the corpus into head / middle / tail perplexity tertiles —
  * the filtering rule of the CCNet pipeline (Wenzek et al., 2020),
  * where a downstream run keeps head+middle and drops the tail.
  *
  * The model is add-one-smoothed: P(w2|w1) = (c(w1 w2) + 1) /
  * (c(w1 *) + V) with V the unigram vocabulary size, so unseen
  * continuations get mass and every probability is a ratio of two
  * positive integers.
  *
  * Engine-exact scoring — no floating log anywhere: each bigram
  * occurrence contributes
  *
  *   nb = floor(log2(c1 + V)) - floor(log2(c2 + 1))   [>= 0 "negbits"]
  *
  * with floor(log2 n) computed as `length(bin(n)) - 1` — the integer
  * bit length both Spark and DuckDB print identically (no leading
  * zeros) — a whole-bit quantization of -log2 P. Per-document
  * "centibits per token" ppl_cbit = (100 * sum nb) div n_bigrams is
  * pure non-negative integer arithmetic (truncation == floor), and the
  * head/middle tertile thresholds are derived from an integer
  * cumulative histogram, NOT a percentile function — so the whole
  * gate, thresholds included, is bit-reproducible across engines
  * (same trick family as the x84/x148 ln-free scores).
  *
  * Scale shape: one narrow bigram explode, two keyed count
  * aggregations (bigram counts, prefix counts) joined back on their
  * natural keys, one per-doc aggregation. The only window runs over
  * the TINY ppl histogram (cardinality bounded by the score range,
  * ~hundreds of rows), never over documents; V and the thresholds are
  * 1-row broadcasts. At 100 TB the model tables are the (w1) / (w1,w2)
  * count tables every distributed LM trainer builds — shuffles carry
  * counts, never text.
  */
object LmQuality {

  /** Per-document LM quality score + tertile bucket.
    * Output: (doc_id, n_big, bits, ppl_cbit, bucket, keep) where
    * n_big = bigram occurrences, bits = summed negbits, ppl_cbit =
    * centibits/bigram (-1 for docs with < 2 tokens, bucketed 'tail'),
    * bucket in head|middle|tail, keep = bucket != 'tail'. */
  def lmQualityGate(docs: DataFrame): DataFrame =
    lmQualityGateTokens(docs.select(col("doc_id"),
      TextStats.tokensCol(col("text")).as("t")))

  /** [[lmQualityGate]] over an already-tokenized frame (doc_id, t) —
    * the path [[Curation]]'s staged profile takes, where the corpus
    * token arrays were computed once up front and every stage reuses
    * them instead of re-running the tokenizer regex. */
  def lmQualityGateTokens(toksIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pin ONCE: the token arrays feed four branches
    // (bigram counts, prefix counts, vocabulary, per-doc scoring) —
    // without the pin each branch would re-scan and re-tokenize the
    // raw corpus, the single-scan violation Curation guards against
    val toks = CacheRegistry.pin(toksIn.select(col("doc_id"), col("t")))
    // per-doc DISTINCT bigram counts — scoring never touches the
    // occurrence level again: a pair occurring k times in a doc is one
    // (doc, w1, w2, k) row, scored once and weighted by k. Versus the
    // occurrence-level formulation (join every bigram occurrence to
    // the model tables), the model join input shrinks from
    // |occurrences| to |distinct pairs per doc| and the prefix counts
    // come from the (much smaller) pair-count table instead of a
    // second pass over occurrences. Integer-identical: sum over
    // occurrences of nb == sum over pairs of k * nb.
    val dbc = CacheRegistry.pin(
      toks.select(col("doc_id"), explode(expr(
          """CASE WHEN size(t) < 2 THEN array()
            |ELSE transform(sequence(1, size(t) - 1),
            |  i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))
            |END""".stripMargin)).as("bg"))
        .groupBy(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .agg(count(lit(1)).as("cnt")))
    // the model: bigram counts, bigram-prefix counts (rolled up from
    // the bigram counts — same integers, one less corpus pass),
    // vocabulary size
    // pinned: bc feeds the prefix rollup AND the pair-score join —
    // unpinned, the corpus bigram aggregate ran once per consumer
    val bc = CacheRegistry.pin(
      dbc.groupBy("w1", "w2").agg(sum("cnt").as("c2")))
    val pc = bc.groupBy("w1").agg(sum("c2").as("c1"))
    val vocab = toks.select(explode(col("t")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    // score every DISTINCT pair: whole-bit -log2 of the smoothed
    // conditional; c2 + 1 <= c1 + V always, so nb >= 0
    val pairScore = bc.join(pc, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        ((length(bin(col("c1") + col("v"))) - 1) -
         (length(bin(col("c2") + lit(1))) - 1)).cast("bigint").as("nb"))
    // pinned: the scored frame feeds THREE consumers (the doc count,
    // the threshold histogram, and the final per-doc join) — without
    // the pin the whole scoring join re-executes per consumer
    val scored = CacheRegistry.pin(dbc.join(pairScore, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_big"), sum(col("cnt") * col("nb")).as("bits"))
      .select(col("doc_id"), col("n_big"), col("bits"),
        expr("(100 * bits) div n_big").as("ppl_cbit")))
    // integer tertile thresholds from the cumulative score histogram:
    // t_k = smallest ppl whose cumulative doc count reaches
    // ceil(k*n/3); the window runs over the tiny histogram only
    val nRow = scored.agg(count(lit(1)).as("n"))
    val hist = scored.groupBy("ppl_cbit").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        Window.orderBy("ppl_cbit")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val thr = hist.crossJoin(broadcast(nRow))
      .agg(
        min(when(col("cum") >= expr("(n + 2) div 3"), col("ppl_cbit")))
          .as("t1"),
        min(when(col("cum") >= expr("(2 * n + 2) div 3"), col("ppl_cbit")))
          .as("t2"))
    toks.select("doc_id").join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(thr))
      .select(col("doc_id"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        coalesce(col("bits"), lit(0L)).as("bits"),
        coalesce(col("ppl_cbit"), lit(-1L)).as("ppl_cbit"),
        when(col("n_big").isNull, "tail")
          .when(col("ppl_cbit") <= col("t1"), "head")
          .when(col("ppl_cbit") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
      .withColumn("keep", col("bucket") =!= "tail")
      .orderBy("doc_id")
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by the log likelihood RATIO of its token stream under a
    * unigram model of a TARGET slice vs the raw pool, and keep the top
    * quartile — the "make the corpus look like the target domain"
    * selection step, here with deterministic top-k in place of Gumbel
    * resampling so the result is reproducible and judgeable.
    *
    * Both models are add-one-smoothed over the shared vocabulary V:
    * p_t(w) = (c_t(w)+1)/(N_t+V), p_r(w) = (c_r(w)+1)/(N_r+V). Each
    * token occurrence contributes the whole-bit quantization
    *
    *   nb = [fl2(c_t+1) + fl2(N_r+V)] - [fl2(c_r+1) + fl2(N_t+V)]
    *
    * (fl2 = integer bit length - 1, printable identically in both
    * engines), a signed integer; per-doc wpt_cb = (100 * sum nb) div
    * n_tok. The keep threshold is the LARGEST score whose
    * descending-cumulative doc count reaches ceil(n/4), derived from
    * the tiny integer score histogram — engine-exact end to end, like
    * [[lmQualityGate]]'s tertiles.
    *
    * Scale shape: two keyed unigram count tables + a 1-row broadcast
    * of totals; scoring is one join per count table on the token key
    * and one per-doc aggregation; the only window runs over the
    * histogram. Shuffles carry counts, never text.
    *
    * Output: (doc_id, n_tok, wbits, wpt_cb, keep); wpt_cb is NULL for
    * tokenless docs (kept = false). */
  def importanceSelect(docs: DataFrame, isTarget: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = CacheRegistry.pin(docs.select(col("doc_id"),
      isTarget.as("is_t"),
      explode(TextStats.tokensCol(col("text"))).as("w")))
    val cr = toks.groupBy("w").agg(count(lit(1)).as("cr"))
    val ct = toks.where(col("is_t")).groupBy("w")
      .agg(count(lit(1)).as("ct"))
    val tot = toks.agg(count(lit(1)).as("nr"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("nt"),
      count_distinct(col("w")).as("v"))
    def fl2(c: Column): Column = (length(bin(c)) - 1).cast("bigint")
    val terms = toks
      .join(cr, Seq("w")).join(ct, Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        (fl2(coalesce(col("ct"), lit(0L)) + 1) + fl2(col("nr") + col("v"))
          - fl2(col("cr") + 1) - fl2(col("nt") + col("v"))).as("nb"))
    val scored = CacheRegistry.pin(terms.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("nb").as("wbits"))
      .select(col("doc_id"), col("n_tok"), col("wbits"),
        expr("(100 * wbits) div n_tok").as("wpt_cb")))
    val nRow = scored.agg(count(lit(1)).as("n"))
    val hist = scored.groupBy("wpt_cb").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        Window.orderBy(col("wpt_cb").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val thr = hist.crossJoin(broadcast(nRow))
      .agg(max(when(col("cum") >= expr("(n + 3) div 4"), col("wpt_cb")))
        .as("t"))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(thr))
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("wbits"), lit(0L)).as("wbits"),
        col("wpt_cb"),
        (col("wpt_cb").isNotNull && col("wpt_cb") >= col("t")).as("keep"))
      .orderBy("doc_id")
  }

  /** One row per n-gram occurrence: (doc_id, w1..wn). */
  private def ngrams(docs: DataFrame, n: Int): DataFrame = {
    val fields = (1 to n).map(i =>
      s"element_at(t, i + ${i - 1}) AS w$i").mkString(", ")
    docs.select(col("doc_id"), TextStats.tokensCol(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(t) < $n THEN array()
           |ELSE transform(sequence(1, size(t) - ${n - 1}),
           |  i -> struct($fields))
           |END""".stripMargin)).as("g"))
      .select(col("doc_id") +: (1 to n).map(i => col(s"g.w$i").as(s"w$i")): _*)
  }

  /** Stupid-backoff trigram scoring (Brants et al. 2007), held-out
    * shape: the model — trigram counts c3, trigram-prefix counts c12,
    * backoff bigram counts cb, bigram-prefix counts pc, vocabulary V —
    * is trained on `train` only; every `score` document is then scored
    * per trigram occurrence, in whole centibits:
    *
    *   seen trigram:  nb = 100 * (flog2(c12) - flog2(c3))
    *   unseen:        nb = 132 + 100 * (flog2(pc + V) - flog2(cb + 1))
    *
    * where flog2(n) = length(bin(n)) - 1 (the integer bit length both
    * engines agree on — no floating log), 132 = round(-100*log2(0.4))
    * is the stupid-backoff penalty for the fixed alpha = 0.4, and the
    * backoff distribution is the add-one bigram so it is total. Unlike
    * [[lmQualityGate]] (trained and scored on the same corpus, so
    * every n-gram is seen) the held-out split genuinely exercises the
    * backoff branch, and the judged `hits` column pins the branch mix.
    *
    * Scale shape: the model tables are the keyed n-gram count
    * aggregates every distributed LM trainer builds; scoring is four
    * left joins on their natural keys plus one per-doc aggregation —
    * shuffles carry counts, never text. Output: (doc_id, n_tri, hits,
    * bits_cb, ppl_cb) with ppl_cb = -1 for docs under 3 tokens. */
  def stupidBackoffScore(train: DataFrame, score: DataFrame): DataFrame = {
    val tri = CacheRegistry.pin(ngrams(train, 3))
    val big = CacheRegistry.pin(ngrams(train, 2))
    val c3 = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val c12 = tri.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val cb = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .select(col("w1").as("bw1"), col("w2").as("bw2"), col("cb"))
    val pc = big.groupBy("w1").agg(count(lit(1)).as("pc"))
      .select(col("w1").as("pw1"), col("pc"))
    val vocab = train
      .select(explode(TextStats.tokensCol(col("text"))).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    def flog2(c: Column): Column = (length(bin(c)) - 1).cast("bigint")
    val terms = ngrams(score, 3)
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(c12, Seq("w1", "w2"), "left")
      .join(cb, col("w2") === col("bw1") && col("w3") === col("bw2"), "left")
      .join(pc, col("w2") === col("pw1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        when(col("c3").isNotNull, 1L).otherwise(0L).as("hit"),
        when(col("c3").isNotNull,
            lit(100L) * (flog2(col("c12")) - flog2(col("c3"))))
          .otherwise(lit(132L) + lit(100L) *
            (flog2(coalesce(col("pc"), lit(0L)) + col("v")) -
             flog2(coalesce(col("cb"), lit(0L)) + lit(1L)))).as("nb"))
    val scored = terms.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"), sum("hit").as("hits"),
        sum("nb").as("bits_cb"))
      .select(col("doc_id"), col("n_tri"), col("hits"), col("bits_cb"),
        expr("(bits_cb) div n_tri").as("ppl_cb"))
    score.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("bits_cb"), lit(0L)).as("bits_cb"),
        coalesce(col("ppl_cb"), lit(-1L)).as("ppl_cb"))
      .orderBy("doc_id")
  }
}
