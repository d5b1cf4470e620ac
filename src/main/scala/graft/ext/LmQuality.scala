package graft.ext

import org.apache.spark.sql.DataFrame
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
  def lmQualityGate(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tokenize ONCE and pin: the token arrays feed four branches
    // (bigram counts, prefix counts, vocabulary, per-doc scoring) —
    // without the pin each branch would re-scan and re-tokenize the
    // raw corpus, the single-scan violation Curation guards against
    val toks = CacheRegistry.pin(docs.select(col("doc_id"),
      TextStats.tokensCol(col("text")).as("t")))
    val bigrams = CacheRegistry.pin(
      toks.select(col("doc_id"), explode(expr(
          """CASE WHEN size(t) < 2 THEN array()
            |ELSE transform(sequence(1, size(t) - 1),
            |  i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))
            |END""".stripMargin)).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2")))
    // the model: bigram counts, bigram-prefix counts, vocabulary size
    val bc = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val pc = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = toks.select(explode(col("t")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    // score every occurrence: whole-bit -log2 of the smoothed
    // conditional; c2 + 1 <= c1 + V always, so nb >= 0
    val terms = bigrams
      .join(bc, Seq("w1", "w2")).join(pc, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        ((length(bin(col("c1") + col("v"))) - 1) -
         (length(bin(col("c2") + lit(1))) - 1)).cast("bigint").as("nb"))
    val scored = terms.groupBy("doc_id")
      .agg(count(lit(1)).as("n_big"), sum("nb").as("bits"))
      .select(col("doc_id"), col("n_big"), col("bits"),
        expr("(100 * bits) div n_big").as("ppl_cbit"))
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
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
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
}
