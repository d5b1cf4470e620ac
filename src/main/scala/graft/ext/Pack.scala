package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk preparation step of LLM
  * pretraining: documents are concatenated in a deterministic order and
  * cut into fixed-size context windows, so every training sequence is
  * full and no padding is wasted.
  *
  * Beyond-reference surface (SURVEY.md §2.8); no analog in localsql.
  *
  * Scale design: a single GLOBAL concatenation order would serialize the
  * corpus through one window partition — the classic cumsum scale trap.
  * Instead documents are first routed to a content-hash BUCKET (a pure
  * function of doc_id, so the layout is reproducible across runs and
  * engines) and packed independently within each bucket:
  *
  *  - token counting is a narrow per-row map (no shuffle);
  *  - the only shuffle is the window partitioned BY BUCKET — at 100 TB
  *    you raise `buckets` to ~100k so each window partition holds
  *    corpus/buckets documents, and all buckets pack in parallel;
  *  - a document's pack is decided by the running token total at its own
  *    START (`cum - tokens`), the standard greedy streaming rule: a doc
  *    beginning inside window w belongs to pack w, and long docs spill
  *    into later packs exactly as a sequential concatenation would cut
  *    them.
  *
  * Everything is exact integer arithmetic on counts, so the packing —
  * and the judged aggregate per pack — is engine-portable.
  */
object Pack {

  /** Assign each document to (bucket, pack_id) for a `window`-token
    * context, 16 md5 buckets. Returns one row per document:
    * (doc_id, bucket, n_tok, pack_id, off) where `off` is the token
    * offset of the document inside its bucket's concatenation. */
  def assignPacks(docs: DataFrame, window: Int): DataFrame =
    assignPacksCounted(docs.select(col("doc_id"),
      // whitespace tokens: cheap, deterministic, and identical to
      // DuckDB's string_split on the same text
      size(split(col("text"), " ")).cast("bigint").as("n_tok")), window)

  /** [[assignPacks]] with the whitespace token count already computed —
    * the path [[Curation]]'s staged profile takes (`counts` = (doc_id,
    * n_tok)): the packing stage then never touches document text at
    * all, only the two-integer manifest. */
  def assignPacksCounted(counts: DataFrame, window: Int): DataFrame = {
    val toks = counts.select(col("doc_id"),
      col("n_tok").cast("bigint").as("n_tok"),
      // 16-way content-hash bucket: first hex nibble of md5(doc_id)
      (instr(lit("0123456789abcdef"),
        substring(md5(col("doc_id").cast("string")), 1, 1)) - 1)
        .cast("bigint").as("bucket"))
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("bucket"), col("n_tok"),
        (col("cum") - col("n_tok")).as("off"),
        floor((col("cum") - col("n_tok")).cast("double") / window)
          .cast("bigint").as("pack_id"))
  }

  /** Split-and-carry packing — the overflow policy of real context
    * window prep: a document whose token range crosses a pack boundary
    * (or is longer than the window outright) is SPLIT at every
    * boundary it crosses and the remainder carried into the next pack,
    * so every pack holds exactly `window` tokens (except each bucket's
    * last) and every token of every document lands in exactly one pack
    * segment (both properties spec-guarded; ExtSpec stitches the
    * segments back). Output: one row per (document, pack) segment —
    * (bucket, pack_id, doc_id, seg_no, seg_off, seg_len) with seg_off
    * the token offset of the segment INSIDE its document.
    *
    * Pure integer arithmetic on [[assignPacks]]'s running offsets: a
    * doc occupying [off, off + n_tok) of its bucket's concatenation
    * intersects packs off div w .. (off + n_tok - 1) div w; the
    * explode is in-row (narrow), so the only shuffle is still the
    * bucket-partitioned window behind assignPacks. */
  def packSegments(docs: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    assignPacks(docs, window)
      .select(col("bucket"), col("doc_id"), col("n_tok"), col("off"),
        explode(expr(
          s"sequence(off div $window, (off + n_tok - 1) div $window)"))
          .as("pack_id"))
      .select(col("bucket"), col("pack_id"), col("doc_id"),
        (col("pack_id") - expr(s"off div $window") + 1).as("seg_no"),
        (greatest(col("off"), col("pack_id") * window) - col("off"))
          .as("seg_off"),
        (least(col("off") + col("n_tok"), (col("pack_id") + 1) * window) -
          greatest(col("off"), col("pack_id") * window)).as("seg_len"))
      .orderBy("bucket", "pack_id", "doc_id", "seg_no")
  }

  /** Judged rollup: one row per (bucket, pack_id) with document count,
    * token total, and the id range packed — the manifest a downstream
    * tokenizer job would consume. */
  def packManifest(docs: DataFrame, window: Int): DataFrame =
    manifestOf(assignPacks(docs, window))

  /** [[packManifest]] over precomputed (doc_id, n_tok) counts — see
    * [[assignPacksCounted]]. */
  def packManifestCounted(counts: DataFrame, window: Int): DataFrame =
    manifestOf(assignPacksCounted(counts, window))

  private def manifestOf(assigned: DataFrame): DataFrame =
    assigned
      .groupBy("bucket", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").cast("bigint").as("n_tok"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("bucket", "pack_id")

  /** Packing-efficiency audit — the numbers that justify (or indict)
    * a context-window choice before a tokenizer job burns GPU-hours:
    * per bucket, the split-and-carry pack count IS the LP lower bound
    * ceil(tokens/window) by construction, so the only waste is the
    * final pack's padding (pad_last); the PRICE of that optimality is
    * split documents — n_split_docs cross a pack boundary and
    * carried_tok of their tokens land outside their first pack
    * (attention-mask fragmentation). carry_ppm is the corpus-health
    * dial: it rises as window shrinks toward the median doc length.
    *
    * Pure rollup over [[assignPacks]]'s running offsets (a doc
    * occupying [off, off+n_tok) splits iff its first and last token
    * fall in different packs; tokens past the first boundary are
    * off+n_tok − (off div w + 1)·w, clamped at 0) — the only shuffle
    * is still the bucket-partitioned window behind assignPacks.
    *
    * Output: (bucket, n_docs, n_tok, n_packs, pad_last, n_split_docs,
    * carried_tok, carry_ppm), ordered by bucket. */
  def packingAudit(docs: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    assignPacks(docs, window)
      .select(col("bucket"), col("n_tok"), col("off"),
        (expr(s"(off + n_tok - 1) div $window") =!=
          expr(s"off div $window")).as("split"),
        greatest(lit(0L), col("off") + col("n_tok") -
          (expr(s"off div $window") + 1) * window).as("carried"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tok"),
        sum(when(col("split"), 1L).otherwise(0L)).as("n_split_docs"),
        sum("carried").as("carried_tok"))
      .select(col("bucket"), col("n_docs"), col("n_tok"),
        expr(s"(n_tok + ${window - 1}) div $window").as("n_packs"),
        expr(s"(n_tok + ${window - 1}) div $window * $window - n_tok")
          .as("pad_last"),
        col("n_split_docs"), col("carried_tok"),
        expr("carried_tok * 1000000 div n_tok").as("carry_ppm"))
      .orderBy("bucket")
  }

  /** TOKEN-BALANCED training-shard manifest — the output-sharding step
    * after packing chooses windows: a pretraining corpus is written as
    * N shard files, and a shard that carries more token mass than its
    * siblings is the straggler every data-parallel epoch waits on. A
    * plain hash split balances DOCUMENT counts, not tokens (long-doc
    * skew rides straight through); greedy LPT balances best but is
    * inherently sequential. The standard deterministic middle ground is
    * SERPENTINE (boustrophedon) assignment over the token-sorted order:
    * rank docs by n_tok descending, deal rank r to shard r mod N on
    * even laps and to shard N-1-(r mod N) on odd laps, so each lap's
    * biggest doc lands on the shard the previous lap short-changed.
    * Max spread is bounded by one lap's within-lap variation — in
    * practice a few ppm once docs >> shards.
    *
    * Scale shape: the global rank comes from a range-partitioned sort +
    * zipWithIndex ([[Ids.rankByOrder]], the x132 discipline) — never a
    * single-partition row_number window; the assignment itself is a
    * narrow in-row expression of (rank, N) and the audit is one keyed
    * aggregation. Determinism: (n_tok DESC, doc_id) is a total order,
    * so the manifest is a pure function of the corpus.
    *
    * Balance ratios widen through DECIMAL(38,0) (DuckDB twin: HUGEINT)
    * before the x1e6 scaling, so corpus token totals past BIGINT/1e6
    * (~9e12 tokens) stay exact.
    *
    * Output per shard: (shard, n_docs, n_tok, ppm_of_ideal — this
    * shard's token mass as ppm of total/N, doc_sum — Σ doc_id pinning
    * the exact assignment set, max_doc_tok), ordered by shard. */
  def shardBalance(docs: DataFrame, shards: Int): DataFrame = {
    require(shards >= 2 && shards <= 65536,
      s"shards must be in [2, 65536]; got $shards")
    val counts = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("n_tok"))
    val ranked = Ids.rankByOrder(counts,
      Seq(col("n_tok").desc, col("doc_id")), Seq("doc_id", "n_tok"), "rank")
    val s = shards.toLong
    val assigned = ranked.select(col("doc_id"), col("n_tok"),
      expr(s"CASE WHEN ((rank - 1) div $s) % 2 = 0 THEN (rank - 1) % $s" +
        s" ELSE $s - 1 - ((rank - 1) % $s) END").as("shard"))
    // The grand total comes from the per-shard aggregates themselves —
    // a global window over the grouped result, whose cardinality is
    // bounded by the `shards` parameter (≤65536 rows), NOT the corpus —
    // so the documents frame is scanned and tokenized exactly once.
    // (A separate counts.agg(sum) branch would re-execute the full
    // lineage: a second 100 TB scan for one scalar.)
    assigned.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tok"),
        sum("doc_id").as("doc_sum"), max("n_tok").as("max_doc_tok"))
      .withColumn("tt", sum("n_tok").over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("shard"), col("n_docs"), col("n_tok"),
        expr(s"CAST(CAST(n_tok AS DECIMAL(38,0)) * $s * 1000000 div tt" +
          " AS BIGINT)").as("ppm_of_ideal"),
        col("doc_sum"), col("max_doc_tok"))
      .orderBy("shard")
  }
}
