package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators over a corpus DataFrame(doc_id, text, ...).
  *
  * Beyond-reference surface (SURVEY.md §2.8). Scale design notes — each
  * stage is a standard distributed-dedup building block:
  *
  *  - EXACT: hash-aggregate on the content key (or its md5, so the
  *    shuffle carries 16 bytes instead of document bodies).
  *  - SHINGLE JOIN (n-gram Jaccard): an inverted index doc↔shingle,
  *    self-joined on the shingle key. The shuffle is keyed by shingle,
  *    so work distributes by content, not by document — hot shingles
  *    (stopword runs) are the skew risk; at 100 TB you'd drop the top
  *    percentile of shingle frequencies first (stop-shingle filter),
  *    which also removes the quadratic blowup of common shingles.
  *  - MINHASH + LSH BANDING: signatures shrink each doc to k hashes;
  *    banding turns near-dup search into an equality join on
  *    (band, signature) — the classic sub-quadratic path. Candidates
  *    are then verified with exact Jaccard (no false positives kept).
  *  - SIMHASH: per-doc 16-bit sketch via bitwise majority vote over
  *    token hashes; one narrow pass + one aggregation by doc.
  *
  * Determinism contract: all hashes are md5 hex strings (identical in
  * Spark and DuckDB); a "min over md5 strings" is a valid uniform
  * minhash permutation. Jaccard is emitted as floor(10000*i/u).
  */
object Dedup {

  /** Per-source exact-dedup accounting: total vs distinct texts. */
  def exactStats(docs: DataFrame): DataFrame =
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("text")).as("n_uniq"))
      .orderBy("source")

  /** Distinct word 3-gram shingles per document: (doc_id, shingle).
    * Built by position-joining the token stream against itself — a
    * narrow self-join per doc_id (co-partitioned by doc_id). */
  def shingles3(docs: DataFrame): DataFrame = {
    val t = TextStats.tokens(docs)
    val a = t.as("a"); val b = t.as("b"); val c = t.as("c")
    a.join(b, col("a.doc_id") === col("b.doc_id") &&
              col("b.pos") === col("a.pos") + 1)
     .join(c, col("a.doc_id") === col("c.doc_id") &&
              col("c.pos") === col("a.pos") + 2)
     .select(col("a.doc_id").as("doc_id"),
       concat_ws(" ", col("a.w"), col("b.w"), col("c.w")).as("shingle"))
     .distinct()
  }

  /** All document pairs with shingle-Jaccard >= threshold, via the
    * inverted-index self-join. Output: (d1, d2, jac_x10k). */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingles3(docs).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val x = sh.as("x"); val y = sh.as("y")
    val inter = x.join(y, col("x.shingle") === col("y.shingle") &&
                          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .where(col("i").cast("double") / (col("s1.n") + col("s2.n") - col("i")) >= threshold)
      .select(col("d1"), col("d2"),
        floor(lit(10000.0) * col("i") / (col("s1.n") + col("s2.n") - col("i")))
          .cast("bigint").as("jac_x10k"))
      .orderBy("d1", "d2")
  }

  /** MinHash signature element i of a shingle: md5 keyed by i. A min
    * over these hex strings per (doc, i) is minhash_i(doc). */
  private def mh(i: Column, shingle: Column): Column =
    md5(concat(i.cast("string"), lit(":"), shingle))

  /** MinHash(k=8) + LSH(2 bands x 4 rows) near-dup candidates, verified
    * with exact Jaccard. Output: (d1, d2, jac_x10k) for all candidate
    * pairs that share at least one band signature. */
  def minhashLshPairs(docs: DataFrame): DataFrame = {
    val sh = shingles3(docs).cache()
    // signatures: doc x i in [0,8) -> min md5
    val sig = sh
      .select(col("doc_id"), col("shingle"), explode(sequence(lit(0), lit(7))).as("i"))
      .groupBy("doc_id", "i")
      .agg(min(mh(col("i"), col("shingle"))).as("m"))
    // 2 bands of 4 rows: band = i % 2, rows selected by floor(i/2)
    def rowOf(r: Int): Column =
      min(when(floor(col("i") / 2.0).cast("bigint") === r, col("m")))
    val bands = sig.groupBy(col("doc_id"), (col("i") % 2).as("band"))
      .agg(md5(concat_ws(":", rowOf(0), rowOf(1), rowOf(2), rowOf(3))).as("sig"))
    val a = bands.as("a"); val b = bands.as("b")
    val cand = a.join(b, col("a.band") === col("b.band") &&
                         col("a.sig") === col("b.sig") &&
                         col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    // verify candidates with exact Jaccard (reusing the shingle index)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val x = sh.as("x"); val y = sh.as("y")
    val inter = x.join(y, col("x.shingle") === col("y.shingle") &&
                          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .agg(count(lit(1)).as("i"))
    cand.join(inter, Seq("d1", "d2"))
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        floor(lit(10000.0) * col("i") / (col("s1.n") + col("s2.n") - col("i")))
          .cast("bigint").as("jac_x10k"))
      .orderBy("d1", "d2")
  }

  /** 16-bit SimHash per document: majority vote over the first 4 md5
    * nibbles (16 bits) of each token occurrence. One narrow explode plus
    * two keyed aggregations — no joins. Output: (doc_id, simhash). */
  def simhash(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bitsTable = Seq((0, 1), (1, 2), (2, 4), (3, 8)).toDF("b", "mask")
    val nibbles = TextStats.tokens(docs)
      .select(col("doc_id"), explode(sequence(lit(1), lit(4))).as("j"), col("w"))
      .select(col("doc_id"), col("j"),
        (expr("instr('0123456789abcdef', substr(md5(w), j, 1))") - 1).as("v"))
    val bits = nibbles.crossJoin(broadcast(bitsTable))
      .groupBy(col("doc_id"), ((col("j") - 1) * 4 + col("b")).as("pos"))
      .agg(sum(when(col("v").bitwiseAND(col("mask")) > 0, 1).otherwise(-1)).as("s"))
    bits.groupBy("doc_id")
      .agg(sum(when(col("s") >= 0,
          pow(lit(2), col("pos")).cast("bigint")).otherwise(0L))
        .cast("bigint").as("simhash"))
      .orderBy("doc_id")
  }
}
