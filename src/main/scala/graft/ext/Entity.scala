package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity-resolution operators (beyond-reference, SURVEY.md §2.8).
  *
  * Fuzzy record linkage is the attribute-level cousin of document
  * near-dup: free-text entity names ("small bolt" / "cold bolt")
  * carry typos and variant spellings, and resolving them is a
  * blocked candidate-generation + verify problem — never all-pairs.
  *
  * Determinism: Levenshtein distance is an exact integer in both
  * Spark (`levenshtein`) and DuckDB (`levenshtein`) — no floats
  * anywhere, so results are bit-identical across engines.
  */
object Entity {

  /** Fuzzy match over the DISTINCT values of `nameCol`: pairs of
    * different names within `maxDist` edits, each with its record
    * support count.
    *
    * Scale shape (the standard ER pipeline):
    *  1. names are deduplicated FIRST — the match runs on the
    *     distinct-value table (vocabulary-sized), never on records;
    *  2. multi-pass token blocking: every whitespace token of a name
    *     is a blocking key, so two names are candidates iff they
    *     share at least one token (a pair within 2 edits of a
    *     multi-word name always shares its unchanged word);
    *  3. block purging: blocks larger than `maxBlock` names are
    *     dropped before pair generation (the classic recall/cost
    *     knob — a stop-word token like "inc" would otherwise
    *     regenerate the quadratic blow-up blocking exists to avoid);
    *  4. `levenshtein` runs only on surviving in-block pairs.
    *
    * Output: (name_a, name_b, dist, cnt_a, cnt_b), name_a < name_b,
    * totally ordered by (name_a, name_b).
    */
  def fuzzyNameMatch(records: DataFrame, nameCol: String, maxDist: Int,
                     maxBlock: Long = 1000L): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8, s"maxDist in [1,8]; got $maxDist")
    val names = records
      .groupBy(col(nameCol).as("name")).agg(count(lit(1)).as("cnt"))
    val blocked = names
      .select(col("name"), col("cnt"),
        explode(split(col("name"), " ")).as("blk"))
      .where(col("blk") =!= "")
    // block purging: drop keys whose block exceeds maxBlock
    val keep = blocked.groupBy("blk").agg(count(lit(1)).as("bn"))
      .where(col("bn") <= maxBlock).select("blk")
    val pruned = blocked.join(keep, Seq("blk"), "left_semi")
    val cand = pruned.as("a")
      .join(pruned.as("b"), col("a.blk") === col("b.blk")
        && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("a.cnt").as("cnt_a"), col("b.cnt").as("cnt_b"))
      .distinct() // a pair sharing two tokens appears once per block
    cand
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "cnt_a", "cnt_b")
      .orderBy("name_a", "name_b")
  }

  /** Golden-record survivorship: after [[fuzzyNameMatch]] pairs are
    * clustered (connected components on the distinct-name graph), fold
    * each entity's records into ONE record by per-attribute rules —
    * the MDM "merge" step that turns resolved duplicates into a
    * master table:
    *  - `modeCol`: plurality value, ties to the smallest (the same
    *    deterministic argmax as label propagation — one
    *    min(struct(-cnt, v)) aggregate);
    *  - `maxCols`: maximum (recency/amount-style columns).
    *
    * Scale shape: matching and clustering run on the vocabulary-sized
    * distinct-name table; records are touched by one equi-join (name
    * -> canonical) and one keyed aggregate per rule family.
    *
    * Output: (canonical, n_records, n_names, <modeCol>,
    * max_<c>...), ordered by canonical. */
  def goldenRecords(records: DataFrame, nameCol: String, maxDist: Int,
                    modeCol: String, maxCols: Seq[String]): DataFrame = {
    val pairs = fuzzyNameMatch(records, nameCol, maxDist)
      .select(col("name_a").as("d1"), col("name_b").as("d2"))
    val names = records.select(col(nameCol).as("doc_id")).distinct()
    val canon = Dedup.clusters(names, pairs)
      .select(col("doc_id").as(nameCol), col("cluster_id").as("canonical"))
    val rec = CacheRegistry.pin(records.join(canon, nameCol))
    val mode = rec.groupBy(col("canonical"), col(modeCol).as("mv"))
      .agg(count(lit(1)).as("c"))
      .groupBy("canonical")
      .agg(min(struct((-col("c")).as("nc"), col("mv").as("v"))).as("m"))
      .select(col("canonical"), col("m.v").as(modeCol))
    val aggs = count(lit(1)).as("n_records") +:
      countDistinct(col(nameCol)).as("n_names") +:
      maxCols.map(c => max(col(c)).as(s"max_$c"))
    val base = rec.groupBy("canonical").agg(aggs.head, aggs.tail: _*)
    base.join(mode, "canonical").orderBy("canonical")
  }
}
