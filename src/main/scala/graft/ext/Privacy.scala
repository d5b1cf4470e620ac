package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operators (beyond-reference, SURVEY.md §2.8). Training
  * corpora that carry user attributes need re-identification guards
  * before release; k-anonymity via generalization ladders is the
  * standard table-shaped one (PII text scrubbing is TextStats.scrub).
  */
object Privacy {

  /** k-anonymize by local recoding over a generalization ladder.
    *
    * `levels(l)` is the quasi-identifier tuple at generalization
    * level l (level 0 finest; a dimension generalized away becomes a
    * `lit("*")`). Records are assigned the FINEST level at which
    * their residual equivalence class reaches `k`:
    *
    *   residual_0 = all records;
    *   level(r) = l  if  |{r' in residual_l : qi_l(r') = qi_l(r)}| >= k;
    *   residual_{l+1} = residual_l minus the level-l satisfied;
    *   leftovers after the coarsest level are SUPPRESSED
    *   (level = levels.size, every QI = '*').
    *
    * Counting each level over the RESIDUAL (not the full table) is
    * what makes the guarantee compositional: a level-l output class
    * is exactly a residual group of size >= k, so every emitted
    * non-suppressed class has >= k members. Callers conventionally
    * drop the suppressed rows (they are flagged, not silently lost).
    *
    * Scale shape: one keyed count + equi-join per ladder level (the
    * ladder is 2-4 rungs), each over a strictly shrinking residual;
    * per-round frames are pinned because two branches (emit, next
    * residual) consume them. No windows, no driver traffic.
    *
    * Output: (id, level, qiNames*: generalized values as strings),
    * totally ordered by id.
    */
  def kAnonymize(df: DataFrame, idCol: String, qiNames: Seq[String],
                 levels: Seq[Seq[Column]], k: Long): DataFrame = {
    val m = qiNames.length
    require(k >= 2, s"k must be >= 2; got $k")
    require(levels.nonEmpty && levels.forall(_.length == m),
      "every generalization level needs one expression per QI name")
    val base = df.select(
      col(idCol).as("id") +: levels.zipWithIndex.flatMap { case (qs, l) =>
        qs.zipWithIndex.map { case (q, i) => q.cast("string").as(s"q${l}_$i") }
      }: _*)
    var residual = base
    val emitted = levels.indices.map { l =>
      val keys = (0 until m).map(i => s"q${l}_$i")
      val cnts = residual.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("cnt"))
      val joined = CacheRegistry.pin(residual.join(cnts, keys))
      residual = joined.where(col("cnt") < k).drop("cnt")
      joined.where(col("cnt") >= k)
        .select(col("id") +: lit(l).as("level") +:
          keys.zip(qiNames).map { case (q, n) => col(q).as(n) }: _*)
    }
    val suppressed = residual.select(
      col("id") +: lit(levels.size).as("level") +:
        qiNames.map(n => lit("*").as(n)): _*)
    (emitted :+ suppressed).reduce(_ unionByName _).orderBy("id")
  }

  /** Join-preserving pseudonymization: the identifier column is
    * replaced by a keyed deterministic surrogate — md5(salt ':' id) —
    * so the same id maps to the same token EVERYWHERE (joins,
    * sessionization and per-user aggregation still work across tables
    * and runs sharing the salt) while the raw id never leaves the
    * boundary. Deterministic tokenization is the release-pipeline
    * default precisely because it needs no mapping table to protect:
    * rotate the salt and every token rotates.
    *
    * A narrow per-row projection — no shuffle, no state, no lookup
    * join; at 100 TB it rides inside whatever scan already runs.
    * (md5 here is a PSEUDONYM generator, not a secrecy proof — a
    * 64-bit id space is enumerable by an attacker who knows the salt;
    * treat the salt as a secret key.) */
  def pseudonymize(df: DataFrame, idCol: String, salt: String): DataFrame =
    df.withColumn(s"${idCol}_token",
        md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
      .drop(idCol)

  /** Right-to-be-forgotten PURGE audit: given a victim key set, the
    * per-table cascade accounting (how many rows a delete request
    * touches, and an exact checksum of what remains) across a
    * customer → orders → lineitem FK chain plus a directly-keyed
    * events table — the ledger a GDPR erasure job emits BEFORE the
    * destructive rewrite, and the reconciliation target AFTER it.
    *
    * Cascade: orders of a victim customer purge; lineitems of a
    * purged order purge (two-level FK walk as two key joins — the
    * victim list broadcasts, the fact tables are touched by exactly
    * one scan each). Checksums are key sums in DECIMAL(38,0)
    * (overflow-safe at any scale, emitted as BIGINT like every other
    * judged integer); lineitem's non-unique key contributes
    * l_orderkey·7 + l_linenumber.
    *
    * Output: one row per table — (tbl, n_purged, n_retained,
    * retained_key_sum), ordered by tbl. */
  def purgeAudit(customer: DataFrame, orders: DataFrame,
                 lineitem: DataFrame, events: DataFrame,
                 victims: DataFrame): DataFrame = {
    val v = broadcast(victims.select(col("k")).distinct())
    def audit(df: DataFrame, name: String, fk: Column,
              keySum: Column): DataFrame =
      df.join(v, fk === col("k"), "left")
        .agg(
          sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("n_purged"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_retained"),
          sum(when(col("k").isNull, keySum.cast("decimal(38,0)"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("s"))
        .select(lit(name).as("tbl"), col("n_purged"), col("n_retained"),
          col("s").cast("bigint").as("retained_key_sum"))
    val purgedOrders = broadcast(
      orders.join(v, col("o_custkey") === col("k"), "left_semi")
        .select(col("o_orderkey").as("k")))
    audit(customer, "customer", col("c_custkey"), col("c_custkey"))
      .unionAll(audit(orders, "orders", col("o_custkey"), col("o_orderkey")))
      .unionAll(lineitem.join(purgedOrders,
          col("l_orderkey") === col("k"), "left")
        .agg(
          sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("n_purged"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_retained"),
          sum(when(col("k").isNull,
            (col("l_orderkey") * 7 + col("l_linenumber"))
              .cast("decimal(38,0)"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("s"))
        .select(lit("lineitem").as("tbl"), col("n_purged"),
          col("n_retained"), col("s").cast("bigint").as("retained_key_sum")))
      .unionAll(audit(events, "events", col("user_id"), col("event_id")))
      .orderBy("tbl")
  }

  /** L-DIVERSITY audit — the disclosure check k-anonymity alone
    * misses: a class can hold k rows and still leak, because every
    * row shares the SAME sensitive value (the homogeneity attack —
    * "all 12 patients in that ZIP+age class have the same
    * diagnosis"). Per quasi-identifier class this audit measures both
    * axes: class size (k) and distinct sensitive values (l), and
    * rolls up how much of the table sits in violating classes under
    * the given thresholds — the one-row go/no-go a release review
    * reads before publishing.
    *
    * Scale shape: ONE keyed aggregation over the QI grid (size +
    * distinct-sensitive in the same pass), then a 1-row rollup —
    * never a per-class loop, never a row-level self-join.
    *
    * Output: one row (n_classes, n_rows, k_violating_classes,
    * rows_at_risk_k, l_violating_classes, rows_at_risk_l,
    * min_class_size, min_l). */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitive: Column, k: Long, l: Long): DataFrame = {
    require(k >= 1 && l >= 1, s"k and l must be >= 1; got k=$k l=$l")
    val cls = df.select(qiCols.map(col) :+ sensitive.as("__s"): _*)
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"), countDistinct(col("__s")).as("ldiv"))
    cls.agg(count(lit(1)).as("n_classes"), sum("sz").as("n_rows"),
      sum(when(col("sz") < k, 1L).otherwise(0L))
        .as("k_violating_classes"),
      sum(when(col("sz") < k, col("sz")).otherwise(0L))
        .as("rows_at_risk_k"),
      sum(when(col("ldiv") < l, 1L).otherwise(0L))
        .as("l_violating_classes"),
      sum(when(col("ldiv") < l, col("sz")).otherwise(0L))
        .as("rows_at_risk_l"),
      min("sz").as("min_class_size"), min("ldiv").as("min_l"))
  }
}
