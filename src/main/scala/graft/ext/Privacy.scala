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

  /** t-CLOSENESS audit (Li et al., ICDE 2007) for an ORDERED numeric
    * sensitive attribute: per quasi-identifier class, the ordered
    * earth-mover distance between the class's sensitive-value
    * distribution and the GLOBAL one,
    *   D = (1/(m-1)) * sum_{i<m} |cumP_i - cumQ_i|
    * over the m global distinct values — the guard k-anonymity and
    * l-diversity both miss (a class can be k-large and l-diverse yet
    * have every salary in the top decile). Exact integers: the cum
    * fractions cross-multiply to |cumA_i*n_g - cumG_i*n| and the ppm
    * divides once at the end, DECIMAL(38,0)-widened past the BIGINT
    * wrap (DuckDB twin: HUGEINT).
    *
    * Scale shape: one (class, value) count (map-side combinable), a
    * grid of classes x global distinct values (bounded by the value
    * domain, not the row count), one cum window per class partition,
    * and the global cum table broadcast back — the same machinery as
    * [[Profile.wassersteinDrift]] with the t-closeness normalization.
    *
    * Output: (qi, n_rows, emd_ppm), ordered by qi. */
  def tCloseness(df: DataFrame, qiCol: String, sensitive: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vc = df.select(col(qiCol).as("qi"), sensitive.as("v"))
      .groupBy("qi", "v").agg(count(lit(1)).as("c"))
    val glob = vc.groupBy("v").agg(sum("c").as("cg"))
    val qis = vc.select("qi").distinct()
    // both cum series run inside the SAME per-class window — no
    // global single-partition pass anywhere
    val grid = qis.crossJoin(broadcast(glob))
      .join(vc, Seq("qi", "v"), "left").na.fill(0L, Seq("c"))
    val wq = Window.partitionBy("qi").orderBy("v")
    val nG = vc.groupBy("qi").agg(sum("c").as("n_g"))
    val tot = glob.agg(sum("cg").as("n"), count(lit(1)).as("m"))
    grid
      .withColumn("cum_q", sum("c").over(wq))
      .withColumn("cum_g", sum("cg").over(wq))
      .join(broadcast(nG), Seq("qi"))
      .crossJoin(broadcast(tot))
      // the i = m term has cum_q*n == cum_g*n_g; dropping it via the
      // rank filter would cost a second window — it contributes 0
      .groupBy(col("qi"), col("n_g"), col("n"), col("m"))
      .agg(sum(abs(col("cum_q") * col("n") - col("cum_g") * col("n_g")))
        .as("steps"))
      .select(col("qi"), col("n_g").as("n_rows"),
        expr("CAST(CAST(steps AS DECIMAL(38,0)) * 1000000" +
          " div (n_g * n * (m - 1)) AS BIGINT)").as("emd_ppm"))
      .orderBy("qi")
  }

  /** USER-CONTRIBUTION bounding audit — the pre-flight for any
    * per-user sensitivity cap (DP aggregate releases, dedup-by-user
    * sampling, abuse throttles): per cell, how many rows the heaviest
    * user contributes, the discrete p99 of rows-per-user, and exactly
    * how many rows a clamp at that p99 would drop. The clamp budget
    * in ppm is the number release engineering actually negotiates.
    *
    * Scale shape: one (cell, user) count (map-side combinable), one
    * keyed aggregate for the per-cell stats including the discrete
    * p99 (an exact member of the multiset, so both engines agree
    * bit-for-bit), then one re-aggregate of the SAME bounded
    * (cell, user) table against the broadcast p99 row for the excess
    * sum. Nothing row-shaped crosses twice.
    *
    * Output: (cell, n_rows, n_users, max_rows_user, p99_rows,
    * excess_rows, excess_ppm), ordered by cell. */
  def contributionBounds(df: DataFrame, cellCol: String,
                         userCol: String): DataFrame = {
    val cu = df.where(col(userCol).isNotNull)
      .select(col(cellCol).as("cell"), col(userCol).as("u"))
      .groupBy("cell", "u").agg(count(lit(1)).as("c"))
    val stats = cu.groupBy("cell")
      .agg(sum("c").as("n_rows"), count(lit(1)).as("n_users"),
        max("c").as("max_rows_user"),
        expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY c)" +
          " AS BIGINT)").as("p99_rows"))
    cu.join(broadcast(stats), Seq("cell"))
      .groupBy(col("cell"), col("n_rows"), col("n_users"),
        col("max_rows_user"), col("p99_rows"))
      .agg(sum(greatest(col("c") - col("p99_rows"), lit(0L)))
        .as("excess_rows"))
      .select(col("cell"), col("n_rows"), col("n_users"),
        col("max_rows_user"), col("p99_rows"), col("excess_rows"),
        expr("excess_rows * 1000000 div n_rows").as("excess_ppm"))
      .orderBy("cell")
  }
}
