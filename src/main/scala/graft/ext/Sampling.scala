package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting operators for training-data
  * pipelines (beyond-reference, SURVEY.md §2.8).
  *
  * Everything here keys off a content hash (md5 of the row key), never
  * off `rand()`: the assignment of a row is a pure function of the row,
  * so it is reproducible across runs, engines, cluster sizes, and data
  * re-partitionings — the property a 100 TB pipeline needs so that
  * re-running a stage (or backfilling one shard) lands every row in the
  * same split/sample. All operators are a single narrow projection (and,
  * for the stratified summary, one keyed aggregation) — zero shuffles
  * for the per-row outputs, no driver participation.
  *
  * The hash bucket is the first two hex chars of md5 (256 buckets);
  * fixed-length lowercase hex compares lexicographically = numerically,
  * so thresholds are expressed as hex-string literals and the whole
  * decision is engine-portable (md5 is bit-identical everywhere, unlike
  * any float or RNG path).
  */
object Sampling {

  /** 256-bucket content hash of a key column: substr(md5(key), 1, 2). */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  /** Deterministic train/valid/test split: ~80/10/10 by hash bucket
    * (train < 0xcc = 204/256, valid < 0xe6 = 230/256, else test).
    * Output: (key, split) — one narrow pass, no shuffle. */
  def hashSplit(df: DataFrame, key: String): DataFrame =
    df.select(col(key),
        when(hashBucket(col(key)) < "cc", "train")
          .when(hashBucket(col(key)) < "e6", "valid")
          .otherwise("test").as("split"))
      .orderBy(key)

  /** Leakage-safe split: like [[hashSplit]], but the hash is taken of
    * the near-dup CLUSTER id (from [[Dedup.clusters]]' labels), so
    * every member of a cluster lands in the SAME split — near
    * duplicates of a training document can never leak into valid/test,
    * the contamination mode a naive per-document split invites.
    * Singleton clusters (cluster_id == own key) degrade to exactly
    * [[hashSplit]] on the representative.
    *
    * Scale shape: the labels are cluster output (one row per document);
    * the split itself is a narrow map over them — no extra shuffle
    * beyond what clustering already paid. Output:
    * (key, cluster_id, split) ordered by key. */
  def clusterSafeSplit(labels: DataFrame, key: String): DataFrame =
    labels.select(col(key), col("cluster_id"),
        when(hashBucket(col("cluster_id")) < "cc", "train")
          .when(hashBucket(col("cluster_id")) < "e6", "valid")
          .otherwise("test").as("split"))
      .orderBy(key)

  /** Exact-budget proportional mix via LARGEST-REMAINDER apportionment:
    * every stratum gets floor(budget * share) rows, and the leftover
    * seats go one each to the strata with the largest fractional
    * remainders (ties toward the smaller stratum name) — the
    * apportionment rule that makes per-stratum quotas sum EXACTLY to
    * the budget, where independent per-stratum rounding (x91's shape)
    * can land off by one per stratum. Selection inside each stratum is
    * smallest-content-hash-first, so the sample is deterministic and
    * stable under corpus growth. A budget >= the corpus selects
    * everything (row_number caps each quota at the stratum size).
    *
    * All integer arithmetic: quotas are exact BIGINT div/mod of
    * (budget * count) — engine-portable. Scale shape: the
    * apportionment windows run over the per-stratum COUNT table
    * (cardinality = #strata); per-stratum selection is the bounded
    * row_number of [[balancedSample]]. Output: (stratum, key, h) of
    * the selected rows. */
  def quotaMix(df: DataFrame, stratum: String, key: String,
               budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 1 && budget <= Int.MaxValue,
      s"budget must be in [1, ${Int.MaxValue}]; got $budget")
    val counts = df.groupBy(stratum).agg(count(lit(1)).as("c"))
    val quotas = largestRemainder(counts, stratum, budget)
    df.select(col(stratum), col(key), md5(col(key).cast("string")).as("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(stratum).orderBy(col("h"), col(key))))
      .join(quotas, stratum)
      .where(col("rn") <= col("q"))
      .select(col(stratum), col(key), col("h"))
      .orderBy(stratum, key)
  }

  /** Largest-remainder quotas over a (stratum, c) count table:
    * floor(budget * c / total) per stratum plus one extra seat to the
    * largest fractional remainders (ties toward the smaller stratum
    * value) — quotas sum exactly to the budget. The windows run over
    * the count table only (cardinality = #strata). */
  private def largestRemainder(counts: DataFrame, stratum: String,
                               budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = counts.agg(sum("c").as("t"))
    val q0 = counts.crossJoin(broadcast(tot))
      .select(col(stratum), col("c"),
        expr(s"($budget * c) div t").as("q0"),
        expr(s"($budget * c) % t").as("rem"))
    val spare = q0.agg((lit(budget) - sum("q0")).as("r"))
    q0.crossJoin(broadcast(spare))
      .withColumn("seat", row_number().over(
        Window.orderBy(col("rem").desc, col(stratum))))
      .select(col(stratum),
        (col("q0") + when(col("seat") <= col("r"), 1L).otherwise(0L))
          .as("q"))
  }

  /** Distribution-matched resampling: select `budget` NON-target rows
    * whose `covariate` DISTRIBUTION matches the target slice's — the
    * "length-matched corpus sample" of ablations, one step beyond
    * [[matchedControls]]' per-row pairing. The target's covariate
    * range is cut into `bins` quantile bins (exact percentile_disc
    * edges — engine-portable integers, no interpolation); the budget
    * is apportioned across bins by the target's bin shares
    * (largest-remainder, exact); each bin fills
    * smallest-content-hash-first from the pool. Bins the pool can't
    * fill select everything they have (the total then falls short —
    * report, don't silently rebalance).
    *
    * Scale shape: the percentile sort runs per-slice once, binning is
    * a broadcast array probe (narrow map), and the selection windows
    * are the bounded per-bin row_number. Output: (bin, key, cv, h). */
  def distributionMatch(df: DataFrame, isTarget: Column, covariate: String,
                        key: String, budget: Long,
                        bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000]; got $bins")
    require(budget >= 1 && budget <= Int.MaxValue,
      s"budget must be in [1, ${Int.MaxValue}]; got $budget")
    val lab = df.select(col(key), col(covariate).as("cv"), isTarget.as("is_t"))
    val edges = lab.where(col("is_t")).agg(array(
      (1 until bins).map(i => expr(
        s"percentile_disc(${i.toDouble / bins}d)" +
          s" WITHIN GROUP (ORDER BY cv)")): _*).as("edges"))
    def binned(rows: DataFrame): DataFrame =
      rows.crossJoin(broadcast(edges))
        .select(col(key), col("cv"),
          expr("aggregate(edges, 0L, (acc, e) -> acc +" +
            " CASE WHEN cv > e THEN 1L ELSE 0L END)").as("bin"))
    val tgtCounts = binned(lab.where(col("is_t")))
      .groupBy("bin").agg(count(lit(1)).as("c"))
    val quotas = largestRemainder(tgtCounts, "bin", budget)
    binned(lab.where(!col("is_t")))
      .withColumn("h", md5(col(key).cast("string")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("bin").orderBy(col("h"), col(key))))
      .join(quotas, "bin")
      .where(col("rn") <= col("q"))
      .select(col("bin"), col(key), col("cv"), col("h"))
      .orderBy("bin", key)
  }

  /** Matched-control selection: for every TARGET row, the nearest
    * non-target row by a numeric covariate within the same stratum —
    * the control-set construction of data ablations (compare an eval
    * slice against length-matched corpus documents, not the raw pool).
    * Controls are chosen with replacement; nearest = smaller absolute
    * covariate gap, ties broken toward the predecessor in the
    * (covariate, doc_id) total order, so the matching is deterministic.
    *
    * Shape: two IGNORE-NULLS running-last windows over the stratum
    * (forward = nearest control at-or-below, reverse = nearest above)
    * — no self-join, no per-target scan. Windows partition by the
    * stratum, so at 100 TB compose the stratum with a coarse covariate
    * bucket (boundary-approximate, the Pack bucketing trick) to bound
    * partition size. Output: (stratum, target_id, target_cv,
    * control_id, control_cv); controls are NULL when the stratum has
    * no non-target rows. */
  def matchedControls(df: DataFrame, isTarget: Column, covariate: String,
                      stratum: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lab = df.select(col(stratum), col("doc_id"),
      col(covariate).as("cv"), isTarget.as("is_t"))
    val fw = Window.partitionBy(stratum).orderBy(col("cv"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bw = Window.partitionBy(stratum)
      .orderBy(col("cv").desc, col("doc_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ctrl = when(!col("is_t"),
      struct(col("cv"), col("doc_id").as("id")))
    val wnd = lab.select(col(stratum), col("doc_id"), col("cv"),
      col("is_t"),
      last(ctrl, ignoreNulls = true).over(fw).as("bef"),
      last(ctrl, ignoreNulls = true).over(bw).as("aft"))
    val useBef = col("aft").isNull || (col("bef").isNotNull &&
      abs(col("bef.cv") - col("cv")) <= abs(col("aft.cv") - col("cv")))
    wnd.where(col("is_t"))
      .select(col(stratum), col("doc_id").as("target_id"),
        col("cv").as("target_cv"),
        when(useBef, col("bef.id")).otherwise(col("aft.id"))
          .as("control_id"),
        when(useBef, col("bef.cv")).otherwise(col("aft.cv"))
          .as("control_cv"))
      .orderBy(stratum, "target_id")
  }

  /** Balanced per-stratum downsample: exactly `n` rows from every
    * stratum (fewer only if the stratum is smaller), chosen as the n
    * smallest content hashes — the class-balancing step of a training
    * mix (equal documents per source/language regardless of raw skew).
    * Hash-ranked selection keeps the choice deterministic and stable
    * under data growth: a stratum's selection only changes where new
    * rows hash below the old cutoff.
    *
    * Scale shape: one shuffle on the stratum key into a bounded
    * per-group top-n (min_by semantics via window over the hash order —
    * partitions stay bounded by stratum count; rank fn, not a global
    * sort). Output: (stratum, key, h) for the selected rows. */
  def balancedSample(df: DataFrame, stratum: String, key: String,
                     n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(col(stratum), col(key),
        md5(col(key).cast("string")).as("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(stratum).orderBy(col("h"), col(key))))
      .where(col("rn") <= n)
      .select(col(stratum), col(key), col("h"))
      .orderBy(stratum, key)
  }

  /** Stratified deterministic sample summary: within every stratum the
    * SAME hash rule keeps ~keep256/256 of rows, so strata stay
    * proportionally represented without a per-stratum pass or any
    * coordination. Output per stratum: total, kept, and the realized
    * keep rate as an exact x10k ratio. */
  def stratifiedSample(df: DataFrame, stratum: String, key: String,
                       keep256: Int = 64): DataFrame = {
    // keep256 > 255 would format as a 3-char hex ("100") and compare
    // lexicographically BELOW most 2-char buckets — silently keeping
    // ~6% instead of 100% — so validate and special-case "keep all".
    require(keep256 >= 0 && keep256 <= 256,
      s"keep256 must be in [0, 256]; got $keep256")
    val kept: Column =
      if (keep256 == 256) lit(true)
      else hashBucket(col(key)) < f"$keep256%02x"
    df.groupBy(stratum)
      .agg(count(lit(1)).as("n_total"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"))
      .select(col(stratum), col("n_total"), col("n_kept"),
        floor(lit(10000.0) * col("n_kept") / col("n_total"))
          .cast("bigint").as("kept_x10k"))
      .orderBy(stratum)
  }

  /** Reproducible per-epoch shuffle order — the "shuffle differently
    * every epoch, identically on every rerun" primitive of training
    * data loaders: epoch e's permutation ranks rows by
    * md5(e ":" key), a pure function of (epoch, row), so any shard of
    * any epoch can be regenerated independently on any cluster.
    *
    * The rank is materialized WITHOUT the textbook scale killer
    * (`row_number() OVER (PARTITION BY epoch ORDER BY hash)` funnels
    * every epoch through one task): rows are range-partition-sorted by
    * (epoch, hash) and numbered with zipWithIndex — the distributed
    * x132 global-ids shape — then each epoch's offset (epoch * n) is
    * subtracted. Output: (epoch, key, ord) with ord = 0..n-1 inside
    * each epoch. */
  def epochShuffle(df: DataFrame, key: String, epochs: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(epochs >= 1 && epochs <= 1024, s"epochs must be in [1, 1024]")
    val spark = df.sparkSession
    val n = df.count()
    val sorted = df.select(col(key))
      .withColumn("epoch", explode(expr(s"sequence(0, ${epochs - 1})")))
      .select(col("epoch").cast("bigint").as("epoch"), col(key),
        md5(concat(col("epoch").cast("string"), lit(":"),
          col(key).cast("string"))).as("h"))
      .orderBy("epoch", "h", key)
    Ids.zipIndexed(sorted, "gid", 0L)
      .select(col("epoch"), col(key),
        (col("gid") - col("epoch") * n).as("ord"))
      .orderBy("epoch", "ord")
  }

  /** CURRICULUM ordering — the easy-first training schedule beside
    * [[epochShuffle]]'s flat permutation: rows are served tier by tier
    * (ascending difficulty), shuffled DETERMINISTICALLY within each
    * tier by md5(seed ":" key), so any shard of the schedule can be
    * regenerated independently on any cluster and a rerun reproduces
    * the curriculum bit-for-bit.
    *
    * Same scale discipline as epochShuffle: the global position comes
    * from a range-partitioned sort + zipWithIndex (Ids.rankByOrder),
    * never `row_number() OVER (ORDER BY ...)` — a curriculum over
    * 100 TB cannot funnel through one task. Judged on a deterministic
    * systematic sample of the permutation (every 97th position), so
    * the oracle checks the whole ORDER, not just tier totals.
    *
    * Output: (rank — 1-based global position, key, tier), every 97th
    * rank, ordered by rank. */
  def curriculumOrder(df: DataFrame, key: String, tier: Column,
                      seed: String): DataFrame = {
    val d = df.select(col(key), tier.cast("bigint").as("tier"),
      md5(concat(lit(seed), lit(":"), col(key).cast("string"))).as("h"))
    Ids.rankByOrder(d, Seq(col("tier"), col("h"), col(key)),
        Seq("tier", "h", key), "rank")
      .where((col("rank") - 1) % 97 === 0)
      .select(col("rank"), col(key), col("tier"))
      .orderBy("rank")
  }

  /** Token-budget temperature mixing — [[temperatureMix]] with the
    * budget measured in TOKENS, which is what a pretraining mix
    * actually allocates: each stratum gets floor(budget * sqrt(n_s) /
    * Σ sqrt(n)) tokens and fills it greedily in content-hash order —
    * a document is admitted iff the running token total at its own
    * START is below the stratum's target (the same
    * running-sum-at-start rule as sequence packing, so the cut is
    * deterministic and a stratum never overshoots by more than one
    * document's tail). Selection is a pure function of the data;
    * whitespace tokens match the packing/oracle tokenizer.
    *
    * Scale shape: one keyed count for the targets, then one window
    * partitioned BY STRATUM over the hash order for the running sum —
    * the bucketed-cumsum shape of [[Pack.assignPacks]] (a token budget
    * needs a prefix SUM, which no bounded top-k aggregate can carry;
    * partitions stay bounded by stratum count, never global).
    * Output: (stratum, key, n_tok) of the selected rows. */
  /** Epoch WATERFILLING — the repeat-budget allocator a compute-bound
    * training run needs: given per-source native token masses n_s, a
    * total token budget B = total · budNum div budDen, and a repeat cap
    * of `capEpochs` epochs per source (data quality degrades past a few
    * repeats — the Muennighoff et al. 2023 "scaling data-constrained"
    * regime), allocate tokens by water level: every source gets
    * min(cap_s, λ) with the level λ chosen so allocations sum to B.
    * Small sources hit their cap and the surplus flows to larger ones —
    * exactly the "fill the cups" picture, computed in closed form.
    *
    * Everything is exact integer arithmetic on the PER-SOURCE table:
    * caps sorted ascending, one cumulative sum, and the classic
    * monotone test S_k + (m−k)·c_k ≤ B counts how many sources cap out
    * (k*); then λ = (B − S_k*) div (m − k*). The division's remainder
    * r (< m − k*) is distributed +1 to the r alphabetically-first
    * sources with slack (cap > λ), so Σ alloc = B exactly except in
    * the tie case cap = λ (shortfall ≤ ties, deterministic both
    * engines). If B ≥ Σ cap, every source caps and the budget is
    * deliberately underspent — repeating data past the cap is the
    * thing this operator exists to refuse.
    *
    * Scale shape: ONE corpus-wide keyed aggregation (map-side
    * combinable) produces the per-source mass table; every window and
    * cross join after that runs on that TINY table (|sources| rows) —
    * the global sort is bounded by source cardinality, never data.
    *
    * Output: (stratum, native_tokens, cap_tokens, alloc_tokens,
    * epochs_x1000 = alloc·1000 div native), ordered by stratum. */
  def epochWaterfill(df: DataFrame, stratum: String, weight: Column,
                     capEpochs: Int, budNum: Long, budDen: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(capEpochs >= 1 && budNum > 0 && budDen > 0,
      s"bad parameters: cap=$capEpochs budget=$budNum/$budDen")
    val sizes = df.groupBy(col(stratum).as("s"))
      .agg(sum(weight).cast("bigint").as("n"))
      .withColumn("cap", lit(capEpochs.toLong) * col("n"))
    val tot = sizes.agg(sum("n").as("tn"), count(lit(1)).as("m"))
      .select(expr(s"tn * $budNum div $budDen").as("bud"), col("m"))
    val wAsc = Window.orderBy(col("cap"), col("s"))
    val st = sizes.crossJoin(broadcast(tot))
      .withColumn("k", row_number().over(wAsc).cast("bigint"))
      .withColumn("sk", sum(col("cap")).over(
        wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ok",
        col("sk") + (col("m") - col("k")) * col("cap") <= col("bud"))
    val kstar = st.agg(
      sum(when(col("ok"), 1L).otherwise(0L)).as("kstar"),
      coalesce(max(when(col("ok"), col("sk"))), lit(0L)).as("skstar"))
    val based = st.crossJoin(broadcast(kstar))
      .withColumn("lam", when(col("kstar") < col("m"),
        expr("(bud - skstar) div (m - kstar)")))
      .withColumn("base", when(col("k") <= col("kstar"), col("cap"))
        .otherwise(least(col("cap"), col("lam"))))
    val spent = based.agg((max("bud") - sum("base")).as("r"))
    val wBump = Window.orderBy("s")
    val bumped = based.crossJoin(broadcast(spent))
      .withColumn("eligible", col("k") > col("kstar") && col("cap") > col("lam"))
      .withColumn("brank",
        sum(when(col("eligible"), 1L).otherwise(0L)).over(
          wBump.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("alloc", col("base") +
        when(col("eligible") && col("brank") <= col("r"), 1L).otherwise(0L))
    bumped.select(col("s").as(stratum), col("n").as("native_tokens"),
        col("cap").as("cap_tokens"), col("alloc").as("alloc_tokens"),
        expr("alloc * 1000 div n").as("epochs_x1000"))
      .orderBy(stratum)
  }

  def tokenBudgetMix(df: DataFrame, stratum: String, key: String,
                     text: String, tokenBudget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val weights = df.groupBy(stratum)
      .agg(count(lit(1)).as("n_raw"))
      .select(col(stratum),
        floor(sqrt(col("n_raw"))).cast("bigint").as("w"))
    val total = weights.agg(sum("w").as("w_tot"))
    val targets = weights.crossJoin(broadcast(total))
      .select(col(stratum),
        expr(s"($tokenBudget * w) div w_tot").as("target_tok"))
    val w = Window.partitionBy(stratum)
      .orderBy(col("h"), col(key))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(stratum), col(key),
        size(split(col(text), " ")).cast("bigint").as("n_tok"),
        md5(col(key).cast("string")).as("h"))
      .join(broadcast(targets), Seq(stratum))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .where(col("cum") - col("n_tok") < col("target_tok"))
      .select(col(stratum), col(key), col("n_tok"))
      .orderBy(stratum, key)
  }

  /** Temperature-based source mixing (the multilingual/multi-source
    * sampling rule of mBERT/XLM-R and friends, alpha = 0.5): each
    * stratum's share of a fixed document budget is proportional to
    * sqrt(its raw count), flattening the head sources and boosting the
    * tail without ever oversampling a row. Rows inside a stratum are
    * chosen as the `target` smallest content hashes, so the selection
    * is a pure function of the data — stable across runs, engines and
    * repartitionings, and stable under growth (a stratum's picks only
    * change where new rows hash below the old cutoff).
    *
    * Exactness across engines: weights are floor(sqrt(n)) — IEEE sqrt
    * is correctly rounded in both JVMs and C libms and n < 2^52 keeps
    * floor exact — and targets are INTEGER arithmetic (budget * w div
    * total), so no float accumulation order can move a boundary.
    *
    * Scale shape: one keyed count (tiny result, broadcast back), then
    * one keyed aggregation whose partial buffers are bounded by
    * `budget` ([[graft.functions.BottomKHashAgg]]) — the shuffle
    * carries at most budget rows per (partition, stratum) and no task
    * ever materializes a whole stratum, unlike the row_number-window
    * formulation that routes every row of a stratum through one task.
    * Output: the selected (stratum, key) rows. */
  def temperatureMix(df: DataFrame, stratum: String, key: String,
                     budget: Long): DataFrame = {
    // the budget bounds the per-group aggregation buffer
    // ([[graft.functions.BottomKHashAgg]] holds at most budget + 2^20
    // candidates between prunes, ~150 B each -> well under a GiB at the
    // cap); beyond it, use a two-pass hash-cutoff selection instead of
    // an in-memory bottom-k
    require(budget > 0 && budget <= (1L << 22),
      s"budget must be in [1, ${1L << 22}]; got $budget")
    // the key round-trips through a string cast (into the aggregate and
    // back out), so only types whose cast is lossless and injective are
    // accepted — float/decimal/timestamp keys could collapse or null
    // out on the way back
    import org.apache.spark.sql.types._
    val kt = df.schema(key).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType, StringType)
        .contains(kt),
      s"temperatureMix key must be an integral or string column; got $kt")
    val weights = df.groupBy(stratum)
      .agg(count(lit(1)).as("n_raw"))
      .select(col(stratum),
        floor(sqrt(col("n_raw"))).cast("bigint").as("w"))
    val total = weights.agg(sum("w").as("w_tot"))
    val targets = weights.crossJoin(broadcast(total))
      .select(col(stratum),
        expr(s"($budget * w) div w_tot").as("target"))
    // no stratum needs more than its target <= budget smallest hashes,
    // so a bounded bottom-k aggregate replaces the per-stratum window;
    // (h ASC, key ASC) totally orders candidates, so the winning set is
    // bit-identical to `row_number() OVER (ORDER BY h, key) <= target`
    val bottomK = udaf(new graft.functions.BottomKHashAgg(budget.toInt),
      org.apache.spark.sql.Encoders.product[graft.functions.HashedKey])
    val keyType = df.schema(key).dataType
    df.select(col(stratum), col(key).cast("string").as("key_s"),
        md5(col(key).cast("string")).as("h"))
      .join(broadcast(targets), Seq(stratum))
      .groupBy(col(stratum), col("target"))
      .agg(bottomK(col("h"), col("key_s")).as("picks"))
      .select(col(stratum), col("target"),
        posexplode(col("picks")).as(Seq("pos", "pick")))
      .where(col("pos") < col("target"))
      .select(col(stratum), col("pick.key").cast(keyType).as(key))
      .orderBy(stratum, key)
  }

  /** Weighted systematic sampling: EXACTLY k draws with inclusion
    * probability proportional to an integer weight, deterministic.
    *
    * Rows are laid on the cumulative-weight line in content-hash
    * order (md5(key), key — a reproducible pseudo-random shuffle);
    * a row is drawn once per multiple of W/k its weight interval
    * covers: copies = floor(cum_end*k div W) - floor(cum_start*k div
    * W). The draw count telescopes to exactly k, heavy rows can be
    * drawn multiple times (the classic PPS-systematic semantics —
    * `copies` reports the multiplicity), and everything is integer
    * arithmetic on BIGINTs, bit-identical across engines.
    *
    * Scale shape: the global running weight is built WITHOUT a
    * single-partition window — per-row cumsum windows partition by
    * the 16-way hash-prefix bucket, and cross-bucket offsets come
    * from a 16-row aggregate (the only "global" step, broadcast
    * back). Needs W * k to fit a BIGINT.
    *
    * Output: (key, w, copies), copies >= 1, ordered by key. */
  def weightedSystematic(df: DataFrame, key: String, weight: Column,
                         k: Long): DataFrame = {
    require(k >= 1, s"k must be positive; got $k")
    val base = df.select(col(key).as("id"), weight.cast("long").as("w"),
        md5(col(key).cast("string")).as("h"))
      .where(col("w") > 0)
      .withColumn("bucket",
        (instr(lit("0123456789abcdef"), substring(col("h"), 1, 1)) - 1)
          .cast("long"))
    val bsums = base.groupBy("bucket").agg(sum("w").as("bw"))
    // 16 rows: the bucket-offset window is bounded, never data-sized
    val offW = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val offs = bsums.select(col("bucket"),
      (sum(col("bw")).over(offW) - col("bw")).as("off"))
    val total = base.agg(sum("w").as("tw"))
    val cumW = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("h", "id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    base
      .withColumn("cin", sum(col("w")).over(cumW))
      .join(broadcast(offs), "bucket")
      .crossJoin(broadcast(total))
      .select(col("id").as(key), col("w"),
        (expr(s"(off + cin) * $k div tw") -
          expr(s"(off + cin - w) * $k div tw")).as("copies"))
      .where(col("copies") > 0)
      .orderBy(key)
  }

  /** Deterministic Poisson-bootstrap confidence interval for the mean
    * of `metric` per stratum — the error bar a corpus dashboard should
    * put on every per-source average before anyone compares two
    * sources. Classic Poisson bootstrap (each row enters replicate r
    * with weight ~ Poisson(1)), made reproducible and engine-exact:
    * the weight is the inverse-CDF of Poisson(1) applied to the first
    * 6 hex digits of md5(r:key) — a pure function of (replicate, key),
    * so any shard on any cluster regenerates the same replicate, the
    * same way [[hashSplit]] fixes split assignment. CDF thresholds are
    * fixed-width lowercase hex strings, so the comparison is the same
    * lexicographic trick the splitter uses.
    *
    * Scale shape: one narrow explode (reps copies of (stratum, key,
    * metric) — map-side combine collapses it immediately into the
    * stratum × reps grid), then exact percentile_disc over each
    * stratum's `reps` replicate means. Nothing global; replicate means
    * use integer div (nonnegative, so trunc == floor across engines).
    *
    * Output: (stratum, n_rows, point_x10k, n_reps, lo95_x10k,
    * med_x10k, hi95_x10k), ordered by stratum. */
  def bootstrapCi(df: DataFrame, stratum: String, key: String,
      metric: Column, reps: Int = 32): DataFrame = {
    require(reps >= 8 && reps <= 256, s"reps in [8, 256]; got $reps")
    val repMeans = df
      .select(col(stratum).as("s"), col(key).cast("string").as("k"),
        metric.cast("bigint").as("m"))
      .withColumn("r", explode(expr(s"sequence(0, ${reps - 1})")))
      .withColumn("h",
        substring(md5(concat(col("r").cast("string"), lit(":"), col("k"))),
          1, 6))
      // Poisson(1) inverse CDF over u = h/16^6: P(<=k) for k = 0..5
      .withColumn("w",
        when(col("h") < "5e2d58", 0L).when(col("h") < "bc5ab1", 1L)
          .when(col("h") < "eb715e", 2L).when(col("h") < "fb2397", 3L)
          .when(col("h") < "ff1025", 4L).when(col("h") < "ffd90f", 5L)
          .otherwise(6L))
      .groupBy("s", "r")
      .agg(sum(col("w") * col("m")).as("wm"), sum("w").as("wn"))
      // an empty replicate (P ~ e^-n_s) contributes no mean
      .where(col("wn") > 0)
      .select(col("s"), expr("10000 * wm div wn").as("mean_x10k"))
    val point = df.groupBy(col(stratum).as("s"))
      .agg(count(lit(1)).as("n_rows"),
        (lit(10000L) * sum(metric.cast("bigint"))).as("tm"))
      .select(col("s"), col("n_rows"),
        expr("tm div n_rows").as("point_x10k"))
    repMeans.groupBy("s")
      .agg(count(lit(1)).as("n_reps"),
        expr("CAST(percentile_disc(0.05) WITHIN GROUP" +
          " (ORDER BY mean_x10k) AS BIGINT)").as("lo95_x10k"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP" +
          " (ORDER BY mean_x10k) AS BIGINT)").as("med_x10k"),
        expr("CAST(percentile_disc(0.95) WITHIN GROUP" +
          " (ORDER BY mean_x10k) AS BIGINT)").as("hi95_x10k"))
      .join(point, Seq("s"))
      .select(col("s").as(stratum), col("n_rows"), col("point_x10k"),
        col("n_reps"), col("lo95_x10k"), col("med_x10k"), col("hi95_x10k"))
      .orderBy(stratum)
  }

  /** Inverse-frequency length-balancing weights — the sampling
    * weights that flatten a skewed document-length distribution:
    * docs are bucketed by n_chars div width, and each bucket gets
    * weight N * 1e6 div (B * n_b) ppm (N = corpus size, B = number
    * of inhabited buckets, n_b = bucket count), so expected sampled
    * mass is uniform across buckets. Beside each weight: the bucket's
    * natural share (ppm) for the before/after comparison.
    *
    * Scale shape: one map-side-combinable aggregate to the bucket
    * table (bounded by the length range / width), then the scalar
    * totals crossed back in via broadcast — corpus rows are touched
    * exactly once. */
  def lengthBalanceWeights(docs: DataFrame, width: Int = 50): DataFrame = {
    val buckets = docs
      .groupBy(expr(s"CAST(n_chars div $width AS BIGINT)").as("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = buckets.agg(sum("n_docs").as("n_total"),
      count(lit(1)).as("n_buckets"))
    buckets.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_docs"),
        expr("n_docs * 1000000 div n_total").as("share_ppm"),
        expr("n_total * 1000000 div (n_buckets * n_docs)").as("weight_ppm"))
      .orderBy("bucket")
  }

  /** COVERAGE-FLOOR sample: a deterministic `target`-row sample that
    * GUARANTEES at least min(floorN, |cell|) rows from every
    * (source, lang) cell before filling the remainder by global hash
    * order — the downsample that never silently drops a rare
    * language (a plain hash sample at 1% keeps 0 rows of a 50-row
    * cell with probability ~.6). Selection is md5-ranked both
    * stages, so the sample is a pure function of the corpus.
    *
    * Scale shape: the per-cell floor picks use the bounded bottom-k
    * aggregate ([[graft.functions.BottomKHashAgg]] — k rows per
    * (partition, cell) on the shuffle, never a per-cell window); the
    * top-up is one anti-join and a TakeOrdered of the remainder (the
    * scalar guaranteed-count is the only driver traffic).
    *
    * Output: (doc_id, source, lang, picked_by in {floor, topup}),
    * ordered by doc_id. */
  def coverageFloorSample(docs: DataFrame, floorN: Int = 2,
                          target: Int = 400): DataFrame = {
    require(floorN >= 1 && target >= 1,
      s"floorN and target must be >= 1; got $floorN, $target")
    val bottomK = org.apache.spark.sql.functions.udaf(
      new graft.functions.BottomKHashAgg(floorN),
      org.apache.spark.sql.Encoders.product[graft.functions.HashedKey])
    val base = docs.select(col("doc_id"), col("source"), col("lang"),
      md5(col("doc_id").cast("string")).as("h"))
    val floorPicks = CacheRegistry.pin(base
      .groupBy("source", "lang")
      .agg(bottomK(col("h"), col("doc_id").cast("string")).as("picks"))
      .select(col("source"), col("lang"),
        explode(col("picks")).as("p"))
      .select(col("p.key").cast("bigint").as("doc_id"),
        col("source"), col("lang")))
    val nFloor = floorPicks.count()
    val topup = base.join(floorPicks.select("doc_id"), Seq("doc_id"),
        "left_anti")
      .orderBy("h", "doc_id")
      .limit(math.max(0, target - nFloor.toInt))
      .select(col("doc_id"), col("source"), col("lang"))
    floorPicks.withColumn("picked_by", lit("floor"))
      .unionByName(topup.withColumn("picked_by", lit("topup")))
      .orderBy("doc_id")
  }

  /** EFFECTIVE SAMPLE SIZE of inverse-frequency source balancing
    * (one row): with per-source weight w_s = N·1e6 div (|S|·n_s)
    * (the ppm-quantized inverse-frequency weights a balanced mix
    * uses), Kish's ESS = (Σw)² div Σw² over all rows — the number
    * that says what a weighted corpus is WORTH in unweighted rows:
    * ess_ratio_ppm near 1e6 = balancing is nearly free, a small
    * ratio = a few tiny sources carry huge weights and the weighted
    * estimates will be noisy (cap the weights or upsample instead;
    * the cap knob lives in [[lengthBalanceWeights]]'s family). Row
    * sums fold from the bounded source table (Σw = Σ n_s·w_s); the
    * squared sums are widened to DECIMAL(38,0) (DuckDB twin:
    * HUGEINT) — Σw is O(N·1e6).
    *
    * Scale shape: ONE map-side-combinable source count; everything
    * else is arithmetic on the |sources|-row table.
    *
    * Output: (n, n_sources, max_w_ppm, ess, ess_ratio_ppm). */
  def effectiveSampleSize(docs: DataFrame): DataFrame = {
    val src = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val tot = src.agg(sum("n_s").as("n"),
      count(lit(1)).as("n_sources"))
    src.crossJoin(broadcast(tot))
      .select(col("n"), col("n_sources"), col("n_s"),
        expr("n * 1000000 div (n_sources * n_s)").as("w"))
      .groupBy("n", "n_sources")
      .agg(max("w").as("max_w_ppm"),
        sum(col("n_s") * col("w")).as("sw"),
        sum(expr("CAST(n_s AS DECIMAL(38,0)) * w * w")).as("sww"))
      .select(col("n"), col("n_sources"), col("max_w_ppm"),
        expr("CAST(CAST(sw AS DECIMAL(38,0)) * sw div sww AS BIGINT)")
          .as("ess"))
      .withColumn("ess_ratio_ppm", expr("ess * 1000000 div n"))
  }

  /** Exact integer floor-sqrt: one float sqrt then a +/-1 correction
    * against the exact integer square — float sqrt alone is off by one
    * near perfect squares past 2^52, and both engines agree on the
    * corrected value for any non-negative BIGINT. */
  private def isqrt(v: Column): Column = {
    val s0 = floor(sqrt(v.cast("double"))).cast("bigint")
    val up = when((s0 + 1) * (s0 + 1) <= v, s0 + 1).otherwise(s0)
    when(up * up > v, up - 1).otherwise(up)
  }

  /** NEYMAN-OPTIMAL stratified sample allocation (Neyman 1934; the
    * survey-sampling classic, public knowledge): a fixed budget of
    * `budget` rows is apportioned across strata proportionally to
    * N_h * S_h (stratum size x standard deviation of `value`) — the
    * allocation minimizing the variance of the stratified mean at
    * fixed cost. High-variance strata buy more samples; a constant
    * stratum prices at zero (the pure rule; production adds a floor,
    * [[coverageFloorSample]] is that knob).
    *
    * Integer-exact end to end: N_h*S_h = sqrt(n*Σx² − (Σx)²) exactly,
    * taken by corrected floor-sqrt ([[isqrt]] — a float sqrt then a
    * +/-1 correction against the exact square, engine-portable);
    * seats by the same largest-remainder rule the quota mixes use;
    * selection inside each stratum smallest-md5-first (the house
    * sampling discipline), so the realized sample is a pure function
    * of the data. Overflow bound: n*Σx² must fit BIGINT — safe for
    * |x| <= ~3e4 and n <= ~1e9 per stratum; wider values must be
    * pre-scaled by the caller (the x394 DECIMAL widening does not
    * compose with an exact integer sqrt).
    *
    * An over-allocated stratum (alloc > N_h) reports the shortfall
    * (n_sampled = N_h < alloc) rather than silently rebalancing —
    * the [[distributionMatch]] policy.
    *
    * Scale shape: ONE keyed moment aggregation over the data; the
    * allocation table is bounded by |strata| (its window runs over
    * that grid only); the selection rank is a per-stratum window
    * (parallel across strata; at extreme per-stratum cardinality the
    * bounded top-k aggregator replaces it, x34 discipline).
    *
    * Output: (stratum, n_pop, nsd, alloc, n_sampled, min_key,
    * max_key) ordered by stratum; min/max_key are over the SELECTED
    * rows (null when alloc = 0) — the oracle re-derives the exact
    * selected set, so a selection-order bug is a hash mismatch. */
  def neymanAllocation(df: DataFrame, stratum: String, key: String,
                       value: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0; got $budget")
    val m = CacheRegistry.pin(df.select(col(stratum).as("s"),
      col(key).cast("bigint").as("k"), value.cast("bigint").as("x")))
    val mom = m.groupBy("s").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"))
    val w = mom.select(col("s"), col("n"),
      isqrt(col("n") * col("sxx") - col("sx") * col("sx")).as("nsd"))
    val alloc = largestRemainder(
      w.select(col("s"), col("nsd").as("c")), "s", budget)
      .select(col("s"), col("q").as("alloc"))
      .join(w, Seq("s"))
    val sel = m.select(col("s"), col("k"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("s")
        .orderBy(md5(col("k").cast("string")), col("k"))).as("rk"))
    alloc.join(sel, Seq("s"), "left")
      .select(col("s"), col("n"), col("nsd"), col("alloc"),
        when(col("rk") <= col("alloc"), col("k")).as("sk"))
      .groupBy(col("s").as(stratum))
      .agg(max(col("n")).as("n_pop"), max(col("nsd")).as("nsd"),
        max(col("alloc")).as("alloc"),
        count(col("sk")).as("n_sampled"),
        min(col("sk")).as("min_key"), max(col("sk")).as("max_key"))
      .orderBy(stratum)
  }

}
