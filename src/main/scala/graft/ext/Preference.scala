package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise-preference aggregation (beyond-reference, SURVEY.md §2.8):
  * the reward-data shape of RLHF pipelines — human raters produce
  * "A beats B" comparisons, and training needs a consistent scalar
  * ranking with the strength-of-schedule correction a naive win RATE
  * lacks (beating strong opponents must count for more than farming
  * weak ones).
  *
  * Bradley-Terry fits that: P(i beats j) = s_i / (s_i + s_j), fitted
  * here by the standard minorization-maximization update (Hunter,
  * Annals of Statistics 2004): s_i ← W_i / Σ_j N_ij / (s_i + s_j).
  * Everything runs in INTEGER fixed point (SCALE = 10⁶; each division
  * is the truncating `div` both engines share), with a FIXED iteration
  * count — so the fit is bit-deterministic and oracle-exact, which no
  * float implementation can promise.
  *
  * Scale shape: the corpus is touched ONCE (a per-user lead window
  * builds consecutive-event comparisons); everything after runs on
  * the |types|² win grid — each MM iteration is one self-join + keyed
  * sum over that grid, driver-free. At 100 TB the grid is still tiny;
  * the fit costs what the comparison extraction costs.
  */
object Preference {

  private val S = 1000000L          // strength fixed-point scale
  private val S2 = S * S            // numerator headroom for div

  /** Comparisons from an event stream: per user, each consecutive
    * event pair with DIFFERENT types is one duel; the larger
    * floor(value·100) wins, ties to the lexicographically smaller
    * type — a pure function of the data, so both engines extract the
    * identical comparison set. Output: (w, l) winner/loser types. */
  private def comparisons(events: DataFrame): DataFrame = {
    val win = Window.partitionBy("u").orderBy("tm", "event_id")
    events.select(col("user_id").as("u"), unix_micros(col("ts")).as("tm"),
        col("event_id"), col("event_type").as("t"),
        floor(col("value") * 100).cast("bigint").as("v"))
      .withColumn("nt", lead("t", 1).over(win))
      .withColumn("nv", lead("v", 1).over(win))
      .where(col("nt").isNotNull && col("nt") =!= col("t"))
      .select(
        when(col("v") > col("nv") ||
          (col("v") === col("nv") && col("t") < col("nt")), col("t"))
          .otherwise(col("nt")).as("w"),
        when(col("v") > col("nv") ||
          (col("v") === col("nv") && col("t") < col("nt")), col("nt"))
          .otherwise(col("t")).as("l"))
  }

  /** Bradley-Terry strengths after `iters` MM rounds. Output:
    * (event_type, n_wins, n_games, strength_x1e6, rank — 1 =
    * strongest, ties by type), ordered by rank then type.
    *
    * Preconditions (documented): (1) a type with ZERO wins fixes to
    * strength 0, and two zero-strength types that dueled each other
    * would make an MM term divide by zero — holds whenever every type
    * wins at least once; (2) each MM term n_ij·10¹²/(s_i+s_j) must
    * fit a BIGINT: the multiply runs in DECIMAL(38,0) (so the naive
    * ~9.2e6-duel wrap cannot happen), leaving a bound of roughly
    * n_ij < 9.2e6·(s_i+s_j) — trillions of duels per PAIR at normal
    * strength scales, beyond any real corpus. */
  def bradleyTerry(events: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters in [1,8]; got $iters")
    val cmp = comparisons(events)
    // directed win counts -> symmetric games grid + per-type wins
    val dir = cmp.groupBy("w", "l").agg(count(lit(1)).as("c"))
    val games = CacheRegistry.pin(
      dir.select(col("w").as("i"), col("l").as("j"), col("c"))
        .unionByName(dir.select(col("l").as("i"), col("w").as("j"),
          col("c")))
        .groupBy("i", "j").agg(sum("c").as("n_ij")))
    val wins = CacheRegistry.pin(
      dir.groupBy(col("w").as("i")).agg(sum("c").as("n_wins")))
    val types = games.select(col("i")).distinct()
    var s = types.select(col("i"), lit(S).as("s"))
    for (_ <- 1 to iters) {
      val sj = s.select(col("i").as("j"), col("s").as("s_j"))
      // numerators in DECIMAL(38,0): n_ij * 1e12 wraps BIGINT once a
      // pair logs ~9.2e6 duels — routine at corpus scale (the oracle
      // runs the same widening in HUGEINT)
      val denom = games.join(s, Seq("i")).join(sj, Seq("j"))
        .select(col("i"),
          expr(s"CAST(CAST(n_ij AS DECIMAL(38,0)) * ${S2}L" +
            " div (s + s_j) AS DECIMAL(38,0))").as("term"))
        .groupBy("i").agg(sum("term").as("denom"))
      s = denom.join(wins, Seq("i"), "left")
        .select(col("i"),
          expr(s"CAST(CAST(coalesce(n_wins, 0L) AS DECIMAL(38,0))" +
            s" * ${S2}L div denom AS BIGINT)").as("s"))
    }
    val totals = games.groupBy("i").agg(sum("n_ij").as("n_games"))
    val out = s.join(wins, Seq("i"), "left").join(totals, Seq("i"))
      .select(col("i").as("event_type"),
        coalesce(col("n_wins"), lit(0L)).as("n_wins"),
        col("n_games"), col("s").as("strength_x1e6"))
    // SinglePartition window is safe HERE ONLY: it ranks the
    // |types|-row strength grid, never row-level data (cf. the
    // zipWithIndex discipline for corpus-sized ranks)
    out.withColumn("rank",
        row_number().over(Window.orderBy(col("strength_x1e6").desc,
          col("event_type"))).cast("bigint"))
      .orderBy("rank", "event_type")
  }
}
