package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate flowing into the top-k aggregate. */
case class ScoredId(score: Long, id: Long)

/** Per-group top-k as a bounded partial aggregation (SURVEY.md §2.6
  * extension surface; used by the kNN operators).
  *
  * The naive per-group top-k — `row_number() OVER (PARTITION BY qid
  * ORDER BY score DESC)` then `rn <= k` — shuffles and sorts EVERY
  * scored pair: |queries| x |corpus| rows through the exchange. This
  * aggregate keeps a bounded buffer of the k best candidates instead;
  * partial buffers combine map-side, so the shuffle carries at most k
  * rows per (partition, group) — the difference between a kNN that
  * tops out at millions of vectors and one that runs at 100 TB.
  *
  * Determinism: candidates are totally ordered by (score DESC, id ASC)
  * — merge order cannot change the winning set, so the distributed
  * result is bit-identical to the window formulation and hash-matches
  * the DuckDB oracle.
  */
class TopKAgg(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  // keep the buffer bounded but don't re-sort on every row: prune
  // lazily once it grows past 4k (amortized O(log k) per insert)
  private def prune(b: Seq[ScoredId]): Seq[ScoredId] =
    if (b.lengthCompare(k) <= 0) b
    else b.sortWith(better).take(k)

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
    val nb = b :+ a
    if (nb.lengthCompare(4 * k) >= 0) prune(nb) else nb
  }
  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
    prune(x ++ y)
  override def finish(b: Seq[ScoredId]): Seq[ScoredId] =
    prune(b).sortWith(better)

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

object TopKAgg {
  /** Register `top_k_<k>(score, id)` for the given k. */
  def register(spark: SparkSession, k: Int): String = {
    val name = s"top_k_$k"
    spark.udf.register(name, udaf(new TopKAgg(k), Encoders.product[ScoredId]))
    name
  }
}

/** Double-scored candidate for the float-tier ranking. */
case class ScoredIdD(score: Double, id: Long)

/** [[TopKAgg]] with a double score — same bounded-buffer partial
  * aggregation for the float kNN tier (where scores are IEEE dots and
  * the ranking, like the scores, is engine-local). */
class TopKAggD(k: Int)
    extends Aggregator[ScoredIdD, Seq[ScoredIdD], Seq[ScoredIdD]] {

  private def better(a: ScoredIdD, b: ScoredIdD): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def prune(b: Seq[ScoredIdD]): Seq[ScoredIdD] =
    if (b.lengthCompare(k) <= 0) b
    else b.sortWith(better).take(k)

  override def zero: Seq[ScoredIdD] = Vector.empty
  override def reduce(b: Seq[ScoredIdD], a: ScoredIdD): Seq[ScoredIdD] = {
    val nb = b :+ a
    if (nb.lengthCompare(4 * k) >= 0) prune(nb) else nb
  }
  override def merge(x: Seq[ScoredIdD], y: Seq[ScoredIdD]): Seq[ScoredIdD] =
    prune(x ++ y)
  override def finish(b: Seq[ScoredIdD]): Seq[ScoredIdD] =
    prune(b).sortWith(better)

  override def bufferEncoder: Encoder[Seq[ScoredIdD]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredIdD]]()
  override def outputEncoder: Encoder[Seq[ScoredIdD]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredIdD]]()
}

object TopKAggD {
  /** Register `top_kd_<k>(score, id)` for the given k. */
  def register(spark: SparkSession, k: Int): String = {
    val name = s"top_kd_$k"
    spark.udf.register(name, udaf(new TopKAggD(k), Encoders.product[ScoredIdD]))
    name
  }
}

/** One (hash, key) candidate flowing into the bottom-k aggregate. */
case class HashedKey(h: String, key: String)

/** Per-group smallest-k by (hash ASC, key ASC) as a bounded partial
  * aggregation — the selection engine behind deterministic sampling
  * operators (Sampling.temperatureMix). The window formulation
  * (`row_number() OVER (PARTITION BY stratum ORDER BY h)`) routes a
  * stratum's ENTIRE row set through one task; with a handful of
  * sources that is a single-task sort per source. This aggregate keeps
  * at most k candidates per partial buffer instead, so the shuffle
  * carries k rows per (partition, group) and no task ever sorts more
  * than a bounded buffer — the 100 TB shape.
  *
  * Determinism: candidates are totally ordered by (h ASC, key ASC);
  * merge order cannot change the winning set, so the result is
  * bit-identical to the window formulation. Hash ties across DISTINCT
  * keys cannot occur for cryptographic h; duplicate keys contribute
  * duplicate elements exactly as repeated rows do under row_number.
  */
class BottomKHashAgg(k: Int)
    extends Aggregator[HashedKey, Seq[HashedKey], Seq[HashedKey]] {

  require(k >= 1, s"k must be positive; got $k")

  // lazy-prune threshold, computed in Long so a large k can never
  // overflow Int (4 * k going negative would make lengthCompare >= 0
  // always true -> a full re-sort on EVERY row), and capped at
  // k + 2^20 so the buffer between prunes stays bounded for large k
  // instead of growing to 4x the budget
  private val pruneAt: Int =
    (4L * k).min(k.toLong + (1L << 20)).min(Int.MaxValue).toInt

  private def lt(a: HashedKey, b: HashedKey): Boolean =
    a.h < b.h || (a.h == b.h && a.key < b.key)

  private def prune(b: Seq[HashedKey]): Seq[HashedKey] =
    if (b.lengthCompare(k) <= 0) b
    else b.sortWith(lt).take(k)

  override def zero: Seq[HashedKey] = Vector.empty
  override def reduce(b: Seq[HashedKey], a: HashedKey): Seq[HashedKey] = {
    val nb = b :+ a
    if (nb.lengthCompare(pruneAt) >= 0) prune(nb) else nb
  }
  override def merge(x: Seq[HashedKey], y: Seq[HashedKey]): Seq[HashedKey] =
    prune(x ++ y)
  override def finish(b: Seq[HashedKey]): Seq[HashedKey] =
    prune(b).sortWith(lt)

  override def bufferEncoder: Encoder[Seq[HashedKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedKey]]()
  override def outputEncoder: Encoder[Seq[HashedKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedKey]]()
}
