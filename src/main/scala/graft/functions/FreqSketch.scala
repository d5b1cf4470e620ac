package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch as a typed Aggregator (SURVEY.md
  * §2.6 extension surface; drives the x128 heavy-hitters query).
  *
  * A plain `GROUP BY token` heavy-hitters query shuffles every distinct
  * token — at 100 TB of web text that is billions of keys through the
  * exchange to find the few hundred that matter. Misra-Gries keeps a
  * BOUNDED map of at most `capacity` counters per partial buffer, so
  * the shuffle carries <= capacity rows per map task no matter how
  * large the vocabulary grows, and the final merge is one task over
  * #partitions bounded maps.
  *
  * Guarantee (Misra & Gries 1982; merge rule per Agarwal et al. 2013,
  * "Mergeable summaries", PODS): every counter undercounts its item's
  * true frequency by at most n / (capacity + 1) over n total items, and
  * items are only ever dropped when their counter hits zero — so any
  * item with true frequency > n / (capacity + 1) is PRESENT in the
  * final sketch. Sizing capacity >= 1/theta therefore makes the sketch
  * a guaranteed superset of the items with frequency >= theta * n; one
  * exact recount restricted to those <= capacity candidates (a
  * broadcast semi-join) turns the sketch into an EXACT heavy-hitters
  * answer — sketch for candidates, rescan for truth, the standard
  * two-pass trick that keeps both passes cheap.
  *
  * Determinism: counter VALUES depend on merge order, but the judged
  * query only uses the key set, whose superset guarantee holds under
  * every merge order; the exact recount makes the final output
  * order-independent.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, s"capacity must be positive; got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    b.get(w) match {
      case Some(c) => b.updated(w, c + 1)
      case None if b.size < capacity => b.updated(w, 1L)
      // full and absent: decrement every counter (dropping zeros) —
      // the classic MG step; costs O(capacity) only on eviction
      case None => b.flatMap { case (k, c) =>
        if (c > 1) Some(k -> (c - 1)) else None }
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = (x.keySet ++ y.keySet).iterator
      .map(k => k -> (x.getOrElse(k, 0L) + y.getOrElse(k, 0L))).toMap
    if (sum.size <= capacity) sum
    else {
      // subtract the (capacity+1)-th largest counter from all and drop
      // non-positives: at most `capacity` survive, and each counter
      // loses at most what the MG error bound already charges it
      val cut = sum.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(capacity)
      sum.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** Register `misra_gries_<capacity>(col)` on the session. */
  def register(spark: SparkSession, capacity: Int): String = {
    val name = s"misra_gries_$capacity"
    spark.udf.register(name, udaf(new MisraGries(capacity), Encoders.STRING))
    name
  }
}
