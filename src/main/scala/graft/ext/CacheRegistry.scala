package graft.ext

import org.apache.spark.sql.DataFrame

/** Registry of every DataFrame the ext operators pin with cache().
  *
  * Caching inside an operator is load-bearing (a plan consumed by two
  * subtrees recomputes otherwise), but an unbounded session would leak
  * those blocks: operators hand back lazy DataFrames, so they can never
  * know when their cache is safe to drop. The session-level runner
  * (Verify, Bench, a REPL user) calls [[clearAll]] once its results are
  * materialized — bounding cache memory by one workload instead of the
  * session lifetime.
  */
object CacheRegistry {

  private val pinned =
    java.util.Collections.synchronizedList(new java.util.ArrayList[DataFrame]())

  /** Cache df and remember it for later [[clearAll]]. */
  def pin(df: DataFrame): DataFrame = {
    pinned.add(df)
    df.cache()
  }

  /** Unpersist every pinned DataFrame and forget it. Also clears the
    * memoized shingle index (Dedup.shingles3). */
  def clearAll(): Unit = {
    pinned.synchronized {
      pinned.forEach(df => { df.unpersist(blocking = false); () })
      pinned.clear()
    }
    Dedup.clearShingleCache()
  }
}
