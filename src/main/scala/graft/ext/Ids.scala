package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global contiguous id assignment (beyond-reference, SURVEY.md §2.8):
  * the "number every row 0..n-1 in key order" primitive that shard
  * manifests, example indices and embedding-matrix row maps all need.
  *
  * The SQL spelling — `row_number() OVER (ORDER BY key)` — is the
  * textbook 100 TB killer: an empty-frame global window makes Catalyst
  * plan a SinglePartition exchange, funnelling the entire dataset
  * through ONE task. The distributed spelling keeps every stage wide:
  *
  *   1. `orderBy(key)` — a range-partitioned sort (sampled boundaries,
  *      each partition sorts locally; no single-task stage);
  *   2. `zipWithIndex` — one lightweight count job over the sorted
  *      partitions to learn per-partition row counts, then each
  *      partition numbers itself from its broadcast prefix offset.
  *
  * Ids depend only on the global key order (keys must be unique for a
  * deterministic assignment), not on the sampled partition boundaries,
  * so the result is reproducible across cluster sizes — which is what
  * the DuckDB row_number oracle checks (x132).
  */
object Ids {

  /** (key, gid) with gid = 0-based dense rank of `key` in ascending
    * order. Requires `key` values to be unique (ties would make the
    * assignment partition-boundary-dependent). */
  def contiguousIds(df: DataFrame, key: String): DataFrame = {
    val sorted = df.select(col(key)).orderBy(key)
    val schema = StructType(sorted.schema.fields :+
      StructField("gid", LongType, nullable = false))
    val numbered = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    sorted.sparkSession.createDataFrame(numbered, schema).orderBy(key)
  }
}
