package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{col, count, count_distinct}
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

  /** The shared zipWithIndex tail of every rank/epoch/layout operator:
    * append `outName` = partition-prefix offset + local index (+ base)
    * to an already-sorted frame. The RDD hop itself is the point (one
    * count job, no SinglePartition window), but the round-trip is
    * encoded with an explicit [[org.apache.spark.sql.Encoders.row]]
    * encoder: `createDataFrame(RDD[Row], schema)` re-enters Catalyst
    * through the generic per-row converter, which measured ~4x the
    * task time of the codegen'd encoder serializer on the x374 file
    * aggs (guide §1.2 "per-task work": same distributed shape, faster
    * row boundary). */
  private[graft] def zipIndexed(sorted: DataFrame, outName: String,
                                base: Long): DataFrame = {
    val schema = StructType(sorted.schema.fields :+
      StructField(outName, LongType, nullable = false))
    val numbered = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + base))
    }
    sorted.sparkSession.createDataset(numbered)(
      org.apache.spark.sql.Encoders.row(schema)).toDF()
  }

  /** (key, gid) with gid = 0-based dense rank of `key` in ascending
    * order. REQUIRES `key` values to be unique: with duplicates the
    * gid a given row gets depends on the sampled range-partition
    * boundaries, silently breaking the advertised cross-cluster
    * reproducibility. `checkUnique = true` enforces this with one
    * extra aggregation job (count vs count-distinct — cheap relative
    * to the global sort that follows); leave it off only when
    * uniqueness is already guaranteed upstream (e.g. a primary key). */
  def contiguousIds(df: DataFrame, key: String,
                    checkUnique: Boolean = false): DataFrame = {
    if (checkUnique) {
      val c = df.agg(count(col(key)).as("n"),
        count_distinct(col(key)).as("d")).head()
      require(c.getLong(0) == c.getLong(1),
        s"contiguousIds requires unique '$key' values: " +
          s"${c.getLong(0)} rows but only ${c.getLong(1)} distinct — " +
          "duplicate keys would make gid partition-boundary-dependent")
    }
    val sorted = df.select(col(key)).orderBy(key)
    zipIndexed(sorted, "gid", 0L).orderBy(key)
  }

  /** Generalized [[contiguousIds]]: number the rows of `df` 1-based in
    * `order` (which MUST be a total order — include a unique tie-break
    * column, or the numbering becomes partition-boundary-dependent),
    * carrying the `keep` columns through. Same distributed shape: a
    * range-partitioned sort + zipWithIndex, never a SinglePartition
    * `row_number() OVER (ORDER BY ...)` window. Output: keep columns
    * plus `outName` (1-based rank, matching SQL row_number). */
  def rankByOrder(df: DataFrame, order: Seq[Column], keep: Seq[String],
                  outName: String): DataFrame = {
    val sorted = df.select(keep.map(col): _*).orderBy(order: _*)
    zipIndexed(sorted, outName, 1L)
  }
}
