package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction (beyond-reference; SURVEY.md §2.8 storage
  * layout): the maintenance pass every streaming/incremental pipeline
  * needs. Append-mode sinks and per-batch writers leave thousands of
  * kilobyte-scale files per partition; at 100 TB the NEXT reader pays
  * for them twice — once in file-listing/driver planning time (a task
  * per file) and once in row-group overhead. Compaction rewrites a
  * directory into ~`targetBytes` files sized off Catalyst's own scan
  * statistics, so downstream scans get back their fair
  * `maxPartitionBytes`-sized splits.
  *
  * Deliberately a REWRITE, not a move: the data passes through one
  * round-robin repartition (no shuffle key — pure balancing, every
  * output file the same size) and lands with whatever compression the
  * session dictates; content is byte-for-byte the same rows (spec:
  * set-equality + file-count collapse in StorageSpec).
  */
object Compact {

  /** Rewrite `inDir` (parquet) into `outDir` as ~targetBytes files.
    * Returns the chosen file count. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, s"targetBytes must be positive; got $targetBytes")
    val df = spark.read.parquet(inDir)
    val files = math.max(1, fileCount(df))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // sizeInBytes is the UNCOMPRESSED Catalyst estimate; it only sets
    // the output file COUNT, so an off-estimate costs file sizing, not
    // correctness. Never produce MORE files than the input has.
    val parts = math.max(1L, math.min(
      (bytes / BigInt(targetBytes)).toLong + 1, files.toLong)).toInt
    df.repartition(parts).write.mode(SaveMode.Overwrite).parquet(outDir)
    parts
  }

  private def fileCount(df: DataFrame): Int =
    df.inputFiles.length
}
