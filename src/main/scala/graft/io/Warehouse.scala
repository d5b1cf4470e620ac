package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-layout operators for the scale path (beyond-reference;
  * SURVEY.md §2.8): the two techniques that remove shuffles/scans
  * before a query even runs.
  *
  *  - BUCKETING: writing both join sides bucketed (and sorted) by the
  *    join key makes every later equi-join on that key bucket-to-bucket
  *    — zero Exchange in the plan. At 100 TB this converts the nightly
  *    fact-to-fact join from the cluster's largest shuffle into a local
  *    merge per bucket. Guarded by PlanSpec ("no Exchange").
  *  - PARTITIONED LAYOUT: writing partitioned by a coarse key (date,
  *    language, source) lets the reader prune whole directories —
  *    PartitionFilters in the scan, files never opened. Guarded by
  *    PlanSpec ("partition pruning").
  */
object Warehouse {

  /** Write df as a bucketed+sorted managed table (parquet). Requires a
    * table name (bucketing metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planned
    * shuffle-free (SortMergeJoin directly over bucket files). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Write df partitioned by the given columns (directory-per-value
    * layout); readers filtering on those columns prune at planning. */
  def writePartitioned(df: DataFrame, path: String, keys: String*): Unit =
    df.write.partitionBy(keys: _*).mode("overwrite").parquet(path)
}
