package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ingest.{Discover, Naming, Readers}

/** Engine session: file catalog + SQL passthrough — the Spark-native
  * re-expression of the reference's LocalSQL class
  * (localsql/localsql.py:22-364).
  *
  * Where the reference copies every referenced table into a fresh
  * SQLite DB per query (its core scalability wall, ref :230), here a
  * table is a lazily-planned temp view over the file: zero copies,
  * and Catalyst pushes filters/pruning into the scan.
  */
class Session(val spark: SparkSession,
              stringifyNested: Boolean = true,
              jsonNormalize: Boolean = false) {

  /** name -> DataFrame, like the reference's self.tables (ref :31). */
  val tables = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]

  /** Last non-empty query result (ref :34, :231-232) for `\s` export. */
  var latestResult: Option[DataFrame] = None

  /** Load one file; returns the registered table name, or None if the
    * format is unknown / the file fails to load (per-file tolerance,
    * ref :302-316). */
  def loadFile(path: String): Option[String] =
    try {
      Readers.read(spark, path, stringifyNested, jsonNormalize).map { df =>
        val name = Naming.tableName(path)
        tables(name) = df
        df.createOrReplaceTempView(name)
        name
      }
    } catch {
      case e: Exception =>
        System.err.println(s"[graft] skipping $path: ${e.getMessage}")
        None
    }

  def loadDir(dir: String, recursive: Boolean = false): Seq[String] = {
    val files = if (recursive) Discover.recursive(dir) else Discover.inDir(dir)
    files.flatMap(p => loadFile(p.toString))
  }

  /** Run SQL; caches the result for export (ref run_lsql :216-233). */
  def sql(query: String): DataFrame = {
    val df = spark.sql(query)
    latestResult = Some(df)
    df
  }

  // ---- catalog introspection (ref \t, \td, bare-table-name) -----------

  /** `\t`: table names (ref :195-197). */
  def tableNames: Seq[String] = tables.keys.toSeq

  /** `\td`: (table, rows, columns, bytes) like get_tables_descr
    * (ref :50-54); bytes from the optimized plan's stats, which is the
    * Spark-native size notion (no full materialization needed). Row
    * count comes from plan statistics when the optimizer knows it
    * (computed stats / CBO) — a df.count() per table is a full scan
    * each, which at 100 TB turns `\td` into a cluster-wide job; the
    * scan only runs when stats are absent. */
  def describeTables(): Seq[(String, Long, Int, BigInt)] =
    tables.toSeq.map { case (name, df) =>
      val stats = df.queryExecution.optimizedPlan.stats
      val rows = stats.rowCount.map(_.toLong).getOrElse(df.count())
      (name, rows, df.columns.length, stats.sizeInBytes)
    }

  /** Completion candidates over the catalog (ref :323-333): table
    * names, then column names backtick-quoted where needed. */
  def completions: Seq[String] =
    Completions.candidates(tables.toSeq.map { case (n, df) => (n, df.columns.toSeq) })

  /** Bare table name: schema dump (ref df.info(), :226-228). */
  def info(name: String): String =
    tables.get(name)
      .map(df => df.schema.treeString + s"rows: ${df.count()}")
      .getOrElse(s"unknown table: $name")
}

object Session {
  /** Standard builder: local[*] with shuffle partitions sized to cores
    * (32 on the test box; a real cluster tunes this to 2-3x total
    * cores), UTC session time. */
  def local(appName: String = "graft"): Session = {
    val cores = Runtime.getRuntime.availableProcessors.toString
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      // AQE coalescing respects the advisory partition size (Spark's
      // documented production recommendation; see Bench.scala) —
      // advisory-sized reduce partitions at scale, one reduce task for
      // kilobyte shuffles locally
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Dialect.register(spark)
    new Session(spark)
  }
}
