package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout keys (beyond-reference, SURVEY.md §2.8).
  *
  * Z-order (Morton) interleaving maps two clustering dimensions onto one
  * sort key such that rows close in EITHER dimension land close in the
  * linear order. Writing 100 TB sorted by this key gives multi-column
  * data-skipping: min/max footer stats of each file then bound both
  * dimensions, so a predicate on either column prunes files — the same
  * idea behind Delta/Iceberg Z-ORDER clustering, expressed as plain
  * integer arithmetic.
  *
  * The computation is a per-row narrow projection (shifts/masks only, in
  * whole-stage codegen); the expensive part of a real Z-order rewrite is
  * the range-partitioned sort-write, which [[graft.io.Warehouse]]'s
  * partitioned-write path covers.
  */
object Layout {

  /** Interleave the low `bits` bits of a (odd positions) and b (even
    * positions) into a Morton key. Disjoint bit positions, so the
    * combine is a plain sum. */
  def zorderKey(a: Column, b: Column, bits: Int = 8): Column =
    (0 until bits).map { j =>
      (shiftleft(shiftright(a, j).bitwiseAND(1), 2 * j + 1) +
        shiftleft(shiftright(b, j).bitwiseAND(1), 2 * j)).cast("bigint")
    }.reduce(_ + _)

  /** The same key as portable SQL text (identical in Spark and DuckDB:
    * &, <<, >> and + only). */
  def zorderSql(a: String, b: String, bits: Int = 8): String =
    (0 until bits).map { j =>
      s"((($a >> $j) & 1) << ${2 * j + 1}) + ((($b >> $j) & 1) << ${2 * j})"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** part table clustered by the (p_size, p_partkey low byte) Morton
    * key: (p_partkey, zkey), ordered by the layout key — the write
    * order a Z-ordered rewrite would use. */
  def partZorder(part: DataFrame): DataFrame =
    part.select(col("p_partkey"),
        zorderKey(col("p_size"), col("p_partkey"), 8).as("zkey"))
      .orderBy("zkey", "p_partkey")

  /** Zone-map pruning audit: BEFORE paying for a 100 TB layout
    * rewrite, measure on the actual data how many "files" each
    * candidate layout would let a predicate skip. Rows are laid out in
    * three orders — natural (by key), sorted by p_size, and Z-ordered
    * by (p_size, p_partkey & 255) — cut into files of `rowsPerFile`
    * rows, and each file keeps parquet-footer-style min/max zone maps
    * of both dimensions. A file must be scanned iff its [min,max]
    * range overlaps the predicate range. The single-column sort wins
    * its own dimension and loses the other; Z-order prunes on BOTH —
    * the number this mart reports is exactly the scan-cost argument
    * for the rewrite.
    *
    * Per-layout global positions come from a range-partitioned sort +
    * zipWithIndex (the epoch-shuffle shape), never a SinglePartition
    * window; zone maps are one keyed agg over file ids.
    *
    * Predicates audited: p_size BETWEEN 10 AND 15, (p_partkey & 255)
    * BETWEEN 0 AND 63, and their conjunction. Output: (layout,
    * n_files, scan_size_pred, scan_key_pred, scan_both), one row per
    * layout, ordered by layout name. */
  def zonemapAudit(part: DataFrame, rowsPerFile: Int = 16): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(rowsPerFile >= 2, s"rowsPerFile >= 2; got $rowsPerFile")
    val spark = part.sparkSession
    val base = part.select(col("p_partkey").cast("bigint").as("pk"),
      col("p_size").cast("bigint").as("sz"),
      col("p_partkey").bitwiseAND(255).cast("bigint").as("pk8"))
    def audit(layout: String, order: Seq[Column]): DataFrame = {
      val sorted = base.orderBy(order: _*)
      val schema = StructType(sorted.schema.fields :+
        StructField("gid", LongType, nullable = false))
      val numbered = spark.createDataFrame(
        sorted.rdd.zipWithIndex().map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ i)
        }, schema)
      numbered
        .groupBy((col("gid") / rowsPerFile).cast("bigint").as("file"))
        .agg(min("sz").as("lo_sz"), max("sz").as("hi_sz"),
          min("pk8").as("lo_pk"), max("pk8").as("hi_pk"))
        .select(lit(layout).as("layout"),
          (col("lo_sz") <= 15 && col("hi_sz") >= 10).as("s_sz"),
          (col("lo_pk") <= 63 && col("hi_pk") >= 0).as("s_pk"))
        .groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("s_sz"), 1L).otherwise(0L)).as("scan_size_pred"),
          sum(when(col("s_pk"), 1L).otherwise(0L)).as("scan_key_pred"),
          sum(when(col("s_sz") && col("s_pk"), 1L).otherwise(0L))
            .as("scan_both"))
    }
    audit("1_natural", Seq(col("pk")))
      .unionByName(audit("2_bysize", Seq(col("sz"), col("pk"))))
      .unionByName(audit("3_zorder",
        Seq(zorderKey(col("sz"), col("pk"), 8), col("pk"))))
      .orderBy("layout")
  }

  /** Hilbert-curve cell index of (a, b) via the native codegen'd
    * expression [[graft.functions.HilbertKey]] — see there for why the
    * rotation loop can't be a composed Column. */
  def hilbertKey(df: DataFrame, a: Column, b: Column, bits: Int = 8): Column = {
    graft.functions.HilbertKey.register(df.sparkSession)
    call_function("hilbert_key", a.cast("bigint"), b.cast("bigint"), lit(bits))
  }

  /** The same walk as portable SQL: returns (roundsCTE, finalRelation)
    * where roundsCTE unrolls the xy2d loop as `bits` chained CTEs over
    * a seed relation `h0(id, x, y, d)` the caller provides. Pure
    * integer CASE/&/xor arithmetic — identical in Spark and DuckDB. */
  def hilbertSqlRounds(bits: Int = 8): String = {
    val rounds = (1 to bits).map { r =>
      val s = 1L << (bits - r)
      val prev = s"h${r - 1}"
      s"""h$r AS (
         |  SELECT id,
         |    CASE WHEN (y & $s) = 0 THEN
         |      (CASE WHEN (x & $s) > 0 THEN $s - 1 - y ELSE y END)
         |    ELSE x END AS x,
         |    CASE WHEN (y & $s) = 0 THEN
         |      (CASE WHEN (x & $s) > 0 THEN $s - 1 - x ELSE x END)
         |    ELSE y END AS y,
         |    d + ${s * s} * xor(
         |      CASE WHEN (x & $s) > 0 THEN 3 ELSE 0 END,
         |      CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d
         |  FROM $prev)""".stripMargin
    }
    rounds.mkString(",\n")
  }

  /** part clustered by the Hilbert index of (p_size, p_partkey & 255):
    * per-row curve positions, totally ordered by (hkey, p_partkey) —
    * the write order a Hilbert-clustered rewrite would use, judged
    * row-exact against the unrolled-SQL oracle. */
  def partHilbert(part: DataFrame, bits: Int = 8): DataFrame = {
    val base = part.select(col("p_partkey"),
      col("p_size").cast("bigint").as("x"),
      col("p_partkey").bitwiseAND(255).cast("bigint").as("y"))
    base.select(col("p_partkey"), col("x"), col("y"),
        hilbertKey(base, col("x"), col("y"), bits).as("hkey"))
      .orderBy("hkey", "p_partkey")
  }

  /** RANGE-PARTITION boundary plan: the exact value cuts a
    * `repartitionByRange(parts)` / range-bucketed write would want,
    * with the partition census those cuts actually produce — the
    * pre-flight that catches the classic range-layout failure (one
    * hot value owning 40% of the rows makes partition i giant no
    * matter where the other cuts land) BEFORE a 100 TB shuffle is
    * committed. Boundaries are discrete quantiles (actual members of
    * the value multiset); a row goes to partition = number of
    * boundaries strictly below its value, so every engine places
    * ties identically. balance_milli = 1000 means perfectly even.
    *
    * Scale shape: one map-side-combinable value histogram; the
    * quantile cuts come from one percentile_disc aggregate; the
    * census is the histogram joined to the broadcast one-row cut
    * table — nothing row-shaped after the first count.
    *
    * Output: (part, lo, hi, n_rows, balance_milli), ordered. */
  def rangeBoundaries(df: DataFrame, value: Column,
                      parts: Int = 8): DataFrame = {
    require(parts >= 2 && parts <= 256,
      s"parts must be in [2, 256]; got $parts")
    val v = df.select(value.as("v"))
    val hist = v.groupBy("v").agg(count(lit(1)).as("c"))
    val cuts = v.agg(
      expr(s"percentile_disc(${1.0 / parts}) WITHIN GROUP (ORDER BY v)")
        .cast("long").as("b1"),
      (2 until parts).map(i =>
        expr(s"percentile_disc(${i.toDouble / parts})" +
          " WITHIN GROUP (ORDER BY v)").cast("long").as(s"b$i")): _*)
    val bArr = (1 until parts).map(i => s"b$i").mkString(", ")
    hist.crossJoin(broadcast(cuts))
      .withColumn("part",
        expr(s"CAST(size(filter(array($bArr), b -> b < v)) AS BIGINT)"))
      .groupBy("part")
      .agg(min("v").as("lo"), max("v").as("hi"), sum("c").as("n_rows"))
      .crossJoin(broadcast(hist.agg(sum("c").as("n_total"))))
      .select(col("part"), col("lo"), col("hi"), col("n_rows"),
        expr(s"n_rows * $parts * 1000 div n_total").as("balance_milli"))
      .orderBy("part")
  }
}
