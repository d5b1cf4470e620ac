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
}
