package graft.ingest

import java.util.{Map => JMap}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 xlsx reader — `spark.read.format("graft-xlsx")` — the
  * scale-out upgrade path SURVEY.md §7.4 names for the driver-side
  * [[Xlsx.read]] (which stays as the REPL's ingestion path).
  *
  * Semantics are identical to the driver reader (first sheet, header
  * row, sharedStrings resolution, Long/Double/String inference); the
  * execution model is Spark-native:
  *
  *  - schema inference streams the sheet ONCE on the driver in constant
  *    memory (per-column type lattice, no grid materialization);
  *  - the scan splits the sheet into ROW-RANGE input partitions
  *    (`rowsPerPartition`, default 10000), so parsing — the CPU cost of
  *    xlsx — runs in parallel on executors, and each partition streams
  *    its slice in constant memory;
  *  - column pruning is pushed down: a `select(one_col)` converts only
  *    that column's cells (the XML is still streamed — row boundaries
  *    are not byte-addressable in a deflated XML — but per-cell convert
  *    and row materialization costs drop to the pruned width).
  *
  * Each partition re-opens the file locally (java.util.zip over the
  * local path, like the driver reader); a cluster deployment would open
  * the same stream through the Hadoop FileSystem API — the connector
  * surface is unchanged by that swap.
  */
final class XlsxSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsx"
  override def supportsExternalMetadata(): Boolean = true

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-xlsx requires a path option")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XlsxSource.inferStreaming(path(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val p = properties.get("path")
    require(p != null && p.nonEmpty, "graft-xlsx requires a path option")
    new XlsxTable(p, schema)
  }
}

object XlsxSource {
  /** Streaming one-pass schema inference: header row names the columns;
    * each column's type starts at Long and widens to Double then String
    * as counter-examples stream by. Constant memory. */
  private[ingest] def inferStreaming(path: String): StructType = {
    val it = new Xlsx.SheetRows(path)
    try {
      require(it.hasNext, s"empty sheet in $path")
      val header = it.next().map(_.getOrElse("")).toSeq
      val width = header.length
      // 0 = long, 1 = double, 2 = string; columns with no values stay
      // string (matches Xlsx.inferType on an empty value list)
      val state = Array.fill(width)(0)
      val seen = Array.fill(width)(false)
      while (it.hasNext) {
        val row = it.next()
        var i = 0
        while (i < width) {
          (if (i < row.length) row(i) else None).foreach { s =>
            seen(i) = true
            if (state(i) == 0 && scala.util.Try(s.trim.toLong).isFailure)
              state(i) = 1
            if (state(i) == 1 && scala.util.Try(s.trim.toDouble).isFailure)
              state(i) = 2
          }
          i += 1
        }
      }
      StructType(header.zipWithIndex.map { case (n, i) =>
        val t =
          if (!seen(i)) StringType
          else state(i) match {
            case 0 => LongType
            case 1 => DoubleType
            case _ => StringType
          }
        StructField(n, t, nullable = true)
      })
    } finally it.close()
  }

  /** Number of DATA rows (excluding the header), one streaming pass. */
  private[ingest] def countDataRows(path: String): Long = {
    val it = new Xlsx.SheetRows(path)
    try { var n = -1L; while (it.hasNext) { it.next(); n += 1 }; math.max(n, 0L) }
    finally it.close()
  }
}

private final class XlsxTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-xlsx:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(path, tableSchema,
      Option(options.get("rowsPerPartition")).map(_.toLong).getOrElse(10000L))
}

private final class XlsxScanBuilder(path: String, full: StructType,
                                    rowsPerPart: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve the source's field order; requiredSchema may be reordered
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => keep.contains(f.name)))
  }
  override def build(): Scan = new XlsxScan(path, full, required, rowsPerPart)
}

private final class XlsxScan(path: String, full: StructType,
                             required: StructType, rowsPerPart: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-xlsx $path [${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = XlsxSource.countDataRows(path)
    if (n == 0) Array(XlsxPartition(0, 0))
    else (0L until n by rowsPerPart)
      .map(s => XlsxPartition(s, math.min(s + rowsPerPart, n)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(path, full, required)
}

/** [start, end) over 0-based DATA row indices (header excluded). */
private final case class XlsxPartition(start: Long, end: Long)
    extends InputPartition

private final class XlsxReaderFactory(path: String, full: StructType,
                                      required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new XlsxPartitionReader(path, full, required,
      partition.asInstanceOf[XlsxPartition])
}

private final class XlsxPartitionReader(path: String, full: StructType,
                                        required: StructType, part: XlsxPartition)
    extends PartitionReader[InternalRow] {
  // executor-side stream over this partition's row slice
  private val it = new Xlsx.SheetRows(path)
  private var opened = false
  private var rowIdx = -1L // -1 = header not yet consumed
  private var current: InternalRow = null
  // (source column index, source type) per required field
  private val wanted: Array[(Int, DataType)] = required.fields.map { f =>
    (full.fieldIndex(f.name), f.dataType)
  }

  override def next(): Boolean = {
    if (!opened) { // skip header + rows before the slice
      if (it.hasNext) it.next() // header
      while (rowIdx < part.start - 1 && it.hasNext) { it.next(); rowIdx += 1 }
      opened = true
    }
    if (rowIdx + 1 >= part.end || !it.hasNext) { current = null; false }
    else {
      val row = it.next(); rowIdx += 1
      val vals = new Array[Any](wanted.length)
      var i = 0
      while (i < wanted.length) {
        val (src, dt) = wanted(i)
        val cell = if (src < row.length) row(src) else None
        vals(i) = cell.map { s =>
          dt match {
            case LongType => s.trim.toLong.asInstanceOf[Any]
            case DoubleType => s.trim.toDouble.asInstanceOf[Any]
            case _ => UTF8String.fromString(s).asInstanceOf[Any]
          }
        }.orNull
        i += 1
      }
      current = new GenericInternalRow(vals)
      true
    }
  }
  override def get(): InternalRow = current
  override def close(): Unit = it.close()
}
