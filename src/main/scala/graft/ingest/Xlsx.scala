package graft.ingest

import java.io.{BufferedOutputStream, FileOutputStream, InputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Xlsx read/write with zero non-JDK dependencies (SURVEY.md §7.4).
  *
  * An xlsx file is a zip of small XMLs; we SAX-parse
  * `xl/worksheets/sheet1.xml` (first sheet, as the reference does —
  * localsql/localsql.py:104-105) resolving `t="s"` cells through
  * `xl/sharedStrings.xml`. First row is the header; column types are
  * inferred (all-numeric -> LongType/DoubleType, else StringType),
  * mirroring the reference's pandas dtype inference.
  *
  * Driver-side by design: spreadsheets are small by nature and the
  * reference loads them driver-side too. The scale-out upgrade path is
  * a DataSourceV2 TableProvider that splits the sheet XML by row ranges;
  * not required for parity.
  */
object Xlsx {

  private[ingest] def slurpSharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    parseStrings(zip.getInputStream(entry))
  }

  private def parseStrings(in: InputStream): IndexedSeq[String] = {
    val out = ArrayBuffer.empty[String]
    val r = XMLInputFactory.newInstance.createXMLStreamReader(in)
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t"  => inT = true
            case _    =>
          }
        case XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t"  => inT = false
            case "si" => out += cur.toString; cur = null
            case _    =>
          }
        case _ =>
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** "BC" -> 54 (0-based column index). */
  private[ingest] def colIndex(cellRef: String): Int = {
    val letters = cellRef.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
  }

  /** Streaming iterator over the first worksheet's rows (header
    * included), shared strings resolved — constant memory regardless of
    * sheet length. The driver reader slurps it whole; the DataSourceV2
    * partitions ([[XlsxSource]]) each stream it and keep only their row
    * range. Close releases the zip handle (also closed automatically at
    * exhaustion). */
  private[ingest] final class SheetRows(path: String)
      extends Iterator[ArrayBuffer[Option[String]]] with AutoCloseable {
    private val zip = new ZipFile(path)
    private val shared = slurpSharedStrings(zip)
    private val r = {
      val sheet = zip.getEntry("xl/worksheets/sheet1.xml")
      require(sheet != null, s"no xl/worksheets/sheet1.xml in $path")
      XMLInputFactory.newInstance.createXMLStreamReader(zip.getInputStream(sheet))
    }
    private var pending: ArrayBuffer[Option[String]] = null
    private var closed = false

    private def advance(): Unit = {
      var row: ArrayBuffer[Option[String]] = null
      var cellType = ""
      var cellCol = 0
      var inV = false
      var v: StringBuilder = null
      while (pending == null && !closed && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = ArrayBuffer.empty
              case "c" =>
                val ref = Option(r.getAttributeValue(null, "r"))
                cellCol = ref.map(colIndex).getOrElse(row.length)
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              case "v" | "t" => inV = true; v = new StringBuilder
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inV => v.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" | "t" =>
                if (inV) {
                  val raw = v.toString
                  val value = cellType match {
                    case "s" => shared(raw.trim.toInt)
                    case _   => raw
                  }
                  while (row.length <= cellCol) row += None
                  row(cellCol) = Some(value)
                  inV = false
                }
              case "row" => pending = row; row = null
              case _ =>
            }
          case _ =>
        }
      }
      if (pending == null) close()
    }

    override def hasNext: Boolean = {
      if (pending == null && !closed) advance()
      pending != null
    }
    override def next(): ArrayBuffer[Option[String]] = {
      if (!hasNext) throw new NoSuchElementException
      val out = pending; pending = null; out
    }
    override def close(): Unit = if (!closed) { closed = true; r.close(); zip.close() }
  }

  /** Raw cell grid of the first worksheet (values as strings). */
  private def readGrid(path: String): Seq[ArrayBuffer[Option[String]]] = {
    val it = new SheetRows(path)
    try it.toList finally it.close()
  }

  private[ingest] def inferType(values: Seq[String]): DataType = {
    if (values.isEmpty) StringType
    else if (values.forall(s => scala.util.Try(s.trim.toLong).isSuccess)) LongType
    else if (values.forall(s => scala.util.Try(s.trim.toDouble).isSuccess)) DoubleType
    else StringType
  }

  /** Read the first sheet into a DataFrame: header row = column names,
    * types inferred per column. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val grid = readGrid(path)
    require(grid.nonEmpty, s"empty sheet in $path")
    val header = grid.head.map(_.getOrElse("")).toSeq
    val body = grid.tail
    val width = header.length
    val types = (0 until width).map { i =>
      inferType(body.flatMap(r => if (i < r.length) r(i) else None))
    }
    val schema = StructType(header.zip(types).map {
      case (n, t) => StructField(n, t, nullable = true)
    })
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    body.foreach { r =>
      val vals = (0 until width).map { i =>
        val cell = if (i < r.length) r(i) else None
        cell.map { s =>
          types(i) match {
            case LongType   => s.trim.toLong.asInstanceOf[Any]
            case DoubleType => s.trim.toDouble.asInstanceOf[Any]
            case _          => s.asInstanceOf[Any]
          }
        }.orNull
      }
      rows.add(Row(vals: _*))
    }
    spark.createDataFrame(rows, schema)
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
     .replace("\"", "&quot;")

  /** Write a DataFrame as a minimal single-sheet xlsx (inline strings —
    * no sharedStrings part needed). Driver-side: collect() is bounded by
    * the same small-result contract as the reference's `\s` export
    * (localsql/localsql.py:183-184). */
  def write(df: DataFrame, path: String): Unit = {
    val cols = df.columns
    val rows = df.collect()
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cell(value: Any): String = value match {
      case null => ""
      case n: Byte => s"<c t=\"n\"><v>$n</v></c>"
      case n: Short => s"<c t=\"n\"><v>$n</v></c>"
      case n: Int => s"<c t=\"n\"><v>$n</v></c>"
      case n: Long => s"<c t=\"n\"><v>$n</v></c>"
      case n: Float => s"<c t=\"n\"><v>$n</v></c>"
      case n: Double => s"<c t=\"n\"><v>$n</v></c>"
      case n: java.math.BigDecimal => s"<c t=\"n\"><v>$n</v></c>"
      case b: Boolean => s"<c t=\"b\"><v>${if (b) 1 else 0}</v></c>"
      case other => s"<c t=\"inlineStr\"><is><t>${xmlEscape(other.toString)}</t></is></c>"
    }
    sb.append("<row>")
    cols.foreach(c => sb.append(s"<c t=\"inlineStr\"><is><t>${xmlEscape(c)}</t></is></c>"))
    sb.append("</row>")
    rows.foreach { r =>
      sb.append("<row>")
      (0 until r.length).foreach(i => sb.append(cell(r.get(i))))
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    put("xl/worksheets/sheet1.xml", sb.toString)
    zos.close()
  }
}
