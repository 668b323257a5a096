package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.GTable

/** Minimal self-contained .xlsx import/export (reference excel_import /
  * excel_export, littletable.py:3019-3115 / 3415-3459 — there via
  * openpyxl). An xlsx is a zip of OOXML parts; this reads/writes the
  * minimum conforming set with inline strings, so no third-party
  * dependency is needed (zero-egress build).
  *
  * Scope mirrors the reference surface: one sheet, first row as header
  * (or explicit `fieldnames`), numeric/string/boolean cells. Driver-side
  * parse into a local Seq then parallelize — the reference treats Excel
  * as a small-file convenience format, not a scale path (for scale data
  * use parquet/CSV).
  */
/** A1-notation column arithmetic (bijective base-26). */
private[graft] object ExcelRefs {
  def colIndex(cellRef: String): Int = {
    var i = 0; var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i) - 'A' + 1); i += 1
    }
    acc - 1
  }

  def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }
}

object Excel {
  import ExcelRefs.{colIndex, colRef}

  // ---------------- import ----------------

  /** Parse sheet cells into rows of Option[Any] (Double | Boolean | String). */
  private def readRows(path: String, sheet: Int): Seq[ArrayBuffer[Option[Any]]] = {
    val zf = new ZipFile(path)
    try {
      def slurp(name: String): Option[org.w3c.dom.Document] =
        Option(zf.getEntry(name)).map { e =>
          val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
          f.setNamespaceAware(false)
          f.newDocumentBuilder().parse(zf.getInputStream(e))
        }
      val shared: IndexedSeq[String] = slurp("xl/sharedStrings.xml").map { d =>
        val sis = d.getElementsByTagName("si")
        (0 until sis.getLength).map(i => sis.item(i).getTextContent)
      }.getOrElse(IndexedSeq.empty)
      val doc = slurp(s"xl/worksheets/sheet$sheet.xml")
        .getOrElse(throw new IllegalArgumentException(s"no sheet$sheet in $path"))
      val rowNodes = doc.getElementsByTagName("row")
      (0 until rowNodes.getLength).map { ri =>
        val out = ArrayBuffer.empty[Option[Any]]
        val cells = rowNodes.item(ri).asInstanceOf[org.w3c.dom.Element]
          .getElementsByTagName("c")
        (0 until cells.getLength).foreach { ci =>
          val c = cells.item(ci).asInstanceOf[org.w3c.dom.Element]
          val ref = c.getAttribute("r")
          // cells may legally omit r= (streaming writers): position is
          // then sequential after the previous cell
          val idx = if (ref.isEmpty) out.length else colIndex(ref)
          while (out.length <= idx) out += None
          val t = c.getAttribute("t")
          val vNodes = c.getElementsByTagName("v")
          val isNode = c.getElementsByTagName("is")
          val raw: Option[String] =
            if (t == "inlineStr" && isNode.getLength > 0)
              Some(isNode.item(0).getTextContent)
            else if (vNodes.getLength > 0) Some(vNodes.item(0).getTextContent)
            else None
          out(idx) = raw.flatMap { v =>
            t match {
              case "s" => Some(shared(v.toInt))
              case "b" => Some(v == "1")
              case "str" | "inlineStr" | "d" => Some(v)
              case "e" => None // formula error cell → null
              case _ => v.toDoubleOption.orElse(Some(v)) // tolerate odd cells as text
            }
          }
        }
        out
      }
    } finally zf.close()
  }

  /** Import sheet `sheet` of an .xlsx; first row is the header unless
    * `fieldnames` is given. Column types: Double if every non-null cell
    * is numeric, Boolean likewise, else String. */
  def excelImport(spark: SparkSession, path: String, sheet: Int = 1,
      fieldnames: Seq[String] = Nil): GTable = {
    val rows = readRows(path, sheet)
    require(rows.nonEmpty || fieldnames.nonEmpty,
      s"sheet $sheet of $path is empty and no fieldnames were given")
    // header cells render with the same whole-double rule as string data
    // cells (a numeric header 2.0 names the column "2", not "2.0")
    def cellText(v: Any): String = v match {
      case d: Double if d == d.floor && math.abs(d) < (1L << 53).toDouble =>
        d.toLong.toString
      case other => other.toString
    }
    val (header, data) =
      if (fieldnames.nonEmpty) (fieldnames, rows)
      else (rows.head.map(_.map(cellText).getOrElse("")).toSeq, rows.tail)
    val width = header.length
    def colVals(i: Int) = data.map(r => if (i < r.length) r(i) else None)
    val fields = header.zipWithIndex.map { case (name, i) =>
      val vs = colVals(i).flatten
      val dt: DataType =
        if (vs.nonEmpty && vs.forall(_.isInstanceOf[Double])) DoubleType
        else if (vs.nonEmpty && vs.forall(_.isInstanceOf[Boolean])) BooleanType
        else StringType
      StructField(name, dt, nullable = true)
    }
    val schema = StructType(fields)
    val sparkRows = data.map { r =>
      Row.fromSeq((0 until width).map { i =>
        val v = if (i < r.length) r(i) else None
        (v, fields(i).dataType) match {
          case (None, _) => null
          case (Some(x: Double), DoubleType) => x
          case (Some(x: Boolean), BooleanType) => x
          case (Some(x), StringType) => x match {
            // whole doubles render as integers only when exactly
            // long-representable (2^53 bound) — no silent saturation
            case d: Double if d == d.floor && math.abs(d) < (1L << 53).toDouble =>
              d.toLong.toString
            case other => other.toString
          }
          case (Some(x), _) => x
        }
      })
    }
    GTable(spark.createDataFrame(
      spark.sparkContext.parallelize(sparkRows.toSeq, math.max(1, sparkRows.length / 10000)),
      schema), new java.io.File(path).getName)
      .withMeta("excel", path)
  }

  // ---------------- export ----------------

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Export to a minimal single-sheet .xlsx (inline strings, numeric and
    * boolean cells typed). Collect-at-edge like the reference's
    * excel_export — a small-file interchange format. */
  def excelExport(t: GTable, path: String, maxRows: Int = 1048575): Unit = {
    val schema = t.df.schema
    val rows = t.df.limit(maxRows).collect()
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try writeParts(zos, schema, rows)
    finally zos.close()
  }

  private def writeParts(zos: ZipOutputStream,
      schema: StructType, rows: Array[Row]): Unit = {
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    val sheetRows = new StringBuilder
    def cell(ref: String, v: Any, dt: DataType): String = (v, dt) match {
      case (null, _) => ""
      // NaN/Infinity are not valid OOXML numbers (Excel flags the workbook
      // corrupt); openpyxl writes NaN as an empty cell — match that.
      case (x: Double, _: NumericType) if x.isNaN || x.isInfinite => ""
      case (x: Float, _: NumericType) if x.isNaN || x.isInfinite => ""
      case (x, _: NumericType) => s"""<c r="$ref"><v>$x</v></c>"""
      case (x: Boolean, BooleanType) => s"""<c r="$ref" t="b"><v>${if (x) 1 else 0}</v></c>"""
      case (x, _) => s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(x.toString)}</t></is></c>"""
    }
    sheetRows ++= "<row r=\"1\">"
    schema.fieldNames.zipWithIndex.foreach { case (f, i) =>
      sheetRows ++= cell(s"${colRef(i)}1", f, StringType)
    }
    sheetRows ++= "</row>"
    rows.zipWithIndex.foreach { case (r, ri) =>
      sheetRows ++= s"""<row r="${ri + 2}">"""
      schema.fields.zipWithIndex.foreach { case (sf, ci) =>
        sheetRows ++= cell(s"${colRef(ci)}${ri + 2}", r.get(ci), sf.dataType)
      }
      sheetRows ++= "</row>"
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
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$sheetRows</sheetData>
         |</worksheet>""".stripMargin)
  }
}
