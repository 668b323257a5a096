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
  * (or explicit `fieldnames`), numeric/string/boolean/date cells. Date
  * and datetime cells follow openpyxl's behavior (the reference's Excel
  * backend): a NUMERIC cell whose style resolves to a date number format
  * decodes from its Excel serial value — date-only formats to a date,
  * formats with a time part to a wall-clock datetime (TimestampNTZ: an
  * xlsx has no timezone). Driver-side parse into a local Seq then
  * parallelize — the reference treats Excel as a small-file convenience
  * format, not a scale path (for scale data use parquet/CSV).
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

  /** What a cell's number format says its numeric value means. */
  private sealed trait FmtKind
  private case object NumberFmt extends FmtKind
  private case object DateFmt extends FmtKind     // date-only (no time part)
  private case object TimeFmt extends FmtKind     // time-only (no date part)
  private case object DateTimeFmt extends FmtKind // both

  /** Built-in numFmtId classes per ECMA-376 §18.8.30 (the same table
    * openpyxl ships): 14-17 and the East Asian 27-36 / 50-58 are dates,
    * 18-21 / 45-47 are times, 22 is a combined datetime. */
  private def builtinKind(id: Int): FmtKind = id match {
    case i if (14 to 17).contains(i) => DateFmt
    case i if (18 to 21).contains(i) => TimeFmt
    case 22 => DateTimeFmt
    case i if (27 to 36).contains(i) => DateFmt
    case i if (45 to 47).contains(i) => TimeFmt
    case i if (50 to 58).contains(i) => DateFmt
    case _ => NumberFmt
  }

  /** Classify a CUSTOM format code the way openpyxl's is_date_format
    * does: ignore quoted literals / [..] sections / backslash escapes,
    * then look for date tokens (y, d, or a bare month m) and time tokens
    * (h, s). "mm-dd-yy" → date; "h:mm AM/PM" → time; "m/d/yy h:mm" →
    * both; "#,##0.00" → number. */
  private def customKind(code: String): FmtKind = {
    val stripped = code
      .replaceAll("\"[^\"]*\"", "") // quoted literals
      .replaceAll("\\[[^\\]]*\\]", "") // color/locale/elapsed sections
      .replaceAll("\\\\.", "") // escaped chars
      .toLowerCase
    val hasDate = stripped.exists(c => c == 'y' || c == 'd')
    val hasTime = stripped.exists(c => c == 'h' || c == 's')
    val hasMonthOrMinute = stripped.contains('m')
    if (hasDate && hasTime) DateTimeFmt
    else if (hasDate) DateFmt
    else if (hasTime) TimeFmt
    // a bare run of m with no y/d/h/s context is a month (e.g. "mmm")
    else if (hasMonthOrMinute) DateFmt
    else NumberFmt
  }

  /** Per-style-index format kinds from xl/styles.xml: cellXfs[i] →
    * numFmtId → builtin table or custom numFmts code. Missing part or
    * malformed styles degrade to "no date styles" (numbers stay numbers),
    * matching a workbook with no styles at all. */
  private def styleKinds(doc: Option[org.w3c.dom.Document]): IndexedSeq[FmtKind] =
    doc.map { d =>
      val customs: Map[Int, String] = {
        val ns = d.getElementsByTagName("numFmt")
        (0 until ns.getLength).map { i =>
          val e = ns.item(i).asInstanceOf[org.w3c.dom.Element]
          e.getAttribute("numFmtId").toInt -> e.getAttribute("formatCode")
        }.toMap
      }
      Option(d.getElementsByTagName("cellXfs").item(0)) match {
        case None => IndexedSeq.empty
        case Some(cellXfs) =>
          val kids = cellXfs.getChildNodes
          (0 until kids.getLength)
            .map(kids.item)
            .collect { case e: org.w3c.dom.Element if e.getTagName == "xf" => e }
            .map { xf =>
              val id = Option(xf.getAttribute("numFmtId")).filter(_.nonEmpty)
                .map(_.toInt).getOrElse(0)
              customs.get(id).map(customKind).getOrElse(builtinKind(id))
            }.toIndexedSeq
      }
    }.getOrElse(IndexedSeq.empty)

  /** Excel serial → date/datetime value, openpyxl's from_excel rules:
    * 1900 date system, epoch 1899-12-30 — except serials below 61, where
    * Excel's phantom 1900-02-29 hasn't happened yet and the epoch is one
    * day later. Sub-day fraction rounds to the nearest millisecond.
    * Date-only formats with no time remainder yield LocalDate; anything
    * with a time part yields LocalDateTime; a pure time-of-day (serial
    * < 1 under a time format) yields LocalTime. */
  private def fromSerial(serial: Double, kind: FmtKind): Any = {
    val days0 = math.floor(serial).toLong
    val ms0 = math.round((serial - days0) * 86400000.0)
    val (days, ms) = if (ms0 == 86400000L) (days0 + 1, 0L) else (days0, ms0)
    val epoch =
      if (serial < 61.0) java.time.LocalDate.of(1899, 12, 31)
      else java.time.LocalDate.of(1899, 12, 30)
    val date = epoch.plusDays(days)
    val time = java.time.LocalTime.ofNanoOfDay(ms * 1000000L)
    kind match {
      case TimeFmt if days == 0 => time
      case DateFmt if ms == 0 => date
      case _ => java.time.LocalDateTime.of(date, time)
    }
  }

  /** Parse sheet cells into rows of Option[Any]
    * (Double | Boolean | String | LocalDate | LocalDateTime | LocalTime). */
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
      val kinds = styleKinds(slurp("xl/styles.xml"))
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
          val styleKind = Option(c.getAttribute("s")).filter(_.nonEmpty)
            .flatMap(s => s.toIntOption).flatMap(kinds.lift).getOrElse(NumberFmt)
          out(idx) = raw.flatMap { v =>
            t match {
              case "s" => Some(shared(v.toInt))
              case "b" => Some(v == "1")
              case "d" => // ISO-8601 typed date cell (rare but in the spec)
                Some(try {
                  if (v.contains('T')) java.time.LocalDateTime.parse(v)
                  else java.time.LocalDate.parse(v): Any
                } catch { case _: java.time.format.DateTimeParseException => v })
              case "str" | "inlineStr" => Some(v)
              case "e" => None // formula error cell → null
              case _ => // numeric cell: a date style decodes the serial
                v.toDoubleOption match {
                  case Some(num) if styleKind != NumberFmt =>
                    Some(fromSerial(num, styleKind))
                  case Some(num) => Some(num)
                  case None => Some(v) // tolerate odd cells as text
                }
            }
          }
        }
        out
      }
    } finally zf.close()
  }

  /** Import sheet `sheet` of an .xlsx; first row is the header unless
    * `fieldnames` is given. Column types: Double if every non-null cell
    * is numeric, Boolean likewise; Date if every cell is a date-only
    * cell, TimestampNTZ if every cell is a date or datetime (dates
    * widen to midnight — Excel has no timezone, so the NTZ flavor keeps
    * the wall-clock reading intact under any session timezone); else
    * String (heterogeneous columns render dates ISO-style, matching the
    * reference's str(datetime) rendering). */
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
        else if (vs.nonEmpty && vs.forall(_.isInstanceOf[java.time.LocalDate])) DateType
        else if (vs.nonEmpty && vs.forall(v =>
          v.isInstanceOf[java.time.LocalDate] || v.isInstanceOf[java.time.LocalDateTime]))
          TimestampNTZType
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
          case (Some(x: java.time.LocalDate), DateType) => java.sql.Date.valueOf(x)
          case (Some(x: java.time.LocalDate), TimestampNTZType) => x.atStartOfDay()
          case (Some(x: java.time.LocalDateTime), TimestampNTZType) => x
          case (Some(x), StringType) => x match {
            // whole doubles render as integers only when exactly
            // long-representable (2^53 bound) — no silent saturation
            case d: Double if d == d.floor && math.abs(d) < (1L << 53).toDouble =>
              d.toLong.toString
            // str(datetime.date) / str(datetime.datetime) style
            case dt: java.time.LocalDateTime =>
              s"${dt.toLocalDate} ${dt.toLocalTime.format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))}"
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
    * excel_export — a small-file interchange format.
    *
    * `maxRows` defaults to the xlsx sheet cap (1,048,575 data rows under
    * the header). A table that exceeds it REFUSES to export — silent
    * truncation would hand the user a file that looks complete; at
    * pipeline scale the right sink is parquet/csv, not a spreadsheet. */
  def excelExport(t: GTable, path: String, maxRows: Int = 1048575): Unit = {
    val schema = t.df.schema
    require(maxRows > 0 && maxRows < Int.MaxValue,
      s"maxRows must be in [1, ${Int.MaxValue - 1}]")
    // collect one row past the cap: enough to detect overflow without
    // counting the full table
    val probe = t.df.limit(maxRows + 1).collect()
    if (probe.length > maxRows)
      throw new IllegalArgumentException(
        s"excelExport: table has more than $maxRows rows (the xlsx sheet cap " +
          "is 1,048,575 data rows); refusing to truncate silently — export " +
          "to parquet/csv, or pass a pre-limited table if a sample is intended")
    val rows = probe
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
    // Inverse of the import's fromSerial (1900 system, phantom-leap-day
    // epoch split); dates/timestamps export as styled serials so Excel —
    // and a re-import through excelImport — read them back typed.
    def dateSerial(d: java.time.LocalDate): Long = {
      val days = d.toEpochDay - java.time.LocalDate.of(1899, 12, 30).toEpochDay
      if (days < 61) days - 1 else days
    }
    def dtSerial(dt: java.time.LocalDateTime): Double =
      dateSerial(dt.toLocalDate) + dt.toLocalTime.toNanoOfDay / 86400e9
    val sheetRows = new StringBuilder
    def cell(ref: String, v: Any, dt: DataType): String = (v, dt) match {
      case (null, _) => ""
      // NaN/Infinity are not valid OOXML numbers (Excel flags the workbook
      // corrupt); openpyxl writes NaN as an empty cell — match that.
      case (x: Double, _: NumericType) if x.isNaN || x.isInfinite => ""
      case (x: Float, _: NumericType) if x.isNaN || x.isInfinite => ""
      case (x, _: NumericType) => s"""<c r="$ref"><v>$x</v></c>"""
      case (x: Boolean, BooleanType) => s"""<c r="$ref" t="b"><v>${if (x) 1 else 0}</v></c>"""
      case (x: java.sql.Date, _) =>
        s"""<c r="$ref" s="1"><v>${dateSerial(x.toLocalDate)}</v></c>"""
      case (x: java.time.LocalDate, _) =>
        s"""<c r="$ref" s="1"><v>${dateSerial(x)}</v></c>"""
      case (x: java.sql.Timestamp, _) =>
        s"""<c r="$ref" s="2"><v>${dtSerial(x.toLocalDateTime)}</v></c>"""
      case (x: java.time.LocalDateTime, _) =>
        s"""<c r="$ref" s="2"><v>${dtSerial(x)}</v></c>"""
      case (x: java.time.Instant, _) =>
        s"""<c r="$ref" s="2"><v>${dtSerial(java.time.LocalDateTime.ofInstant(x, java.time.ZoneOffset.UTC))}</v></c>"""
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
        |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
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
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
        |</Relationships>""".stripMargin)
    // style 1 = builtin date format (14: mm-dd-yy), style 2 = builtin
    // datetime format (22: m/d/yy h:mm) — the two kinds exported above
    put("xl/styles.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
        |<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
        |<borders count="1"><border/></borders>
        |<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>
        |<cellXfs count="3"><xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/><xf numFmtId="14" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/><xf numFmtId="22" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/></cellXfs>
        |</styleSheet>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$sheetRows</sheetData>
         |</worksheet>""".stripMargin)
  }
}
