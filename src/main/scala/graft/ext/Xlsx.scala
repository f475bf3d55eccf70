package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** XLSX (OPC / SpreadsheetML) cell extraction — the spreadsheet
  * sibling of [[Docx]] (r13 verdict ask #3): a .xlsx is a ZIP holding
  * `xl/workbook.xml` (sheet names), an optional
  * `xl/sharedStrings.xml` (the string table nearly all text cells
  * point into), and one `xl/worksheets/sheetN.xml` per sheet (cells
  * with refs, types, and values).
  *
  * Same contract as the other OPC walks: a STRUCTURAL scan, not an
  * XML parser — no DTDs (no entity-expansion bombs by construction),
  * prefixes matched literally. Worksheet parts are bound to workbook
  * sheet names in `sheetN.xml` numeric order (what every mainstream
  * writer emits; the rels indirection adds nothing for text
  * extraction). Cell semantics per ECMA-376 §18.3: `t="s"` is an
  * index into sharedStrings (bounds-checked — a poison index is a
  * typed reject), `t="inlineStr"` carries its text inline in
  * `<is><t>`, `t="str"` is a formula's cached string, no `t` is a
  * number; rich-text `<si>` items concatenate their run texts.
  * Strict and total: any cap/bounds trip is a typed reject via
  * [[xlsxErrors]]; one poison blob never crashes a task. 100 TB
  * shape: one blob in → cell rows out, narrow map, no shuffle.
  */
object Xlsx {

  private val MaxCells = 1000000
  private val MaxSharedStrings = 1000000
  private val MaxTextBytes = 16 << 20

  private final case class Walk(msg: String)
    extends RuntimeException(msg, null, false, false)
  private def fail(msg: String): Nothing = throw Walk(msg)

  final case class Cell(sheetIdx: Int, sheet: String, ref: String,
                        row: Int, colNum: Int, kind: String, value: String)

  /** `name="value"` attribute of a tag body (literal match, quotes
    * per ECMA-376's own serialization). The match must start a token
    * (preceded by whitespace), so `name="…"` can never resolve from
    * inside a longer attribute like `longname="…"` or a quoted value.
    */
  private def attr(tag: String, name: String): Option[String] = {
    val needle = s"""$name=""""
    var k = tag.indexOf(needle)
    while (k >= 0) {
      if (k > 0 && Character.isWhitespace(tag.charAt(k - 1))) {
        val start = k + needle.length
        val end = tag.indexOf('"', start)
        if (end < 0) fail("unterminated attribute")
        return Some(tag.substring(start, end))
      }
      k = tag.indexOf(needle, k + 1)
    }
    None
  }

  /** All `<t>`-run texts inside one element body, concatenated —
    * covers both plain `<t>x</t>` and rich-text runs
    * `<r>…<t>x</t></r><r><t>y</t></r>` (ECMA-376 §18.4.8).
    */
  private def tRunsOf(xml: String, from: Int, until: Int): String = {
    val sb = new StringBuilder
    var i = from
    while (i < until) {
      val lt = xml.indexOf("<t", i)
      if (lt < 0 || lt >= until) i = until
      else {
        val gt = xml.indexOf('>', lt + 1)
        if (gt < 0) fail("unterminated tag")
        val head = xml.substring(lt + 1, gt)
        if (head == "t" || head.startsWith("t ")) {
          if (head.endsWith("/")) i = gt + 1
          else {
            val close = xml.indexOf("</t>", gt + 1)
            if (close < 0 || close > until) fail("unterminated t")
            sb.append(Docx.decodeEntitiesOf(xml.substring(gt + 1, close)))
            if (sb.length > MaxTextBytes) fail("text too long")
            i = close + 4
          }
        } else i = gt + 1
      }
    }
    sb.toString
  }

  /** sharedStrings.xml → the string table, one entry per `<si>`. */
  private[ext] def sharedStringsOf(xml: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var n = 0
    var i = 0
    while (i < xml.length) {
      val lt = xml.indexOf("<si>", i)
      val ltA = xml.indexOf("<si ", i)
      val open = if (lt < 0) ltA else if (ltA < 0) lt else math.min(lt, ltA)
      if (open < 0) i = xml.length
      else {
        val gt = xml.indexOf('>', open + 1)
        if (gt < 0) fail("unterminated tag")
        val close = xml.indexOf("</si>", gt + 1)
        if (close < 0) fail("unterminated si")
        out += tRunsOf(xml, gt + 1, close)
        n += 1
        if (n > MaxSharedStrings) fail("too many shared strings")
        i = close + 5
      }
    }
    out.result()
  }

  /** `A1`-style ref → (row, 1-based column). */
  private[ext] def parseRef(ref: String): (Int, Int) = {
    var i = 0; var colNum = 0
    while (i < ref.length && ref.charAt(i) >= 'A' && ref.charAt(i) <= 'Z') {
      colNum = colNum * 26 + (ref.charAt(i) - 'A' + 1)
      if (colNum > 16384) fail("column out of range")
      i += 1
    }
    if (i == 0 || i == ref.length) fail(s"bad cell ref")
    var row = 0
    while (i < ref.length) {
      val c = ref.charAt(i)
      if (c < '0' || c > '9') fail("bad cell ref")
      row = row * 10 + (c - '0')
      if (row > 1048576) fail("row out of range")
      i += 1
    }
    if (row == 0) fail("bad cell ref")
    (row, colNum)
  }

  /** One worksheet part → its cells (empty cells skipped). */
  private def cellsOf(xml: String, sheetIdx: Int, sheet: String,
                      shared: Vector[String],
                      budget: Array[Int]): Seq[Cell] = {
    val out = Vector.newBuilder[Cell]
    var i = 0
    while (i < xml.length) {
      val lt = xml.indexOf("<c", i)
      if (lt < 0) i = xml.length
      else {
        val gt = xml.indexOf('>', lt + 1)
        if (gt < 0) fail("unterminated tag")
        val head = xml.substring(lt + 1, gt)
        if (!(head == "c" || head.startsWith("c ") ||
          (head.startsWith("c") && head.endsWith("/") && head.length == 2)))
          i = gt + 1 // <col>, <cols>, <conditionalFormatting>, …
        else if (head.endsWith("/")) i = gt + 1 // empty cell
        else {
          val close = xml.indexOf("</c>", gt + 1)
          if (close < 0) fail("unterminated c")
          val body = xml.substring(gt + 1, close)
          val ref = attr(head, "r").getOrElse(fail("cell without ref"))
          val (row, colNum) = parseRef(ref)
          val t = attr(head, "t").getOrElse("n")
          val cell: Option[Cell] = t match {
            case "s" =>
              val v = vOf(body).getOrElse(fail("shared cell without v"))
              val idx = try v.trim.toInt
                catch { case _: NumberFormatException =>
                  fail("bad shared string index") }
              if (idx < 0 || idx >= shared.length)
                fail("shared string index out of range")
              Some(Cell(sheetIdx, sheet, ref, row, colNum, "shared",
                shared(idx)))
            case "inlineStr" =>
              Some(Cell(sheetIdx, sheet, ref, row, colNum, "inline",
                tRunsOf(body, 0, body.length)))
            case "str" => vOf(body).map(v =>
              Cell(sheetIdx, sheet, ref, row, colNum, "formula",
                Docx.decodeEntitiesOf(v)))
            case "b" => vOf(body).map(v =>
              Cell(sheetIdx, sheet, ref, row, colNum, "bool", v.trim))
            case "e" => vOf(body).map(v =>
              Cell(sheetIdx, sheet, ref, row, colNum, "error", v.trim))
            case _ => vOf(body).map(v =>
              Cell(sheetIdx, sheet, ref, row, colNum, "num", v.trim))
          }
          cell.foreach { c =>
            out += c
            budget(0) += 1
            if (budget(0) > MaxCells) fail("too many cells")
          }
          i = close + 4
        }
      }
    }
    out.result()
  }

  /** Body of the cell's `<v>` element, if present. */
  private def vOf(body: String): Option[String] = {
    val open = body.indexOf("<v")
    if (open < 0) return None
    val gt = body.indexOf('>', open)
    if (gt < 0) fail("unterminated tag")
    if (body.charAt(gt - 1) == '/') return Some("")
    val close = body.indexOf("</v>", gt)
    if (close < 0) fail("unterminated v")
    Some(body.substring(gt + 1, close))
  }

  /** Sheet names from workbook.xml, in document order. */
  private[ext] def sheetNamesOf(xml: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < xml.length) {
      val lt = xml.indexOf("<sheet ", i)
      if (lt < 0) i = xml.length
      else {
        val gt = xml.indexOf('>', lt + 1)
        if (gt < 0) fail("unterminated tag")
        out += attr(xml.substring(lt + 1, gt), "name")
          .map(Docx.decodeEntitiesOf)
          .getOrElse(fail("sheet without name"))
        i = gt + 1
      }
    }
    out.result()
  }

  /** Full walk: blob → cells across all sheets. */
  private[ext] def parseXlsx(bytes: Array[Byte],
                             maxInflate: Long = 64L << 20)
      : Either[String, Seq[Cell]] =
    try {
      if (bytes == null || bytes.length < 4) return Left("too short")
      ZipArchive.payloadsOf(bytes, ".xml", maxInflate) match {
        case Left(e) => Left(e)
        case Right(parts) =>
          val byName = parts.map(p => p._2 -> p._3).toMap
          val workbook = byName.get("xl/workbook.xml") match {
            case None => return Left("no xl/workbook.xml")
            case Some(p) => new String(p,
              java.nio.charset.StandardCharsets.UTF_8)
          }
          val names = sheetNamesOf(workbook)
          val shared = byName.get("xl/sharedStrings.xml")
            .map(p => sharedStringsOf(new String(p,
              java.nio.charset.StandardCharsets.UTF_8)))
            .getOrElse(Vector.empty)
          val sheetParts = parts
            .filter(p => p._2.startsWith("xl/worksheets/sheet") &&
              p._2.endsWith(".xml"))
            .flatMap { p =>
              val numStr = p._2
                .stripPrefix("xl/worksheets/sheet").stripSuffix(".xml")
              try Some((numStr.toInt, p._3))
              catch { case _: NumberFormatException => None }
            }
            .sortBy(_._1)
          val budget = Array(0)
          Right(sheetParts.zipWithIndex.flatMap { case ((_, payload), k) =>
            val sheet = if (k < names.length) names(k) else s"sheet${k + 1}"
            cellsOf(new String(payload,
              java.nio.charset.StandardCharsets.UTF_8),
              k, sheet, shared, budget)
          })
      }
    } catch {
      case Walk(m) => Left(m)
      case Docx.Walk(m) => Left(m) // the shared entity decoder's reject
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
    }

  /** One row per cell: `(…keep…, sheet_idx, sheet, ref, row, col,
    * kind, value)`. Poison blobs yield zero rows; [[xlsxErrors]] is
    * the error channel.
    */
  def extractXlsxCells(df: DataFrame, binCol: String,
                       maxInflate: Long = 64L << 20): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("sheet_idx", IntegerType, nullable = false),
        StructField("sheet", StringType, nullable = false),
        StructField("ref", StringType, nullable = false),
        StructField("row", IntegerType, nullable = false),
        StructField("col", IntegerType, nullable = false),
        StructField("kind", StringType, nullable = false),
        StructField("value", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parseXlsx(r.getAs[Array[Byte]](idx), maxInflate) match {
          case Left(_) => Iterator.empty
          case Right(cells) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            cells.iterator.map { c =>
              val arr = new Array[Any](nKeep + 7)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = c.sheetIdx; arr(nKeep + 1) = c.sheet
              arr(nKeep + 2) = c.ref; arr(nKeep + 3) = c.row
              arr(nKeep + 4) = c.colNum; arr(nKeep + 5) = c.kind
              arr(nKeep + 6) = c.value
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: `(…keep…, error)`. */
  def xlsxErrors(df: DataFrame, binCol: String,
                 maxInflate: Long = 64L << 20): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) :+
      StructField("error", StringType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parseXlsx(r.getAs[Array[Byte]](idx), maxInflate) match {
          case Left(e) =>
            val arr = new Array[Any](nKeep + 1)
            var i = 0
            while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
            arr(nKeep) = e
            Iterator.single(Row.fromSeq(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(arr)))
          case Right(_) => Iterator.empty
        }
      }
    }(enc)
  }

  // --------------------------------------------------- fixture writer

  private def escXml(s: String): String = Docx.escXml(s)

  /** A cell value for [[buildXlsx]]: text cells alternate between the
    * shared-string table and inline strings so both read paths are
    * exercised; numbers go through `<v>`.
    */
  sealed trait CellValue
  final case class Text(s: String) extends CellValue
  final case class Num(v: String) extends CellValue

  /** Minimal valid OPC container: workbook + sharedStrings + one
    * worksheet part per sheet. `sheets` maps name → rows of cells
    * (cell (i, j) lands at ref (row i+1, col j+1)).
    */
  def buildXlsx(sheets: Seq[(String, Seq[Seq[CellValue]])]): Array[Byte] = {
    val sharedTable = scala.collection.mutable.LinkedHashMap
      .empty[String, Int]
    def colName(c: Int): String = { // 1-based
      var v = c; val sb = new StringBuilder
      while (v > 0) {
        val r = (v - 1) % 26
        sb.insert(0, ('A' + r).toChar); v = (v - 1) / 26
      }
      sb.toString
    }
    var textSeq = 0
    val sheetXmls = sheets.map { case (_, rows) =>
      val body = rows.zipWithIndex.map { case (cells, ri) =>
        val cellXml = cells.zipWithIndex.map { case (cv, ci) =>
          val ref = colName(ci + 1) + (ri + 1)
          cv match {
            case Num(v) => s"""<c r="$ref"><v>$v</v></c>"""
            case Text(s) =>
              textSeq += 1
              if (textSeq % 2 == 0)
                s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${escXml(s)}</t></is></c>"""
              else {
                val idx = sharedTable.getOrElseUpdate(s, sharedTable.size)
                s"""<c r="$ref" t="s"><v>$idx</v></c>"""
              }
          }
        }.mkString
        s"""<row r="${ri + 1}">$cellXml</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$body</sheetData>
         |</worksheet>""".stripMargin
    }
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheets>${sheets.zipWithIndex.map { case ((name, _), i) =>
            s"""<sheet name="${escXml(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString}</sheets>
         |</workbook>""".stripMargin
    val sst = {
      // split every other entry into two rich runs to exercise the
      // run-concatenation path
      val items = sharedTable.keys.zipWithIndex.map { case (s, i) =>
        if (i % 2 == 1 && s.length > 2) {
          val cut = s.length / 2
          s"""<si><r><t xml:space="preserve">${escXml(s.take(cut))}</t></r><r><t xml:space="preserve">${escXml(s.drop(cut))}</t></r></si>"""
        } else s"""<si><t xml:space="preserve">${escXml(s)}</t></si>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedTable.size}" uniqueCount="${sharedTable.size}">$items</sst>""".stripMargin
    }
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |</Types>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ZipArchive.buildZip(Seq(
      ("[Content_Types].xml", 8, utf8(contentTypes)),
      ("_rels/.rels", 8, utf8(rels)),
      ("xl/workbook.xml", 8, utf8(workbook)),
      ("xl/sharedStrings.xml", 8, utf8(sst))) ++
      sheetXmls.zipWithIndex.map { case (xml, i) =>
        (s"xl/worksheets/sheet${i + 1}.xml", 8, utf8(xml))
      })
  }
}
