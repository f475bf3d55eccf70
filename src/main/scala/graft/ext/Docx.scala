package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** DOCX (OPC / WordprocessingML) text extraction — the second big
  * real-corpus document format after PDF (round-12 verdict ask #4).
  * A .docx is an OPC container: a ZIP holding `word/document.xml`
  * plus parts we don't need for text. The ZIP layer is
  * [[ZipArchive]] (zip64-capable, every CRC verified); this module
  * adds the minimal WordprocessingML walk:
  *
  *   - `<w:p>` … `</w:p>`  paragraph boundaries → one row each;
  *   - `<w:t>` / `<w:t …>` … `</w:t>`  text runs (entity-decoded:
  *     the five XML named entities + decimal/hex character refs);
  *   - `<w:tab/>` → TAB, `<w:br/>` / `<w:cr/>` → newline within the
  *     paragraph.
  *
  * This is a STRUCTURAL scan in the [[ProtoWire]]/[[ParquetMeta]]
  * style, not an XML parser: no DTDs (so no entity-expansion bombs by
  * construction), no namespace resolution — the `w:` prefix is
  * matched literally, which is what every real-world writer emits.
  * Strict and total: a container whose ZIP layer fails validation, or
  * with no `word/document.xml`, or whose XML walk trips a cap is a
  * typed reject ([[docxErrors]]); one poison blob never crashes a
  * task. 100 TB shape: one blob in → paragraph rows out, narrow map,
  * no shuffle. Spec: ECMA-376 part 1 (WordprocessingML), ISO 29500.
  */
object Docx {

  private val MaxParagraphs = 100000
  private val MaxTextBytes = 16 << 20

  private[ext] final case class Walk(msg: String)
    extends RuntimeException(msg, null, false, false)
  private def fail(msg: String): Nothing = throw Walk(msg)

  /** [[decodeEntities]] for the sibling OPC walks ([[Xlsx]], [[Pptx]])
    * — throws [[Walk]], which the siblings catch alongside their own.
    */
  private[ext] def decodeEntitiesOf(s: String): String = decodeEntities(s)

  /** Decode the XML entities WordprocessingML text runs may carry. */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 12) fail("unterminated entity")
        val name = s.substring(i + 1, semi)
        name match {
          case "amp" => out.append('&')
          case "lt" => out.append('<')
          case "gt" => out.append('>')
          case "quot" => out.append('"')
          case "apos" => out.append('\'')
          case _ if name.startsWith("#x") || name.startsWith("#X") =>
            val v = try Integer.parseInt(name.substring(2), 16)
              catch { case _: NumberFormatException => fail("bad char ref") }
            if (v < 0 || v > 0x10FFFF) fail("char ref out of range")
            out.appendAll(Character.toChars(v))
          case _ if name.startsWith("#") =>
            val v = try Integer.parseInt(name.substring(1))
              catch { case _: NumberFormatException => fail("bad char ref") }
            if (v < 0 || v > 0x10FFFF) fail("char ref out of range")
            out.appendAll(Character.toChars(v))
          case _ => fail("unknown entity")
        }
        i = semi + 1
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Paragraph texts from one document.xml payload. */
  private[ext] def paragraphsOf(xml: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var nPara = 0
    val cur = new StringBuilder
    var inPara = false
    var i = 0
    val n = xml.length
    // tag scan: find each '<', dispatch on the tag name
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = n }
      else {
        val gt = xml.indexOf('>', lt + 1)
        if (gt < 0) fail("unterminated tag")
        val tag = xml.substring(lt + 1, gt)
        def tagIs(name: String): Boolean =
          tag == name || (tag.startsWith(name) && tag.length > name.length &&
            (tag.charAt(name.length) == ' ' || tag.charAt(name.length) == '/'))
        if (tagIs("w:p")) {
          if (!tag.endsWith("/")) { inPara = true; cur.clear() }
          else { // self-closing empty paragraph
            out += ""
            nPara += 1
            if (nPara > MaxParagraphs) fail("too many paragraphs")
          }
          i = gt + 1
        } else if (tag == "/w:p") {
          if (inPara) {
            out += cur.toString
            nPara += 1
            if (nPara > MaxParagraphs) fail("too many paragraphs")
            inPara = false
          }
          i = gt + 1
        } else if (tagIs("w:t") && !tag.endsWith("/")) {
          val close = xml.indexOf("</w:t>", gt + 1)
          if (close < 0) fail("unterminated w:t")
          if (inPara) {
            cur.append(decodeEntities(xml.substring(gt + 1, close)))
            if (cur.length > MaxTextBytes) fail("paragraph too long")
          }
          i = close + "</w:t>".length
        } else if (tagIs("w:tab")) {
          if (inPara) cur.append('\t')
          i = gt + 1
        } else if (tagIs("w:br") || tagIs("w:cr")) {
          if (inPara) cur.append('\n')
          i = gt + 1
        } else i = gt + 1
      }
    }
    if (inPara) fail("unterminated paragraph")
    out.result()
  }

  /** Full walk: blob → paragraph texts. */
  private[ext] def parseDocx(bytes: Array[Byte],
                             maxInflate: Long = 64L << 20)
      : Either[String, Seq[String]] =
    try {
      if (bytes == null || bytes.length < 4) return Left("too short")
      ZipArchive.payloadsOf(bytes, "word/document.xml", maxInflate) match {
        case Left(e) => Left(e)
        case Right(parts) =>
          parts.find(_._2 == "word/document.xml") match {
            case None => Left("no word/document.xml")
            case Some((_, _, payload)) =>
              Right(paragraphsOf(new String(payload,
                java.nio.charset.StandardCharsets.UTF_8)))
          }
      }
    } catch {
      case Walk(m) => Left(m)
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
    }

  /** One row per paragraph: `(…keep…, para_idx, text)`. Poison blobs
    * yield zero rows; [[docxErrors]] is the error channel.
    */
  def extractDocxText(df: DataFrame, binCol: String,
                      maxInflate: Long = 64L << 20): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("para_idx", IntegerType, nullable = false),
        StructField("text", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parseDocx(r.getAs[Array[Byte]](idx), maxInflate) match {
          case Left(_) => Iterator.empty
          case Right(paras) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            paras.iterator.zipWithIndex.map { case (text, pi) =>
              val arr = new Array[Any](nKeep + 2)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = pi
              arr(nKeep + 1) = text
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: `(…keep…, error)`. */
  def docxErrors(df: DataFrame, binCol: String,
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
        parseDocx(r.getAs[Array[Byte]](idx), maxInflate) match {
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

  /** Core document properties from `docProps/core.xml` (OPC Dublin
    * Core): title, creator, created, modified — the provenance fields
    * a corpus pipeline keys on. Absent part or absent element → null
    * column, not an error (properties are optional in OPC).
    */
  def extractDocxMeta(df: DataFrame, binCol: String,
                      maxInflate: Long = 64L << 20): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("title", StringType, nullable = true),
        StructField("creator", StringType, nullable = true),
        StructField("created", StringType, nullable = true),
        StructField("modified", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val props =
          try {
            // container must be a valid docx (has word/document.xml)
            parseDocx(bytes, maxInflate) match {
              case Left(_) => None
              case Right(_) =>
                val core = ZipArchive
                  .payloadsOf(bytes, "docProps/core.xml", maxInflate)
                  .toOption.flatMap(_.headOption).map(_._3)
                Some(core match {
                  case None => (null, null, null, null)
                  case Some(payload) =>
                    val xml = new String(payload,
                      java.nio.charset.StandardCharsets.UTF_8)
                    def el(tag: String): String = {
                      val open = xml.indexOf(s"<$tag")
                      if (open < 0) return null
                      val gt = xml.indexOf('>', open)
                      if (gt < 0) fail("unterminated tag")
                      if (xml.charAt(gt - 1) == '/') return ""
                      val close = xml.indexOf(s"</$tag>", gt)
                      if (close < 0) fail(s"unterminated $tag")
                      decodeEntities(xml.substring(gt + 1, close))
                    }
                    (el("dc:title"), el("dc:creator"),
                      el("dcterms:created"), el("dcterms:modified"))
                })
            }
          } catch { case Walk(_) => None }
        props match {
          case None => Iterator.empty
          case Some((ti, cr, cd, mo)) =>
            val arr = new Array[Any](nKeep + 4)
            var i = 0
            while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
            arr(nKeep) = ti; arr(nKeep + 1) = cr
            arr(nKeep + 2) = cd; arr(nKeep + 3) = mo
            Iterator.single(Row.fromSeq(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(arr)))
        }
      }
    }(enc)
  }

  // --------------------------------------------------- fixture writer

  /** XML escaping shared by the OPC fixture writers ([[Xlsx]],
    * [[Pptx]] reuse it like [[decodeEntitiesOf]]): all four named
    * entities, so the output is safe in BOTH element text and quoted
    * attribute values (Xlsx writes sheet names into attributes).
    */
  private[ext] def escXml(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  /** Minimal valid OPC container: `[Content_Types].xml`, the package
    * rels part, and a `word/document.xml` with one `<w:p>` per
    * paragraph (runs split mid-text so multi-run paragraphs are
    * exercised; tabs/newlines become `<w:tab/>`/`<w:br/>`).
    */
  def buildDocx(paragraphs: Seq[String],
                coreProps: Option[(String, String, String)] = None)
      : Array[Byte] = {
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
        |</Relationships>""".stripMargin
    def runsOf(p: String): String = {
      // encode tabs and newlines as their WordprocessingML elements,
      // split the remaining text into two runs when long enough
      val sb = new StringBuilder
      var buf = new StringBuilder
      def flushText(): Unit = if (buf.nonEmpty) {
        val t = buf.toString
        if (t.length > 8) {
          val cut = t.length / 2
          sb.append(s"""<w:r><w:t xml:space="preserve">${escXml(t.take(cut))}</w:t></w:r>""")
          sb.append(s"""<w:r><w:t xml:space="preserve">${escXml(t.drop(cut))}</w:t></w:r>""")
        } else
          sb.append(s"""<w:r><w:t xml:space="preserve">${escXml(t)}</w:t></w:r>""")
        buf = new StringBuilder
      }
      p.foreach {
        case '\t' => flushText(); sb.append("<w:r><w:tab/></w:r>")
        case '\n' => flushText(); sb.append("<w:r><w:br/></w:r>")
        case c => buf.append(c)
      }
      flushText()
      sb.toString
    }
    val body = paragraphs.map(p => s"<w:p>${runsOf(p)}</w:p>").mkString
    val document =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
         |<w:body>$body<w:sectPr/></w:body>
         |</w:document>""".stripMargin
    val coreEntry = coreProps.map { case (title, creator, created) =>
      val core =
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" xmlns:dc="http://purl.org/dc/elements/1.1/" xmlns:dcterms="http://purl.org/dc/terms/">
           |<dc:title>${escXml(title)}</dc:title>
           |<dc:creator>${escXml(creator)}</dc:creator>
           |<dcterms:created>${escXml(created)}</dcterms:created>
           |<dcterms:modified>${escXml(created)}</dcterms:modified>
           |</cp:coreProperties>""".stripMargin
      ("docProps/core.xml", 8,
        core.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    ZipArchive.buildZip(Seq(
      ("[Content_Types].xml", 8,
        contentTypes.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      ("_rels/.rels", 8,
        rels.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      ("word/document.xml", 8,
        document.getBytes(java.nio.charset.StandardCharsets.UTF_8))) ++
      coreEntry)
  }
}
