package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** PPTX (OPC / PresentationML) text extraction — the slide-deck
  * sibling of [[Docx]] (r13 verdict ask #3): a .pptx is a ZIP holding
  * `ppt/presentation.xml` plus one `ppt/slides/slideN.xml` per slide;
  * visible text lives in DrawingML runs (`<a:t>`) inside paragraphs
  * (`<a:p>`), ECMA-376 part 1 §21.1 — the same run/paragraph split as
  * WordprocessingML with an `a:` prefix and `<a:br/>` line breaks.
  *
  * Same contract as the other OPC walks: a structural scan (no DTDs,
  * literal prefixes), slide parts bound in `slideN.xml` numeric order
  * (the order every mainstream writer emits). Strict and total:
  * poison is a typed reject via [[pptxErrors]]; a deck with no slide
  * parts yields zero text rows, not an error. 100 TB shape: one blob
  * in → paragraph rows out, narrow map, no shuffle.
  */
object Pptx {

  private val MaxParagraphs = 100000
  private val MaxTextBytes = 16 << 20

  private final case class Walk(msg: String)
    extends RuntimeException(msg, null, false, false)
  private def fail(msg: String): Nothing = throw Walk(msg)

  /** Paragraph texts of one slide part. */
  private[ext] def slideParagraphsOf(xml: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var nPara = 0
    val cur = new StringBuilder
    var inPara = false
    var i = 0
    val n = xml.length
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
        if (tagIs("a:p")) {
          if (!tag.endsWith("/")) { inPara = true; cur.clear() }
          else {
            out += ""
            nPara += 1
            if (nPara > MaxParagraphs) fail("too many paragraphs")
          }
          i = gt + 1
        } else if (tag == "/a:p") {
          if (inPara) {
            out += cur.toString
            nPara += 1
            if (nPara > MaxParagraphs) fail("too many paragraphs")
            inPara = false
          }
          i = gt + 1
        } else if (tagIs("a:t") && !tag.endsWith("/")) {
          val close = xml.indexOf("</a:t>", gt + 1)
          if (close < 0) fail("unterminated a:t")
          if (inPara) {
            cur.append(Docx.decodeEntitiesOf(xml.substring(gt + 1, close)))
            if (cur.length > MaxTextBytes) fail("paragraph too long")
          }
          i = close + "</a:t>".length
        } else if (tagIs("a:br")) {
          if (inPara) cur.append('\n')
          i = gt + 1
        } else i = gt + 1
      }
    }
    if (inPara) fail("unterminated paragraph")
    out.result()
  }

  /** Full walk: blob → (slide index, paragraph index, text) rows. */
  private[ext] def parsePptx(bytes: Array[Byte],
                             maxInflate: Long = 64L << 20)
      : Either[String, Seq[(Int, Int, String)]] =
    try {
      if (bytes == null || bytes.length < 4) return Left("too short")
      ZipArchive.payloadsOf(bytes, ".xml", maxInflate) match {
        case Left(e) => Left(e)
        case Right(parts) =>
          if (!parts.exists(_._2 == "ppt/presentation.xml"))
            return Left("no ppt/presentation.xml")
          val slides = parts
            .filter(p => p._2.startsWith("ppt/slides/slide") &&
              p._2.endsWith(".xml"))
            .flatMap { p =>
              val numStr = p._2
                .stripPrefix("ppt/slides/slide").stripSuffix(".xml")
              try Some((numStr.toInt, p._3))
              catch { case _: NumberFormatException => None }
            }
            .sortBy(_._1)
          Right(slides.zipWithIndex.flatMap { case ((_, payload), si) =>
            slideParagraphsOf(new String(payload,
              java.nio.charset.StandardCharsets.UTF_8))
              .zipWithIndex.map { case (text, pi) => (si, pi, text) }
          })
      }
    } catch {
      case Walk(m) => Left(m)
      case Docx.Walk(m) => Left(m) // the shared entity decoder's reject
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
    }

  /** One row per slide paragraph: `(…keep…, slide_idx, para_idx,
    * text)`. Poison blobs yield zero rows; [[pptxErrors]] is the
    * error channel.
    */
  def extractPptxText(df: DataFrame, binCol: String,
                      maxInflate: Long = 64L << 20): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("slide_idx", IntegerType, nullable = false),
        StructField("para_idx", IntegerType, nullable = false),
        StructField("text", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parsePptx(r.getAs[Array[Byte]](idx), maxInflate) match {
          case Left(_) => Iterator.empty
          case Right(paras) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            paras.iterator.map { case (si, pi, text) =>
              val arr = new Array[Any](nKeep + 3)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = si; arr(nKeep + 1) = pi; arr(nKeep + 2) = text
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: `(…keep…, error)`. */
  def pptxErrors(df: DataFrame, binCol: String,
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
        parsePptx(r.getAs[Array[Byte]](idx), maxInflate) match {
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

  /** Minimal valid OPC container: presentation.xml + one slide part
    * per entry of `slides` (each a list of paragraph texts; runs split
    * mid-text to exercise multi-run concatenation, embedded newlines
    * become `<a:br/>`).
    */
  def buildPptx(slides: Seq[Seq[String]]): Array[Byte] = {
    def runsOf(p: String): String = {
      val sb = new StringBuilder
      var buf = new StringBuilder
      def flushText(): Unit = if (buf.nonEmpty) {
        val t = buf.toString
        if (t.length > 8) {
          val cut = t.length / 2
          sb.append(s"<a:r><a:t>${escXml(t.take(cut))}</a:t></a:r>")
          sb.append(s"<a:r><a:t>${escXml(t.drop(cut))}</a:t></a:r>")
        } else sb.append(s"<a:r><a:t>${escXml(t)}</a:t></a:r>")
        buf = new StringBuilder
      }
      p.foreach {
        case '\n' => flushText(); sb.append("<a:br/>")
        case c => buf.append(c)
      }
      flushText()
      sb.toString
    }
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>
        |</Types>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>
        |</Relationships>""".stripMargin
    val presentation =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"/>""".stripMargin
    def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val slideEntries = slides.zipWithIndex.map { case (paras, i) =>
      val body = paras.map(p => s"<a:p>${runsOf(p)}</a:p>").mkString
      val xml =
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
           |<p:cSld><p:spTree><p:sp><p:txBody>$body</p:txBody></p:sp></p:spTree></p:cSld>
           |</p:sld>""".stripMargin
      (s"ppt/slides/slide${i + 1}.xml", 8, utf8(xml))
    }
    ZipArchive.buildZip(Seq(
      ("[Content_Types].xml", 8, utf8(contentTypes)),
      ("_rels/.rels", 8, utf8(rels)),
      ("ppt/presentation.xml", 8, utf8(presentation))) ++ slideEntries)
  }
}
