package graft.ext

/** Generator for the committed external-writer DOCX interop artifact
  * (`src/test/resources/interop/external-writer.docx`) — r13 verdict
  * ask #7: `Docx` matches the `w:` prefix literally, justified as
  * "what every real-world writer emits"; this artifact pins that
  * assumption against a genuinely INDEPENDENT writer toolchain.
  *
  * No office suite exists in this environment (zero egress), so the
  * independent toolchain is the JDK's own:
  *
  *   - `javax.xml` DOM + `Transformer` serializes `word/document.xml`
  *     and `docProps/core.xml` — a real namespace-aware XML writer
  *     with its own escaping and attribute-emission conventions, not
  *     this repo's string templates;
  *   - `java.util.zip.ZipOutputStream` writes the OPC container —
  *     crucially, on a streaming sink it sets general-purpose bit 3
  *     and emits DATA DESCRIPTORS (local headers carry zero sizes),
  *     a layout [[ZipArchive]]'s hand-rolled builder never produces
  *     but real writers do.
  *
  * The document body mirrors the part inventory and attribute noise
  * LibreOffice-class writers emit (styles/fontTable/settings parts,
  * `mc:Ignorable`, `w:rsidR` paragraph attributes, `w:rPr` run
  * properties, `xml:space="preserve"`), per ECMA-376's published
  * examples. Re-run with
  * `sbt "Test/runMain graft.ext.ExternalWriterFixture"` to regenerate.
  */
object ExternalWriterFixture {

  /** The paragraph texts the artifact carries — asserted verbatim by
    * the interop spec (tab, empty paragraph, entity-hostile chars,
    * Cyrillic through a real serializer).
    */
  val paragraphs: Seq[String] = Seq(
    "External writer interop fixture",
    "entities & <angles> \"quotes\" survive the JDK serializer",
    "tab\there and a multi-run continuation produced as separate runs",
    "",
    "кириллический текст через настоящий сериализатор")

  def documentXml(): Array[Byte] = {
    val wNs = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    val mcNs = "http://schemas.openxmlformats.org/markup-compatibility/2006"
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    val doc = dbf.newDocumentBuilder().newDocument()
    val root = doc.createElementNS(wNs, "w:document")
    root.setAttributeNS("http://www.w3.org/2000/xmlns/", "xmlns:mc", mcNs)
    root.setAttributeNS(mcNs, "mc:Ignorable", "w14")
    doc.appendChild(root)
    val body = doc.createElementNS(wNs, "w:body")
    root.appendChild(body)
    paragraphs.foreach { text =>
      val p = doc.createElementNS(wNs, "w:p")
      p.setAttributeNS(wNs, "w:rsidR", "00AB12CD")
      p.setAttributeNS(wNs, "w:rsidRDefault", "00AB12CD")
      val pPr = doc.createElementNS(wNs, "w:pPr")
      val style = doc.createElementNS(wNs, "w:pStyle")
      style.setAttributeNS(wNs, "w:val", "Normal")
      pPr.appendChild(style)
      p.appendChild(pPr)
      // split on tabs; emit each text chunk as up to two runs with
      // run-property noise, the way real writers fragment text
      val chunks = text.split("\t", -1)
      chunks.zipWithIndex.foreach { case (chunk, ci) =>
        if (ci > 0) {
          val r = doc.createElementNS(wNs, "w:r")
          r.appendChild(doc.createElementNS(wNs, "w:tab"))
          p.appendChild(r)
        }
        val parts =
          if (chunk.length > 12) Seq(chunk.take(7), chunk.drop(7))
          else if (chunk.nonEmpty) Seq(chunk)
          else Seq.empty
        parts.foreach { part =>
          val r = doc.createElementNS(wNs, "w:r")
          val rPr = doc.createElementNS(wNs, "w:rPr")
          val lang = doc.createElementNS(wNs, "w:lang")
          lang.setAttributeNS(wNs, "w:val", "en-US")
          rPr.appendChild(lang)
          r.appendChild(rPr)
          val t = doc.createElementNS(wNs, "w:t")
          t.setAttributeNS("http://www.w3.org/XML/1998/namespace",
            "xml:space", "preserve")
          t.appendChild(doc.createTextNode(part))
          r.appendChild(t)
          p.appendChild(r)
        }
      }
      body.appendChild(p)
    }
    body.appendChild(doc.createElementNS(wNs, "w:sectPr"))
    serialize(doc)
  }

  private def corePropsXml(): Array[Byte] = {
    val cpNs = "http://schemas.openxmlformats.org/package/2006/metadata/core-properties"
    val dcNs = "http://purl.org/dc/elements/1.1/"
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    val doc = dbf.newDocumentBuilder().newDocument()
    val root = doc.createElementNS(cpNs, "cp:coreProperties")
    doc.appendChild(root)
    val title = doc.createElementNS(dcNs, "dc:title")
    title.appendChild(doc.createTextNode("Interop fixture"))
    root.appendChild(title)
    val creator = doc.createElementNS(dcNs, "dc:creator")
    creator.appendChild(doc.createTextNode("jdk-toolchain"))
    root.appendChild(creator)
    serialize(doc)
  }

  private def serialize(doc: org.w3c.dom.Document): Array[Byte] = {
    val tf = javax.xml.transform.TransformerFactory.newInstance()
      .newTransformer()
    tf.setOutputProperty(javax.xml.transform.OutputKeys.ENCODING, "UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    tf.transform(new javax.xml.transform.dom.DOMSource(doc),
      new javax.xml.transform.stream.StreamResult(out))
    out.toByteArray
  }

  /** The full artifact: ZipOutputStream over a streaming sink (data
    * descriptors on every deflated entry) with a LibreOffice-class
    * part inventory.
    */
  def build(): Array[Byte] = {
    def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val contentTypes = utf8(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
        """</Types>""")
    val rels = utf8(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
        """</Relationships>""")
    val docRels = utf8(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
        """</Relationships>""")
    val styles = utf8(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<w:styles xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:style w:type="paragraph" w:styleId="Normal"><w:name w:val="Normal"/></w:style></w:styles>""")
    val fontTable = utf8(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<w:fonts xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:font w:name="Liberation Serif"><w:charset w:val="00"/></w:font></w:fonts>""")
    val settings = utf8(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<w:settings xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:zoom w:percent="100"/></w:settings>""")
    val entries = Seq(
      "[Content_Types].xml" -> contentTypes,
      "_rels/.rels" -> rels,
      "word/document.xml" -> documentXml(),
      "word/_rels/document.xml.rels" -> docRels,
      "word/styles.xml" -> styles,
      "word/fontTable.xml" -> fontTable,
      "word/settings.xml" -> settings,
      "docProps/core.xml" -> corePropsXml())
    val bos = new java.io.ByteArrayOutputStream()
    // Wrap in a plain OutputStream so ZipOutputStream cannot seek:
    // it must emit data descriptors (GP bit 3) like a streaming writer
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FilterOutputStream(bos))
    entries.foreach { case (name, payload) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(payload)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val dest = java.nio.file.Paths.get(args.headOption.getOrElse(
      "src/test/resources/interop/external-writer.docx"))
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.write(dest, build())
    println(s"wrote ${java.nio.file.Files.size(dest)} bytes to $dest")
  }
}
