package graft.ext

import graft.SparkFunSuite

class DocxSpec extends SparkFunSuite {

  private val paras = Seq(
    "hello world this is paragraph one",
    "tabs\there and\nbreaks",
    "entities & <angles> survive",
    "")

  test("round-trip: paragraphs, runs, tabs, breaks, entities") {
    val b = Docx.buildDocx(paras)
    val Right(out) = Docx.parseDocx(b): @unchecked
    assert(out == paras)
  }

  test("multi-run paragraphs reassemble exactly") {
    val long = Seq("x" * 100, "a b c d e f g h i j")
    val Right(out) = Docx.parseDocx(Docx.buildDocx(long)): @unchecked
    assert(out == long)
  }

  test("poison XML: typed rejects, never a crash") {
    // not a zip
    assert(Docx.parseDocx("plain text".getBytes).isLeft)
    assert(Docx.parseDocx(Array.emptyByteArray) == Left("too short"))
    // a valid zip with no word/document.xml
    val noDoc = ZipArchive.buildZip(Seq(("other.xml", 8, "<a/>".getBytes)))
    assert(Docx.parseDocx(noDoc) == Left("no word/document.xml"))
    // malformed XML payloads: each a typed reject
    def withXml(xml: String): Array[Byte] =
      ZipArchive.buildZip(Seq(("word/document.xml", 8, xml.getBytes)))
    assert(Docx.parseDocx(withXml("<w:p><w:t")) ==
      Left("unterminated tag"))
    assert(Docx.parseDocx(withXml("<w:p><w:t>unclosed")) ==
      Left("unterminated w:t"))
    assert(Docx.parseDocx(withXml("<w:p><w:t>no close tag</w:p>")) ==
      Left("unterminated w:t"))
    assert(Docx.parseDocx(withXml("<w:p><w:t>bad &entity;</w:t></w:p>")) ==
      Left("unknown entity"))
    assert(Docx.parseDocx(withXml("<w:p><w:t>bad &amp</w:t></w:p>")) ==
      Left("unterminated entity"))
    assert(Docx.parseDocx(withXml("<w:p><w:t>x</w:t>")) ==
      Left("unterminated paragraph"))
    assert(Docx.parseDocx(withXml("<w:p><w:t>&#x110000;</w:t></w:p>")) ==
      Left("char ref out of range"))
    // truncation totality over the container: typed or valid, no throw
    val good = Docx.buildDocx(paras)
    (0 until good.length by 5).foreach(k => Docx.parseDocx(good.take(k)))
  }

  test("numeric character references decode") {
    val b = ZipArchive.buildZip(Seq(("word/document.xml", 8,
      "<w:p><w:t>&#65;&#x42;c</w:t></w:p>".getBytes)))
    assert(Docx.parseDocx(b) == Right(Seq("ABc")))
  }

  test("DataFrame layer: paragraph rows + error channel") {
    import spark.implicits._
    val good = Docx.buildDocx(Seq("para one", "para two"))
    val bad = "PKbroken".getBytes
    val df = Seq((1L, good), (2L, bad)).toDF("doc_id", "blob")
    val rows = Docx.extractDocxText(df, "blob")
      .orderBy("doc_id", "para_idx").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1L, 0, "para one"), (1L, 1, "para two")))
    val errs = Docx.docxErrors(df, "blob").collect()
    assert(errs.length == 1 && errs(0).getAs[Long]("doc_id") == 2L)
  }

  test("core properties: present, absent part, absent elements, " +
    "entities") {
    import spark.implicits._
    val withProps = Docx.buildDocx(Seq("body"),
      coreProps = Some(("T&T <draft>", "a creator", "2024-01-02T03:04:05Z")))
    val noProps = Docx.buildDocx(Seq("body"))
    val df = Seq((1L, withProps), (2L, noProps)).toDF("doc_id", "blob")
    val rows = Docx.extractDocxMeta(df, "blob").orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("title") == "T&T <draft>")
    assert(rows(0).getAs[String]("creator") == "a creator")
    assert(rows(0).getAs[String]("created") == "2024-01-02T03:04:05Z")
    assert(rows(1).getAs[String]("title") == null)
    // a non-docx zip yields no metadata row (strict container gate)
    val notDocx = ZipArchive.buildZip(Seq(("other.xml", 8, "<a/>".getBytes)))
    val df2 = Seq((3L, notDocx)).toDF("doc_id", "blob")
    assert(Docx.extractDocxMeta(df2, "blob").collect().isEmpty)
  }

  test("java.util.zip interop: our OPC container opens as a zip") {
    val b = Docx.buildDocx(paras)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(b))
    val names = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toSeq
    assert(names.contains("word/document.xml") &&
      names.contains("[Content_Types].xml"))
  }

  test("external-writer interop: the committed JDK-toolchain artifact " +
    "(streaming zip with data descriptors + DOM-serialized XML, " +
    "LibreOffice-class part inventory) walks clean") {
    // Pins the literal `w:`-prefix assumption (Docx.scala) against an
    // INDEPENDENT writer pipeline: java.util.zip.ZipOutputStream on a
    // non-seekable sink sets GP bit 3 (zero-size local headers + data
    // descriptors — a layout our own builder never emits), and
    // javax.xml's namespace-aware Transformer serializes the
    // WordprocessingML with its own conventions. Guarded: skips if the
    // artifact is absent; regenerate with
    // `sbt "Test/runMain graft.ext.ExternalWriterFixture"`.
    val f = new java.io.File("src/test/resources/interop/external-writer.docx")
    assume(f.exists, "interop artifact not present")
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // the committed artifact really is the streaming layout
    assert((bytes(6) & 0x08) != 0, "expected GP bit 3 (data descriptor)")
    val Right(paras) = Docx.parseDocx(bytes): @unchecked
    assert(paras == ExternalWriterFixture.paragraphs,
      s"external-writer paragraphs did not round-trip: $paras")
    // core properties through the same artifact
    import spark.implicits._
    val df = Seq((1L, bytes)).toDF("doc_id", "blob")
    val meta = Docx.extractDocxMeta(df, "blob").collect()
    assert(meta.length == 1 &&
      meta(0).getAs[String]("title") == "Interop fixture" &&
      meta(0).getAs[String]("creator") == "jdk-toolchain")
    // and the error channel stays silent
    assert(Docx.docxErrors(df, "blob").collect().isEmpty)
  }
}
