package graft.ext

import graft.SparkFunSuite

class PptxSpec extends SparkFunSuite {

  private val slides = Seq(
    Seq("title slide text", "subtitle with entities & <angles>"),
    Seq("second slide bullet one", "line one\nline two", ""))

  test("round-trip: slides, paragraphs, runs, breaks, entities") {
    val b = Pptx.buildPptx(slides)
    val Right(out) = Pptx.parsePptx(b): @unchecked
    val got = out.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(got(0) == slides(0))
    assert(got(1) == slides(1))
  }

  test("slide order follows slideN.xml numeric order, not zip order") {
    // build slides 1..3, then check indices line up with content
    val b = Pptx.buildPptx(Seq(Seq("first"), Seq("second"), Seq("third")))
    val Right(out) = Pptx.parsePptx(b): @unchecked
    assert(out == Seq((0, 0, "first"), (1, 0, "second"), (2, 0, "third")))
  }

  test("poison: typed rejects, never a crash") {
    assert(Pptx.parsePptx("not a zip".getBytes).isLeft)
    assert(Pptx.parsePptx(Array.emptyByteArray) == Left("too short"))
    val noPres = ZipArchive.buildZip(Seq(("other.xml", 8, "<a/>".getBytes)))
    assert(Pptx.parsePptx(noPres) == Left("no ppt/presentation.xml"))
    def withSlide(xml: String): Array[Byte] =
      ZipArchive.buildZip(Seq(
        ("ppt/presentation.xml", 8, "<p:presentation/>".getBytes),
        ("ppt/slides/slide1.xml", 8, xml.getBytes)))
    assert(Pptx.parsePptx(withSlide("<a:p><a:t>unclosed")) ==
      Left("unterminated a:t"))
    assert(Pptx.parsePptx(withSlide("<a:p><a:t>x</a:t>")) ==
      Left("unterminated paragraph"))
    assert(Pptx.parsePptx(withSlide("<a:p><a:t>&bogus;</a:t></a:p>")) ==
      Left("unknown entity"))
    // a deck with no slide parts: zero rows, NOT an error
    val empty = ZipArchive.buildZip(Seq(
      ("ppt/presentation.xml", 8, "<p:presentation/>".getBytes)))
    assert(Pptx.parsePptx(empty) == Right(Seq.empty))
  }

  test("DataFrame layer: paragraphs out, poison to the error channel") {
    val s = spark; import s.implicits._
    val good = Pptx.buildPptx(Seq(Seq("hello deck")))
    val df = Seq((1L, good), (2L, "junk".getBytes)).toDF("doc_id", "blob")
    val out = Pptx.extractPptxText(df, "blob").collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L &&
      out(0).getString(3) == "hello deck")
    val errs = Pptx.pptxErrors(df, "blob").collect()
    assert(errs.length == 1 && errs(0).getLong(0) == 2L)
  }
}
