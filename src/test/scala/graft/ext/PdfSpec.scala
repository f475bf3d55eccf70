package graft.ext

import graft.SparkFunSuite

class PdfSpec extends SparkFunSuite {

  private val pages = Seq(
    Seq("hello world", "second line"),
    Seq("page two only"))

  private def textOf(b: Array[Byte]): Seq[String] = {
    val Right((_, pgs)) = Pdf.parsePdf(b): @unchecked
    pgs.map(_.text)
  }

  test("classic xref round-trip: pages, lines, meta") {
    val b = Pdf.buildPdf(pages)
    val Right((m, pgs)) = Pdf.parsePdf(b): @unchecked
    assert(m.version == "1.4" && m.xrefKind == "table" && m.nPages == 2)
    assert(pgs.map(_.text) ==
      Seq("hello world\nsecond line", "page two only"))
  }

  test("FlateDecode content + TJ arrays reproduce the same text") {
    assert(textOf(Pdf.buildPdf(pages, flate = true)) ==
      textOf(Pdf.buildPdf(pages)))
    assert(textOf(Pdf.buildPdf(pages, useTJ = true)) ==
      textOf(Pdf.buildPdf(pages)))
    assert(textOf(Pdf.buildPdf(pages, flate = true, useTJ = true)) ==
      textOf(Pdf.buildPdf(pages)))
  }

  test("xref stream (PNG Up predictor) and ObjStm routes") {
    val viaStream = Pdf.buildPdf(pages, flate = true, xrefStream = true)
    val Right((m1, p1)) = Pdf.parsePdf(viaStream): @unchecked
    assert(m1.version == "1.5" && m1.xrefKind == "stream")
    assert(p1.map(_.text) == textOf(Pdf.buildPdf(pages)))
    val viaObjStm = Pdf.buildPdf(pages, flate = true, objStm = true)
    val Right((m2, p2)) = Pdf.parsePdf(viaObjStm): @unchecked
    assert(m2.xrefKind == "stream")
    assert(p2.map(_.text) == textOf(Pdf.buildPdf(pages)))
  }

  test("string escapes: parens, backslashes, nested parens") {
    val tricky = Seq(Seq("""a(b)c\d""", "x (y) z"))
    assert(textOf(Pdf.buildPdf(tricky)) == Seq("a(b)c\\d\nx (y) z"))
    assert(textOf(Pdf.buildPdf(tricky, flate = true, useTJ = true)) ==
      Seq("a(b)c\\d\nx (y) z"))
  }

  test("UTF-16BE hex text strings decode (BOM-dispatched)") {
    val uni = Seq(Seq("héllo wörld", "ascii too"), Seq("päge twö"))
    assert(textOf(Pdf.buildPdf(uni, hexUtf16 = true)) ==
      Seq("héllo wörld\nascii too", "päge twö"))
    assert(textOf(Pdf.buildPdf(uni, hexUtf16 = true, flate = true)) ==
      Seq("héllo wörld\nascii too", "päge twö"))
  }

  test("ASCIIHexDecode and ASCII85Decode filters, alone and chained " +
    "with FlateDecode") {
    val want = textOf(Pdf.buildPdf(pages))
    assert(textOf(Pdf.buildPdf(pages, asciiFilter = Some("AHx"))) == want)
    assert(textOf(Pdf.buildPdf(pages, asciiFilter = Some("A85"))) == want)
    assert(textOf(Pdf.buildPdf(pages, flate = true,
      asciiFilter = Some("AHx"))) == want)
    assert(textOf(Pdf.buildPdf(pages, flate = true,
      asciiFilter = Some("A85"))) == want)
    // corrupt ascii85: typed reject
    val b = Pdf.buildPdf(pages, asciiFilter = Some("A85"))
    val i = (0 until b.length - 1).find(j =>
      b(j) == '~' && b(j + 1) == '>').get
    val bad = b.clone(); bad(i - 1) = 'v' // outside '!'..'u'
    assert(Pdf.parsePdf(bad).isLeft)
  }

  test("LZWDecode: spec-semantics hand vector + fixture route + " +
    "width-boundary roundtrip") {
    // hand-packed code sequence [256, 'A', 'B', 258, 257] at width 9:
    // clear, literal A, literal B (table adds 258="AB"), code 258
    // ("AB", table adds 259="BA"), EOD → "ABAB"
    def pack(codes: Seq[Int], width: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0L; var bits = 0
      codes.foreach { c =>
        acc = (acc << width) | c; bits += width
        while (bits >= 8) {
          out.write(((acc >> (bits - 8)) & 0xFF).toInt); bits -= 8
        }
      }
      if (bits > 0) out.write(((acc << (8 - bits)) & 0xFF).toInt)
      out.toByteArray
    }
    val v = Pdf.lzwDecode(pack(Seq(256, 'A', 'B', 258, 257), 9), 1 << 20)
    assert(new String(v, "ISO-8859-1") == "ABAB")
    // the deferred-code case: code == next table entry (KwKwK)
    val v2 = Pdf.lzwDecode(pack(Seq(256, 'A', 258, 257), 9), 1 << 20)
    assert(new String(v2, "ISO-8859-1") == "AAA")
    // malformed: code beyond the table is a typed reject
    assert(Pdf.parsePdf(Array.emptyByteArray).isLeft) // (smoke)
    intercept[Exception](Pdf.lzwDecode(pack(Seq(256, 300, 257), 9), 1 << 20))
    // fixture route: LZW-coded content streams extract identically;
    // the long page crosses the 9->10 bit width boundary (needs >253
    // dictionary entries), proving encoder/decoder width sync
    val long = Seq(
      (0 until 40).map(i => s"line $i with some repeated words " +
        ("abcdefghij" * 3).drop(i % 7)),
      Seq("short second page"))
    assert(textOf(Pdf.buildPdf(long, asciiFilter = Some("LZW"))) ==
      textOf(Pdf.buildPdf(long)))
    assert(textOf(Pdf.buildPdf(pages, asciiFilter = Some("LZW"))) ==
      textOf(Pdf.buildPdf(pages)))
  }

  test("RunLengthDecode: literals, runs, EOD, truncation rejects") {
    def enc(parts: Array[Byte]*): Array[Byte] = {
      // naive literal-only encoder + explicit runs where asked
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach { p => out.write(p, 0, p.length) }
      out.write(128) // EOD
      out.toByteArray
    }
    // literal block "abc" + run of 5 'x'
    val data = enc(Array[Byte](2, 'a', 'b', 'c'),
      Array[Byte]((257 - 5).toByte, 'x'))
    assert(new String(Pdf.runLengthDecode(data), "ISO-8859-1") == "abcxxxxx")
    intercept[Exception](Pdf.runLengthDecode(Array[Byte](2, 'a')))
    intercept[Exception](Pdf.runLengthDecode(Array[Byte](200.toByte)))
  }

  test("Type0/CID fonts with ToUnicode CMaps decode to real text") {
    val uni = Seq(Seq("hello cid world", "line two!"), Seq("page 2"))
    assert(textOf(Pdf.buildPdf(uni, cidFont = true)) ==
      Seq("hello cid world\nline two!", "page 2"))
    assert(textOf(Pdf.buildPdf(uni, cidFont = true, flate = true)) ==
      Seq("hello cid world\nline two!", "page 2"))
    // xref-stream coding composes with the CID route
    assert(textOf(Pdf.buildPdf(uni, cidFont = true, flate = true,
      xrefStream = true)) ==
      Seq("hello cid world\nline two!", "page 2"))
  }

  test("real-world interop: the reference's own pdf_example.pdf " +
    "(212 KB, classic xref, FlateDecode, 73 objects) walks clean") {
    // test/deduplicator_test.exs:28 reads this file as chunk bytes;
    // we additionally EXTRACT it. Guarded: skips where the reference
    // checkout is absent.
    val f = new java.io.File(
      "/root/reference/test/resources/pdf_example.pdf")
    assume(f.exists, "reference resources not present")
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val Right((m, pages)) = Pdf.parsePdf(bytes): @unchecked
    assert(m.version == "1.5" && m.xrefKind == "table")
    assert(m.nObjects == 72, s"expected 72 located objects, got ${m.nObjects}")
    assert(m.nPages == 6 && pages.length == 6)
    // every font in this file is Type0/Identity-H with a ToUnicode
    // CMap — readable text out PROVES the CMap path on real data:
    // the title page is Russian ("Санкт-Петербургский политехнический
    // университет…"), so the decoded text must be dominated by
    // Cyrillic, not raw CID bytes
    val t = pages.head.text
    val cyr = t.count(c => c >= 0x400 && c <= 0x4FF)
    val nonWs = t.count(!_.isWhitespace)
    assert(nonWs > 100 && cyr * 10 > nonWs * 9,
      s"expected mostly-Cyrillic decoded text, got $cyr/$nonWs")
    assert(t.contains("Петербургский"),
      "a known title-page word must survive extraction verbatim")
  }

  test("incremental update: a second generation overrides an object " +
    "through /Prev, first-seen (newest) wins") {
    // real-world "save in place": new objects + a new xref section
    // whose trailer /Prev points at the previous startxref
    val base = Pdf.buildPdf(Seq(Seq("original text")))
    val s = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    val oldStart = s.lastIndexOf("startxref")
    val oldXrefOff = s.substring(oldStart + 9).trim.split("\\s+")(0)
    // object 4 is the single page's content stream (1 catalog, 2
    // pages, 3 page, 4 content, 5 font)
    val newContent = "BT /F1 12 Tf 72 720 Td (updated text) Tj ET\n"
    val upd = new StringBuilder()
    val updOff = base.length
    upd.append(s"4 0 obj\n<< /Length ${newContent.length} >>\nstream\n")
    upd.append(newContent)
    upd.append("endstream\nendobj\n")
    val xrefOff = base.length + upd.length
    upd.append("xref\n0 1\n0000000000 65535 f \n")
    upd.append(f"4 1\n$updOff%010d 00000 n \n")
    upd.append(s"trailer\n<< /Size 6 /Root 1 0 R /Prev $oldXrefOff >>\n")
    upd.append(s"startxref\n$xrefOff\n%%EOF\n")
    val twoGen = base ++ upd.toString
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val Right((m, pages)) = Pdf.parsePdf(twoGen): @unchecked
    assert(m.xrefKind == "table" && m.nPages == 1)
    assert(pages.head.text == "updated text",
      s"newest generation must win, got '${pages.head.text}'")
    // and the ORIGINAL file, unmodified, still reads the old text
    assert(textOf(base) == Seq("original text"))
  }

  test("typed rejects, never a crash") {
    assert(Pdf.parsePdf(null).isLeft)
    assert(Pdf.parsePdf(Array.emptyByteArray) == Left("too short"))
    assert(Pdf.parsePdf("not a pdf at all".getBytes) == Left("bad magic"))
    val good = Pdf.buildPdf(pages, flate = true)
    // truncation totality: a prefix cut before the startxref anchor is
    // a typed reject; one cut after it (losing only the %%EOF marker)
    // may legitimately still parse — but NOTHING may throw
    val anchor = new String(good,
      java.nio.charset.StandardCharsets.ISO_8859_1).indexOf("startxref")
    (0 until good.length by 7).foreach { k =>
      val r = Pdf.parsePdf(good.take(k))
      if (k <= anchor) assert(r.isLeft, s"prefix $k parsed")
    }
    // bit flips: typed reject or a parse that still terminates
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val m = good.clone()
      m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Pdf.parsePdf(m) // must not throw
    }
  }

  test("decompression bomb: inflate cap is a typed reject") {
    val big = Seq(Seq("x" * 400, "y" * 400))
    val b = Pdf.buildPdf(big, flate = true)
    assert(Pdf.parsePdf(b, maxInflate = 64).isLeft)
    assert(Pdf.parsePdf(b).isRight)
  }

  test("encrypted PDF is a TYPED reject, distinct from structural " +
    "poison") {
    // Plant an /Encrypt entry in the classic trailer dict (ISO 32000-1
    // §7.6) by byte surgery: the trailer sits AFTER the xref table, so
    // the startxref offset stays valid.
    val plain = Pdf.buildPdf(pages)
    val s = new String(plain, java.nio.charset.StandardCharsets.ISO_8859_1)
    val enc = s.replace("/Root 1 0 R >>", "/Root 1 0 R /Encrypt 99 0 R >>")
    assert(enc != s, "surgery must hit the trailer dict")
    val encrypted = enc.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Pdf.parsePdf(encrypted) == Left("encrypted"))
    // corrupt stays its own class
    assert(Pdf.parsePdf("%PDF-1.4 broken".getBytes).isLeft)
    assert(Pdf.parsePdf("%PDF-1.4 broken".getBytes) != Left("encrypted"))
    // error channel separates locked from corrupt
    import spark.implicits._
    val df = Seq((1L, plain), (2L, encrypted),
      (3L, "%PDF-1.4 broken".getBytes)).toDF("doc_id", "blob")
    val errs = Pdf.pdfErrors(df, "blob").orderBy("doc_id").collect()
    assert(errs.length == 2)
    assert(errs(0).getLong(0) == 2L && errs(0).getString(1) == "encrypted")
    assert(errs(1).getLong(0) == 3L && errs(1).getString(1) != "encrypted")
  }

  test("DataFrame layer: pages out, poison to error channel") {
    import spark.implicits._
    val good = Pdf.buildPdf(pages, flate = true)
    val bad = "%PDF-1.4 broken".getBytes
    val df = Seq((1L, good), (2L, bad)).toDF("doc_id", "blob")
    val rows = Pdf.extractPdfText(df, "blob")
      .orderBy("doc_id", "page_idx").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("text")).toSeq ==
      Seq("hello world\nsecond line", "page two only"))
    val meta = Pdf.extractPdfMeta(df, "blob").collect()
    assert(meta.length == 1 && meta(0).getAs[Int]("n_pages") == 2)
    val errs = Pdf.pdfErrors(df, "blob").collect()
    assert(errs.length == 1 && errs(0).getAs[Long]("doc_id") == 2L)
  }
}
