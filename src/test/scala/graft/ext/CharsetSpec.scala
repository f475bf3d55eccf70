package graft.ext

import graft.SparkFunSuite
import java.nio.charset.StandardCharsets

class CharsetSpec extends SparkFunSuite {

  private val cyr = "привет мир это кириллический текст"
  private val fr = "document summary with sparse accents: café déjà reçu"

  test("BOM dispatch: UTF-8/16LE/16BE/32LE/32BE, BOM stripped") {
    def bom(prefix: Array[Int], body: Array[Byte]): Array[Byte] =
      prefix.map(_.toByte) ++ body
    val cases = Seq(
      (bom(Array(0xEF, 0xBB, 0xBF), cyr.getBytes(StandardCharsets.UTF_8)),
        "utf-8"),
      (bom(Array(0xFF, 0xFE), cyr.getBytes(StandardCharsets.UTF_16LE)),
        "utf-16le"),
      (bom(Array(0xFE, 0xFF), cyr.getBytes(StandardCharsets.UTF_16BE)),
        "utf-16be"),
      (bom(Array(0xFF, 0xFE, 0, 0), cyr.getBytes("UTF-32LE")), "utf-32le"),
      (bom(Array(0, 0, 0xFE, 0xFF), cyr.getBytes("UTF-32BE")), "utf-32be"))
    cases.foreach { case (bytes, want) =>
      val d = Charset.decodeToUtf8(bytes)
      assert(d.charset == want, s"want $want got ${d.charset}")
      assert(d.confident)
      assert(d.text == cyr, s"[$want] round-trip broke: ${d.text}")
    }
  }

  test("BOM-less: strict UTF-8 validation, ASCII, and the high-byte " +
    "single-byte discriminator") {
    val u8 = Charset.decodeToUtf8(cyr.getBytes(StandardCharsets.UTF_8))
    assert(u8.charset == "utf-8" && u8.confident && u8.text == cyr)
    val asc = Charset.decodeToUtf8(
      "plain ascii".getBytes(StandardCharsets.US_ASCII))
    assert(asc.charset == "us-ascii" && asc.confident &&
      asc.text == "plain ascii")
    // dense Cyrillic in windows-1251: invalid as UTF-8, high-byte-dense
    val w1251 = Charset.decodeToUtf8(cyr.getBytes("windows-1251"))
    assert(w1251.charset == "windows-1251", w1251.toString)
    assert(w1251.confident)
    assert(w1251.text == cyr, s"1251 round-trip broke: ${w1251.text}")
    // sparse accents in windows-1252: the non-confident Latin arm
    val w1252 = Charset.decodeToUtf8(fr.getBytes("windows-1252"))
    assert(w1252.charset == "windows-1252" && !w1252.confident)
    assert(w1252.text == fr)
  }

  test("BOM-less UTF-16 via the NUL-parity heuristic") {
    val latin = "this is plain latin text in utf sixteen"
    val le = Charset.decodeToUtf8(latin.getBytes(StandardCharsets.UTF_16LE))
    assert(le.charset == "utf-16le" && le.confident && le.text == latin)
    val be = Charset.decodeToUtf8(latin.getBytes(StandardCharsets.UTF_16BE))
    assert(be.charset == "utf-16be" && be.confident && be.text == latin)
  }

  test("Shift-JIS: dense kana/kanji leads detected, round-trips; " +
    "Cyrillic look-alikes stay windows-1251") {
    val jp = "こんにちは世界 これは日本語のテキストです 12"
    val d = Charset.decodeToUtf8(jp.getBytes("Shift_JIS"))
    assert(d.charset == "shift_jis", d.toString)
    assert(d.confident)
    assert(d.text == jp, s"SJIS round-trip broke: ${d.text}")
    // dense Cyrillic VALIDATES as SJIS pairs for some strings, but has
    // zero 0x81-0x9F leads — must stay windows-1251
    val ru = "привет мир это кириллический текст"
    assert(Charset.decodeToUtf8(ru.getBytes("windows-1251")).charset ==
      "windows-1251")
    // sparse-accent Latin stays 1252 (its 0xE0-0xEF accents pair as
    // SJIS leads but never as 0x81-0x9F ones)
    assert(Charset.decodeToUtf8(fr.getBytes("windows-1252")).charset ==
      "windows-1252")
  }

  test("totality: arbitrary bytes always decode to exactly one row, " +
    "never an exception") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { i =>
      val bytes = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      val d = Charset.decodeToUtf8(bytes) // must not throw
      assert(d.charset.nonEmpty)
      val _ = (d.text, d.confident)
    }
    assert(Charset.decodeToUtf8(Array.emptyByteArray) ==
      Charset.Decoded("", "us-ascii", true))
    // odd-length "UTF-16" poison: REPLACE, not crash
    val odd = Array[Byte](0xFF.toByte, 0xFE.toByte, 0x41)
    assert(Charset.decodeToUtf8(odd).charset == "utf-16le")
  }

  test("real-corpus interop: the reference's own Cyrillic fixture " +
    "(6.4 KB) round-trips through every single-byte and UTF-16 wire " +
    "encoding") {
    // /root/reference/test/resources/text.txt is real Russian prose —
    // the one-byte-encoding world this detector exists for. Re-encode
    // it into each wire charset and require detection + bit-exact
    // transcode back to the UTF-8 original. Guarded: skips where the
    // reference checkout is absent.
    val f = new java.io.File("/root/reference/test/resources/text.txt")
    assume(f.exists, "reference resources not present")
    val original = new String(java.nio.file.Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8)
    assert(original.count(c => c >= 0x400 && c <= 0x4FF) > 1000,
      "fixture must be Cyrillic-dominated")
    val cases = Seq(
      ("utf-8", original.getBytes(StandardCharsets.UTF_8)),
      ("windows-1251", original.getBytes("windows-1251")),
      ("utf-16le", original.getBytes(StandardCharsets.UTF_16LE)),
      ("utf-16be", original.getBytes(StandardCharsets.UTF_16BE)))
    cases.foreach { case (want, bytes) =>
      val d = Charset.decodeToUtf8(bytes)
      assert(d.charset == want, s"want $want got ${d.charset}")
      assert(d.text == original, s"[$want] real-corpus round-trip broke")
    }
    // dense Cyrillic → the confident 1251 arm
    assert(Charset.decodeToUtf8(original.getBytes("windows-1251")).confident)
  }

  test("DataFrame layer: one output row per input row, keep columns " +
    "preserved") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, cyr.getBytes(StandardCharsets.UTF_8)),
      (2L, cyr.getBytes("windows-1251")),
      (3L, fr.getBytes("windows-1252")),
      (4L, "ascii only".getBytes(StandardCharsets.US_ASCII)))
      .toDF("doc_id", "raw")
    val out = Charset.transcodeToUtf8(df, "raw")
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    // schema: (doc_id, text, charset, confident)
    assert(out.map(_.getString(2)).toSeq ==
      Seq("utf-8", "windows-1251", "windows-1252", "us-ascii"))
    assert(out(0).getString(1) == cyr && out(1).getString(1) == cyr)
    assert(out(2).getString(1) == fr)
    assert(out.map(_.getBoolean(3)).toSeq ==
      Seq(true, true, false, true))
  }
}
