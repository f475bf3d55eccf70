package graft.ext

import graft.SparkFunSuite

class WebPSpec extends SparkFunSuite {

  test("round-trip: vp8 / vp8l / vp8x / animated variants") {
    val Right(a) = WebP.webpMeta(WebP.syntheticWebP(0, 320, 240, 50, 3)): @unchecked
    assert(a == WebP.WebPMeta("vp8", 320, 240, hasAlpha = false,
      hasAnimation = false, 1))
    val Right(b) = WebP.webpMeta(WebP.syntheticWebP(1, 16383, 1, 8, 5)): @unchecked
    assert(b == WebP.WebPMeta("vp8l", 16383, 1, hasAlpha = true,
      hasAnimation = false, 1))
    val Right(c) = WebP.webpMeta(WebP.syntheticWebP(2, 640, 480, 30, 7)): @unchecked
    assert(c == WebP.WebPMeta("vp8x", 640, 480, hasAlpha = false,
      hasAnimation = false, 3))
    val Right(d) = WebP.webpMeta(WebP.syntheticWebP(3, 100000, 2, 0, 1)): @unchecked
    assert(d == WebP.WebPMeta("vp8x", 100000, 2, hasAlpha = true,
      hasAnimation = true, 2))
  }

  test("typed rejects: magic, sync, signature, version, canvas, bounds") {
    val good = WebP.syntheticWebP(0, 320, 240, 50, 3)
    assert(WebP.webpMeta(Array.empty[Byte]) == Left("empty blob"))
    assert(WebP.webpMeta("RIFX1234WEBP".getBytes("US-ASCII")) ==
      Left("bad riff magic"))
    val form = good.clone(); form(8) = 'A'
    assert(WebP.webpMeta(form) == Left("not a webp form"))
    // break the VP8 sync code (riff 12 + chunk hdr 8 + tag 3)
    val sync = good.clone(); sync(12 + 8 + 3) = 0x00
    assert(WebP.webpMeta(sync) == Left("bad vp8 sync code"))
    // interframe first
    val intr = good.clone(); intr(12 + 8) = (intr(12 + 8) | 1).toByte
    assert(WebP.webpMeta(intr) == Left("vp8 interframe first"))
    // vp8l bad version (set bits 29..31)
    val l = WebP.syntheticWebP(1, 64, 64, 8, 5)
    val lv = l.clone(); lv(12 + 8 + 4) = (lv(12 + 8 + 4) | 0xE0).toByte
    assert(WebP.webpMeta(lv) == Left("bad vp8l version"))
    // vp8x canvas disagreeing with the inner still frame
    val x = WebP.syntheticWebP(2, 640, 480, 30, 7)
    val xm = x.clone(); xm(12 + 8 + 4) = (xm(12 + 8 + 4) ^ 1).toByte
    assert(WebP.webpMeta(xm) == Left("vp8x canvas mismatch"))
    // riff size past the blob
    val rs = good.clone(); rs(6) = 0x7F
    assert(WebP.webpMeta(rs) == Left("riff size out of bounds"))
    // truncation totality
    (0 to good.length).foreach(k => WebP.webpMeta(good.take(k)))
  }

  test("extractWebPMeta: ok rows + typed error rows") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, WebP.syntheticWebP(1, 48, 32, 10, 2)),
      (2L, Array[Byte](1, 2, 3))).toDF("id", "blob")
    val rows = WebP.extractWebPMeta(df, "blob").orderBy("id").collect()
    assert(rows(0).getString(1) == "vp8l" && rows(0).getLong(2) == 48L &&
      rows(0).getBoolean(7))
    assert(!rows(1).getBoolean(7) && rows(1).getString(8) == "bad riff magic")
  }
}
