package graft.ext

import graft.SparkFunSuite

class PngChunksSpec extends SparkFunSuite {

  test("interop: ImageIO-encoded RGB and gray PNGs walk cleanly") {
    val Right(rgb) = PngChunks.pngMeta(Multimodal.syntheticPng(33, 21, 5)): @unchecked
    assert(rgb.width == 33L && rgb.height == 21L)
    assert(rgb.bitDepth == 8 && rgb.colorType == 2 && rgb.interlace == 0)
    assert(rgb.idatBytes > 0 && rgb.nChunks >= 3)
    val Right(g) = PngChunks.pngMeta(
      Multimodal.syntheticGrayPng(17, 9, 3)): @unchecked
    assert(g.width == 17L && g.height == 9L && g.colorType == 0)
  }

  test("every chunk crc is verified; typed rejects; truncation totality") {
    val good = Multimodal.syntheticPng(24, 16, 7)
    // flip a byte inside IHDR data -> its CRC catches it
    val ih = good.clone(); ih(20) = (ih(20) ^ 0x01).toByte
    assert(PngChunks.pngMeta(ih) == Left("bad chunk crc"))
    // flip a byte deep in the blob (inside IDAT) -> that chunk's CRC
    val id = good.clone()
    id(good.length - 20) = (id(good.length - 20) ^ 0x01).toByte
    assert(PngChunks.pngMeta(id) == Left("bad chunk crc"))
    assert(PngChunks.pngMeta(Array.empty[Byte]) == Left("empty blob"))
    assert(PngChunks.pngMeta("notapng!".getBytes("US-ASCII")) ==
      Left("bad png signature"))
    assert(PngChunks.pngMeta(good.dropRight(1)).isLeft)
    assert(PngChunks.pngMeta(good ++ Array[Byte](1)) ==
      Left("trailing garbage"))
    (0 to good.length by 3).foreach(k => PngChunks.pngMeta(good.take(k)))
  }

  test("extractPngMeta: ok + typed error rows") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticPng(12, 10, 1)),
      (2L, Array[Byte](1, 2, 3))).toDF("id", "blob")
    val rows = PngChunks.extractPngMeta(df, "blob").orderBy("id").collect()
    assert(rows(0).getLong(1) == 12L && rows(0).getBoolean(8))
    assert(!rows(1).getBoolean(8) &&
      rows(1).getString(9) == "bad png signature")
  }
}
