package graft.ext

import graft.SparkFunSuite

class ExifSpec extends SparkFunSuite {

  private def realJpeg: Array[Byte] = Multimodal.solidJpeg(16, 12, 128)

  test("round-trip on a REAL JPEG: both byte orders, extra tags counted") {
    Seq(true, false).foreach { le =>
      val jpeg = Exif.withExif(realJpeg,
        Exif.exifApp1(le, orientation = 6, width = 1600L, height = 1200L,
          extraTags = 2))
      val Right(m) = Exif.exifMeta(jpeg): @unchecked
      assert(m.hasExif && m.byteOrderLE == le)
      assert(m.orientation.contains(6))
      assert(m.width.contains(1600L) && m.height.contains(1200L))
      assert(m.nEntries.contains(5))
      // still a decodeable JPEG after insertion
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      assert(img != null && img.getWidth == 16 && img.getHeight == 12)
    }
  }

  test("no-exif JPEG: has_exif=false with nulls, not a reject") {
    val Right(m) = Exif.exifMeta(realJpeg): @unchecked
    assert(!m.hasExif && m.orientation.isEmpty && m.nEntries.isEmpty)
  }

  test("typed rejects: structure and TIFF malformations; truncation totality") {
    val good = Exif.withExif(realJpeg, Exif.exifApp1(true, 1, 100L, 50L))
    assert(Exif.exifMeta(Array.empty[Byte]) == Left("empty blob"))
    assert(Exif.exifMeta(Array[Byte](1, 2, 3)) == Left("bad soi"))
    // break the TIFF byte-order marker (SOI 2 + FF E1 len 4 + Exif\0\0 6)
    val bo = good.clone(); bo(12) = 'X'
    assert(Exif.exifMeta(bo) == Left("bad tiff header"))
    // orientation out of the 1..8 domain
    val badO = Exif.withExif(realJpeg, Exif.exifApp1(true, 9, 100L, 50L))
    assert(Exif.exifMeta(badO) == Left("bad orientation value"))
    // segment length runs past the blob (APP1 length high byte at 4)
    val tr = good.clone(); tr(4) = 0x7F
    assert(Exif.exifMeta(tr) == Left("truncated segment"))
    // truncation totality: never throws
    (0 to good.length by 3).foreach(k => Exif.exifMeta(good.take(k)))
  }

  test("extractExif over a DataFrame: ok rows, quarantine rows, poison rows") {
    val s = spark
    import s.implicits._
    val withE = Exif.withExif(realJpeg, Exif.exifApp1(false, 3, 640L, 480L))
    val df = Seq((1L, withE), (2L, realJpeg),
      (3L, Array[Byte](9, 9))).toDF("id", "blob")
    val rows = Exif.extractExif(df, "blob").orderBy("id").collect()
    assert(rows(0).getBoolean(1) && rows(0).getInt(3) == 3 &&
      rows(0).getLong(4) == 640L && rows(0).getBoolean(7))
    assert(!rows(1).getBoolean(1) && rows(1).isNullAt(3) &&
      rows(1).getBoolean(7))
    assert(!rows(2).getBoolean(7) && rows(2).getString(8) == "bad soi")
  }
}
