package graft.ext

import graft.SparkFunSuite

class SevenZipSpec extends SparkFunSuite {

  private def fill(b: Byte, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); java.util.Arrays.fill(a, b); a
  }

  test("round-trip + typed rejects") {
    val good = SevenZip.buildSevenZip(100, fill(7, 40))
    val Right(m) = SevenZip.sevenZipTable(good): @unchecked
    assert(m.verMajor == 0 && m.verMinor == 4)
    assert(m.nextHeaderOffset == 100L && m.nextHeaderSize == 40L)
    assert(m.nextHeaderSum == 280L)
    def mut(off: Int, x: Int): Array[Byte] = {
      val b = good.clone(); b(off) = (b(off) ^ x).toByte; b
    }
    assert(SevenZip.sevenZipTable(Array.empty[Byte]) == Left("too short"))
    assert(SevenZip.sevenZipTable(mut(0, 0x10)) == Left("bad magic"))
    // locator fields guarded by the start-header CRC
    assert(SevenZip.sevenZipTable(mut(12, 0x01)) ==
      Left("start header crc mismatch"))
    // end header guarded by ITS crc
    assert(SevenZip.sevenZipTable(mut(good.length - 1, 0x01)) ==
      Left("next header crc mismatch"))
    // truncation totality
    (0 until good.length).foreach(k => SevenZip.sevenZipTable(good.take(k)))
  }

  test("overflow-crafted start headers reject, never crash or false-accept") {
    val good = SevenZip.buildSevenZip(100, fill(7, 40))
    // forge nhOffset/nhSize then recompute the start-header CRC so the
    // walk reaches the bounds check itself
    def forge(nhOffset: Long, nhSize: Long, nhCrc: Long): Array[Byte] = {
      val b = good.clone()
      var v = nhOffset
      (0 until 8).foreach { i => b(12 + i) = (v & 0xFF).toByte; v >>= 8 }
      v = nhSize
      (0 until 8).foreach { i => b(20 + i) = (v & 0xFF).toByte; v >>= 8 }
      v = nhCrc
      (0 until 4).foreach { i => b(28 + i) = (v & 0xFF).toByte; v >>= 8 }
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 20)
      v = crc.getValue
      (0 until 4).foreach { i => b(8 + i) = (v & 0xFF).toByte; v >>= 8 }
      b
    }
    // nhOffset + nhSize wraps Long negative: must reject, not AIOOBE
    assert(SevenZip.sevenZipTable(forge(1L << 62, 1L << 62, 0L)) ==
      Left("next header out of bounds"))
    // nhSize = 2^32 truncates toInt to 0: a forged nhCrc = 0 (CRC of
    // zero bytes) must NOT pass the verified gate
    assert(SevenZip.sevenZipTable(forge(0L, 1L << 32, 0L)) ==
      Left("next header out of bounds"))
    // genuinely-zero next header: reject (degenerate CRC domain)
    assert(SevenZip.sevenZipTable(forge(0L, 0L, 0L)) ==
      Left("next header out of bounds"))
  }

  test("extract + errors over a DataFrame") {
    import spark.implicits._
    val a = SevenZip.buildSevenZip(10, fill(2, 16))
    val bad = a.clone(); bad(a.length - 3) = 0x7F
    val df = Seq((1L, a), (2L, bad)).toDF("id", "blob")
    val rows = SevenZip.extractSevenZipMeta(df, "blob").collect()
    assert(rows.length == 1 &&
      rows(0).getAs[Long]("next_header_sum") == 32L)
    val errs = SevenZip.sevenZipErrors(df, "blob").collect()
    assert(errs.length == 1 &&
      errs(0).getAs[String]("error") == "next header crc mismatch")
  }
}
