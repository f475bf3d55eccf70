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
