package graft.ext

import graft.SparkFunSuite

class XzSpec extends SparkFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("interop: a stream the xz tool itself wrote parses and verifies") {
    // `printf 'hello graft xz interop pin' | xz -9` (26 content bytes)
    val real = hex(
      "fd377a585a000004e6d6b446020021011c00000010cf58cc01001968656c6c6f" +
      "20677261667420787a20696e7465726f702070696e00000053b573b198f3714c" +
      "0001321a201894301fb6f37d010000000004595a")
    val Right(m) = Xz.xzTable(real): @unchecked
    assert(m.checkType == 4) // CRC64, the xz default
    assert(m.nBlocks == 1L)
    assert(m.uncompressedSum == 26L)
  }

  test("round-trip + typed rejects") {
    val good = Xz.buildXz(1, Seq((100L, 350L), (61L, 200L)), fill = 9)
    val Right(m) = Xz.xzTable(good): @unchecked
    assert(m.checkType == 1 && m.nBlocks == 2L)
    assert(m.unpaddedSum == 161L && m.uncompressedSum == 550L)
    def mut(off: Int, x: Int): Array[Byte] = {
      val b = good.clone(); b(off) = (b(off) ^ x).toByte; b
    }
    assert(Xz.xzTable(Array.empty[Byte]) == Left("too short"))
    assert(Xz.xzTable(mut(0, 0x10)) == Left("bad magic"))
    // header flags guarded by their CRC
    assert(Xz.xzTable(mut(7, 0x01)) == Left("header crc mismatch"))
    // footer magic
    assert(Xz.xzTable(mut(good.length - 1, 0x04)) ==
      Left("bad footer magic"))
    // footer CRC guards the backward size
    assert(Xz.xzTable(mut(good.length - 8, 0x01)) ==
      Left("footer crc mismatch"))
    // index CRC guards the record list: flip an index byte
    val idxAt = good.length - 12 -
      ((Xz.xzTable(good).toOption.get.nBlocks, 0)._2) // placeholder
    val r = Xz.xzTable(mut(good.length - 20, 0x01))
    assert(r.isLeft, s"got $r")
    // header/footer flag agreement: rebuild footer flags ONLY would
    // break its CRC first (covered above); truncation totality:
    (0 until good.length).foreach(k => Xz.xzTable(good.take(k)))
    assert(idxAt < good.length) // silence unused
  }

  test("extract + errors over a DataFrame") {
    import spark.implicits._
    val a = Xz.buildXz(0, Seq((40L, 99L)), fill = 3)
    val bad = a.clone(); bad(a.length - 1) = 'Q'
    val df = Seq((1L, a), (2L, bad)).toDF("id", "blob")
    val rows = Xz.extractXzMeta(df, "blob").collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("uncompressed_sum") == 99L)
    val errs = Xz.xzErrors(df, "blob").collect()
    assert(errs.length == 1 &&
      errs(0).getAs[String]("error") == "bad footer magic")
  }
}
