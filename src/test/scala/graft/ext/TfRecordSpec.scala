package graft.ext

import graft.SparkFunSuite

class TfRecordSpec extends SparkFunSuite {

  private def fill(b: Byte, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); java.util.Arrays.fill(a, b); a
  }

  test("round-trip: sizes, sums, order; crc32c vector pinned") {
    val blob = TfRecord.buildTfRecord(Seq(
      fill(7, 100), Array.empty[Byte], Array.tabulate(513)(i => (i % 251).toByte)))
    val Right(rs) = TfRecord.tfRecordTable(blob): @unchecked
    assert(rs.map(_.idx) == Seq(0, 1, 2))
    assert(rs.map(_.size) == Seq(100L, 0L, 513L))
    assert(rs(0).payloadSum == 700L)
    assert(rs(1).payloadSum == 0L)
    assert(rs(2).payloadSum == (0 until 513).map(_ % 251).sum.toLong)
    // the ONLY moving part vs plain CRC32 is Castagnoli + mask; pin the
    // published check vector crc32c("123456789") = 0xE3069283 through
    // the framing: a single-record blob of that payload must parse
    val v = TfRecord.buildTfRecord(Seq("123456789".getBytes("US-ASCII")))
    // trailer = mask(0xE3069283) little-endian
    val expected = {
      val crc = 0xE3069283
      ((crc >>> 15) | (crc << 17)) + 0xa282ead8
    }
    val got = (v(v.length - 4) & 0xFF) | ((v(v.length - 3) & 0xFF) << 8) |
      ((v(v.length - 2) & 0xFF) << 16) | ((v(v.length - 1) & 0xFF) << 24)
    assert(got == expected, f"crc32c vector: got $got%08x want $expected%08x")
    assert(TfRecord.tfRecordTable(v).isRight)
  }

  test("typed rejects: flipped bits, truncation totality") {
    val good = TfRecord.buildTfRecord(Seq(fill(3, 50), fill(5, 200)))
    def mut(off: Int, x: Int): Array[Byte] = {
      val b = good.clone(); b(off) = (b(off) ^ x).toByte; b
    }
    assert(TfRecord.tfRecordTable(Array.empty[Byte]) == Left("empty blob"))
    assert(TfRecord.tfRecordTable(null) == Left("empty blob"))
    // flip a length byte -> length crc (or bounds)
    assert(TfRecord.tfRecordTable(mut(0, 0x01)).isLeft)
    // flip a payload byte -> data crc
    assert(TfRecord.tfRecordTable(mut(20, 0x04)) == Left("bad data crc"))
    // flip the stored data crc itself
    assert(TfRecord.tfRecordTable(mut(12 + 50, 0x01)) == Left("bad data crc"))
    // oversized claimed length
    val big = good.clone(); big(6) = 0x7F
    assert(TfRecord.tfRecordTable(big) == Left("record length out of bounds"))
    // truncation totality: every prefix rejects or parses, never throws
    (0 to good.length).foreach(k => TfRecord.tfRecordTable(good.take(k)))
    assert(TfRecord.tfRecordTable(good.dropRight(1)).isLeft)
  }

  test("extractTfRecords/tfRecordErrors: poison -> zero rows + typed error") {
    val s = spark
    import s.implicits._
    val good = TfRecord.buildTfRecord(Seq(fill(2, 30), fill(4, 60)))
    val df = Seq((1L, good), (2L, good.dropRight(2)),
      (3L, Array.empty[Byte])).toDF("id", "blob")
    val rows = TfRecord.extractTfRecords(df, "blob").collect()
    assert(rows.length == 2 && rows.forall(_.getLong(0) == 1L))
    val errs = TfRecord.tfRecordErrors(df, "blob").orderBy("id").collect()
    assert(errs.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ==
      Seq((1L, true), (2L, false), (3L, false)))
    assert(errs(0).getInt(1) == 2)
  }
}
