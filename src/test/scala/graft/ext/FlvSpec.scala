package graft.ext

import graft.SparkFunSuite

class FlvSpec extends SparkFunSuite {

  private def fill(b: Byte, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); java.util.Arrays.fill(a, b); a
  }

  test("round-trip: tag chain, extended timestamps, flag agreement") {
    val flv = Flv.buildFlv(Seq(
      (18, 0L, fill(1, 50)),          // script data
      (9, 0L, fill(2, 1000)),         // video
      (8, 10L, fill(3, 200)),         // audio
      (9, 40L, fill(4, 900)),
      (9, 0x1234567FL, fill(5, 7)))) // > 24-bit timestamp: ext byte live
    val Right(ts) = Flv.flvTagTable(flv): @unchecked
    assert(ts.map(_.tagType) == Seq(18, 9, 8, 9, 9))
    assert(ts.map(_.dataSize) == Seq(50L, 1000L, 200L, 900L, 7L))
    assert(ts(4).timestampMs == 0x1234567FL)
    assert(ts(1).payloadSum == 2000L && ts(2).payloadSum == 600L)
  }

  test("typed rejects: back-pointer chain is load-bearing") {
    val good = Flv.buildFlv(Seq((9, 0L, fill(1, 100)), (8, 5L, fill(2, 60))))
    def mut(off: Int, x: Int): Array[Byte] = {
      val b = good.clone(); b(off) = (b(off) ^ x).toByte; b
    }
    assert(Flv.flvTagTable(Array.empty[Byte]) == Left("too short"))
    assert(Flv.flvTagTable(mut(0, 0x10)) == Left("bad magic"))
    assert(Flv.flvTagTable(mut(3, 0x02)) == Left("unsupported flv version"))
    assert(Flv.flvTagTable(mut(4, 0x10)) == Left("reserved header flags"))
    // drop the audio flag: header disagrees with the tags present
    assert(Flv.flvTagTable(mut(4, 0x04)) ==
      Left("header flags disagree with tags"))
    // first tag's back-pointer: flip a byte of it
    val bpAt = 9 + 4 + 11 + 100
    assert(Flv.flvTagTable(mut(bpAt + 3, 0x01)) ==
      Left("back-pointer mismatch"))
    // nonzero stream id
    assert(Flv.flvTagTable(mut(9 + 4 + 10, 0x01)) ==
      Left("nonzero stream id"))
    // truncation totality
    (0 until good.length).foreach(k => Flv.flvTagTable(good.take(k)))
    // trailing garbage = truncated next tag header
    assert(Flv.flvTagTable(good ++ fill(1, 3)).isLeft)
  }

  test("extract + errors over a DataFrame") {
    import spark.implicits._
    val a = Flv.buildFlv(Seq((9, 0L, fill(7, 11))))
    val bad = a.clone(); bad(a.length - 1) = (bad(a.length - 1) ^ 1).toByte
    val df = Seq((1L, a), (2L, bad)).toDF("id", "blob")
    val rows = Flv.extractFlvTags(df, "blob").collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("payload_sum") == 77L)
    val errs = Flv.flvErrors(df, "blob").collect()
    assert(errs.length == 1 &&
      errs(0).getAs[String]("error") == "back-pointer mismatch")
  }
}
