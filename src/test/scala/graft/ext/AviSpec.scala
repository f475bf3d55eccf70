package graft.ext

import graft.SparkFunSuite

class AviSpec extends SparkFunSuite {

  private def fill(b: Byte, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); java.util.Arrays.fill(a, b); a
  }

  test("round-trip: streams, chunk inventory, junk, rec grouping, pad") {
    val avi = Avi.buildAvi(320, 240, 100, 33333,
      streams = Seq(("vids", 1L, 30L, 100L), ("auds", 1L, 8000L, 48000L)),
      movi = Seq(
        (0, "dc", fill(3, 101)), // odd size: pad byte live
        (1, "wb", fill(5, 200)),
        (0, "dc", fill(7, 44)),
        (1, "wb", fill(9, 11))),
      withJunk = true, recGroup = true)
    val Right(m) = Avi.aviTable(avi): @unchecked
    assert(m.width == 320L && m.height == 240L && m.totalFrames == 100L)
    assert(m.usPerFrame == 33333L)
    assert(m.streams.map(_.fccType) == Seq("vids", "auds"))
    assert(m.streams.map(_.rate) == Seq(30L, 8000L))
    assert(m.streams.map(_.length) == Seq(100L, 48000L))
    assert(m.streams.map(_.nChunks) == Seq(2, 2))
    assert(m.streams(0).payloadSum == 3L * 101 + 7L * 44)
    assert(m.streams(1).payloadSum == 5L * 200 + 9L * 11)
  }

  test("typed rejects") {
    val good = Avi.buildAvi(64, 48, 5, 1000,
      Seq(("vids", 1L, 25L, 5L)), Seq((0, "dc", fill(1, 10))))
    def mut(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    assert(Avi.aviTable(Array.empty[Byte]) == Left("too short"))
    assert(Avi.aviTable(mut(0, 'X')) == Left("bad riff magic"))
    assert(Avi.aviTable(mut(8, 'W')) == Left("not an avi form"))
    // declared stream count lies: avih dwStreams at hdrl body
    // locate 'avih' and patch its dwStreams (offset 24 in the body)
    val ai = (0 until good.length - 4)
      .find(i => good(i) == 'a' && good(i + 1) == 'v' &&
        good(i + 2) == 'i' && good(i + 3) == 'h').get
    val lied = good.clone(); lied(ai + 8 + 24) = 7
    assert(Avi.aviTable(lied) == Left("stream count mismatch"))
    // orphan movi chunk: patch the '00dc' id to stream 3
    val ci = (0 until good.length - 4)
      .find(i => good(i) == '0' && good(i + 1) == '0' &&
        good(i + 2) == 'd' && good(i + 3) == 'c').get
    val orphan = good.clone(); orphan(ci + 1) = '3'
    assert(Avi.aviTable(orphan) == Left("orphan stream chunk"))
    // unknown chunk kind
    val kindp = good.clone(); kindp(ci + 2) = 'z'
    assert(Avi.aviTable(kindp) == Left("unknown movi chunk kind"))
    // truncation totality
    (0 until good.length).foreach(k => Avi.aviTable(good.take(k)))
  }

  test("extract + errors over a DataFrame") {
    import spark.implicits._
    val a = Avi.buildAvi(16, 16, 2, 500, Seq(("vids", 1L, 10L, 2L)),
      Seq((0, "dc", fill(2, 30)), (0, "dc", fill(4, 31))))
    val bad = a.clone(); bad(5) = 0x7F // riff size out of bounds
    val df = Seq((1L, a), (2L, bad)).toDF("id", "blob")
    val rows = Avi.extractAviStreams(df, "blob").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Int]("n_chunks") == 2)
    assert(rows(0).getAs[Long]("payload_sum") == 2L * 30 + 4L * 31)
    val errs = Avi.aviErrors(df, "blob").collect()
    assert(errs.length == 1 &&
      errs(0).getAs[String]("error") == "riff size out of bounds")
  }
}
