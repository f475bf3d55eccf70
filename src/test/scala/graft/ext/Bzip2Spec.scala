package graft.ext

import graft.SparkFunSuite

class Bzip2Spec extends SparkFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("interop: a stream bzip2 itself wrote scans to one block") {
    // `printf 'hello graft bzip2 split scan' | bzip2 -9`
    val real = hex(
      "425a6839314159265359ecf246ed0000061980400010003be5dc102000229a68" +
      "d1ea1936a14d3231313125d163da6970b2488b3210450dcfc5dc914e14243b3c" +
      "91bb40")
    val Right(m) = Bzip2.bzip2Table(real): @unchecked
    assert(m.level == 9)
    assert(m.nBlocks == 1L)
    assert(m.eosAtBit > 0L)
  }

  test("planted blocks at odd bit phases are all found") {
    // gaps deliberately NOT multiples of 8: the scan must work at
    // every bit phase
    val gaps = Seq(3, 17, 29, 8)
    val blob = Bzip2.buildBzip2(5, gaps)
    val Right(m) = Bzip2.bzip2Table(blob): @unchecked
    assert(m.level == 5)
    assert(m.nBlocks == 4L)
    assert(m.eosAtBit == 32L + gaps.map(_ + 48).sum)
    // typed rejects
    assert(Bzip2.bzip2Table(Array.empty[Byte]) == Left("too short"))
    val bm = blob.clone(); bm(0) = 'X'
    assert(Bzip2.bzip2Table(bm) == Left("bad magic"))
    val bl = blob.clone(); bl(3) = '0'
    assert(Bzip2.bzip2Table(bl) == Left("bad level digit"))
    // no blocks at all
    assert(Bzip2.bzip2Table(Bzip2.buildBzip2(1, Nil)) ==
      Left("no block magic"))
    // truncation totality
    (0 until blob.length).foreach(k => Bzip2.bzip2Table(blob.take(k)))
  }

  test("extract + errors over a DataFrame") {
    import spark.implicits._
    val a = Bzip2.buildBzip2(3, Seq(5, 11))
    val bad = a.clone()
    bad(bad.length - 7) = (bad(bad.length - 7) ^ 0xFF).toByte
    val df = Seq((1L, a), (2L, bad)).toDF("id", "blob")
    val rows = Bzip2.extractBzip2Meta(df, "blob").collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("n_blocks") == 2L)
    val errs = Bzip2.bzip2Errors(df, "blob").collect()
    assert(errs.length == 1)
  }
}
