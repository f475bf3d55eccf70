package graft.ext

import graft.SparkFunSuite

class CborSpec extends SparkFunSuite {

  private def stats(b: Array[Byte]): Map[String, (Long, Long)] = {
    val Right(s) = Cbor.cborTable(b): @unchecked
    s.map(f => f.family -> ((f.n, f.valSum))).toMap
  }

  test("all widths, negatives, strings (definite + indefinite), tags") {
    val w = new Cbor.Writer
    w.int(10).int(200).int(40000).int(70000).int(5000000000L)
    w.int(-5).int(-300)
    w.text("hello")
    w.textIndef(Seq("ab", "cde", "")) // reassembles to 5
    w.bytesV(Array[Byte](1, 2, 3))
    w.arrHeader(2).int(1).int(2)
    w.arrIndefStart().int(7).int(8).int(9).breakStop()
    w.mapHeader(1).text("k").bool(true)
    w.tag(1L).int(99)
    w.nullV().float64(2.5)
    val m = stats(w.bytes)
    assert(m("int") == ((13L, 10L + 200 + 40000 + 70000 + 5000000000L -
      5 - 300 + 1 + 2 + 7 + 8 + 9 + 99)))
    assert(m("text") == ((3L, 5L + 5 + 1)))
    assert(m("bytes") == ((1L, 3L)))
    assert(m("array") == ((2L, 5L)))
    assert(m("map") == ((1L, 1L)))
    assert(m("bool") == ((1L, 1L)))
    assert(m("tag") == ((1L, 1L)))
    assert(m("null")._1 == 1L)
    assert(m("float") == ((1L, 0L)))
  }

  test("typed rejects") {
    assert(Cbor.cborTable(Array.empty[Byte]) == Left("empty blob"))
    // lone break
    assert(Cbor.cborTable(Array[Byte](0xFF.toByte)) ==
      Left("unexpected break"))
    // reserved additional info 28 on major 0
    assert(Cbor.cborTable(Array[Byte](0x1C)) ==
      Left("reserved additional info"))
    // indefinite text with a BYTES chunk inside
    val bad = new Cbor.Writer
    bad.out.write((3 << 5) | 31)
    bad.bytesV(Array[Byte](1))
    bad.breakStop()
    assert(Cbor.cborTable(bad.bytes) == Left("bad indefinite chunk type"))
    // nesting bomb
    val bomb = Array.fill(100)(0x81.toByte) ++ Array[Byte](0x00)
    assert(Cbor.cborTable(bomb) == Left("nesting too deep"))
    // length lies
    assert(Cbor.cborTable(Array[Byte](0x58.toByte, 60, 1)) ==
      Left("length out of bounds"))
    // truncation totality
    val w = new Cbor.Writer
    w.mapHeader(2).text("a").int(70000).text("b")
      .textIndef(Seq("xy", "z"))
    val good = w.bytes
    (0 until good.length).foreach(k => Cbor.cborTable(good.take(k)))
    assert(Cbor.cborTable(good).isRight)
  }

  test("extract + errors over a DataFrame") {
    import spark.implicits._
    val w = new Cbor.Writer
    w.mapHeader(1).text("k").int(7)
    val good = w.bytes
    val bad = good ++ Array[Byte](0xFF.toByte)
    val df = Seq((1L, good), (2L, bad)).toDF("id", "blob")
    val rows = Cbor.extractCborStats(df, "blob")
      .orderBy("id", "family").collect()
    assert(rows.map(_.getAs[String]("family")).toSeq ==
      Seq("int", "map", "text"))
    val errs = Cbor.cborErrors(df, "blob").collect()
    assert(errs.length == 1 &&
      errs(0).getAs[String]("error") == "unexpected break")
  }
}
