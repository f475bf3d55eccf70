package graft.ext

import graft.SparkFunSuite

class MsgPackSpec extends SparkFunSuite {

  private def stats(b: Array[Byte]): Map[String, (Long, Long)] = {
    val Right(s) = MsgPack.msgPackTable(b): @unchecked
    s.map(f => f.family -> ((f.n, f.valSum))).toMap
  }

  test("every family and width decodes with the right value mass") {
    val pk = new MsgPack.Packer
    pk.int(5).int(200).int(70000).int(5000000000L) // fix/u8/u32/u64
    pk.int(-3).int(-100).int(-40000).int(-3000000000L) // nfix/i8/i32/i64
    pk.int(40000) // u16
    pk.str("ab").str("x" * 100) // fixstr + str8
    pk.binV(Array[Byte](1, 2, 3))
    pk.arrHeader(2).int(1).int(2)
    pk.arrHeader(17); (0 until 17).foreach(_ => pk.nil()) // array16
    pk.mapHeader(1).str("k").bool(true)
    pk.float64(3.5)
    val m = stats(pk.bytes)
    assert(m("int") == ((11L, 5 + 200 + 70000 + 5000000000L - 3 - 100 -
      40000 - 3000000000L + 40000 + 1 + 2)))
    assert(m("str") == ((3L, 2L + 100 + 1))) // "ab", x*100, "k"
    assert(m("bin") == ((1L, 3L)))
    assert(m("array") == ((2L, 19L)))
    assert(m("map") == ((1L, 1L)))
    assert(m("nil")._1 == 17L)
    assert(m("bool") == ((1L, 1L)))
    assert(m("float") == ((1L, 0L)))
  }

  test("fixext and ext lengths") {
    val pk = new MsgPack.Packer
    // fixext4: 0xD6, type, 4 bytes
    pk.out.write(0xD6); pk.out.write(1); pk.out.write(Array[Byte](9, 9, 9, 9))
    // ext8 len 5
    pk.out.write(0xC7); pk.out.write(5); pk.out.write(2)
    pk.out.write(Array[Byte](1, 2, 3, 4, 5))
    val m = stats(pk.bytes)
    assert(m("ext") == ((2L, 9L)))
  }

  test("typed rejects and bombs") {
    assert(MsgPack.msgPackTable(Array.empty[Byte]) == Left("empty blob"))
    assert(MsgPack.msgPackTable(Array[Byte](0xC1.toByte)) ==
      Left("reserved byte 0xc1"))
    // str8 claiming more than the blob has
    assert(MsgPack.msgPackTable(Array[Byte](0xD9.toByte, 50, 1, 2)) ==
      Left("length out of bounds"))
    // nesting bomb: 100 nested fixarray(1) headers
    val bomb = Array.fill(100)(0x91.toByte) ++ Array[Byte](0xC0.toByte)
    assert(MsgPack.msgPackTable(bomb) == Left("nesting too deep"))
    // truncation totality over a mixed blob
    val pk = new MsgPack.Packer
    pk.mapHeader(2).str("a").int(70000).str("b").arrHeader(1).float64(1.25)
    val good = pk.bytes
    (0 until good.length).foreach(k => MsgPack.msgPackTable(good.take(k)))
    assert(MsgPack.msgPackTable(good).isRight)
  }

  test("extract + errors over a DataFrame") {
    import spark.implicits._
    val pk = new MsgPack.Packer
    pk.mapHeader(1).str("k").int(7)
    val good = pk.bytes
    val bad = good ++ Array[Byte](0xC1.toByte)
    val df = Seq((1L, good), (2L, bad)).toDF("id", "blob")
    val rows = MsgPack.extractMsgPackStats(df, "blob")
      .orderBy("id", "family").collect()
    assert(rows.map(_.getAs[String]("family")).toSeq ==
      Seq("int", "map", "str"))
    val errs = MsgPack.msgPackErrors(df, "blob").collect()
    assert(errs.length == 1 &&
      errs(0).getAs[String]("error") == "reserved byte 0xc1")
  }
}
