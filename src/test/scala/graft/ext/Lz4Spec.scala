package graft.ext

import graft.SparkFunSuite

class Lz4Spec extends SparkFunSuite {
  import Lz4.{Lit, MatchRef}

  private def fill(b: Byte, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); java.util.Arrays.fill(a, b); a
  }
  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  test("XXH32: published vectors") {
    def h(s: String, seed: Int = 0): Long = {
      val b = ascii(s); Lz4.xxh32(b, 0, b.length, seed)
    }
    assert(h("") == 0x02CC5D05L)
    assert(h("a") == 0x550D7456L)
    assert(h("abc") == 0x32D153FFL)
    assert(h("Nobody inspects the spammish repetition") == 0xE2293B2FL)
    // all four length paths (16-stripe loop, 4-lane, tail, seeded)
    assert(h("0123456789abcdef") == 0xC2C45B69L)
    assert(h("0123456789abcdefghijklmnopqrstuvwxyz", 7) == 0x72F88912L)
    val r = Array.tabulate(101)(_.toByte)
    assert(Lz4.xxh32(r, 0, r.length, 0x9E3779B1) == 0x37B352EEL)
  }

  test("block decode: hand-constructed sequences (non-circular)") {
    // token 0x14: litLen 1, matchLen 4+4=8; literal 'X'; offset 1
    val hand = Array[Byte](0x14, 'X'.toByte, 1, 0)
    val frame = Lz4.buildLz4Frame(Seq((false, hand)), fill('X', 9),
      withContentSize = true)
    val Right(fs) = Lz4.lz4FrameTable(frame): @unchecked
    assert(fs.head.contentLen == 9L)
    assert(fs.head.contentSum == 9L * 'X')
    // classic RLE via the op builder: "A" + match(1, 18) = 19 × 'A'
    val rle = Lz4.buildLz4Block(Seq(Lit(ascii("A")), MatchRef(1, 18)))
    val dec = Lz4.replayOps(Seq(Lit(ascii("A")), MatchRef(1, 18)))
    assert(dec.length == 19 && dec.forall(_ == 'A'))
    val f2 = Lz4.buildLz4Frame(Seq((false, rle)), dec, withContentSize = true,
      withContentChecksum = true)
    val Right(fs2) = Lz4.lz4FrameTable(f2): @unchecked
    assert(fs2.head.contentLen == 19L && fs2.head.checksumOk.contains(true))
    // overlapping copy, offset 2: AB + 10 → ABABABABABAB (period 2)
    val ops = Seq(Lit(ascii("AB")), MatchRef(2, 10))
    val expect = "AB" + "AB" * 5
    assert(new String(Lz4.replayOps(ops)) == expect)
    // long literal run (>15 → extension bytes) + long match (>19)
    val big = Array.tabulate(300)(i => (i % 251).toByte)
    val ops2 = Seq(Lit(big), MatchRef(300, 400), Lit(ascii("tail")))
    val dec2 = Lz4.replayOps(ops2)
    val f3 = Lz4.buildLz4Frame(Seq((false, Lz4.buildLz4Block(ops2))), dec2,
      withContentChecksum = true)
    val Right(fs3) = Lz4.lz4FrameTable(f3): @unchecked
    assert(fs3.head.contentLen == dec2.length.toLong)
    assert(fs3.head.contentSum == dec2.map(b => (b & 0xFF).toLong).sum)
  }

  test("frames: uncompressed blocks, multi-frame, skippable, options") {
    val raw = fill(9, 500)
    val f1 = Lz4.buildLz4Frame(Seq((true, raw)), raw,
      withContentChecksum = true, withContentSize = true,
      withBlockChecksum = true)
    val ops = Seq(Lit(ascii("Z")), MatchRef(1, 100))
    val c2 = Lz4.replayOps(ops)
    val f2 = Lz4.buildLz4Frame(Seq((false, Lz4.buildLz4Block(ops))), c2)
    val sk = Lz4.buildLz4Skippable(fill(3, 40), nibble = 7)
    val Right(fs) = Lz4.lz4FrameTable(f1 ++ sk ++ f2): @unchecked
    assert(fs.map(_.kind) == Seq("lz4", "skippable", "lz4"))
    assert(fs(0).contentLen == 500L && fs(0).contentSum == 4500L)
    assert(fs(0).checksumOk.contains(true) && fs(2).checksumOk.isEmpty)
    assert(fs(1).contentLen == 40L && fs(1).contentSum == 120L)
    assert(fs(2).contentLen == 101L)
  }

  test("linked vs independent blocks: cross-block history") {
    // block 1: literals "HISTORY!"; block 2: match reaching into block 1
    val b1 = Lz4.buildLz4Block(Seq(Lit(ascii("HISTORY!"))))
    val b2 = Lz4.buildLz4Block(Seq(Lit(ascii("x")), MatchRef(9, 8)))
    val content = ascii("HISTORY!") ++ ascii("x") ++ ascii("HISTORY!")
    val linked = Lz4.buildLz4Frame(Seq((false, b1), (false, b2)), content,
      withContentChecksum = true, blockIndep = false)
    val Right(fs) = Lz4.lz4FrameTable(linked): @unchecked
    assert(fs.head.contentLen == content.length.toLong)
    assert(fs.head.checksumOk.contains(true) && !fs.head.blockIndep)
    // the SAME blocks declared independent must reject the back-reference
    val indep = Lz4.buildLz4Frame(Seq((false, b1), (false, b2)), content,
      blockIndep = true)
    assert(Lz4.lz4FrameTable(indep) == Left("match offset out of window"))
  }

  test("typed rejects: every verification is load-bearing") {
    val ops = Seq(Lit(fill(5, 30)), MatchRef(10, 20))
    val content = Lz4.replayOps(ops)
    val good = Lz4.buildLz4Frame(Seq((false, Lz4.buildLz4Block(ops))),
      content, withContentChecksum = true, withContentSize = true,
      withBlockChecksum = true)
    def mut(off: Int, x: Int): Array[Byte] = {
      val b = good.clone(); b(off) = (b(off) ^ x).toByte; b
    }
    assert(Lz4.lz4FrameTable(Array.empty[Byte]) == Left("empty blob"))
    assert(Lz4.lz4FrameTable(fill(0, 16)) == Left("bad magic"))
    // header checksum guards the descriptor (flip content-size byte)
    assert(Lz4.lz4FrameTable(mut(6, 0x01)) ==
      Left("header checksum mismatch"))
    // version != 01
    val v = good.clone(); v(4) = (v(4) ^ 0xC0).toByte
    assert(Lz4.lz4FrameTable(v) == Left("unsupported frame version"))
    // content checksum poison (last 4 bytes)
    assert(Lz4.lz4FrameTable(mut(good.length - 1, 0x10)) ==
      Left("content checksum mismatch"))
    // declared content size lies: rebuild with wrong contentForChecksum
    val lied = Lz4.buildLz4Frame(Seq((false, Lz4.buildLz4Block(ops))),
      content ++ ascii("x"), withContentSize = true)
    assert(Lz4.lz4FrameTable(lied) == Left("content size mismatch"))
    // block checksum poison: flip a block byte; the BLOCK checksum
    // fires before any content check
    val hdrLen = 4 + 2 + 8 + 1 // magic + FLG/BD + content size + HC
    val r = Lz4.lz4FrameTable(mut(hdrLen + 4 + 2, 0x20))
    assert(r == Left("block checksum mismatch"), s"got $r")
    // truncation totality: never throws
    (0 until good.length).foreach { k =>
      assert(Lz4.lz4FrameTable(good.take(k)).isLeft, s"prefix $k")
    }
    // zero offset
    val z = Lz4.buildLz4Frame(Seq((false,
      Array[Byte](0x14, 'X'.toByte, 0, 0))), fill('X', 9))
    assert(Lz4.lz4FrameTable(z) == Left("zero match offset"))
  }

  test("decode bombs stop at the declared block budget / frame cap") {
    // 6-byte compressed block claiming a 70 KB decode under BD=4 (64KB)
    val bomb = Lz4.buildLz4Block(Seq(Lit(ascii("Q")), MatchRef(1, 70000)))
    val f = Lz4.buildLz4Frame(Seq((false, bomb)), Array.empty[Byte])
    assert(Lz4.lz4FrameTable(f) == Left("block decode bomb"))
    // within block budget but over the frame cap
    val ok = Lz4.buildLz4Block(Seq(Lit(ascii("Q")), MatchRef(1, 50000)))
    val f2 = Lz4.buildLz4Frame(Seq((false, ok)), Array.empty[Byte])
    assert(Lz4.lz4FrameTable(f2, maxDecode = 1000) ==
      Left("block decode bomb"))
    assert(Lz4.lz4FrameTable(f2).isRight)
    // uncompressed path respects the cap too
    val f3 = Lz4.buildLz4Frame(Seq((true, fill(1, 5000))), fill(1, 5000))
    assert(Lz4.lz4FrameTable(f3, maxDecode = 1000) == Left("lz4 decode cap"))
  }

  test("extractLz4Frames / extractLz4Content / lz4Errors") {
    import spark.implicits._
    val ops = Seq(Lit(ascii("AB")), MatchRef(2, 40))
    val content = Lz4.replayOps(ops)
    val goodBlob = Lz4.buildLz4Frame(Seq((false, Lz4.buildLz4Block(ops))),
      content, withContentChecksum = true)
    val badBlob = {
      val b = goodBlob.clone()
      b(b.length - 1) = (b(b.length - 1) ^ 1).toByte; b
    }
    val df = Seq((1L, goodBlob), (2L, badBlob)).toDF("id", "blob")
    val rows = Lz4.extractLz4Frames(df, "blob").collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("content_len") == 42L)
    val cont = Lz4.extractLz4Content(df, "blob").collect()
    assert(cont.length == 1)
    assert(java.util.Arrays.equals(cont(0).getAs[Array[Byte]]("content"),
      content))
    val errs = Lz4.lz4Errors(df, "blob").collect()
    assert(errs.length == 1 &&
      errs(0).getAs[String]("error") == "content checksum mismatch")
  }
}
