package graft.ext

import graft.SparkFunSuite

class ZstdSpec extends SparkFunSuite {

  private def fill(b: Byte, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); java.util.Arrays.fill(a, b); a
  }

  test("xxh64: published empty-string vector + Spark XxHash64 interop") {
    assert(Zstd.xxh64(Array.empty[Byte], 0, 0, 0L) == 0xEF46DB3751D8E999L)
    // cross-validate against Spark's own XXH64 (seed 42 over raw binary)
    // on lengths covering every tail path (<4, <8, 8.., 32.., mixed)
    val s = spark
    import s.implicits._
    val cases = Seq(0, 1, 3, 4, 7, 8, 15, 31, 32, 33, 64, 100).map { n =>
      Array.tabulate(n)(i => ((i * 37 + n) % 251).toByte)
    }
    val sparkVals = cases.map(Seq(_)).map(_.toDF("b")
      .selectExpr("xxhash64(b)").collect()(0).getLong(0))
    cases.zip(sparkVals).foreach { case (b, want) =>
      assert(Zstd.xxh64(b, 0, b.length, 42L) == want, s"len=${b.length}")
    }
  }

  test("round-trip: raw + rle blocks, all fcs widths, checksum, skippable") {
    // fcs flag 0 + single segment (1-byte fcs), 1 (2-byte, value+256),
    // 2 (4-byte), 3 (8-byte)
    val combos = Seq(
      (0, true, Seq((false, fill(7, 100)))),
      (1, false, Seq((false, fill(3, 200)), (true, fill(9, 500)))),
      (2, false, Seq((true, fill(1, 1000)))),
      (3, false, Seq((false, fill(2, 50)), (false, fill(4, 60)))))
    combos.foreach { case (fcs, ss, blocks) =>
      val frame = Zstd.buildZstdFrame(blocks, withChecksum = true, fcs, ss)
      val Right(fs) = Zstd.zstdFrameTable(frame): @unchecked
      val want = blocks.map(_._2.length).sum
      val wantSum = blocks.map(b => b._2.map(_.toLong & 0xFF).sum).sum
      assert(fs == Seq(Zstd.ZstdFrame(0, "zstd", want, wantSum,
        blocks.length, Some(true))), s"fcs=$fcs")
    }
    // concatenated frames + skippable in the middle
    val cat = Zstd.buildZstdFrame(Seq((false, fill(5, 40))), withChecksum = false,
        2, singleSegment = false) ++
      Zstd.buildSkippable(fill(8, 30), nibble = 7) ++
      Zstd.buildZstdFrame(Seq((true, fill(6, 80))), withChecksum = true,
        2, singleSegment = false)
    val Right(fs) = Zstd.zstdFrameTable(cat): @unchecked
    assert(fs.map(f => (f.idx, f.kind, f.contentSize, f.nBlocks)) == Seq(
      (0, "zstd", 40L, 1), (1, "skippable", 30L, 0), (2, "zstd", 80L, 1)))
    assert(fs(0).checksumOk.isEmpty && fs(2).checksumOk.contains(true))
  }

  test("typed rejects: checksum poison, reserved bits, entropy blocks, bombs") {
    val good = Zstd.buildZstdFrame(Seq((false, fill(7, 100))),
      withChecksum = true, 2, singleSegment = false)
    // flip a content byte -> xxh64 catches it
    val bad = good.clone(); bad(good.length - 10) = 99
    assert(Zstd.zstdFrameTable(bad) == Left("bad content checksum"))
    // reserved descriptor bit
    val rd = good.clone(); rd(4) = (rd(4) | 0x08).toByte
    assert(Zstd.zstdFrameTable(rd) == Left("reserved descriptor bit set"))
    // compressed block type -> quarantine reject
    val cb = good.clone()
    val bhOff = 4 + 1 + 1 + 4 // magic+fhd+window+fcs4
    cb(bhOff) = (cb(bhOff) | 0x04).toByte // type 2
    assert(Zstd.zstdFrameTable(cb) == Left("compressed block unsupported"))
    // declared content size disagreeing with blocks
    val cs = good.clone(); cs(4 + 2) = (cs(4 + 2) + 1).toByte
    assert(Zstd.zstdFrameTable(cs) == Left("content size mismatch"))
    // RLE decode bomb: a 4-byte claim of a 1 MiB run under a small cap
    val bomb = Zstd.buildZstdFrame(Seq((true, fill(1, 1024 * 1024))),
      withChecksum = false, 2, singleSegment = false)
    assert(bomb.length < 100, s"rle bomb should be tiny, ${bomb.length}")
    assert(Zstd.zstdFrameTable(bomb, maxDecode = 1000) ==
      Left("frame exceeds decode cap"))
    assert(Zstd.zstdFrameTable(Array[Byte](1, 2, 3, 4, 5)) == Left("bad magic"))
    assert(Zstd.zstdFrameTable(Array.empty[Byte]) == Left("empty blob"))
    // truncation totality
    (0 to good.length).foreach(k => Zstd.zstdFrameTable(good.take(k)))
    assert(Zstd.zstdFrameTable(good.dropRight(1)).isLeft)
  }

  test("extractZstdContent: multi-block reassembly, skippable excluded, idx kept") {
    val s = spark
    import s.implicits._
    val payload = Array.tabulate(700)(i => (i * 13 % 251).toByte)
    val blob = Zstd.buildZstdFrame(
        Seq((false, payload.take(300)), (false, payload.drop(300))),
        withChecksum = true, 2, singleSegment = false) ++
      Zstd.buildSkippable(fill(9, 20)) ++
      Zstd.buildZstdFrame(Seq((true, fill(4, 90))), withChecksum = false,
        0, singleSegment = false)
    val df = Seq((1L, blob)).toDF("id", "blob")
    val rows = Zstd.extractZstdContent(df, "blob").orderBy("frame_idx")
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2)))
    assert(rows.map(_._1).toSeq == Seq(0, 2)) // skippable idx 1 absent
    assert(java.util.Arrays.equals(rows(0)._2, payload))
    assert(java.util.Arrays.equals(rows(1)._2, fill(4, 90)))
  }

  test("extractZstdFrames/zstdErrors: poison -> zero rows + typed error") {
    val s = spark
    import s.implicits._
    val good = Zstd.buildZstdFrame(Seq((false, fill(2, 64))),
      withChecksum = true, 2, singleSegment = false)
    val df = Seq((1L, good), (2L, good.dropRight(2)),
      (3L, Array.empty[Byte])).toDF("id", "blob")
    val rows = Zstd.extractZstdFrames(df, "blob").collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L)
    assert(rows.head.getLong(3) == 64L && rows.head.getLong(4) == 128L)
    val errs = Zstd.zstdErrors(df, "blob").orderBy("id").collect()
    assert(errs.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ==
      Seq((1L, true), (2L, false), (3L, false)))
  }
}
