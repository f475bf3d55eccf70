package graft.ext

import graft.SparkFunSuite

class OrcSpec extends SparkFunSuite {

  test("round-trip under all four supported codecs, multi-chunk") {
    Seq(0, 1, 2, 4).foreach { codec =>
      val blob = Orc.buildOrc(codec, nCols = 3,
        stripeRows = Seq(100L, 250L, 7L), contentLength = 5555L,
        bodyLen = 64, chunkEvery = 48) // small chunks: reassembly live
      val r = Orc.orcFooterTable(blob)
      assert(r.isRight, s"codec $codec: $r")
      val Right(m) = r: @unchecked
      assert(m.compression == Map(0 -> "NONE", 1 -> "ZLIB",
        2 -> "SNAPPY", 4 -> "LZ4")(codec))
      assert(m.nStripes == 3 && m.nCols == 3)
      assert(m.numRows == 357L && m.contentLength == 5555L)
    }
  }

  test("interop: a footer Spark itself wrote (ORC + snappy) walks") {
    import spark.implicits._
    val dir = tempDir("orcmeta")
    val df = (0 until 777).map(i => (i.toLong, s"v$i", i % 5))
      .toDF("id", "s", "k")
    df.coalesce(1).write.mode("overwrite")
      .option("compression", "snappy").orc(s"$dir/t")
    val part = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".orc")).head
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    val Right(m) = Orc.orcFooterTable(bytes): @unchecked
    assert(m.numRows == 777L)
    assert(m.nCols == 3)
    assert(m.nStripes >= 1)
    assert(m.compression == "SNAPPY")
    // and zlib, Spark's other bundled orc codec
    df.coalesce(1).write.mode("overwrite")
      .option("compression", "zlib").orc(s"$dir/z")
    val pz = new java.io.File(s"$dir/z").listFiles()
      .filter(_.getName.endsWith(".orc")).head
    val Right(mz) = Orc.orcFooterTable(
      java.nio.file.Files.readAllBytes(pz.toPath)): @unchecked
    assert(mz.numRows == 777L && mz.compression == "ZLIB")
  }

  test("typed rejects") {
    val good = Orc.buildOrc(1, 2, Seq(10L, 20L), 100L, bodyLen = 16)
    def mut(off: Int, x: Int): Array[Byte] = {
      val b = good.clone(); b(off) = (b(off) ^ x).toByte; b
    }
    assert(Orc.orcFooterTable(Array.empty[Byte]) == Left("too short"))
    assert(Orc.orcFooterTable(mut(0, 0x40)) == Left("bad head magic"))
    // postscript magic poison (the byte before psLen)
    assert(Orc.orcFooterTable(mut(good.length - 2, 0x01)) ==
      Left("bad postscript magic"))
    // LZO / ZSTD quarantine
    Seq(3, 5).foreach { c =>
      val b = Orc.buildOrc(0, 1, Seq(5L), 10L, bodyLen = 0)
      // patch the postscript's compression varint (field 2 value):
      // rebuild instead — craft via buildOrc on codec then swap is
      // fragile, so build un-compressed and rewrite the codec byte
      // by scanning the postscript for key 0x10 (field 2, varint)
      val psLen = b(b.length - 1) & 0xFF
      val psStart = b.length - 1 - psLen
      var i = psStart
      var patched = false
      while (i < b.length - 2 && !patched) {
        if ((b(i) & 0xFF) == 0x10) { b(i + 1) = c.toByte; patched = true }
        i += 1
      }
      assert(patched)
      assert(Orc.orcFooterTable(b) == Left("unsupported compression"), s"c=$c")
    }
    // stripe-sum vs declared row count mismatch: bump the declared
    // numberOfRows varint (field 6 key 0x30) in the NONE-codec footer
    val nb = Orc.buildOrc(0, 1, Seq(9L), 10L, bodyLen = 0)
    val psLen2 = nb(nb.length - 1) & 0xFF
    val psStart2 = nb.length - 1 - psLen2
    var j = psStart2 - 2
    var hit = false
    while (j > 3 && !hit) {
      if ((nb(j) & 0xFF) == 0x30 && (nb(j + 1) & 0xFF) == 9) {
        nb(j + 1) = 8; hit = true
      }
      j -= 1
    }
    assert(hit)
    assert(Orc.orcFooterTable(nb) == Left("row count mismatch"))
    // truncation totality
    (0 until good.length).foreach(k => Orc.orcFooterTable(good.take(k)))
  }

  test("extract + errors over a DataFrame") {
    import spark.implicits._
    val a = Orc.buildOrc(2, 4, Seq(50L), 900L, bodyLen = 8)
    val bad = a.clone(); bad(bad.length - 2) = (bad(bad.length - 2) ^ 1).toByte
    val df = Seq((1L, a), (2L, bad)).toDF("id", "blob")
    val rows = Orc.extractOrcMeta(df, "blob").collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("num_rows") == 50L)
    assert(rows(0).getAs[Int]("n_cols") == 4)
    val errs = Orc.orcErrors(df, "blob").collect()
    assert(errs.length == 1 &&
      errs(0).getAs[String]("error") == "bad postscript magic")
  }
}
