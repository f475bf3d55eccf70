package graft.ext

import graft.SparkFunSuite

class GzipSpec extends SparkFunSuite {

  private def fill(b: Byte, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); java.util.Arrays.fill(a, b); a
  }

  test("round-trip: every optional header field, multi-member, trailer") {
    val m0 = Gzip.buildGzipMember(fill(7, 1000), fname = "a.txt",
      comment = "hello", extra = fill(1, 8), mtime = 123456789L, os = 3,
      isText = true, withHcrc = true)
    val m1 = Gzip.buildGzipMember(Array.tabulate(777)(i => (i % 251).toByte))
    val m2 = Gzip.buildGzipMember(fill(9, 50), fname = "z.bin", os = 255)
    val Right(ms) = Gzip.gzipMemberTable(m0 ++ m1 ++ m2): @unchecked
    assert(ms.map(_.idx) == Seq(0, 1, 2))
    assert(ms(0).fname == "a.txt" && ms(0).comment == "hello")
    assert(ms(0).isText && ms(0).hcrcPresent && ms(0).extraLen == 8)
    assert(ms(0).mtime == 123456789L && ms(0).os == 3)
    assert(ms(0).decompLen == 1000L && ms(0).contentSum == 7000L)
    assert(ms(1).fname == null && ms(1).comment == null && !ms(1).hcrcPresent)
    assert(ms(1).decompLen == 777L &&
      ms(1).contentSum == (0 until 777).map(_ % 251).sum.toLong)
    assert(ms(2).fname == "z.bin" && ms(2).os == 255)
    // deflate actually compressed the constant run
    assert(ms(0).compLen < 1000L)
  }

  test("interop: GZIPInputStream reads our member; we read GZIPOutputStream") {
    val content = Array.tabulate(4321)(i => (i * 7 % 251).toByte)
    val ours = Gzip.buildGzipMember(content, fname = "f.txt", withHcrc = true)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(ours))
    val got = in.readAllBytes()
    assert(java.util.Arrays.equals(got, content))
    // reverse direction
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(content); gz.close()
    val Right(ms) = Gzip.gzipMemberTable(bos.toByteArray): @unchecked
    assert(ms.size == 1)
    assert(ms.head.decompLen == content.length.toLong)
    assert(ms.head.contentSum == content.map(_ & 0xFF).map(_.toLong).sum)
  }

  test("typed rejects: every verification is load-bearing") {
    val good = Gzip.buildGzipMember(fill(5, 400), fname = "x", withHcrc = true)
    def mut(off: Int, x: Int): Array[Byte] = {
      val b = good.clone(); b(off) = (b(off) ^ x).toByte; b
    }
    assert(Gzip.gzipMemberTable(Array.empty[Byte]) == Left("empty blob"))
    assert(Gzip.gzipMemberTable(null) == Left("empty blob"))
    assert(Gzip.gzipMemberTable(fill(0, 20)) == Left("bad gzip magic"))
    // reserved FLG bit
    assert(Gzip.gzipMemberTable(mut(3, 0x80)) == Left("reserved FLG bits set"))
    // bad method
    val cm = good.clone(); cm(2) = 7
    assert(Gzip.gzipMemberTable(cm) == Left("unknown compression method"))
    // FHCRC poison: flip a header byte covered by it (mtime)
    assert(Gzip.gzipMemberTable(mut(4, 0x01)) == Left("FHCRC mismatch"))
    // stored CRC32 poison
    assert(Gzip.gzipMemberTable(mut(good.length - 5, 0x10)) ==
      Left("CRC32 mismatch"))
    // ISIZE poison
    assert(Gzip.gzipMemberTable(mut(good.length - 1, 0x5A)) ==
      Left("ISIZE mismatch"))
    // unterminated FNAME: header claims FNAME but blob ends inside it
    val noHcrc = Gzip.buildGzipMember(fill(5, 10), fname = "longname.txt")
    assert(Gzip.gzipMemberTable(noHcrc.take(14)) == Left("unterminated FNAME"))
    // truncation totality: never throws, never fabricates a member
    (0 until good.length by 7).foreach { k =>
      assert(Gzip.gzipMemberTable(good.take(k)).isLeft, s"prefix $k")
    }
    // garbage after a valid member = truncated next header
    assert(Gzip.gzipMemberTable(good ++ fill(1, 4)).isLeft)
  }

  test("inflate bomb cap") {
    val bomb = Gzip.buildGzipMember(new Array[Byte](8 << 20)) // 8 MiB zeros
    assert(Gzip.gzipMemberTable(bomb, maxDecode = 1024) ==
      Left("gzip inflate cap"))
    // default cap passes it
    assert(Gzip.gzipMemberTable(bomb).isRight)
  }

  test("extractGzipMembers / extractGzipContent / gzipErrors") {
    import spark.implicits._
    val blobA = Gzip.buildGzipMember(fill(2, 100), fname = "a") ++
      Gzip.buildGzipMember(fill(3, 200))
    val blobBad = {
      val b = Gzip.buildGzipMember(fill(4, 50))
      b(b.length - 1) = (b(b.length - 1) ^ 0x5A).toByte; b
    }
    val df = Seq((1L, blobA), (2L, blobBad)).toDF("id", "blob")
    val rows = Gzip.extractGzipMembers(df, "blob")
      .orderBy("id", "member_idx").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("content_sum")).toSeq == Seq(200L, 600L))
    assert(rows(0).getAs[String]("fname") == "a")
    val contents = Gzip.extractGzipContent(df, "blob")
      .orderBy("id", "member_idx").collect()
    assert(contents.length == 2)
    assert(java.util.Arrays.equals(
      contents(0).getAs[Array[Byte]]("content"), fill(2, 100)))
    assert(java.util.Arrays.equals(
      contents(1).getAs[Array[Byte]]("content"), fill(3, 200)))
    val errs = Gzip.gzipErrors(df, "blob").collect()
    assert(errs.length == 1 && errs(0).getAs[String]("error") ==
      "ISIZE mismatch")
  }

  test("tar.gz composition: gzip content feeds the ustar walk byte-exactly") {
    import spark.implicits._
    val tar = TarShard.syntheticTar(11L)
    val blob = Gzip.buildGzipMember(tar, fname = "s.tar", withHcrc = true)
    val df = Seq((11L, blob)).toDF("doc_id", "blob")
    val content = Gzip.extractGzipContent(df, "blob")
      .select($"doc_id", $"content")
    val members = TarShard.extractTarMembers(content, "content")
      .where($"is_file").collect()
    val Right(direct) = TarShard.tarMemberTable(tar): @unchecked
    assert(members.length == direct.count(_.typeflag == '0'))
  }
}
