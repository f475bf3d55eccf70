package graft.ext

import graft.SparkFunSuite

class TarShardSpec extends SparkFunSuite {

  private def member(name: String, fill: Byte, size: Int,
                     tf: Char = '0'): (String, Char, Array[Byte]) = {
    val p = new Array[Byte](size)
    java.util.Arrays.fill(p, fill)
    (name, tf, p)
  }

  test("round-trip: names, sizes, typeflags, payload sums, member order") {
    val tar = TarShard.buildTar(Seq(
      member("dir", 0, 0, '5'),
      member("dir/a.txt", 7, 100),
      member("dir/a.jpg", 9, 513), // forces padding to 1024
      member("b.json", 3, 0)))
    val Right(ms) = TarShard.tarMemberTable(tar): @unchecked
    assert(ms.map(_.name) == Seq("dir", "dir/a.txt", "dir/a.jpg", "b.json"))
    assert(ms.map(_.idx) == Seq(0, 1, 2, 3))
    assert(ms.map(_.size) == Seq(0L, 100L, 513L, 0L))
    assert(ms.map(_.typeflag) == Seq('5'.toInt, '0'.toInt, '0'.toInt, '0'.toInt))
    assert(ms.map(_.payloadSum) == Seq(0L, 700L, 513L * 9, 0L))
  }

  test("interop: java.util.zip-independent check against Apache-format expectations") {
    // header invariants a third-party reader relies on: magic at 257,
    // checksum convention, 512 padding
    val tar = TarShard.buildTar(Seq(member("x.bin", 1, 10)))
    assert(tar.length == 512 + 512 + 1024)
    assert(new String(tar, 257, 5, "US-ASCII") == "ustar")
    // checksum re-verifies with the field read as spaces
    val Right(_) = TarShard.tarMemberTable(tar): @unchecked
  }

  test("long names split into the ustar prefix field and re-join on read") {
    val dir = "a" * 80 + "/" + "b" * 60
    val name = dir + "/" + "c" * 40 + ".txt"
    assert(name.length > 100)
    val tar = TarShard.buildTar(Seq(member(name, 5, 8)))
    val Right(ms) = TarShard.tarMemberTable(tar): @unchecked
    assert(ms.head.name == name)
  }

  test("typed rejects: every malformation class") {
    val good = TarShard.buildTar(Seq(member("a.txt", 7, 100)))
    def mutate(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    assert(TarShard.tarMemberTable(Array.empty[Byte]) == Left("empty blob"))
    assert(TarShard.tarMemberTable(null) == Left("empty blob"))
    assert(TarShard.tarMemberTable(good.take(300)) == Left("truncated header"))
    assert(TarShard.tarMemberTable(mutate(257, 'X')) == Left("bad magic"))
    // flip a payload-adjacent header byte -> checksum breaks
    assert(TarShard.tarMemberTable(mutate(0, 'z')) == Left("bad checksum"))
    // size-field rejects need the checksum REPAIRED after the mutation
    // (the checksum gate fires first — itself pinned above)
    def resummed(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v
      java.util.Arrays.fill(b, 148, 156, ' '.toByte)
      var sum = 0L
      (0 until 512).foreach(i => sum += (b(i) & 0xFF))
      val cs = f"$sum%06o".getBytes("US-ASCII")
      System.arraycopy(cs, 0, b, 148, 6)
      b(154) = 0; b(155) = ' '
      b
    }
    // non-octal size
    assert(TarShard.tarMemberTable(resummed(124, 'Q')) ==
      Left("bad size field"))
    // base-256 size marker
    assert(TarShard.tarMemberTable(resummed(124, 0x80.toByte)) ==
      Left("bad size field"))
    // unsupported member types: pax headers and GNU longname
    Seq('x', 'g', 'L', 'K').foreach { tf =>
      val bad = TarShard.buildTar(Seq(member("a.txt", 7, 100, tf)))
      assert(TarShard.tarMemberTable(bad) == Left("unsupported member type"))
    }
    // member payload truncated (cut inside the 100-byte payload)
    assert(TarShard.tarMemberTable(good.take(600)) ==
      Left("truncated member"))
    // end-of-archive: missing second zero block / dirty / garbage
    assert(TarShard.tarMemberTable(good.dropRight(1024)) ==
      Left("truncated header"))
    assert(TarShard.tarMemberTable(good.dropRight(300)) ==
      Left("truncated end-of-archive"))
    val dirty = good.clone(); dirty(good.length - 100) = 1
    assert(TarShard.tarMemberTable(dirty) == Left("dirty end-of-archive"))
    val trailing = good ++ Array[Byte](0, 0, 5)
    assert(TarShard.tarMemberTable(trailing) ==
      Left("garbage after end-of-archive"))
  }

  test("truncation totality: every prefix either parses or rejects, never throws") {
    val tar = TarShard.buildTar(Seq(
      member("d", 0, 0, '5'), member("d/a.txt", 2, 77), member("d/a.jpg", 3, 513)))
    (0 to tar.length by 97).foreach { k =>
      TarShard.tarMemberTable(tar.take(k)) // must not throw
    }
    (tar.length - 5 to tar.length).foreach { k =>
      TarShard.tarMemberTable(tar.take(k))
    }
  }

  test("extractTarMembers + webdatasetSamples: grouping, exts, totals") {
    val s = spark
    import s.implicits._
    val tar = TarShard.buildTar(Seq(
      member("sh/000001.txt", 1, 10),
      member("sh/000001.jpg", 2, 20),
      member("sh/000001.seg.json", 3, 30), // multi-dot ext: "seg.json"
      member("sh/000002.txt", 4, 40),
      member("nokey", 5, 50))) // no dot: ext ""
    val df = Seq((1L, tar)).toDF("doc_id", "blob")
    val members = TarShard.extractTarMembers(df, "blob")
    assert(members.count() == 5)
    val samples = TarShard.webdatasetSamples(members)
      .orderBy("sample_key")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    assert(samples.toSeq == Seq(
      ("nokey", 1L, "", 50L),
      ("sh/000001", 3L, "jpg,seg.json,txt", 60L),
      ("sh/000002", 1L, "txt", 40L)))
    // poison blob: zero member rows, typed error row
    val bad = Seq((2L, tar.take(100))).toDF("doc_id", "blob")
    assert(TarShard.extractTarMembers(bad, "blob").count() == 0)
    val err = TarShard.tarErrors(bad, "blob").collect().head
    assert(!err.getBoolean(2) && err.getString(3) == "truncated header")
  }

  test("extractTarPayloads: byte-faithful slices, suffix filter, dirs skipped") {
    val s = spark
    import s.implicits._
    val png = Array.tabulate(513)(i => (i * 31 % 251).toByte)
    val tar = TarShard.buildTar(Seq(
      member("d", 0, 0, '5'),
      ("d/a.png", '0', png),
      member("d/a.txt", 7, 40),
      ("d/b.png", '0', png.reverse)))
    val df = Seq((1L, tar)).toDF("doc_id", "blob")
    val got = TarShard.extractTarPayloads(df, "blob", ".png")
      .orderBy("name").collect()
      .map(r => (r.getString(2), r.getAs[Array[Byte]](3)))
    assert(got.map(_._1).toSeq == Seq("d/a.png", "d/b.png"))
    assert(java.util.Arrays.equals(got(0)._2, png))
    assert(java.util.Arrays.equals(got(1)._2, png.reverse))
    // empty suffix = every regular file; the dir member never appears
    assert(TarShard.extractTarPayloads(df, "blob").count() == 3)
  }

  test("syntheticTar parses; member counts follow the formula") {
    (1L to 60L).foreach { id =>
      val Right(ms) = TarShard.tarMemberTable(TarShard.syntheticTar(id)): @unchecked
      val nSamples = (2 + id % 3).toInt
      val nFiles = (0 until nSamples).map { j =>
        1 + (if ((id + j) % 2 == 0) 1 else 0) + (if ((id + j) % 3 == 0) 1 else 0)
      }.sum
      assert(ms.count(_.typeflag == '0'.toInt) == nFiles, s"id=$id")
      assert(ms.head.typeflag == '5'.toInt)
    }
  }
}
