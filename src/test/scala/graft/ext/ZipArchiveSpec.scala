package graft.ext

import graft.SparkFunSuite

class ZipArchiveSpec extends SparkFunSuite {

  private def fill(b: Byte, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); java.util.Arrays.fill(a, b); a
  }

  test("round-trip: stored + deflated entries, sums, order, comment scan") {
    val zip = ZipArchive.buildZip(Seq(
      ("a/x.txt", 0, fill(7, 100)),
      ("a/y.bin", 8, fill(9, 5000)),
      ("z.json", 8, Array.tabulate(777)(i => (i % 251).toByte))),
      comment = "trailing comment to scan over")
    val Right(es) = ZipArchive.zipEntryTable(zip): @unchecked
    assert(es.map(_.name) == Seq("a/x.txt", "a/y.bin", "z.json"))
    assert(es.map(_.idx) == Seq(0, 1, 2))
    assert(es.map(_.method) == Seq(0, 8, 8))
    assert(es.map(_.usize) == Seq(100L, 5000L, 777L))
    assert(es(0).payloadSum == 700L)
    assert(es(1).payloadSum == 45000L)
    assert(es(2).payloadSum == (0 until 777).map(_ % 251).sum.toLong)
    // deflate actually compressed the constant run
    assert(es(1).csize < 5000L)
  }

  test("zip64: forced markers resolve to the same entry table") {
    val entries = Seq(
      ("a/x.txt", 0, fill(7, 100)),
      ("big.bin", 8, Array.tabulate(5000)(i => (i % 251).toByte)))
    val plain = ZipArchive.buildZip(entries)
    val z64 = ZipArchive.buildZip(entries, forceZip64 = true)
    val Right(ep) = ZipArchive.zipEntryTable(plain): @unchecked
    val Right(e64) = ZipArchive.zipEntryTable(z64): @unchecked
    assert(e64 == ep) // identical logical table through both codings
    // payload extraction resolves the markers too
    import spark.implicits._
    val df = Seq((1L, z64)).toDF("id", "blob")
    val pay = ZipArchive.extractZipPayloads(df, "blob").collect()
    assert(pay.length == 2)
    assert(java.util.Arrays.equals(
      pay(0).getAs[Array[Byte]]("content"), fill(7, 100)))
    // typed rejects on mangled zip64 structures
    val noLoc = z64.clone()
    val locAt = (0 until noLoc.length - 4).find(i =>
      noLoc(i) == 'P' && noLoc(i + 1) == 'K' && noLoc(i + 2) == 6 &&
        noLoc(i + 3) == 7).get
    noLoc(locAt + 3) = 9
    assert(ZipArchive.zipEntryTable(noLoc) == Left("missing zip64 locator"))
    val badSig = z64.clone()
    val e64At = (0 until badSig.length - 4).find(i =>
      badSig(i) == 'P' && badSig(i + 1) == 'K' && badSig(i + 2) == 6 &&
        badSig(i + 3) == 6).get
    badSig(e64At + 3) = 9
    assert(ZipArchive.zipEntryTable(badSig) ==
      Left("bad zip64 eocd signature"))
    // truncation totality over the zip64 coding
    (0 until z64.length by 3).foreach(k => ZipArchive.zipEntryTable(z64.take(k)))
  }

  test("zip64 overflow-crafted offsets reject, never crash") {
    // EOCD64 locator pointing at e64 near Long.MaxValue: the sum
    // e64 + 56 wraps negative; the subtraction-form check must reject
    def le(v: Long, w: Int): Array[Byte] =
      Array.tabulate(w)(i => ((v >> (8 * i)) & 0xFF).toByte)
    def craftedEocd(e64: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte]('P', 'K', 6, 7), 0, 4) // zip64 locator
      out.write(le(0L, 4), 0, 4)                   // disk 0
      out.write(le(e64, 8), 0, 8)                  // eocd64 offset
      out.write(le(1L, 4), 0, 4)                   // total disks 1
      out.write(Array[Byte]('P', 'K', 5, 6), 0, 4) // EOCD
      out.write(le(0L, 4), 0, 4)                   // disk fields
      out.write(le(0xFFFFL, 2), 0, 2)              // entries: zip64 marker
      out.write(le(0xFFFFL, 2), 0, 2)
      out.write(le(0xFFFFFFFFL, 4), 0, 4)          // cd size marker
      out.write(le(0xFFFFFFFFL, 4), 0, 4)          // cd offset marker
      out.write(le(0L, 2), 0, 2)                   // no comment
      out.toByteArray
    }
    assert(ZipArchive.zipEntryTable(craftedEocd(Long.MaxValue - 8)) ==
      Left("zip64 eocd out of bounds"))
    assert(ZipArchive.zipEntryTable(craftedEocd(1L << 62)) ==
      Left("zip64 eocd out of bounds"))
    // in-bounds pointer to garbage: typed reject (catch-all backstop)
    val r = ZipArchive.zipEntryTable(craftedEocd(0L))
    assert(r.isLeft)
  }

  test("zip64 interop: java.util.zip.ZipFile reads our forced fixture") {
    val z64 = ZipArchive.buildZip(Seq(("f.txt", 8, fill(3, 321))),
      forceZip64 = true)
    val tmp = java.io.File.createTempFile("graftz64", ".zip")
    try {
      java.nio.file.Files.write(tmp.toPath, z64)
      val zf = new java.util.zip.ZipFile(tmp)
      try {
        val e = zf.getEntry("f.txt")
        assert(e != null && e.getSize == 321L)
        val got = zf.getInputStream(e).readAllBytes()
        assert(java.util.Arrays.equals(got, fill(3, 321)))
      } finally zf.close()
    } finally tmp.delete()
  }

  test("interop: java.util.zip.ZipInputStream reads our fixture") {
    val zip = ZipArchive.buildZip(Seq(("f.txt", 8, fill(3, 321))))
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(zip))
    val e = zin.getNextEntry
    assert(e.getName == "f.txt")
    val buf = new Array[Byte](1024)
    var total = 0
    var got = zin.read(buf)
    while (got > 0) { total += got; got = zin.read(buf) }
    assert(total == 321)
    assert(zin.getNextEntry == null)
  }

  test("typed rejects: every malformation class") {
    val good = ZipArchive.buildZip(Seq(
      ("a.txt", 0, fill(1, 50)), ("b.bin", 8, fill(2, 300))))
    def mut(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    assert(ZipArchive.zipEntryTable(Array.empty[Byte]) == Left("empty blob"))
    assert(ZipArchive.zipEntryTable(null) == Left("empty blob"))
    assert(ZipArchive.zipEntryTable(fill(0, 10)) == Left("too short for eocd"))
    assert(ZipArchive.zipEntryTable(fill(0, 100)) ==
      Left("no end-of-central-directory"))
    // flip a stored payload byte -> entry CRC catches it
    assert(ZipArchive.zipEntryTable(mut(30 + 5 /* name */ + 3, 99)) ==
      Left("bad entry crc"))
    // flip a deflate byte -> either a broken stream or a crc mismatch
    val lh2 = 30 + 5 + 50 // start of second local header
    val r = ZipArchive.zipEntryTable(mut(lh2 + 30 + 5 + 2, 99))
    assert(r.isLeft, s"got $r")
    // truncate the tail (cd gone)
    assert(ZipArchive.zipEntryTable(good.take(good.length - 30)).isLeft)
    // encrypted flag in the CD entry
    val cdOff = good.length - 22 - 2 * (46 + 5)
    assert(good(cdOff) == 'P' && good(cdOff + 3) == 2)
    val enc = good.clone(); enc(cdOff + 8) = 0x01
    assert(ZipArchive.zipEntryTable(enc) == Left("encrypted entry unsupported"))
    // data-descriptor flag on an archive with NO real descriptor: the
    // bytes after the payload (the next local header) must not pass as
    // one — supported layouts are validated, forged flags are caught
    val dd = good.clone(); dd(cdOff + 8) = 0x08
    assert(ZipArchive.zipEntryTable(dd) == Left("data descriptor mismatch"))
    // unsupported method
    val m9 = good.clone(); m9(cdOff + 10) = 9
    assert(ZipArchive.zipEntryTable(m9) == Left("unsupported method"))
    // central/local name mismatch
    val nm = good.clone(); nm(cdOff + 46) = 'z'
    assert(ZipArchive.zipEntryTable(nm) == Left("central/local name mismatch"))
    // truncation totality: never throws
    (0 to good.length by 13).foreach(k => ZipArchive.zipEntryTable(good.take(k)))
  }

  test("streaming zip (GP bit 3, data descriptors, zero-size local " +
    "headers) walks clean — the java.util.zip streaming layout") {
    val bos = new java.io.ByteArrayOutputStream()
    // FilterOutputStream hides seekability → ZipOutputStream must
    // write zero sizes in local headers + data descriptors after
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FilterOutputStream(bos))
    val payloads = Seq(
      "first.txt" -> "streamed entry one contents",
      "dir/second.txt" -> ("x" * 5000)) // long enough to really deflate
    payloads.foreach { case (name, text) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(text.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    val bytes = bos.toByteArray
    assert((bytes(6) & 0x08) != 0, "expected GP bit 3 in the fixture")
    val Right(entries) = ZipArchive.zipEntryTable(bytes): @unchecked
    assert(entries.map(_.name) == payloads.map(_._1))
    assert(entries.map(_.usize) == payloads.map(_._2.length.toLong))
    val Right(contents) = ZipArchive.payloadsOf(bytes, ".txt"): @unchecked
    assert(contents.map(c => c._2 -> new String(c._3, "UTF-8")) == payloads)
    // a corrupted descriptor is caught, not ignored: zero the crc field
    // of the FIRST entry's descriptor (sits right after its payload)
    val Right(all) = ZipArchive.zipEntryTable(bytes): @unchecked
    val firstCsize = all.head.csize.toInt
    val nameLen = "first.txt".length
    val ddOff = 30 + nameLen + firstCsize + 4 // past the PK\7\8 signature
    val bad = bytes.clone()
    (0 until 4).foreach(i => bad(ddOff + i) = 0x5A)
    assert(ZipArchive.zipEntryTable(bad) == Left("data descriptor mismatch"))
  }

  test("zip bomb: inflate cap rejects before allocating the claimed size") {
    // 32 MiB of zeros deflates to ~32 KiB; cap at 1 MiB must reject
    val bomb = ZipArchive.buildZip(Seq(("zeros.bin", 8,
      new Array[Byte](32 * 1024 * 1024))))
    assert(bomb.length < 100 * 1024, s"fixture should be small, ${bomb.length}")
    assert(ZipArchive.zipEntryTable(bomb, maxInflate = 1024 * 1024) ==
      Left("entry exceeds inflate cap"))
    // and parses fine under the default cap
    val Right(es) = ZipArchive.zipEntryTable(bomb): @unchecked
    assert(es.head.usize == 32L * 1024 * 1024 && es.head.payloadSum == 0L)
  }

  test("extractZipEntries/zipErrors: poison -> zero rows + typed error") {
    val s = spark
    import s.implicits._
    val good = ZipArchive.buildZip(Seq(("a.txt", 0, fill(4, 25))))
    val df = Seq((1L, good), (2L, good.take(20)),
      (3L, Array.empty[Byte])).toDF("id", "blob")
    val rows = ZipArchive.extractZipEntries(df, "blob").collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L)
    assert(rows.head.getString(2) == "a.txt" && rows.head.getLong(5) == 100L)
    val errs = ZipArchive.zipErrors(df, "blob").orderBy("id").collect()
    assert(errs.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ==
      Seq((1L, true), (2L, false), (3L, false)))
  }
}
