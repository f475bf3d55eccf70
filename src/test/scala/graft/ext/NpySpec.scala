package graft.ext

import graft.SparkFunSuite

class NpySpec extends SparkFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("interop: bytes NumPy itself wrote (np.save) parse exactly") {
    // np.save(arange(6, dtype='<i4').reshape(2,3))
    val real = hex(
      "934e554d5059010076007b276465736372273a20273c6934272c2027666f7274" +
      "72616e5f6f72646572273a2046616c73652c20277368617065273a2028322c20" +
      "33292c207d202020202020202020202020202020202020202020202020202020" +
      "202020202020202020202020202020202020202020202020202020202020200a" +
      "000000000100000002000000030000000400000005000000")
    val Right(m) = Npy.npyTable(real): @unchecked
    assert(m.descr == "<i4" && !m.fortran)
    assert(m.ndim == 2 && m.shape0 == 2L && m.shape1 == 3L)
    assert(m.nElems == 6L && m.elemSum.contains(15L))
    // np.save(np.array([300, -5, 7], dtype='<i2')) — signed decode
    val signed = hex(
      "934e554d5059010076007b276465736372273a20273c6932272c2027666f7274" +
      "72616e5f6f72646572273a2046616c73652c20277368617065273a2028332c29" +
      "2c207d2020202020202020202020202020202020202020202020202020202020" +
      "202020202020202020202020202020202020202020202020202020202020200a" +
      "2c01fbff0700")
    val Right(s) = Npy.npyTable(signed): @unchecked
    assert(s.descr == "<i2" && s.ndim == 1 && s.shape0 == 3L)
    assert(s.elemSum.contains(302L)) // 300 - 5 + 7
  }

  test("round-trip: widths, signedness, scalars, v2 header, fortran") {
    val Right(a) = Npy.npyTable(Npy.buildNpy("<i8", Seq(2L, 2L),
      Seq(1L, -2L, 3L, -4L))): @unchecked
    assert(a.elemSum.contains(-2L) && a.nElems == 4L)
    val Right(b) = Npy.npyTable(Npy.buildNpy("|u1", Seq(5L),
      Seq(250L, 251L, 1L, 2L, 3L))): @unchecked
    assert(b.elemSum.contains(507L) && b.byteSum == 507L)
    val Right(c) = Npy.npyTable(Npy.buildNpy("<u4", Seq.empty,
      Seq(4000000000L))): @unchecked
    assert(c.ndim == 0 && c.nElems == 1L && c.elemSum.contains(4000000000L))
    val Right(d) = Npy.npyTable(Npy.buildNpy("<i4", Seq(3L),
      Seq(7L, 8L, 9L), fortran = true, version = 2)): @unchecked
    assert(d.fortran && d.elemSum.contains(24L))
    // float arrays: byte_sum only, elem_sum null
    val f = Npy.buildNpy("<f8", Seq(2L), Seq(0L, 0L))
    val Right(fm) = Npy.npyTable(f): @unchecked
    assert(fm.elemSum.isEmpty && fm.nElems == 2L)
  }

  test("typed rejects") {
    val good = Npy.buildNpy("<i4", Seq(2L), Seq(1L, 2L))
    assert(Npy.npyTable(Array.empty[Byte]) == Left("too short"))
    val bm = good.clone(); bm(0) = 0x42
    assert(Npy.npyTable(bm) == Left("bad magic"))
    // big-endian dtype is a quarantine reject
    val be = Npy.buildNpy("<i4", Seq(2L), Seq(1L, 2L))
    be(10 + be.drop(10).indexOf('<'.toByte)) = '>'
    assert(Npy.npyTable(be) == Left("unsupported descr"))
    // data size disagreement
    assert(Npy.npyTable(good ++ Array[Byte](0)) ==
      Left("data size mismatch"))
    assert(Npy.npyTable(good.dropRight(1)) == Left("data size mismatch"))
    // truncation totality
    (0 until good.length).foreach(k => Npy.npyTable(good.take(k)))
    // header length cap
    val cap = good.clone(); cap(8) = 0xFF.toByte; cap(9) = 0xFF.toByte
    assert(Npy.npyTable(cap).isLeft)
  }

  test("npz composition: zip payloads feed the npy walk") {
    import spark.implicits._
    val emb = Npy.buildNpy("<i2", Seq(2L, 3L), Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val ids = Npy.buildNpy("<i8", Seq(2L), Seq(10L, 20L))
    val npz = ZipArchive.buildZip(Seq(
      ("emb.npy", 8, emb), ("ids.npy", 0, ids)))
    val df = Seq((1L, npz)).toDF("doc_id", "blob")
    val payloads = ZipArchive.extractZipPayloads(df, "blob", ".npy")
      .select($"doc_id", $"name", $"content")
    val rows = Npy.extractNpyMeta(payloads, "content")
      .orderBy("name").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("name") == "emb.npy")
    assert(rows(0).getAs[Long]("elem_sum") == 21L)
    assert(rows(1).getAs[Long]("elem_sum") == 30L)
  }
}
