package graft.ext

import graft.SparkFunSuite

class SafeTensorsSpec extends SparkFunSuite {

  /** Raw blob from an explicit header string + data bytes. */
  private def raw(header: String, data: Array[Byte]): Array[Byte] = {
    val hdr = header.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream()
    var hl = hdr.length.toLong
    var i = 0
    while (i < 8) { out.write((hl & 0xFF).toInt); hl >>= 8; i += 1 }
    out.write(hdr, 0, hdr.length)
    out.write(data, 0, data.length)
    out.toByteArray
  }

  private def errOf(b: Array[Byte]): String = {
    import spark.implicits._
    val df = Seq((1L, b)).toDF("id", "blob")
    val e = SafeTensors.safeTensorErrors(df, "blob").collect()
    if (e.isEmpty) null else e(0).getAs[String]("error")
  }

  test("round-trip: dtypes, shapes, sums, metadata skipped") {
    import spark.implicits._
    val blob = SafeTensors.buildSafeTensors(Seq(
      ("emb", "F32", Seq(2L, 3L), 7),
      ("ids", "I64", Seq(4L), 9),
      ("mask", "U8", Seq(5L, 2L), 3)),
      metadata = Seq("format" -> "pt"))
    val df = Seq((1L, blob)).toDF("doc_id", "blob")
    val rows = SafeTensors.safeTensorTable(df, "blob")
      .orderBy("tensor_name").collect()
    assert(rows.map(_.getAs[String]("tensor_name")).toSeq ==
      Seq("emb", "ids", "mask"))
    assert(rows.map(_.getAs[String]("dtype")).toSeq ==
      Seq("F32", "I64", "U8"))
    assert(rows.map(_.getAs[Long]("n_elems")).toSeq == Seq(6L, 4L, 10L))
    assert(rows.map(_.getAs[Long]("nbytes")).toSeq == Seq(24L, 32L, 10L))
    assert(rows.map(_.getAs[Long]("byte_sum")).toSeq ==
      Seq(24L * 7, 32L * 9, 10L * 3))
    assert(rows.forall(_.getAs[Boolean]("extent_ok")))
  }

  test("0-dim tensor and out-of-order header entries") {
    import spark.implicits._
    // entries declared B-then-A while A owns the first extent
    val hdr = """{"b":{"dtype":"U8","shape":[3],"data_offsets":[4,7]},""" +
      """"a":{"dtype":"F32","shape":[],"data_offsets":[0,4]}}"""
    val blob = raw(hdr, Array[Byte](1, 1, 1, 1, 2, 2, 2))
    val df = Seq((1L, blob)).toDF("doc_id", "blob")
    val rows = SafeTensors.safeTensorTable(df, "blob")
      .orderBy("tensor_name").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_elems") == 1L) // scalar: empty shape
    assert(rows(0).getAs[Long]("byte_sum") == 4L)
    assert(rows(1).getAs[Long]("byte_sum") == 6L)
    assert(rows.forall(_.getAs[Boolean]("extent_ok")))
  }

  test("extent lies quarantine (extent_ok=false), never throw") {
    import spark.implicits._
    // declared F32 [3] (12 bytes) but extent is 13
    val hdr = """{"t":{"dtype":"F32","shape":[3],"data_offsets":[0,13]}}"""
    val df = Seq((1L, raw(hdr, new Array[Byte](13)))).toDF("doc_id", "blob")
    val rows = SafeTensors.safeTensorTable(df, "blob").collect()
    assert(rows.length == 1 && !rows(0).getAs[Boolean]("extent_ok"))
    // unknown dtype quarantines the same way
    val hdr2 = """{"t":{"dtype":"F4","shape":[3],"data_offsets":[0,13]}}"""
    val df2 = Seq((1L, raw(hdr2, new Array[Byte](13)))).toDF("doc_id", "blob")
    val r2 = SafeTensors.safeTensorTable(df2, "blob").collect()
    assert(r2.length == 1 && !r2(0).getAs[Boolean]("extent_ok"))
  }

  test("extractTensorVectors: bit-exact F32 decode, 1-D and 2-D") {
    import spark.implicits._
    val v1 = Array(1.5f, -2.25f, 3.0e-7f, Float.MinPositiveValue)
    val mat = Array(Array(0.1f, 0.2f), Array(-0.3f, 0.4f), Array(5f, 6f))
    def le(fs: Array[Float]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(fs.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fs.foreach(bb.putFloat); bb.array()
    }
    val blob = SafeTensors.buildSafeTensorsRaw(Seq(
      ("vec", "F32", Seq(4L), le(v1)),
      ("mat", "F32", Seq(3L, 2L), le(mat.flatten)),
      ("ids", "I64", Seq(1L), new Array[Byte](8)))) // non-F32: skipped
    val df = Seq((1L, blob)).toDF("doc_id", "blob")
    val rows = SafeTensors.extractTensorVectors(df, "blob")
      .orderBy("tensor_name", "row_idx").collect()
    assert(rows.length == 4) // 3 mat rows + 1 vec
    val matRows = rows.take(3).map(_.getSeq[Float](3).toArray)
    assert(matRows.zip(mat).forall { case (a, b) =>
      java.util.Arrays.equals(a, b) })
    assert(java.util.Arrays.equals(rows(3).getSeq[Float](3).toArray, v1))
  }

  test("extractTensorVectors: shape-before-dtype key order still decodes") {
    // JSON keys are unordered; the spec permits any entry key order.
    import spark.implicits._
    val v = Array(1.0f, -2.0f, 0.5f)
    val bb = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    v.foreach(bb.putFloat)
    val blob = raw(
      """{"vec":{"shape":[3],"data_offsets":[0,12],"dtype":"F32"}}""",
      bb.array())
    val df = Seq((1L, blob)).toDF("doc_id", "blob")
    val rows = SafeTensors.extractTensorVectors(df, "blob").collect()
    assert(rows.length == 1)
    assert(java.util.Arrays.equals(rows(0).getSeq[Float](3).toArray, v))
  }

  test("typed rejects") {
    assert(errOf(Array.empty[Byte]) == "too short")
    assert(errOf(new Array[Byte](5)) == "too short")
    // header length claims past the blob
    val big = raw("{}", Array.empty[Byte])
    val lie = big.clone(); lie(0) = 0x70
    assert(errOf(lie) == "header out of bounds")
    // absurd header length hits the cap before any allocation
    val cap = new Array[Byte](16)
    cap(7) = 0x7F // huge LE u64
    assert(errOf(cap) == "header length cap")
    // offsets gap
    assert(errOf(raw(
      """{"a":{"dtype":"U8","shape":[2],"data_offsets":[0,2]},""" +
        """"b":{"dtype":"U8","shape":[2],"data_offsets":[3,5]}}""",
      new Array[Byte](5))) == "offsets not contiguous")
    // data region not covered (trailing unclaimed bytes)
    assert(errOf(raw(
      """{"a":{"dtype":"U8","shape":[2],"data_offsets":[0,2]}}""",
      new Array[Byte](3))) == "data region not covered")
    // offsets past the region
    assert(errOf(raw(
      """{"a":{"dtype":"U8","shape":[9],"data_offsets":[0,9]}}""",
      new Array[Byte](3))) == "offsets out of bounds")
    // entry without data_offsets
    assert(errOf(raw("""{"a":{"dtype":"U8","shape":[2]}}""",
      new Array[Byte](2))) == "missing data_offsets")
    // not an object
    assert(errOf(raw("""[1,2]""", Array.empty[Byte])) == "bad header json")
    // truncation totality over a real blob
    val good = SafeTensors.buildSafeTensors(Seq(("t", "U8", Seq(4L), 1)))
    (0 until good.length).foreach { k =>
      errOf(good.take(k)) // must not throw
    }
  }
}
