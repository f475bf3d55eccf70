package graft.ext

import graft.SparkFunSuite

class AvroOcfSpec extends SparkFunSuite {

  private val sync = Array.tabulate(16)(i => (i * 13 + 7).toByte)

  private def fill(b: Byte, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); java.util.Arrays.fill(a, b); a
  }

  test("round-trip: null + deflate codecs, counts, sizes, sums") {
    Seq("null", "deflate").foreach { codec =>
      val blob = AvroOcf.buildAvro("\"bytes\"", codec, sync, Seq(
        (5L, fill(9, 100)),
        (12L, Array.tabulate(3000)(i => (i % 251).toByte))))
      val Right(bs) = AvroOcf.avroBlockTable(blob): @unchecked
      assert(bs.map(_.idx) == Seq(0, 1), codec)
      assert(bs.map(_.nRecords) == Seq(5L, 12L), codec)
      assert(bs.map(_.usize) == Seq(100L, 3000L), codec)
      assert(bs(0).payloadSum == 900L, codec)
      assert(bs(1).payloadSum == (0 until 3000).map(_ % 251).sum.toLong, codec)
      if (codec == "deflate") // the constant run must actually compress
        assert(blob.length < 1500, s"deflate fixture too big: ${blob.length}")
    }
  }

  test("metadata map: negative-count form parses; unknown codec rejects") {
    // hand-build a negative-count metadata block: -2 entries + byte size
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('O', 'b', 'j', 1))
    def vl(v: Long): Unit = {
      var z = (v << 1) ^ (v >> 63)
      while ((z & ~0x7FL) != 0) { out.write(((z & 0x7F) | 0x80).toInt); z >>>= 7 }
      out.write(z.toInt)
    }
    def entry(k: String, v: String): Unit = {
      vl(k.length); out.write(k.getBytes("UTF-8"))
      vl(v.length); out.write(v.getBytes("UTF-8"))
    }
    val body = new java.io.ByteArrayOutputStream()
    vl(-2) // negative count: byte size follows
    val mark = out.size()
    // measure entries via a scratch: simpler — write entries to a temp
    val scratch = new java.io.ByteArrayOutputStream()
    def ventry(o: java.io.ByteArrayOutputStream, k: String, v: String): Unit = {
      def vv(x: Long): Unit = {
        var z = (x << 1) ^ (x >> 63)
        while ((z & ~0x7FL) != 0) { o.write(((z & 0x7F) | 0x80).toInt); z >>>= 7 }
        o.write(z.toInt)
      }
      vv(k.length); o.write(k.getBytes("UTF-8"))
      vv(v.length); o.write(v.getBytes("UTF-8"))
    }
    ventry(scratch, "avro.schema", "\"bytes\"")
    ventry(scratch, "avro.codec", "null")
    vl(scratch.size())
    out.write(scratch.toByteArray)
    vl(0)
    out.write(sync)
    // one block
    vl(3); vl(4); out.write(Array[Byte](1, 2, 3, 4)); out.write(sync)
    val Right(bs) = AvroOcf.avroBlockTable(out.toByteArray): @unchecked
    assert(bs == Seq(AvroOcf.AvroBlock(0, 3L, 4L, 10L)))
    assert(body.size() == 0 && mark >= 0) // silence unused warnings
    // snappy now decodes (with CRC verified); unknown codecs still reject
    val sn = AvroOcf.buildAvro("\"bytes\"", "snappy", sync, Seq((1L, fill(1, 4))))
    val Right(snb) = AvroOcf.avroBlockTable(sn): @unchecked
    assert(snb == Seq(AvroOcf.AvroBlock(0, 1L, 4L, 4L)))
    val bz = AvroOcf.buildAvro("\"bytes\"", "bzip2", sync, Seq((1L, fill(1, 4))))
    assert(AvroOcf.avroBlockTable(bz) == Left("unsupported codec"))
  }

  test("typed rejects: sync mismatch, truncation totality, bombs") {
    val good = AvroOcf.buildAvro("\"bytes\"", "null", sync, Seq(
      (2L, fill(1, 50)), (3L, fill(2, 60))))
    assert(AvroOcf.avroBlockTable(Array.empty[Byte]) == Left("empty blob"))
    assert(AvroOcf.avroBlockTable("NotAvro!".getBytes("US-ASCII")) ==
      Left("bad magic"))
    // flip a byte of the FIRST block's trailing sync
    val syncPos = good.length - 16 - 2 /*varints*/ - 60 - 16
    val bad = good.clone()
    bad(syncPos) = (bad(syncPos) ^ 1).toByte
    assert(AvroOcf.avroBlockTable(bad) == Left("sync marker mismatch"))
    // missing schema
    val noSchema = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(Array[Byte]('O', 'b', 'j', 1)); o.write(0); o.write(sync)
      o.toByteArray
    }
    assert(AvroOcf.avroBlockTable(noSchema) == Left("missing avro.schema"))
    // deflate bomb: 32 MiB of zeros under a 1 MiB cap
    val bomb = AvroOcf.buildAvro("\"bytes\"", "deflate", sync,
      Seq((1L, new Array[Byte](32 * 1024 * 1024))))
    assert(bomb.length < 100 * 1024)
    assert(AvroOcf.avroBlockTable(bomb, maxInflate = 1024 * 1024) ==
      Left("block exceeds inflate cap"))
    // truncation totality
    (0 to good.length).foreach(k => AvroOcf.avroBlockTable(good.take(k)))
    assert(AvroOcf.avroBlockTable(good.dropRight(1)).isLeft)
  }

  test("extractAvroBlocks/avroErrors: poison -> zero rows + typed error") {
    val s = spark
    import s.implicits._
    val good = AvroOcf.buildAvro("\"bytes\"", "null", sync, Seq((4L, fill(3, 25))))
    val df = Seq((1L, good), (2L, good.dropRight(3)),
      (3L, Array.empty[Byte])).toDF("id", "blob")
    val rows = AvroOcf.extractAvroBlocks(df, "blob").collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L)
    assert(rows.head.getLong(2) == 4L && rows.head.getLong(4) == 75L)
    val errs = AvroOcf.avroErrors(df, "blob").orderBy("id").collect()
    assert(errs.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ==
      Seq((1L, true), (2L, false), (3L, false)))
  }
}
