package graft.ext

import graft.SparkFunSuite

class SnappySpec extends SparkFunSuite {
  import Snappy.{Lit, Copy}

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private def fill(b: Byte, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); java.util.Arrays.fill(a, b); a
  }
  private def dec(b: Array[Byte]): Either[String, Array[Byte]] =
    Snappy.decode(b, 0, b.length)

  test("hand-constructed tag decode (non-circular)") {
    // preamble 5; literal tag (len 1): 0x00; 'W'; copy1: len 4, offset 1
    // tag = 01 | (0<<2) | (0<<5) = 0x01, offset byte 0x01
    val hand = Array[Byte](5, 0x00, 'W'.toByte, 0x01, 0x01)
    val Right(d) = dec(hand): @unchecked
    assert(new String(d) == "WWWWW")
    // copy2 form: preamble 9; literal "AB"; tag 2|((7-1)<<2)=0x1A,
    // offset 0002 → ABAB… period 2
    val hand2 = Array[Byte](9, 0x04, 'A'.toByte, 'B'.toByte,
      0x1A, 0x02, 0x00)
    val Right(d2) = dec(hand2): @unchecked
    assert(new String(d2) == "ABABABABA")
  }

  test("op builder round-trips every tag family") {
    val big = Array.tabulate(70000)(i => (i * 13 % 251).toByte)
    val ops = Seq(Lit(ascii("seed")), Copy(4, 10), // 1-byte offset form
      Lit(big), // literal extension bytes + chunking
      Copy(30000, 100), // 2-byte offset form, chunked len
      Lit(ascii("tail")))
    val expect = Snappy.replayOps(ops)
    val Right(got) = Snappy.decode(Snappy.buildRaw(ops), 0,
      Snappy.buildRaw(ops).length, maxOut = 1 << 20): @unchecked
    assert(java.util.Arrays.equals(got, expect))
    // overlap RLE
    val rle = Seq(Lit(ascii("Z")), Copy(1, 300))
    val Right(z) = dec(Snappy.buildRaw(rle)): @unchecked
    assert(z.length == 301 && z.forall(_ == 'Z'))
  }

  test("typed rejects and bomb cap") {
    assert(dec(Array.empty[Byte]) == Left("empty snappy block"))
    // preamble claims 100, body has 1 literal byte
    assert(dec(Array[Byte](100, 0x00, 9)) == Left("snappy length mismatch"))
    // literal runs past input
    assert(dec(Array[Byte](10, 0x24, 1, 2)) == Left("literals out of bounds"))
    // copy before any output
    assert(dec(Array[Byte](4, 0x01, 0x01)) == Left("copy offset out of window"))
    // zero offset
    assert(dec(Array[Byte](5, 0x00, 7, 0x01, 0x00)) ==
      Left("copy offset out of window"))
    // output overrun: declared 2 but literal+copy produce more
    assert(dec(Array[Byte](2, 0x00, 7, 0x05, 0x01)).isLeft)
    // bomb: preamble claims 4 GiB-ish — rejected BEFORE allocation
    val bomb = Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
      0xFF.toByte, 0x0F, 0x00)
    assert(Snappy.decode(bomb, 0, bomb.length) == Left("snappy decode cap"))
    // truncation totality over a real block
    val good = Snappy.buildRaw(Seq(Lit(fill(3, 100)), Copy(50, 80)))
    (0 until good.length).foreach { k =>
      assert(Snappy.decode(good, 0, k).isLeft, s"prefix $k")
    }
  }

  test("avro snappy codec: decode + big-endian CRC of uncompressed") {
    val sync = Array.tabulate(16)(i => (i * 7 + 3).toByte)
    val payload = Array.tabulate(500)(i => (i % 251).toByte)
    val blob = AvroOcf.buildAvro("\"bytes\"", "snappy", sync,
      Seq((4L, payload), (2L, fill(9, 77))))
    val Right(bs) = AvroOcf.avroBlockTable(blob): @unchecked
    assert(bs.map(_.nRecords) == Seq(4L, 2L))
    assert(bs.map(_.usize) == Seq(500L, 77L))
    assert(bs(0).payloadSum == payload.map(b => (b & 0xFF).toLong).sum)
    assert(bs(1).payloadSum == 77L * 9)
    // CRC poison: flip a CRC byte of the first block (last 4 bytes
    // before its sync) — find via rebuild offsets
    val comp = Snappy.encodeLiteral(payload)
    // header length = blob length - blocks; easier: flip EVERY byte in
    // turn and require that at least one yields the snappy crc error
    // and none yields a wrong Right
    val hits = (4 until blob.length).count { k =>
      val m = blob.clone(); m(k) = (m(k) ^ 0x40).toByte
      AvroOcf.avroBlockTable(m) == Left("snappy crc mismatch")
    }
    assert(hits >= 4, s"crc bytes not protected (hits=$hits)")
    assert(comp.length < payload.length + 10)
  }
}
