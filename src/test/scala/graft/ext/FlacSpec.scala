package graft.ext

import graft.SparkFunSuite

class FlacSpec extends SparkFunSuite {

  private def constFrame(no: Long, vals: Array[Long], bps: Int = 16,
                         channels: Int = 2, rate: Long = 48000L,
                         srCode: Int = 10, block: Int = 256): Array[Byte] =
    Flac.buildFlacFrame(no, block, rate, srCode, channels, bps,
      constant = Some(vals), verbatim = None)

  private def verbFrame(no: Long, vs: Array[Array[Long]], bps: Int = 16,
                        channels: Int = 2, rate: Long = 48000L,
                        srCode: Int = 10, block: Int = 256): Array[Byte] =
    Flac.buildFlacFrame(no, block, rate, srCode, channels, bps,
      constant = None, verbatim = Some(vs))

  test("round-trip: constant + verbatim frames, sums, offsets, codes") {
    val v0 = Array.tabulate(2, 256)((c, s) => ((s * 7 + c * 11) % 256 - 128).toLong)
    val blob = Flac.buildFlac(48000L, 2, 16, 768L, Seq(
      constFrame(0, Array(100L, -3L)),
      verbFrame(1, v0),
      constFrame(2, Array(-32768L, 32767L))))
    val Right(doc) = Flac.flacFrameTable(blob): @unchecked
    assert(doc.sampleRate == 48000L && doc.channels == 2 && doc.bps == 16)
    assert(doc.totalSamples == 768L)
    assert(doc.frames.map(_.idx) == Seq(0L, 1L, 2L))
    assert(doc.frames.map(_.firstSample) == Seq(0L, 256L, 512L))
    assert(doc.frames.map(_.blockSize) == Seq(256, 256, 256))
    assert(doc.frames(0).sampleSum == (100L - 3L) * 256)
    assert(doc.frames(1).sampleSum == v0.flatten.sum)
    assert(doc.frames(2).sampleSum == (-32768L + 32767L) * 256)
  }

  test("sample-rate codes: streaminfo-ref, table, and end-of-header forms agree") {
    // srCode 0 (from streaminfo), 10 (48k table), 13 (16-bit Hz),
    // 14 (16-bit x10) must all parse to the same rate
    Seq(0, 10, 13, 14).foreach { sr =>
      val blob = Flac.buildFlac(48000L, 1, 16, 256L,
        Seq(constFrame(0, Array(5L), channels = 1, srCode = sr)))
      val Right(doc) = Flac.flacFrameTable(blob): @unchecked
      assert(doc.frames.head.sampleSum == 5L * 256, s"srCode=$sr")
    }
    // a frame whose coded rate CONTRADICTS streaminfo is a typed reject
    val bad = Flac.buildFlac(44100L, 1, 16, 256L,
      Seq(constFrame(0, Array(5L), channels = 1, rate = 48000L, srCode = 10)))
    assert(Flac.flacFrameTable(bad) ==
      Left("frame/streaminfo sample rate mismatch"))
  }

  test("bit depths 8/12/16/20/24/32 and 1..4 channels round-trip") {
    for (bps <- Seq(8, 12, 16, 20, 24, 32); nch <- 1 to 4) {
      val max = (1L << (bps - 1)) - 1
      val vals = Array.tabulate(nch)(c => if (c % 2 == 0) max else -max)
      val blob = Flac.buildFlac(8000L, nch, bps, 256L,
        Seq(constFrame(0, vals, bps = bps, channels = nch,
          rate = 8000L, srCode = 4)))
      val Right(doc) = Flac.flacFrameTable(blob): @unchecked
      assert(doc.frames.head.sampleSum == vals.sum * 256, s"bps=$bps nch=$nch")
    }
  }

  test("utf8-coded frame numbers: multi-byte boundaries") {
    Seq(0L, 127L, 128L, 2047L, 2048L, 65535L, 1L << 20, (1L << 31) - 1)
      .foreach { no =>
        val blob = Flac.buildFlac(8000L, 1, 16, 0L,
          Seq(constFrame(no, Array(1L), channels = 1, rate = 8000L,
            srCode = 4)))
        val Right(doc) = Flac.flacFrameTable(blob): @unchecked
        assert(doc.frames.head.firstSample == no * 256, s"no=$no")
      }
  }

  test("typed rejects: crc poison, sync loss, truncation totality, metadata") {
    val good = Flac.buildFlac(48000L, 2, 16, 512L, Seq(
      constFrame(0, Array(7L, 9L)),
      verbFrame(1, Array.tabulate(2, 256)((c, s) => (s % 17 + c).toLong))),
      padding = 64)
    assert(Flac.flacFrameTable(good).isRight)
    // one flipped bit in a subframe payload -> frame CRC-16 catches it
    val framesStart = 4 + 4 + 34 + 4 + 64
    val poisoned = good.clone()
    poisoned(framesStart + 20) = (poisoned(framesStart + 20) ^ 0x04).toByte
    val r = Flac.flacFrameTable(poisoned)
    assert(r == Left("bad frame crc") || r == Left("bad frame header crc") ||
      r.isLeft, s"got $r")
    // header byte flip -> header CRC-8
    val hpoison = good.clone()
    hpoison(framesStart + 2) = (hpoison(framesStart + 2) ^ 0x01).toByte
    assert(Flac.flacFrameTable(hpoison).isLeft)
    // magic / metadata rejects
    assert(Flac.flacFrameTable(Array.empty[Byte]) == Left("empty blob"))
    assert(Flac.flacFrameTable("flaC....".getBytes("US-ASCII")) ==
      Left("bad magic"))
    assert(Flac.flacFrameTable(good.take(10)) ==
      Left("truncated metadata block"))
    // garbage between frames = sync loss
    val withJunk = good ++ Array[Byte](0x12, 0x34)
    assert(Flac.flacFrameTable(withJunk) == Left("bad frame sync"))
    // truncation totality: never throws
    (0 to good.length by 7).foreach(k => Flac.flacFrameTable(good.take(k)))
  }

  test("unsupported-but-real constructs are typed quarantine rejects") {
    // stereo decorrelation (channel assignment 8 = left/side): flip the
    // assignment bits in a 2-channel frame header and re-CRC
    val f = constFrame(0, Array(1L, 2L))
    // header: 14+1+1+4+4 = 24 bits, channel assignment at bits 24..27
    val mut = f.clone()
    mut(3) = ((mut(3) & 0x0F) | (8 << 4)).toByte
    // recompute crcs: header crc at byte 3+utf8(1)=… simpler: rebuild via parser expectation
    val hdrLen = 5 // 4 header bytes + 1 utf8 byte (frameNo 0)
    mut(hdrLen) = Flac.TestHooks.crc8(mut, 0, hdrLen).toByte
    val bodyLen = mut.length - 2
    val c16 = Flac.TestHooks.crc16(mut, 0, bodyLen)
    mut(bodyLen) = ((c16 >> 8) & 0xFF).toByte
    mut(bodyLen + 1) = (c16 & 0xFF).toByte
    val blob = Flac.buildFlac(48000L, 2, 16, 256L, Seq(mut))
    assert(Flac.flacFrameTable(blob) == Left("unsupported channel assignment"))
    // FIXED-prediction subframe type: same surgery on the subframe header
    val f2 = constFrame(0, Array(1L), channels = 1)
    val sfOff = 6 // 4 hdr + 1 utf8 + 1 crc8; subframe header = next byte
    val mut2 = f2.clone()
    mut2(sfOff) = (8 << 1).toByte // type FIXED order 0, pad 0, wasted 0
    val body2 = mut2.length - 2
    val c162 = Flac.TestHooks.crc16(mut2, 0, body2)
    mut2(body2) = ((c162 >> 8) & 0xFF).toByte
    mut2(body2 + 1) = (c162 & 0xFF).toByte
    val blob2 = Flac.buildFlac(48000L, 1, 16, 256L, Seq(mut2))
    assert(Flac.flacFrameTable(blob2) == Left("unsupported subframe type"))
  }

  test("extractFlacFrames/flacErrors: poison -> zero rows + typed error") {
    val s = spark
    import s.implicits._
    val good = Flac.buildFlac(16000L, 1, 16, 512L, Seq(
      constFrame(0, Array(3L), channels = 1, rate = 16000L, srCode = 5),
      constFrame(1, Array(-4L), channels = 1, rate = 16000L, srCode = 5)))
    val df = Seq((1L, good), (2L, good.dropRight(1)),
      (3L, Array.empty[Byte])).toDF("id", "blob")
    val rows = Flac.extractFlacFrames(df, "blob").collect()
    assert(rows.length == 2 && rows.forall(_.getLong(0) == 1L))
    val errs = Flac.flacErrors(df, "blob").orderBy("id").collect()
    assert(errs.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ==
      Seq((1L, true), (2L, false), (3L, false)))
    assert(errs(0).getInt(1) == 2)
  }
}
