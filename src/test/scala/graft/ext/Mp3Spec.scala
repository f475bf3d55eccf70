package graft.ext

import graft.SparkFunSuite

class Mp3Spec extends SparkFunSuite {

  test("frame arithmetic: the canonical MPEG1-L3 128kbps@44100 frame is 417 bytes") {
    // the textbook value every MP3 tool agrees on
    val f = Mp3.buildMp3Frame(3, 3, brIdx = 9, srIdx = 0, pad = 0,
      mode = 1, fill = 7)
    assert(f.length == 417)
    val Right(fs) = Mp3.mp3FrameTable(f): @unchecked
    assert(fs.length == 1)
    assert(fs.head.bitrateKbps == 128 && fs.head.sampleRate == 44100)
    assert(fs.head.frameBytes == 417 && fs.head.samplesPerFrame == 1152)
    assert(fs.head.payloadSum == (417 - 4) * 7L)
    // padding adds exactly one byte for layer II/III
    assert(Mp3.buildMp3Frame(3, 3, 9, 0, 1, 1, 7).length == 418)
  }

  test("syntheticMp3: all three format classes parse with the fixture arithmetic") {
    (0L until 24L).foreach { id =>
      val Right(fs) = Mp3.mp3FrameTable(Mp3.syntheticMp3(id)): @unchecked
      assert(fs.length == 4 + (id % 5).toInt)
      val cls = (id % 3).toInt
      assert(fs.forall(_.versionId == (if (cls == 2) 2 else 3)))
      assert(fs.forall(_.layer == (if (cls == 1) 2 else 3)))
      assert(fs.forall(_.samplesPerFrame == (if (cls == 2) 576 else 1152)))
      // offsets are contiguous from the ID3v2 end
      val id3 = 15 + (id % 50).toInt
      assert(fs.head.offset == id3)
      fs.sliding(2).foreach {
        case Seq(a, b) => assert(b.offset == a.offset + a.frameBytes)
        case _ =>
      }
    }
  }

  test("truncation totality: every prefix yields a typed result, never throws") {
    val full = Mp3.syntheticMp3(5)
    var lefts = 0
    (0 to full.length).foreach { k =>
      Mp3.mp3FrameTable(full.take(k)) match {
        case Left(_) => lefts += 1
        case Right(fs) => assert(fs.nonEmpty) // frame-boundary prefixes
      }
    }
    assert(lefts > full.length / 2)
  }

  test("malformed blobs: distinct typed reasons") {
    def hdr(b1: Int, b2: Int): Array[Byte] =
      Array(0xFF.toByte, b1.toByte, b2.toByte, 0x40.toByte)
    assert(Mp3.mp3FrameTable(null) == Left("empty blob"))
    assert(Mp3.mp3FrameTable(Array.empty[Byte]) == Left("empty blob"))
    assert(Mp3.mp3FrameTable(Array[Byte](0, 1, 2, 3))
      == Left("bad frame sync"))
    assert(Mp3.mp3FrameTable(Array[Byte](0xFF.toByte))
      == Left("truncated frame header"))
    // version bits 01 = reserved
    assert(Mp3.mp3FrameTable(hdr(0xE0 | (1 << 3) | (1 << 1) | 1, 0x94))
      == Left("reserved version"))
    // layer bits 00 = reserved
    assert(Mp3.mp3FrameTable(hdr(0xE0 | (3 << 3) | 1, 0x94))
      == Left("reserved layer"))
    // bitrate index 0 = free-format (frame length not derivable)
    assert(Mp3.mp3FrameTable(hdr(0xFB, 0x00))
      == Left("free-format bitrate"))
    assert(Mp3.mp3FrameTable(hdr(0xFB, 0xF0))
      == Left("bad bitrate index"))
    // sample-rate index 3 = reserved
    assert(Mp3.mp3FrameTable(hdr(0xFB, 0x9C))
      == Left("bad sample-rate index"))
    // valid header claiming more bytes than present
    assert(Mp3.mp3FrameTable(hdr(0xFB, 0x94)) == Left("truncated frame"))
    // ID3v2 header claiming a size beyond the blob
    assert(Mp3.mp3FrameTable(Mp3.buildId3v2(100).take(12))
      == Left("truncated id3v2 tag"))
    // non-syncsafe ID3v2 size byte
    val badSync = Mp3.buildId3v2(5); badSync(6) = 0x80.toByte
    assert(Mp3.mp3FrameTable(badSync) == Left("truncated id3v2 tag"))
    // a lone ID3v2 tag has no frames
    assert(Mp3.mp3FrameTable(Mp3.buildId3v2(5)) == Left("no frames"))
    // 128 trailing bytes that are NOT an ID3v1 tag are garbage
    val frame = Mp3.buildMp3Frame(3, 3, 9, 0, 0, 1, 7)
    assert(Mp3.mp3FrameTable(frame ++ new Array[Byte](128))
      == Left("bad frame sync"))
    // ...but a real TAG trailer is legal
    val tag = new Array[Byte](128)
    tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
    val Right(ok) = Mp3.mp3FrameTable(frame ++ tag): @unchecked
    assert(ok.length == 1)
  }

  test("extractMp3Frames/mp3Errors: poison -> zero rows + typed error; totals exact") {
    val s = spark; import s.implicits._
    val good = Mp3.syntheticMp3(7) // cls 1: MPEG1 Layer II, 6 frames
    val df = Seq(
      (1L, good),
      (2L, good.dropRight(2)),
      (3L, Array.empty[Byte])
    ).toDF("id", "blob")
    val rows = Mp3.extractMp3Frames(df, "blob").collect()
    assert(rows.forall(_.getAs[Long]("id") == 1L) && rows.length == 6)
    val errs = Mp3.mp3Errors(df, "blob").orderBy("id").collect()
    assert(errs.map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("ok"))).toSeq
      == Seq((1L, true), (2L, false), (3L, false)))
    assert(errs(0).getAs[Int]("n_frames") == 6)
    assert(errs(0).getAs[Long]("total_samples") == 6L * 1152)
    assert(errs(1).getAs[String]("error") == "truncated frame")
    assert(errs(2).getAs[String]("error") == "empty blob")
  }
}
