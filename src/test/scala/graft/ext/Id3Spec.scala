package graft.ext

import graft.SparkFunSuite

class Id3Spec extends SparkFunSuite {

  private def tf(fid: String, text: String, enc: Int) =
    (fid, Mp3.id3TextData(text, enc))

  test("v2.3 / v2.4 frame walks: size coding, encodings, padding, PRIV") {
    // >127-byte frame data exercises the size-coding split:
    // v2.4 syncsafe vs v2.3 plain big-endian
    val long = "x" * 200
    val v4 = Mp3.buildId3v2Tag(4, Seq(
      tf("TIT2", long, 0), tf("TPE1", "artist", 1),
      tf("TALB", "album", 2), tf("TCON", "genre", 3),
      ("PRIV", Array[Byte](1, 2, 3, 4, 5))), pad = 14)
    val Right(f4) = Mp3.id3FrameTable(v4): @unchecked
    assert(f4.map(_.frameId) == Seq("TIT2", "TPE1", "TALB", "TCON", "PRIV"))
    assert(f4.map(_.idx) == Seq(0, 1, 2, 3, 4))
    assert(f4(0).text == long)
    assert(f4(1).text == "artist" && f4(2).text == "album" &&
      f4(3).text == "genre")
    assert(f4(4).text == null && f4(4).size == 5)
    val v3 = Mp3.buildId3v2Tag(3, Seq(
      tf("TIT2", long, 0), tf("TPE1", "artist", 1)), pad = 3)
    val Right(f3) = Mp3.id3FrameTable(v3): @unchecked
    assert(f3(0).text == long && f3(1).text == "artist")
    // v2.2: 3-char ids, 3-byte sizes
    val v2 = Mp3.buildId3v2Tag(2, Seq(
      ("TT2", Mp3.id3TextData("t2 title", 0)),
      ("TP1", Mp3.id3TextData("t2 artist", 1))))
    val Right(f2) = Mp3.id3FrameTable(v2): @unchecked
    assert(f2.map(_.frameId) == Seq("TT2", "TP1"))
    assert(f2(0).text == "t2 title" && f2(1).text == "t2 artist")
  }

  test("extended headers are skipped by version-correct rules") {
    val fs = Seq(tf("TIT2", "t", 0))
    val Right(a) = Mp3.id3FrameTable(
      Mp3.buildId3v2Tag(3, fs, withExtHeader = true)): @unchecked
    assert(a.head.text == "t")
    val Right(b) = Mp3.id3FrameTable(
      Mp3.buildId3v2Tag(4, fs, withExtHeader = true)): @unchecked
    assert(b.head.text == "t")
  }

  test("typed rejects: encoding domain, padding, unsync, bounds") {
    // enc 2/3 are v2.4-only
    assert(Mp3.id3FrameTable(Mp3.buildId3v2Tag(3,
      Seq(tf("TIT2", "t", 3)))) == Left("bad text encoding"))
    assert(Mp3.id3FrameTable(Mp3.buildId3v2Tag(3,
      Seq(tf("TIT2", "t", 2)))) == Left("bad text encoding"))
    // nonzero padding
    val padded = Mp3.buildId3v2Tag(4, Seq(tf("TIT2", "t", 0)), pad = 8)
    padded(padded.length - 1) = 0x11
    assert(Mp3.id3FrameTable(padded) == Left("nonzero padding"))
    // unsynchronization round-trip: text with 0xFF bytes ('ÿ' in
    // Latin-1) survives the FF-00 stuffing scheme
    val ff = Mp3.buildId3v2Tag(3, Seq(tf("TIT2", "aÿbÿ", 0),
      tf("TPE1", "plain", 0)))
    val unsync = Mp3.unsynchronizeTag(ff)
    assert(unsync.length > ff.length) // stuffing actually happened
    val Right(uf) = Mp3.id3FrameTable(unsync): @unchecked
    assert(uf.map(_.text) == Seq("aÿbÿ", "plain"))
    // frame size overruns the tag
    val good = Mp3.buildId3v2Tag(3, Seq(tf("TIT2", "title", 0)))
    val over = good.clone()
    over(10 + 7) = 0x70 // inflate the plain-BE size low byte
    assert(Mp3.id3FrameTable(over) == Left("frame out of bounds"))
    // v2.4 frame size must be syncsafe
    val ss = Mp3.buildId3v2Tag(4, Seq(tf("TIT2", "title", 0)))
    val badSs = ss.clone(); badSs(10 + 7) = 0x80.toByte
    assert(Mp3.id3FrameTable(badSs) == Left("bad frame syncsafe size"))
    // bad frame id characters
    val badId = good.clone(); badId(10) = '!'
    assert(Mp3.id3FrameTable(badId) == Left("bad frame id"))
    // compression/encryption frame-format flags quarantine
    val fmt = Mp3.buildId3v2Tag(3, Seq(tf("TIT2", "t", 0)))
    fmt(10 + 9) = 0x80.toByte
    assert(Mp3.id3FrameTable(fmt) == Left("unsupported frame format flags"))
    // truncation totality: never throws
    (0 until good.length).foreach(k => Mp3.id3FrameTable(good.take(k)))
    assert(Mp3.id3FrameTable(Array.empty[Byte]) == Left("no id3v2 tag"))
  }

  test("composition: the frame walk's tag is a valid q155 prefix") {
    val tag = Mp3.buildId3v2Tag(4, Seq(tf("TIT2", "song", 1)), pad = 5)
    val frame = Mp3.buildMp3Frame(3, 3, 5, 0, 0, 0, 42)
    val Right(fs) = Mp3.mp3FrameTable(tag ++ frame): @unchecked
    assert(fs.length == 1 && fs.head.offset == tag.length.toLong)
    val Right(id3) = Mp3.id3FrameTable(tag ++ frame): @unchecked
    assert(id3.head.text == "song")
  }

  test("extractId3Frames over a DataFrame") {
    import spark.implicits._
    val a = Mp3.buildId3v2Tag(3, Seq(tf("TIT2", "one", 0),
      tf("TRCK", "7", 1)))
    val bad = a.clone(); bad(5) = (bad(5) | 0x80).toByte
    val df = Seq((1L, a), (2L, bad)).toDF("id", "blob")
    val rows = Mp3.extractId3Frames(df, "blob")
      .orderBy("id", "frame_idx").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("text")).toSeq == Seq("one", "7"))
  }
}
