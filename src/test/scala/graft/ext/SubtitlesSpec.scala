package graft.ext

import graft.SparkFunSuite

class SubtitlesSpec extends SparkFunSuite {

  private val cues = Seq(
    (0L, 1500L, "hello there"),
    (3661001L, 3662999L, "line one\nline two"), // 1h01m01.001s: carries live
    (7200000L, 7200500L, "third"))

  test("srt and vtt round-trip the SAME cues (ids/settings don't change them)") {
    val Right(a) = Subtitles.parseSrt(Subtitles.buildSrt(cues)): @unchecked
    val Right(b) = Subtitles.parseVtt(Subtitles.buildVtt(cues)): @unchecked
    val Right(c) = Subtitles.parseVtt(
      Subtitles.buildVtt(cues, withIds = true, withSettings = true)): @unchecked
    val want = cues.zipWithIndex.map { case ((s, e, t), i) =>
      Subtitles.Cue(i, s, e, t)
    }
    assert(a == want && b == want && c == want)
    // CRLF documents parse identically
    val Right(d) = Subtitles.parseSrt(
      Subtitles.buildSrt(cues).replace("\n", "\r\n")): @unchecked
    assert(d == want)
    // VTT MM:SS.mmm short form
    val Right(e) = Subtitles.parseVtt(
      "WEBVTT\n\n01:02.003 --> 01:03.000\nshort form\n"): @unchecked
    assert(e == Seq(Subtitles.Cue(0, 62003L, 63000L, "short form")))
    // NOTE/STYLE blocks are skipped
    val Right(f) = Subtitles.parseVtt(
      "WEBVTT\n\nNOTE a comment\n\n00:01.000 --> 00:02.000\nx\n"): @unchecked
    assert(f.length == 1)
  }

  test("typed rejects: timestamps, ordering, headers, indexes") {
    assert(Subtitles.parseSrt("") == Left("empty document"))
    assert(Subtitles.parseSrt(null) == Left("empty document"))
    assert(Subtitles.parseSrt("1\n00:00:00,000 --> 00:00:61,000\nx") ==
      Left("bad timestamp")) // seconds 61 out of range
    assert(Subtitles.parseSrt("1\n00:00:02,000 --> 00:00:01,000\nx") ==
      Left("cue ends before it starts"))
    assert(Subtitles.parseSrt("one\n00:00:00,000 --> 00:00:01,000\nx") ==
      Left("bad cue index"))
    assert(Subtitles.parseSrt("1\n00:00:00.000 --> 00:00:01.000\nx") ==
      Left("bad timestamp")) // dots are VTT, not SRT
    assert(Subtitles.parseVtt("1\n00:00.000 --> 00:01.000\nx") ==
      Left("missing webvtt header"))
    assert(Subtitles.parseVtt("WEBVTT\n\n00:00,000 --> 00:01,000\nx") ==
      Left("bad timestamp")) // commas are SRT, not VTT
  }

  test("extractCues over a DataFrame: auto-detect, poison -> zero rows") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Subtitles.buildSrt(cues)),
      (2L, Subtitles.buildVtt(cues)),
      (3L, "garbage that is not a subtitle file"),
      (4L, "")).toDF("id", "body")
    val rows = Subtitles.extractCues(df, "body").collect()
    assert(rows.count(_.getLong(0) == 1L) == 3)
    assert(rows.count(_.getLong(0) == 2L) == 3)
    assert(!rows.exists(r => r.getLong(0) == 3L || r.getLong(0) == 4L))
    // format-independent: srt and vtt docs produce identical cue rows
    val a = rows.filter(_.getLong(0) == 1L).map(r => (r.getInt(1),
      r.getLong(2), r.getLong(3), r.getString(4))).toSet
    val b = rows.filter(_.getLong(0) == 2L).map(r => (r.getInt(1),
      r.getLong(2), r.getLong(3), r.getString(4))).toSet
    assert(a == b)
  }
}
