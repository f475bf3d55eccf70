package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Subtitle ingest (SubRip .srt and W3C WebVTT) — the text track of a
  * crawled video corpus, and training text in its own right (aligned
  * speech transcripts). One parser, two published syntaxes:
  *
  *   SRT: blank-line-separated blocks of (numeric index,
  *        `HH:MM:SS,mmm --> HH:MM:SS,mmm`, text lines).
  *   VTT: a `WEBVTT` header line, then cues of (optional identifier,
  *        `HH:MM:SS.mmm --> HH:MM:SS.mmm` plus optional cue settings
  *        after the end timestamp, text lines). (WebVTT also allows
  *        MM:SS.mmm; accepted.)
  *
  * Strict and total: malformed timestamps, an end before its start,
  * out-of-range minute/second fields, a non-numeric SRT index, and a
  * missing VTT header are typed rejects; cue text is preserved
  * verbatim (multi-line joined with '\n').
  */
object Subtitles {

  final case class Cue(idx: Int, startMs: Long, endMs: Long, text: String)

  private val SrtTime =
    """(\d{2,3}):(\d{2}):(\d{2}),(\d{3})""".r
  private val VttTime =
    """(?:(\d{2,3}):)?(\d{2}):(\d{2})\.(\d{3})""".r

  private def srtMs(s: String): Long = s match {
    case SrtTime(h, m, sec, ms)
      if m.toInt < 60 && sec.toInt < 60 =>
      ((h.toLong * 60 + m.toLong) * 60 + sec.toLong) * 1000 + ms.toLong
    case _ => -1L
  }

  private def vttMs(s: String): Long = s match {
    case VttTime(h, m, sec, ms)
      if m.toInt < 60 && sec.toInt < 60 =>
      val hh = if (h == null) 0L else h.toLong
      ((hh * 60 + m.toLong) * 60 + sec.toLong) * 1000 + ms.toLong
    case _ => -1L
  }

  /** Parse an SRT document. */
  def parseSrt(text: String): Either[String, Seq[Cue]] = {
    if (text == null || text.isEmpty) return Left("empty document")
    val blocks = text.replace("\r\n", "\n").split("\n{2,}")
      .map(_.strip).filter(_.nonEmpty)
    if (blocks.isEmpty) return Left("no cues")
    val out = scala.collection.mutable.ArrayBuffer.empty[Cue]
    blocks.foreach { blk =>
      val lines = blk.split("\n")
      if (lines.length < 2) return Left("short cue block")
      if (!lines(0).strip.forall(_.isDigit) || lines(0).strip.isEmpty)
        return Left("bad cue index")
      val tl = lines(1).split("-->")
      if (tl.length != 2) return Left("bad timing line")
      val start = srtMs(tl(0).strip)
      val end = srtMs(tl(1).strip)
      if (start < 0 || end < 0) return Left("bad timestamp")
      if (end < start) return Left("cue ends before it starts")
      out += Cue(out.length, start, end, lines.drop(2).mkString("\n"))
    }
    Right(out.toSeq)
  }

  /** Parse a WebVTT document. */
  def parseVtt(text: String): Either[String, Seq[Cue]] = {
    if (text == null || text.isEmpty) return Left("empty document")
    val norm = text.replace("\r\n", "\n")
    val lines0 = norm.split("\n", -1)
    if (lines0.isEmpty || !lines0(0).strip.startsWith("WEBVTT"))
      return Left("missing webvtt header")
    val body = lines0.drop(1).mkString("\n")
    val blocks = body.split("\n{2,}").map(_.strip).filter(_.nonEmpty)
      .filterNot(b => b.startsWith("NOTE") || b.startsWith("STYLE") ||
        b.startsWith("REGION"))
    val out = scala.collection.mutable.ArrayBuffer.empty[Cue]
    blocks.foreach { blk =>
      val lines = blk.split("\n")
      // optional cue identifier: the timing line is the one with -->
      val ti = lines.indexWhere(_.contains("-->"))
      if (ti < 0 || ti > 1) return Left("bad cue block")
      val tl = lines(ti).split("-->")
      if (tl.length != 2) return Left("bad timing line")
      val start = vttMs(tl(0).strip)
      // cue settings may follow the end timestamp
      val endTok = tl(1).strip.split("""\s+""")(0)
      val end = vttMs(endTok)
      if (start < 0 || end < 0) return Left("bad timestamp")
      if (end < start) return Left("cue ends before it starts")
      out += Cue(out.length, start, end, lines.drop(ti + 1).mkString("\n"))
    }
    if (out.isEmpty) return Left("no cues")
    Right(out.toSeq)
  }

  /** Explode a subtitle text column into one row per cue:
    * `(…keep…, cue_idx, start_ms, end_ms, cue_text)`. `format` is
    * "srt", "vtt", or "auto" (VTT when the document opens with
    * WEBVTT). Poison documents yield zero rows.
    */
  def extractCues(df: DataFrame, textCol: String,
                  format: String = "auto"): DataFrame = {
    require(Set("srt", "vtt", "auto")(format), s"bad format $format")
    val schema = StructType(df.schema.fields.filterNot(_.name == textCol) ++
      Seq(StructField("cue_idx", IntegerType, nullable = false),
        StructField("start_ms", LongType, nullable = false),
        StructField("end_ms", LongType, nullable = false),
        StructField("cue_text", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(textCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == textCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val text = r.getAs[String](idx)
        val parsed = format match {
          case "srt" => parseSrt(text)
          case "vtt" => parseVtt(text)
          case _ =>
            if (text != null && text.stripLeading().startsWith("WEBVTT"))
              parseVtt(text)
            else parseSrt(text)
        }
        parsed match {
          case Left(_) => Iterator.empty
          case Right(cues) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            cues.iterator.map { c =>
              val arr = new Array[Any](nKeep + 4)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = c.idx; arr(nKeep + 1) = c.startMs
              arr(nKeep + 2) = c.endMs; arr(nKeep + 3) = c.text
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // fixture writers

  private def fmt(ms: Long, sep: Char): String = {
    val h = ms / 3600000
    val m = (ms / 60000) % 60
    val s = (ms / 1000) % 60
    val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d$sep$f%03d"
  }

  def buildSrt(cues: Seq[(Long, Long, String)]): String =
    cues.zipWithIndex.map { case ((a, b, t), i) =>
      s"${i + 1}\n${fmt(a, ',')} --> ${fmt(b, ',')}\n$t"
    }.mkString("\n\n") + "\n"

  def buildVtt(cues: Seq[(Long, Long, String)],
               withIds: Boolean = false,
               withSettings: Boolean = false): String = {
    val body = cues.zipWithIndex.map { case ((a, b, t), i) =>
      val id = if (withIds) s"cue-${i + 1}\n" else ""
      val settings = if (withSettings) " align:start line:0" else ""
      s"$id${fmt(a, '.')} --> ${fmt(b, '.')}$settings\n$t"
    }.mkString("\n\n")
    s"WEBVTT\n\n$body\n"
  }
}
