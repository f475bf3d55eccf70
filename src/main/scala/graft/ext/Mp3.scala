package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** MPEG audio (MP3) frame-level plumbing — the dominant compressed
  * audio format in any crawled corpus. The reference engine treats
  * audio as opaque chunks (`/root/reference/lib/deduplicator.ex`); a
  * corpus pipeline needs the layer above: walk the frame sequence,
  * recover per-frame timing/bitrate metadata, and hand frame extents
  * to the dedup operators — WITHOUT decoding audio (no DCT here; this
  * is pure header arithmetic, which is what makes it exact).
  *
  * Format facts from the public ISO/IEC 11172-3 / 13818-3 headers:
  *   - a frame starts with an 11-bit sync (0xFFE), then version
  *     (MPEG1/2/2.5), layer (I/II/III), bitrate index, sample-rate
  *     index, padding bit, channel mode;
  *   - frame length in bytes is derived, not stored: Layer I
  *     `(12·br/sr + pad)·4`, Layer II and MPEG1 Layer III
  *     `144·br/sr + pad`, MPEG2/2.5 Layer III `72·br/sr + pad`
  *     (integer division; br in bit/s);
  *   - samples per frame: Layer I 384, Layer II 1152, Layer III 1152
  *     (MPEG1) / 576 (MPEG2/2.5);
  *   - files commonly carry an ID3v2 tag up front (10-byte header with
  *     a 28-bit syncsafe size, optional footer) and a 128-byte ID3v1
  *     `TAG` trailer.
  *
  * Scale notes (100 TB): the walk is a narrow per-partition map — one
  * blob in, frame rows out, no shuffle, no driver involvement; cost is
  * linear in blob size with zero per-frame allocation beyond the row.
  * All header-derived lengths are UNTRUSTED: bounds are checked before
  * every read, the walk is strict (garbage between frames rejects the
  * blob with a typed reason — crawl pipelines quarantine, they don't
  * guess), and free-format frames (length not derivable) are a typed
  * reject, so a poison blob costs one error row, never a scan overrun.
  */
object Mp3 {

  final case class Mp3Frame(idx: Int, offset: Long, versionId: Int,
                            layer: Int, bitrateKbps: Int, sampleRate: Int,
                            padding: Int, channelMode: Int, frameBytes: Int,
                            samplesPerFrame: Int, payloadSum: Long)

  // bitrate tables in kbit/s, indexed 1..14 (0 = free-format, 15 = bad)
  private val Br1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val Br1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val Br1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Br2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val Br2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  // sample-rate tables, indexed 0..2 (3 = bad), by version id
  private val Sr1 = Array(44100, 48000, 32000)
  private val Sr2 = Array(22050, 24000, 16000)
  private val Sr25 = Array(11025, 12000, 8000)

  /** version id: 0 = MPEG2.5, 2 = MPEG2, 3 = MPEG1 (the header's own
    * 2-bit encoding; 1 is reserved). layer: 1/2/3 = Layer I/II/III.
    */
  private def bitrateKbps(versionId: Int, layer: Int, idx: Int): Int = {
    val table =
      if (versionId == 3) layer match {
        case 1 => Br1L1; case 2 => Br1L2; case _ => Br1L3
      } else if (layer == 1) Br2L1
      else Br2L23
    table(idx)
  }

  private def sampleRate(versionId: Int, idx: Int): Int =
    (versionId match { case 3 => Sr1; case 2 => Sr2; case _ => Sr25 })(idx)

  private def samplesPerFrame(versionId: Int, layer: Int): Int =
    layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (versionId == 3) 1152 else 576
    }

  private def frameBytes(versionId: Int, layer: Int, brKbps: Int,
                         sr: Int, pad: Int): Int = {
    val br = brKbps * 1000
    layer match {
      case 1 => (12 * br / sr + pad) * 4
      case 2 => 144 * br / sr + pad
      case _ => (if (versionId == 3) 144 else 72) * br / sr + pad
    }
  }

  private def u(b: Byte): Int = b & 0xFF

  /** ID3v2 total tag length at offset 0, or 0 when absent, or -1 when
    * the tag header claims more bytes than the blob has (truncation).
    * Size field is 28-bit syncsafe; the footer flag adds 10 bytes.
    */
  private def id3v2Length(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    if ((u(b(6)) | u(b(7)) | u(b(8)) | u(b(9))) >= 0x80) return -1 // not syncsafe
    val size = (u(b(6)) << 21) | (u(b(7)) << 14) | (u(b(8)) << 7) | u(b(9))
    val total = 10 + size + (if ((u(b(5)) & 0x10) != 0) 10 else 0)
    if (total > b.length) -1 else total
  }

  /** Walk one blob's frame sequence. Strict and total: any structural
    * violation (bad sync, reserved version/layer, free-format or bad
    * bitrate index, bad sample-rate index, truncated frame, garbage
    * where a frame should start) rejects the blob with a typed reason.
    * A trailing 128-byte ID3v1 `TAG` block is legal and skipped.
    */
  def mp3FrameTable(bytes: Array[Byte]): Either[String, Seq[Mp3Frame]] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try mp3FrameTableWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def mp3FrameTableWalk(bytes: Array[Byte]): Either[String, Seq[Mp3Frame]] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val skip = id3v2Length(bytes)
    if (skip < 0) return Left("truncated id3v2 tag")
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Mp3Frame]
    var pos = skip
    var idx = 0
    while (pos < n) {
      // legal trailer: exactly 128 bytes of ID3v1 at the very end
      if (n - pos == 128 && bytes(pos) == 'T' && bytes(pos + 1) == 'A' &&
          bytes(pos + 2) == 'G') {
        return if (out.isEmpty) Left("no frames") else Right(out.toSeq)
      }
      if (n - pos < 4) return Left("truncated frame header")
      val b1 = u(bytes(pos + 1))
      if (u(bytes(pos)) != 0xFF || (b1 & 0xE0) != 0xE0)
        return Left("bad frame sync")
      val versionId = (b1 >> 3) & 0x3
      if (versionId == 1) return Left("reserved version")
      val layerBits = (b1 >> 1) & 0x3
      if (layerBits == 0) return Left("reserved layer")
      val layer = 4 - layerBits // 01=III, 10=II, 11=I
      val b2 = u(bytes(pos + 2))
      val brIdx = (b2 >> 4) & 0xF
      if (brIdx == 0) return Left("free-format bitrate")
      if (brIdx == 15) return Left("bad bitrate index")
      val srIdx = (b2 >> 2) & 0x3
      if (srIdx == 3) return Left("bad sample-rate index")
      val pad = (b2 >> 1) & 0x1
      val mode = (u(bytes(pos + 3)) >> 6) & 0x3
      val br = bitrateKbps(versionId, layer, brIdx)
      val sr = sampleRate(versionId, srIdx)
      val len = frameBytes(versionId, layer, br, sr, pad)
      if (len < 4) return Left("degenerate frame length")
      if (len > n - pos) return Left("truncated frame")
      var sum = 0L
      var i = pos + 4
      val end = pos + len
      while (i < end) { sum += u(bytes(i)); i += 1 }
      out += Mp3Frame(idx, pos.toLong, versionId, layer, br, sr, pad, mode,
        len, samplesPerFrame(versionId, layer), sum)
      idx += 1
      pos = end
    }
    if (out.isEmpty) Left("no frames") else Right(out.toSeq)
  }

  /** Explode a binary MP3 column into one row per frame. Poison blobs
    * yield zero rows (the container-explode convention shared with
    * [[Multimodal.extractMp4Samples]] / [[WebArchive.extractWarcRecords]]);
    * [[mp3Errors]] is the error channel. Narrow per-partition flatMap.
    */
  def extractMp3Frames(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("frame_idx", IntegerType, nullable = false),
        StructField("offset", LongType, nullable = false),
        StructField("version_id", IntegerType, nullable = false),
        StructField("layer", IntegerType, nullable = false),
        StructField("bitrate_kbps", IntegerType, nullable = false),
        StructField("sample_rate", IntegerType, nullable = false),
        StructField("padding", IntegerType, nullable = false),
        StructField("channel_mode", IntegerType, nullable = false),
        StructField("frame_bytes", IntegerType, nullable = false),
        StructField("spf", IntegerType, nullable = false),
        StructField("payload_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        mp3FrameTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(frames) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            frames.iterator.map { f =>
              val arr = new Array[Any](nKeep + 11)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = f.idx; arr(nKeep + 1) = f.offset
              arr(nKeep + 2) = f.versionId; arr(nKeep + 3) = f.layer
              arr(nKeep + 4) = f.bitrateKbps; arr(nKeep + 5) = f.sampleRate
              arr(nKeep + 6) = f.padding; arr(nKeep + 7) = f.channelMode
              arr(nKeep + 8) = f.frameBytes; arr(nKeep + 9) = f.samplesPerFrame
              arr(nKeep + 10) = f.payloadSum
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error/summary channel: one row per blob with
    * `(n_frames, total_samples, ok, error)` — total_samples feeds
    * duration (`total_samples / sample_rate`) without a float anywhere.
    */
  def mp3Errors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("n_frames", IntegerType, nullable = false),
        StructField("total_samples", LongType, nullable = false),
        StructField("ok", BooleanType, nullable = false),
        StructField("error", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.map { r =>
        val res = mp3FrameTable(r.getAs[Array[Byte]](idx))
        val arr = new Array[Any](nKeep + 4)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        res match {
          case Left(e) =>
            arr(nKeep) = 0; arr(nKeep + 1) = 0L
            arr(nKeep + 2) = false; arr(nKeep + 3) = e
          case Right(fs) =>
            arr(nKeep) = fs.length
            arr(nKeep + 1) = fs.map(_.samplesPerFrame.toLong).sum
            arr(nKeep + 2) = true; arr(nKeep + 3) = null
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // Synthetic fixtures (REAL format bytes — an independent MP3 frame
  // walker would parse them; the fixture-as-spec discipline of
  // Multimodal.syntheticMp4 / WebArchive.syntheticWarc).
  // ------------------------------------------------------------------

  /** Build one frame's bytes. `fill` is the constant payload byte. */
  def buildMp3Frame(versionId: Int, layer: Int, brIdx: Int, srIdx: Int,
                    pad: Int, mode: Int, fill: Int): Array[Byte] = {
    val br = bitrateKbps(versionId, layer, brIdx)
    val sr = sampleRate(versionId, srIdx)
    val len = frameBytes(versionId, layer, br, sr, pad)
    val out = new Array[Byte](len)
    val layerBits = 4 - layer
    out(0) = 0xFF.toByte
    out(1) = (0xE0 | (versionId << 3) | (layerBits << 1) | 1).toByte
    out(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    out(3) = (mode << 6).toByte
    java.util.Arrays.fill(out, 4, len, fill.toByte)
    out
  }

  /** Build an ID3v2.3 tag of `payload` content bytes (zeros). */
  def buildId3v2(payload: Int): Array[Byte] = {
    val out = new Array[Byte](10 + payload)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 3
    out(6) = ((payload >> 21) & 0x7F).toByte
    out(7) = ((payload >> 14) & 0x7F).toByte
    out(8) = ((payload >> 7) & 0x7F).toByte
    out(9) = (payload & 0x7F).toByte
    out
  }

  // ------------------------------------------------------------------
  // ID3v2 FRAME inventory (id3.org ID3v2.2 / v2.3 / v2.4 informal
  // standards) — the metadata layer q155 skips as an opaque prefix.
  // Audio curation reads it: title/artist/album text frames are the
  // only provenance a bare .mp3 carries.
  // ------------------------------------------------------------------

  final case class Id3Frame(idx: Int, frameId: String, size: Int,
                            text: String)

  /** Parse the ID3v2 tag at offset 0 into its frames. Strict and
    * total: version-correct size coding (v2.4 frame sizes are
    * syncsafe, v2.3 plain, v2.2 3-byte), extended headers skipped by
    * their version rules, padding must be all-zero, text-frame
    * encodings validated per version (0/1 in v2.2/v2.3; 0-3 in
    * v2.4), and the unsynchronization flag is a typed quarantine
    * reject. Non-text frames surface with a null `text`.
    */
  def id3FrameTable(bytes: Array[Byte]): Either[String, Seq[Id3Frame]] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try id3FrameTableWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def id3FrameTableWalk(bytes: Array[Byte]): Either[String, Seq[Id3Frame]] = {
    if (bytes == null || bytes.length < 10) return Left("no id3v2 tag")
    if (bytes(0) != 'I' || bytes(1) != 'D' || bytes(2) != '3')
      return Left("no id3v2 tag")
    val major = u(bytes(3))
    if (major < 2 || major > 4) return Left("unsupported id3v2 version")
    val flags = u(bytes(5))
    if ((u(bytes(6)) | u(bytes(7)) | u(bytes(8)) | u(bytes(9))) >= 0x80)
      return Left("bad syncsafe size")
    val size = (u(bytes(6)) << 21) | (u(bytes(7)) << 14) |
      (u(bytes(8)) << 7) | u(bytes(9))
    if (10 + size > bytes.length) return Left("truncated id3v2 tag")
    // Unsynchronization (id3v2.3 §5 whole-tag scheme; in v2.4 the tag
    // flag means every frame was unsynchronized the same way): every
    // FF 00 pair in the stored body decodes to FF. Frame sizes in the
    // tag refer to the DE-unsynchronized data.
    val (body, bodyEnd) =
      if ((flags & 0x80) != 0) {
        val out = new Array[Byte](size)
        var i = 10
        var o = 0
        val lim = 10 + size
        while (i < lim) {
          out(o) = bytes(i)
          o += 1
          if (u(bytes(i)) == 0xFF && i + 1 < lim && bytes(i + 1) == 0)
            i += 2
          else i += 1
        }
        (out, o)
      } else (bytes, 10 + size)
    parseFrames(body, if ((flags & 0x80) != 0) 0 else 10, bodyEnd,
      major, flags)
  }

  private def parseFrames(bytes: Array[Byte], start: Int, end: Int,
                          major: Int, flags: Int)
      : Either[String, Seq[Id3Frame]] = {
    var p = start
    if ((flags & 0x40) != 0) { // extended header
      if (major == 2) return Left("id3v2.2 compression unsupported")
      if (major == 3) {
        if (end - p < 4) return Left("truncated extended header")
        val es = (u(bytes(p)) << 24) | (u(bytes(p + 1)) << 16) |
          (u(bytes(p + 2)) << 8) | u(bytes(p + 3))
        if (es < 0 || es > end - p - 4) return Left("extended header out of bounds")
        p += 4 + es // v2.3 size EXCLUDES the size field
      } else {
        if (end - p < 4) return Left("truncated extended header")
        if ((u(bytes(p)) | u(bytes(p + 1)) | u(bytes(p + 2)) |
            u(bytes(p + 3))) >= 0x80) return Left("bad syncsafe size")
        val es = (u(bytes(p)) << 21) | (u(bytes(p + 1)) << 14) |
          (u(bytes(p + 2)) << 7) | u(bytes(p + 3))
        if (es < 6 || es > end - p) return Left("extended header out of bounds")
        p += es // v2.4 size INCLUDES itself
      }
    }
    val idLen = if (major == 2) 3 else 4
    val hdrLen = if (major == 2) 6 else 10
    val out = scala.collection.mutable.ArrayBuffer.empty[Id3Frame]
    var idx = 0
    while (p < end) {
      if (bytes(p) == 0) {
        // padding begins: strict — every remaining byte must be zero
        var i = p
        while (i < end) {
          if (bytes(i) != 0) return Left("nonzero padding")
          i += 1
        }
        p = end
      } else {
        if (end - p < hdrLen) return Left("truncated frame header")
        var ok = true
        var i = 0
        while (i < idLen) {
          val c = bytes(p + i)
          if (!((c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9'))) ok = false
          i += 1
        }
        if (!ok) return Left("bad frame id")
        val fid = new String(bytes, p, idLen,
          java.nio.charset.StandardCharsets.US_ASCII)
        val fsize =
          if (major == 2)
            (u(bytes(p + 3)) << 16) | (u(bytes(p + 4)) << 8) | u(bytes(p + 5))
          else if (major == 3)
            (u(bytes(p + 4)) << 24) | (u(bytes(p + 5)) << 16) |
              (u(bytes(p + 6)) << 8) | u(bytes(p + 7))
          else {
            if ((u(bytes(p + 4)) | u(bytes(p + 5)) | u(bytes(p + 6)) |
                u(bytes(p + 7))) >= 0x80)
              return Left("bad frame syncsafe size")
            (u(bytes(p + 4)) << 21) | (u(bytes(p + 5)) << 14) |
              (u(bytes(p + 6)) << 7) | u(bytes(p + 7))
          }
        if (fsize < 0 || fsize > end - p - hdrLen)
          return Left("frame out of bounds")
        if (major >= 3) {
          val f2 = u(bytes(p + 9))
          // compression/encryption/unsync per-frame formats we can't
          // byte-walk — quarantine
          if ((f2 & (if (major == 3) 0xC0 else 0x0E)) != 0)
            return Left("unsupported frame format flags")
        }
        val dataAt = p + hdrLen
        var text: String = null
        if (fid.charAt(0) == 'T' && fid != "TXXX" && fid != "TXX" &&
            fsize >= 1) {
          val encB = u(bytes(dataAt))
          val maxEnc = if (major == 4) 3 else 1
          if (encB > maxEnc) return Left("bad text encoding")
          val cs = encB match {
            case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
            case 1 => java.nio.charset.StandardCharsets.UTF_16 // BOM
            case 2 => java.nio.charset.StandardCharsets.UTF_16BE
            case _ => java.nio.charset.StandardCharsets.UTF_8
          }
          var t = new String(bytes, dataAt + 1, fsize - 1, cs)
          // strip trailing NUL terminator(s)
          while (t.nonEmpty && t.charAt(t.length - 1) == '\u0000')
            t = t.substring(0, t.length - 1)
          text = t
        }
        out += Id3Frame(idx, fid, fsize, text)
        idx += 1
        p = dataAt + fsize
      }
    }
    Right(out.toSeq)
  }

  /** Explode the ID3v2 tag of a binary column into one row per frame:
    * `(…keep…, frame_idx, frame_id, fsize, text)`.
    */
  def extractId3Frames(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("frame_idx", IntegerType, nullable = false),
        StructField("frame_id", StringType, nullable = false),
        StructField("fsize", IntegerType, nullable = false),
        StructField("text", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        id3FrameTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(frames) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            frames.iterator.map { f =>
              val arr = new Array[Any](nKeep + 4)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = f.idx; arr(nKeep + 1) = f.frameId
              arr(nKeep + 2) = f.size; arr(nKeep + 3) = f.text
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Encode one text frame's data bytes (encoding byte + text,
    * NUL-terminated) in the given encoding.
    */
  def id3TextData(text: String, encB: Int): Array[Byte] = {
    val cs = encB match {
      case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
      case 1 => java.nio.charset.StandardCharsets.UTF_16 // writes BOM
      case 2 => java.nio.charset.StandardCharsets.UTF_16BE
      case _ => java.nio.charset.StandardCharsets.UTF_8
    }
    val tb = (text + "\u0000").getBytes(cs)
    Array(encB.toByte) ++ tb
  }

  /** Build a full ID3v2 tag with explicit frames
    * `(frameId, dataBytes)`, optional extended header, and `pad`
    * zero bytes of padding. Frame sizes are coded per `major`'s rule.
    */
  def buildId3v2Tag(major: Int, frames: Seq[(String, Array[Byte])],
                    pad: Int = 0, withExtHeader: Boolean = false)
      : Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    if (withExtHeader) {
      if (major == 3) {
        // size 6 (excl. the field): flags 0, padding size 0
        body.write(Array[Byte](0, 0, 0, 6, 0, 0, 0, 0, 0, 0))
      } else {
        // v2.4: syncsafe size 6 incl. itself, 1 flag byte count, flags 0
        body.write(Array[Byte](0, 0, 0, 6, 1, 0))
      }
    }
    frames.foreach { case (fid, data) =>
      body.write(fid.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      if (major == 2) {
        body.write((data.length >> 16) & 0xFF)
        body.write((data.length >> 8) & 0xFF)
        body.write(data.length & 0xFF)
      } else if (major == 3) {
        body.write((data.length >> 24) & 0xFF)
        body.write((data.length >> 16) & 0xFF)
        body.write((data.length >> 8) & 0xFF)
        body.write(data.length & 0xFF)
        body.write(0); body.write(0)
      } else {
        body.write((data.length >> 21) & 0x7F)
        body.write((data.length >> 14) & 0x7F)
        body.write((data.length >> 7) & 0x7F)
        body.write(data.length & 0x7F)
        body.write(0); body.write(0)
      }
      body.write(data, 0, data.length)
    }
    body.write(new Array[Byte](pad), 0, pad)
    val bb = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(major); out.write(0)
    out.write(if (withExtHeader) 0x40 else 0)
    out.write((bb.length >> 21) & 0x7F)
    out.write((bb.length >> 14) & 0x7F)
    out.write((bb.length >> 7) & 0x7F)
    out.write(bb.length & 0x7F)
    out.write(bb, 0, bb.length)
    out.toByteArray
  }

  /** Unsynchronize a built ID3v2 tag (fixture side of the v2.3 §5
    * scheme): every 0xFF byte in the body gets a 0x00 stuffed after
    * it, the header grows the syncsafe size accordingly, and the
    * unsync flag is set.
    */
  def unsynchronizeTag(tag: Array[Byte]): Array[Byte] = {
    val size = (u(tag(6)) << 21) | (u(tag(7)) << 14) |
      (u(tag(8)) << 7) | u(tag(9))
    val body = new java.io.ByteArrayOutputStream()
    var i = 10
    val lim = 10 + size
    while (i < lim) {
      body.write(tag(i))
      if (u(tag(i)) == 0xFF) body.write(0)
      i += 1
    }
    val bb = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(tag, 0, 5)
    out.write(u(tag(5)) | 0x80)
    out.write((bb.length >> 21) & 0x7F)
    out.write((bb.length >> 14) & 0x7F)
    out.write((bb.length >> 7) & 0x7F)
    out.write(bb.length & 0x7F)
    out.write(bb, 0, bb.length)
    out.toByteArray
  }

  /** The q155 gate fixture: `4 + id % 5` frames behind an id-sized
    * ID3v2 tag, one of three format classes keyed by `id % 3`
    * (MPEG1 Layer III / MPEG1 Layer II / MPEG2 Layer III — distinct
    * bitrate tables, sample-rate tables, size formulas, and samples
    * per frame), bitrate/sample-rate/padding varying per frame, and an
    * ID3v1 trailer on `id % 4 == 0` — every derived column is integer
    * arithmetic a SQL oracle can restate.
    */
  def syntheticMp3(id: Long): Array[Byte] = {
    val (versionId, layer) = ((id % 3).toInt: @unchecked) match {
      case 0 => (3, 3); case 1 => (3, 2); case 2 => (2, 3)
    }
    val nFrames = 4 + (id % 5).toInt
    val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    parts += buildId3v2(5 + (id % 50).toInt)
    (0 until nFrames).foreach { j =>
      parts += buildMp3Frame(versionId, layer,
        brIdx = 1 + ((id * 5 + j * 3) % 14).toInt,
        srIdx = ((id + j) % 3).toInt,
        pad = ((id + j) % 2).toInt,
        mode = ((id + j) % 4).toInt,
        fill = (1 + (id * 7 + j * 13) % 200).toInt)
    }
    if (id % 4 == 0) {
      val tag = new Array[Byte](128)
      tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
      parts += tag
    }
    val total = parts.map(_.length).sum
    val out = new Array[Byte](total)
    var p = 0
    parts.foreach { b =>
      System.arraycopy(b, 0, out, p, b.length); p += b.length }
    out
  }
}
