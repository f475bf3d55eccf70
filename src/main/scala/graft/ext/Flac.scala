package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FLAC (Free Lossless Audio Codec, xiph.org format spec / RFC 9639)
  * ingest — the lossless family of a crawled audio corpus (speech
  * datasets overwhelmingly ship FLAC or WAV). Completes the audio
  * coverage next to WAV/PCM ([[Multimodal]]), MP3 ([[Mp3]]), Ogg
  * ([[Ogg]]) and WebM ([[Matroska]]).
  *
  * FLAC frames carry NO length field: a walker must actually decode
  * each frame's bit-level subframes to find its end. This parser
  * implements the metadata-block walk (STREAMINFO required first),
  * the frame-header bit layout (sync, blocking strategy, block-size /
  * sample-rate / sample-size codes incl. the end-of-header forms,
  * UTF-8-coded frame number), CONSTANT and VERBATIM subframes for
  * 1-8 independent channels, and VERIFIES both the header CRC-8
  * (poly 0x07) and the whole-frame CRC-16 (poly 0x8005) — one flipped
  * bit anywhere is a typed reject. Prediction-coded subframes (FIXED/
  * LPC) and stereo-decorrelated channel assignments are surfaced as
  * typed rejects (quarantine), not silent drops — the pipeline-scope
  * boundary, same argument as [[Matroska]]'s pre-q164 lacing reject.
  *
  * Strict and total over untrusted bytes: every read is bounds-checked
  * and every malformation (bad magic, truncated metadata, sync loss,
  * STREAMINFO inconsistency, CRC mismatch, over-long UTF-8) is a typed
  * reject. 100 TB shape: one file = one blob row, the walk is a narrow
  * per-partition map; sample payloads are never materialized — frames
  * stream out as (index, first_sample, block_size, sample_sum).
  */
object Flac {

  final case class FlacFrame(idx: Long, firstSample: Long, blockSize: Int,
                             channels: Int, bps: Int, sampleSum: Long)
  final case class FlacDoc(sampleRate: Long, channels: Int, bps: Int,
                           totalSamples: Long, frames: Seq[FlacFrame])

  private def u(b: Byte): Int = b & 0xFF

  // CRC-8, poly 0x07, init 0, MSB-first (FLAC frame header)
  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80) != 0) ((r << 1) ^ 0x07) & 0xFF else (r << 1) & 0xFF
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  // CRC-16, poly 0x8005, init 0, MSB-first (FLAC whole frame)
  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 8
      var j = 0
      while (j < 8) {
        r = if ((r & 0x8000) != 0) ((r << 1) ^ 0x8005) & 0xFFFF
            else (r << 1) & 0xFFFF
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table(c ^ u(b(i))); i += 1 }
    c
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c = ((c << 8) & 0xFFFF) ^ Crc16Table(((c >> 8) ^ u(b(i))) & 0xFF)
      i += 1
    }
    c
  }

  /** MSB-first bit reader over a byte range; every read bounds-checked
    * (returns Long.MinValue-free via the `ok` flag — callers bail to a
    * typed reject).
    */
  private final class BitReader(b: Array[Byte], val limit: Int, start: Int) {
    var bytePos: Int = start
    var bitPos: Int = 0 // 0..7, bits consumed of current byte
    var failed: Boolean = false

    def bits(n: Int): Long = {
      var v = 0L
      var k = n
      while (k > 0) {
        if (bytePos >= limit) { failed = true; return 0L }
        val avail = 8 - bitPos
        val take = math.min(avail, k)
        val cur = u(b(bytePos))
        val shifted = (cur >> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | shifted
        bitPos += take
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        k -= take
      }
      v
    }

    def signedBits(n: Int): Long = {
      val v = bits(n)
      if (failed) 0L
      else if ((v & (1L << (n - 1))) != 0) v - (1L << n)
      else v
    }

    def alignToByte(): Boolean = {
      if (bitPos != 0) {
        val pad = bits(8 - bitPos)
        if (failed || pad != 0) return false
      }
      true
    }
  }

  /** Walk one FLAC blob. */
  def flacFrameTable(bytes: Array[Byte]): Either[String, FlacDoc] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try flacFrameTableWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def flacFrameTableWalk(bytes: Array[Byte]): Either[String, FlacDoc] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val n = bytes.length
    if (n < 4 || bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' ||
        bytes(3) != 'C') return Left("bad magic")
    var pos = 4
    // metadata blocks: STREAMINFO (type 0, 34 bytes) must come first
    var sampleRate = 0L
    var siChannels = 0
    var siBps = 0
    var totalSamples = 0L
    var minBlock = 0
    var maxBlock = 0
    var sawStreamInfo = false
    var last = false
    var first = true
    while (!last) {
      if (n - pos < 4) return Left("truncated metadata header")
      val hdr = u(bytes(pos))
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7F
      val blen = (u(bytes(pos + 1)) << 16) | (u(bytes(pos + 2)) << 8) |
        u(bytes(pos + 3))
      if (btype == 127) return Left("invalid metadata block type")
      if (n - pos - 4 < blen) return Left("truncated metadata block")
      if (first && btype != 0) return Left("missing streaminfo")
      if (btype == 0) {
        if (!first) return Left("duplicate streaminfo")
        if (blen != 34) return Left("bad streaminfo length")
        val r = new BitReader(bytes, pos + 4 + 34, pos + 4)
        minBlock = r.bits(16).toInt
        maxBlock = r.bits(16).toInt
        r.bits(24); r.bits(24) // min/max frame size (0 = unknown)
        sampleRate = r.bits(20)
        siChannels = r.bits(3).toInt + 1
        siBps = r.bits(5).toInt + 1
        totalSamples = r.bits(36)
        if (r.failed) return Left("truncated streaminfo")
        if (sampleRate == 0) return Left("bad streaminfo sample rate")
        sawStreamInfo = true
      }
      first = false
      pos += 4 + blen
    }
    if (!sawStreamInfo) return Left("missing streaminfo")

    val frames = scala.collection.mutable.ArrayBuffer.empty[FlacFrame]
    var frameIdx = 0L
    while (pos < n) {
      val frameStart = pos
      val r = new BitReader(bytes, n, pos)
      val sync = r.bits(14)
      if (r.failed || sync != 0x3FFE) return Left("bad frame sync")
      if (r.bits(1) != 0) return Left("bad frame reserved bit")
      val variableBlocking = r.bits(1) == 1
      val bsCode = r.bits(4).toInt
      val srCode = r.bits(4).toInt
      val chanAsgn = r.bits(4).toInt
      val ssCode = r.bits(3).toInt
      if (r.bits(1) != 0) return Left("bad frame reserved bit")
      if (r.failed) return Left("truncated frame header")
      // UTF-8-coded frame number (fixed) / first-sample (variable)
      val coded = readUtf8Coded(r)
      if (coded < 0) return Left("bad utf8 frame number")
      val blockSize = bsCode match {
        case 0 => return Left("reserved block size code")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.bits(8).toInt + 1
        case 7 => r.bits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      val frameRate = srCode match {
        case 0  => sampleRate
        case 1  => 88200L
        case 2  => 176400L
        case 3  => 192000L
        case 4  => 8000L
        case 5  => 16000L
        case 6  => 22050L
        case 7  => 24000L
        case 8  => 32000L
        case 9  => 44100L
        case 10 => 48000L
        case 11 => 96000L
        case 12 => r.bits(8) * 1000L
        case 13 => r.bits(16)
        case 14 => r.bits(16) * 10L
        case _  => return Left("invalid sample rate code")
      }
      if (r.failed) return Left("truncated frame header")
      if (frameRate != sampleRate)
        return Left("frame/streaminfo sample rate mismatch")
      val channels = chanAsgn match {
        case c if c <= 7 => c + 1
        case c if c <= 10 => return Left("unsupported channel assignment")
        case _ => return Left("reserved channel assignment")
      }
      if (channels != siChannels)
        return Left("frame/streaminfo channel mismatch")
      val bps = ssCode match {
        case 0 => siBps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => return Left("reserved sample size code")
      }
      if (bps != siBps) return Left("frame/streaminfo sample size mismatch")
      if (blockSize < 1 || blockSize > math.max(maxBlock, 65536))
        return Left("frame block size out of range")
      // header CRC-8 covers everything up to here (byte-aligned by
      // construction: 32 header bits + whole UTF-8 bytes + 8/16-bit
      // end-of-header fields)
      if (r.bitPos != 0) return Left("misaligned frame header")
      val hcrc = r.bits(8).toInt
      if (r.failed) return Left("truncated frame header")
      if (hcrc != crc8(bytes, frameStart, r.bytePos - 1))
        return Left("bad frame header crc")
      // subframes
      var sampleSum = 0L
      var ch = 0
      while (ch < channels) {
        if (r.bits(1) != 0) return Left("bad subframe padding bit")
        val sfType = r.bits(6).toInt
        val wasted = r.bits(1)
        if (r.failed) return Left("truncated subframe header")
        if (wasted != 0) return Left("unsupported wasted bits")
        sfType match {
          case 0 => // CONSTANT
            val v = r.signedBits(bps)
            if (r.failed) return Left("truncated subframe")
            sampleSum += v * blockSize
          case 1 => // VERBATIM
            var s = 0
            while (s < blockSize) {
              sampleSum += r.signedBits(bps)
              s += 1
            }
            if (r.failed) return Left("truncated subframe")
          case t if t >= 8 && t <= 12 =>
            return Left("unsupported subframe type") // FIXED
          case t if t >= 32 =>
            return Left("unsupported subframe type") // LPC
          case _ => return Left("reserved subframe type")
        }
        ch += 1
      }
      if (!r.alignToByte()) return Left("bad frame padding")
      val fcrc = r.bits(16).toInt
      if (r.failed) return Left("truncated frame")
      if (fcrc != crc16(bytes, frameStart, r.bytePos - 2))
        return Left("bad frame crc")
      val firstSample =
        if (variableBlocking) coded else coded * blockSize
      frames += FlacFrame(frameIdx, firstSample, blockSize, channels,
        bps, sampleSum)
      frameIdx += 1
      pos = r.bytePos
    }
    Right(FlacDoc(sampleRate, siChannels, siBps, totalSamples,
      frames.toSeq))
  }

  /** FLAC's UTF-8-style coded number (up to 36 bits / 7 bytes);
    * -1 on malformation. Reads whole bytes from an aligned reader.
    */
  private def readUtf8Coded(r: BitReader): Long = {
    val b0 = r.bits(8).toInt
    if (r.failed) return -1
    if ((b0 & 0x80) == 0) return b0
    var nCont = 0
    var mask = 0x40
    while ((b0 & mask) != 0 && nCont < 7) { nCont += 1; mask >>= 1 }
    if (nCont < 1 || nCont > 6) return -1
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < nCont) {
      val c = r.bits(8).toInt
      if (r.failed || (c & 0xC0) != 0x80) return -1
      v = (v << 6) | (c & 0x3F)
      i += 1
    }
    v
  }

  /** Explode a binary FLAC column into one row per frame:
    * `(…keep…, frame_idx, first_sample, block_size, n_channels, bps,
    * sample_rate, sample_sum)`. Poison blobs yield zero rows.
    */
  def extractFlacFrames(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("frame_idx", LongType, nullable = false),
        StructField("first_sample", LongType, nullable = false),
        StructField("block_size", IntegerType, nullable = false),
        StructField("n_channels", IntegerType, nullable = false),
        StructField("bps", IntegerType, nullable = false),
        StructField("sample_rate", LongType, nullable = false),
        StructField("sample_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        flacFrameTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(doc) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            doc.frames.iterator.map { f =>
              val arr = new Array[Any](nKeep + 7)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = f.idx; arr(nKeep + 1) = f.firstSample
              arr(nKeep + 2) = f.blockSize; arr(nKeep + 3) = f.channels
              arr(nKeep + 4) = f.bps; arr(nKeep + 5) = doc.sampleRate
              arr(nKeep + 6) = f.sampleSum
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: one row per blob, `(n_frames, ok, error)`. */
  def flacErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("n_frames", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false),
        StructField("error", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.map { r =>
        val res = flacFrameTable(r.getAs[Array[Byte]](idx))
        val arr = new Array[Any](nKeep + 3)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        res match {
          case Right(doc) =>
            arr(nKeep) = doc.frames.length; arr(nKeep + 1) = true
            arr(nKeep + 2) = null
          case Left(e) =>
            arr(nKeep) = 0; arr(nKeep + 1) = false; arr(nKeep + 2) = e
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }

  /** Spec-only access to the CRC kernels (for building frame variants
    * the writer deliberately refuses to emit — decorrelated channel
    * assignments, prediction subframes).
    */
  object TestHooks {
    def crc8(b: Array[Byte], from: Int, until: Int): Int =
      Flac.crc8(b, from, until)
    def crc16(b: Array[Byte], from: Int, until: Int): Int =
      Flac.crc16(b, from, until)
  }

  // ------------------------------------------------------------------
  // fixture writer

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def bits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >> k) & 1L).toInt
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        k -= 1
      }
    }
    def alignZero(): Unit = if (nBits != 0) bits(0, 8 - nBits)
    def bytes: Array[Byte] = { require(nBits == 0); out.toByteArray }
  }

  private def utf8Coded(v: Long): Array[Byte] = {
    if (v < 0x80) Array(v.toByte)
    else {
      // standard UTF-8 length selection: payload bits = 5·nCont + 6
      def fits(nc: Int): Boolean = v < (1L << (5 * nc + 6))
      var nCont = 1
      while (!fits(nCont)) nCont += 1
      val b = new Array[Byte](nCont + 1)
      var rem = v
      var i = nCont
      while (i >= 1) {
        b(i) = (0x80 | (rem & 0x3F)).toByte
        rem >>= 6
        i -= 1
      }
      val lead = (0xFF << (7 - nCont)) & 0xFF
      b(0) = (lead | rem.toInt).toByte
      b
    }
  }

  /** One frame, fixed blocking: CONSTANT (`values(ch)` replicated) or
    * VERBATIM (`verbatim(ch)(s)`), real CRC-8 + CRC-16.
    */
  def buildFlacFrame(frameNo: Long, blockSize: Int, sampleRate: Long,
                     srCode: Int, channels: Int, bps: Int,
                     constant: Option[Array[Long]],
                     verbatim: Option[Array[Array[Long]]]): Array[Byte] = {
    val w = new BitWriter
    w.bits(0x3FFE, 14)
    w.bits(0, 1); w.bits(0, 1) // reserved, fixed blocking
    val bsCode = blockSize match {
      case 192 => 1
      case b if b >= 256 && (b & (b - 1)) == 0 && b <= 32768 =>
        8 + java.lang.Integer.numberOfTrailingZeros(b / 256)
      case b if b >= 576 && (b % 576) == 0 &&
        ((b / 576) & (b / 576 - 1)) == 0 && b <= 4608 =>
        2 + java.lang.Integer.numberOfTrailingZeros(b / 576)
      case _ => 7 // 16-bit at end of header
    }
    w.bits(bsCode, 4)
    w.bits(srCode, 4)
    w.bits(channels - 1, 4)
    val ssCode = bps match {
      case 8 => 1; case 12 => 2; case 16 => 4
      case 20 => 5; case 24 => 6; case 32 => 7
    }
    w.bits(ssCode, 3)
    w.bits(0, 1)
    utf8Coded(frameNo).foreach(b => w.bits(b & 0xFF, 8))
    if (bsCode == 7) w.bits(blockSize - 1, 16)
    srCode match {
      case 12 => w.bits(sampleRate / 1000, 8)
      case 13 => w.bits(sampleRate, 16)
      case 14 => w.bits(sampleRate / 10, 16)
      case _ =>
    }
    // CRC-8 needs the bytes so far: materialize, then continue
    val head = w.bytes // header is byte-aligned by construction
    val afterCrc8 = new BitWriter
    afterCrc8.bits(crc8(head, 0, head.length), 8)
    (0 until channels).foreach { ch =>
      constant match {
        case Some(vals) =>
          afterCrc8.bits(0, 1); afterCrc8.bits(0, 6); afterCrc8.bits(0, 1)
          afterCrc8.bits(vals(ch) & ((1L << bps) - 1), bps)
        case None =>
          afterCrc8.bits(0, 1); afterCrc8.bits(1, 6); afterCrc8.bits(0, 1)
          val vs = verbatim.get(ch)
          var s = 0
          while (s < blockSize) {
            afterCrc8.bits(vs(s) & ((1L << bps) - 1), bps)
            s += 1
          }
      }
    }
    afterCrc8.alignZero()
    val body = head ++ afterCrc8.bytes
    val fin = new BitWriter
    fin.bits(crc16(body, 0, body.length), 16)
    body ++ fin.bytes
  }

  /** STREAMINFO + optional PADDING metadata + frames. */
  def buildFlac(sampleRate: Long, channels: Int, bps: Int,
                totalSamples: Long, frames: Seq[Array[Byte]],
                padding: Int = 0): Array[Byte] = {
    val si = new BitWriter
    si.bits(256, 16); si.bits(32768, 16) // min/max block size
    si.bits(0, 24); si.bits(0, 24)       // min/max frame size unknown
    si.bits(sampleRate, 20)
    si.bits(channels - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(totalSamples, 36)
    (0 until 16).foreach(_ => si.bits(0, 8)) // md5 unknown
    val siBytes = si.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val lastIfNoPad = if (padding > 0) 0x00 else 0x80
    out.write(lastIfNoPad | 0x00) // STREAMINFO
    out.write(0); out.write(0); out.write(34)
    out.write(siBytes)
    if (padding > 0) {
      out.write(0x80 | 0x01) // last, PADDING
      out.write((padding >> 16) & 0xFF); out.write((padding >> 8) & 0xFF)
      out.write(padding & 0xFF)
      out.write(new Array[Byte](padding))
    }
    frames.foreach(out.write)
    out.toByteArray
  }
}
