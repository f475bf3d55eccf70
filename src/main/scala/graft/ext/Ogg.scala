package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Ogg container plumbing (RFC 3533) — the Vorbis/Opus wrapper, the
  * third major crawled-audio family next to MP3 ([[Mp3]]) and
  * WAV/MP4 ([[Multimodal]]). Format facts from the public RFC:
  *   - a physical stream is a sequence of pages: capture pattern
  *     `OggS`, version 0, header-type flags (0x01 continuation,
  *     0x02 BOS, 0x04 EOS), 64-bit LE granule position, 32-bit LE
  *     bitstream serial, 32-bit LE page sequence, CRC-32 (poly
  *     0x04C11DB7, unreflected, init 0, computed with the CRC field
  *     zeroed), a segment count, and that many one-byte lacing
  *     values;
  *   - packets are rebuilt from consecutive segments: a 255 segment
  *     means "continues", < 255 ends the packet; a packet may span
  *     pages (the next page sets the continuation flag).
  *
  * The walk VERIFIES every page CRC — a corrupted page is a typed
  * reject, not garbage packets. Packet payloads are not materialized:
  * the walk carries (size, byte-sum) accumulators per logical stream,
  * so a multi-megabyte spanning packet costs no allocation.
  *
  * Scale notes (100 TB): one blob in, packet rows out — narrow
  * per-partition flatMap, linear, no shuffle. All counts/lengths are
  * untrusted and bounds-checked; cross-page state is per-serial
  * (bounded by the stream's multiplexing width, single digits in
  * practice).
  */
object Ogg {

  final case class OggPacket(serial: Long, packetIdx: Int, granule: Long,
                             size: Int, payloadSum: Long,
                             spansPages: Boolean)

  // Ogg CRC-32: forward (MSB-first), poly 0x04C11DB7, init 0, no xor
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private def u(b: Byte): Int = b & 0xFF

  /** CRC over `[from, until)` with the 4 bytes at `crcAt` read as 0. */
  private def pageCrc(b: Array[Byte], from: Int, until: Int,
                      crcAt: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      val x = if (i >= crcAt && i < crcAt + 4) 0 else u(b(i))
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ x) & 0xFF)
      i += 1
    }
    crc
  }

  private def le32(b: Array[Byte], p: Int): Long =
    (u(b(p)) | (u(b(p + 1)) << 8) | (u(b(p + 2)) << 16)).toLong |
      (u(b(p + 3)).toLong << 24)

  private def le64(b: Array[Byte], p: Int): Long =
    le32(b, p) | (le32(b, p + 4) << 32)

  private final class Open(var size: Int, var sum: Long, var pages: Int)

  /** Walk one blob into its packet table. Strict and total: bad
    * capture/version, CRC mismatch, orphan or missing continuation,
    * truncation, and an unterminated packet at stream end are typed
    * rejects.
    */
  def oggPacketTable(bytes: Array[Byte]): Either[String, Seq[OggPacket]] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try oggPacketTableWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def oggPacketTableWalk(bytes: Array[Byte]): Either[String, Seq[OggPacket]] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[OggPacket]
    val open = scala.collection.mutable.Map.empty[Long, Open]
    val pktIdx = scala.collection.mutable.Map.empty[Long, Int]
    var pos = 0
    var sawPage = false
    while (pos < n) {
      if (n - pos < 27) return Left("truncated page header")
      if (!(bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
            bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S'))
        return Left("bad capture pattern")
      if (bytes(pos + 4) != 0) return Left("bad stream version")
      val flags = u(bytes(pos + 5))
      val granule = le64(bytes, pos + 6)
      val serial = le32(bytes, pos + 14)
      val nSegs = u(bytes(pos + 26))
      val segTab = pos + 27
      if (segTab + nSegs > n) return Left("truncated segment table")
      var payload = 0
      var i = 0
      while (i < nSegs) { payload += u(bytes(segTab + i)); i += 1 }
      val body = segTab + nSegs
      if (body + payload > n) return Left("truncated page body")
      val crcStored = le32(bytes, pos + 22)
      val crcActual = pageCrc(bytes, pos, body + payload, pos + 22)
      if ((crcActual & 0xFFFFFFFFL) != crcStored)
        return Left("page crc mismatch")
      // continuation bookkeeping (per logical stream)
      val continued = (flags & 0x01) != 0
      if (continued && !open.contains(serial))
        return Left("orphan continuation")
      if (!continued && open.contains(serial))
        return Left("missing continuation")
      // assemble packets from segments
      var segP = body
      i = 0
      while (i < nSegs) {
        val lace = u(bytes(segTab + i))
        val o = open.getOrElseUpdate(serial, new Open(0, 0L, 0))
        var j = segP
        val until = segP + lace
        var sum = 0L
        while (j < until) { sum += u(bytes(j)); j += 1 }
        o.size += lace; o.sum += sum
        if (lace < 255) { // packet ends here
          val idx = pktIdx.getOrElse(serial, 0)
          pktIdx(serial) = idx + 1
          out += OggPacket(serial, idx, granule, o.size, o.sum,
            o.pages > 0)
          open.remove(serial)
        }
        segP = until
        i += 1
      }
      // a packet still open after this page spans into the next
      open.get(serial).foreach(_.pages += 1)
      sawPage = true
      pos = body + payload
    }
    if (!sawPage) return Left("no pages")
    if (open.nonEmpty) return Left("unterminated packet")
    Right(out.toSeq)
  }

  /** Explode a binary Ogg column into one row per packet. Poison blobs
    * yield zero rows; [[oggErrors]] is the error channel.
    */
  def extractOggPackets(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("serial", LongType, nullable = false),
        StructField("packet_idx", IntegerType, nullable = false),
        StructField("granule", LongType, nullable = false),
        StructField("psize", IntegerType, nullable = false),
        StructField("payload_sum", LongType, nullable = false),
        StructField("spans_pages", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        oggPacketTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(pkts) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            pkts.iterator.map { pk =>
              val arr = new Array[Any](nKeep + 6)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = pk.serial; arr(nKeep + 1) = pk.packetIdx
              arr(nKeep + 2) = pk.granule; arr(nKeep + 3) = pk.size
              arr(nKeep + 4) = pk.payloadSum; arr(nKeep + 5) = pk.spansPages
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: one row per blob, `(n_packets, ok, error)`. */
  def oggErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("n_packets", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false),
        StructField("error", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.map { r =>
        val res = oggPacketTable(r.getAs[Array[Byte]](idx))
        val arr = new Array[Any](nKeep + 3)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        res match {
          case Left(e) =>
            arr(nKeep) = 0; arr(nKeep + 1) = false; arr(nKeep + 2) = e
          case Right(ps) =>
            arr(nKeep) = ps.length; arr(nKeep + 1) = true
            arr(nKeep + 2) = null
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // Synthetic fixtures (REAL Ogg bytes with REAL CRCs — an independent
  // Ogg reader would accept them; fixture-as-spec).
  // ------------------------------------------------------------------

  /** Build one page. `segments` are the raw segment payloads in lace
    * order (caller encodes 255-continuation by segment sizing).
    */
  final case class OggCodec(serial: Long, codec: String,
                            channels: Option[Int], sampleRate: Option[Long],
                            preSkip: Option[Int])

  /** Identify the codec of every logical stream from its BOS page's
    * first packet — the RFC 7845 `OpusHead` and Vorbis-I
    * `\x01vorbis` identification headers (both MUST fit their BOS
    * page; one that doesn't is a typed reject). Pages are validated
    * with the same CRC/shape discipline as [[oggPacketTable]]; only
    * the id-header payload (tens of bytes) is ever materialized.
    * Streams whose first packet matches neither codec surface as
    * `unknown` with null fields — the quarantine signal, not a drop.
    */
  def oggStreamCodecs(bytes: Array[Byte]): Either[String, Seq[OggCodec]] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try oggStreamCodecsWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def oggStreamCodecsWalk(bytes: Array[Byte]): Either[String, Seq[OggCodec]] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[OggCodec]
    val seen = scala.collection.mutable.Set.empty[Long]
    var pos = 0
    var sawPage = false
    while (pos < n) {
      if (n - pos < 27) return Left("truncated page header")
      if (!(bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
            bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S'))
        return Left("bad capture pattern")
      if (bytes(pos + 4) != 0) return Left("bad stream version")
      val flags = u(bytes(pos + 5))
      val serial = le32(bytes, pos + 14)
      val nSegs = u(bytes(pos + 26))
      val body = pos + 27 + nSegs
      if (body > n) return Left("truncated segment table")
      var payloadLen = 0
      var i = 0
      while (i < nSegs) { payloadLen += u(bytes(pos + 27 + i)); i += 1 }
      if (body + payloadLen > n) return Left("truncated page payload")
      val crc = pageCrc(bytes, pos, body + payloadLen, pos + 22)
      if (crc != le32(bytes, pos + 22).toInt) return Left("crc mismatch")
      if ((flags & 0x02) != 0) {
        if (!seen.add(serial)) return Left("duplicate bos")
        // first packet = first lace run; must terminate on this page
        var len = 0
        var k = 0
        var done = false
        while (k < nSegs && !done) {
          val l = u(bytes(pos + 27 + k))
          len += l
          if (l < 255) done = true
          k += 1
        }
        if (!done) return Left("id header spans pages")
        out += parseIdHeader(serial, bytes, body, len)
      }
      sawPage = true
      pos = body + payloadLen
    }
    if (!sawPage) return Left("no pages")
    Right(out.toSeq)
  }

  private def parseIdHeader(serial: Long, b: Array[Byte], off: Int,
                            len: Int): OggCodec = {
    def has(magic: String, at: Int): Boolean = {
      if (len < at + magic.length) return false
      var i = 0
      while (i < magic.length) {
        if (b(off + at + i) != magic.charAt(i).toByte) return false
        i += 1
      }
      true
    }
    if (len >= 19 && has("OpusHead", 0))
      OggCodec(serial, "opus", Some(u(b(off + 9))),
        Some((u(b(off + 12)) | (u(b(off + 13)) << 8) |
          (u(b(off + 14)) << 16)).toLong | (u(b(off + 15)).toLong << 24)),
        Some(u(b(off + 10)) | (u(b(off + 11)) << 8)))
    else if (len >= 30 && b(off) == 1 && has("vorbis", 1))
      OggCodec(serial, "vorbis", Some(u(b(off + 11))),
        Some(le32(b, off + 12)), None)
    else OggCodec(serial, "unknown", None, None, None)
  }

  /** Explode a binary Ogg column into one row per logical stream:
    * `(…keep…, serial, codec, channels, sample_rate, pre_skip)`.
    * Poison blobs yield zero rows.
    */
  def identifyOggCodecs(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("serial", LongType, nullable = false),
        StructField("codec", StringType, nullable = false),
        StructField("channels", IntegerType, nullable = true),
        StructField("sample_rate", LongType, nullable = true),
        StructField("pre_skip", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        oggStreamCodecs(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(cs) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            cs.iterator.map { c =>
              val arr = new Array[Any](nKeep + 5)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = c.serial; arr(nKeep + 1) = c.codec
              arr(nKeep + 2) = c.channels.orNull
              arr(nKeep + 3) = c.sampleRate.orNull
              arr(nKeep + 4) = c.preSkip.orNull
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** RFC 7845 §5.1 OpusHead identification packet. */
  def opusHeadPacket(channels: Int, preSkip: Int, rate: Long): Array[Byte] = {
    val b = new Array[Byte](19)
    "OpusHead".getBytes("US-ASCII").copyToArray(b)
    b(8) = 1
    b(9) = channels.toByte
    b(10) = (preSkip & 0xFF).toByte; b(11) = ((preSkip >> 8) & 0xFF).toByte
    var i = 0
    while (i < 4) { b(12 + i) = ((rate >> (8 * i)) & 0xFF).toByte; i += 1 }
    // output gain 0, mapping family 0
    b
  }

  /** Vorbis I §4.2.2 identification header packet. */
  def vorbisIdPacket(channels: Int, rate: Long): Array[Byte] = {
    val b = new Array[Byte](30)
    b(0) = 1
    "vorbis".getBytes("US-ASCII").copyToArray(b, 1)
    // version (4 bytes LE) = 0
    b(11) = channels.toByte
    var i = 0
    while (i < 4) { b(12 + i) = ((rate >> (8 * i)) & 0xFF).toByte; i += 1 }
    // bitrates 0; blocksizes 2^8/2^8; framing bit
    b(28) = 0x88.toByte
    b(29) = 1
    b
  }

  def buildOggPage(flags: Int, granule: Long, serial: Long, seq: Long,
                   laces: Seq[Int], payload: Array[Byte]): Array[Byte] = {
    require(laces.length <= 255, "max 255 segments per page")
    require(laces.sum == payload.length, "laces must cover the payload")
    val out = new Array[Byte](27 + laces.length + payload.length)
    out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
    out(4) = 0
    out(5) = flags.toByte
    var i = 0
    while (i < 8) { out(6 + i) = ((granule >> (8 * i)) & 0xFF).toByte; i += 1 }
    i = 0
    while (i < 4) { out(14 + i) = ((serial >> (8 * i)) & 0xFF).toByte; i += 1 }
    i = 0
    while (i < 4) { out(18 + i) = ((seq >> (8 * i)) & 0xFF).toByte; i += 1 }
    // CRC at 22..25 left zero for the computation
    out(26) = laces.length.toByte
    i = 0
    while (i < laces.length) { out(27 + i) = laces(i).toByte; i += 1 }
    System.arraycopy(payload, 0, out, 27 + laces.length, payload.length)
    val crc = pageCrc(out, 0, out.length, 22)
    i = 0 // CRC is stored little-endian
    while (i < 4) { out(22 + i) = ((crc >> (8 * i)) & 0xFF).toByte; i += 1 }
    out
  }

  /** Lacing values for one packet of `size` bytes: 255-runs plus a
    * terminator (< 255); a size that is a multiple of 255 ends with an
    * explicit 0 lace per the RFC.
    */
  def lacesFor(size: Int): Seq[Int] =
    Seq.fill(size / 255)(255) :+ (size % 255)

  /** The q166 gate fixture: one logical stream (serial = id),
    * `4 + id % 4` packets of size `30 + (id·7 + j·13) % 500` (sizes
    * above 255 exercise multi-segment lacing), constant fill
    * `(id + j·37) % 251`. Each page carries ONE packet — except
    * packets over 300 bytes, whose first 255 bytes sit on one page
    * (open 255 lace) and the remainder on the NEXT page with the
    * continuation flag (the cross-page reassembly path). BOS on the
    * first page, EOS on the last; page p carries granule
    * `(p+1)·1000 + id % 7`.
    */
  def syntheticOgg(id: Long): Array[Byte] = {
    val npk = 4 + (id % 4).toInt
    val serial = id & 0xFFFFFFFFL
    val pages = scala.collection.mutable.ArrayBuffer
      .empty[(Seq[Int], Array[Byte], Boolean)] // laces, payload, continued
    (0 until npk).foreach { j =>
      val size = 30 + ((id * 7 + j * 13) % 500).toInt
      val fill = ((id + j * 37) % 251).toInt
      val payload = new Array[Byte](size)
      java.util.Arrays.fill(payload, fill.toByte)
      if (size > 300) {
        pages += ((Seq(255), payload.take(255), false))
        pages += ((lacesFor(size - 255), payload.drop(255), true))
      } else {
        pages += ((lacesFor(size), payload, false))
      }
    }
    val parts = pages.zipWithIndex.map { case ((laces, payload, cont), p) =>
      val flags = (if (cont) 0x01 else 0) |
        (if (p == 0) 0x02 else 0) |
        (if (p == pages.length - 1) 0x04 else 0)
      buildOggPage(flags, (p + 1) * 1000L + id % 7, serial, p.toLong,
        laces, payload)
    }
    val total = parts.map(_.length).sum
    val out = new Array[Byte](total)
    var q = 0
    parts.foreach { b => System.arraycopy(b, 0, out, q, b.length); q += b.length }
    out
  }
}
