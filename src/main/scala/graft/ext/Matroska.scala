package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Matroska / WebM (EBML) container plumbing — with fragmented MP4
  * (see [[Multimodal]]), the other dominant crawled-video container.
  * The format facts are from the public Matroska/EBML specs (RFC 8794
  * for EBML; the Matroska element registry):
  *   - an EBML document is a tree of elements: ID (1–4 byte VINT with
  *     the length marker KEPT) + size (1–8 byte VINT with the marker
  *     STRIPPED) + payload; an all-ones size VINT means "unknown size"
  *     (legal for Segment and Cluster in streamed files — a large
  *     share of crawled WebM — and rejected elsewhere);
  *   - `Segment` holds `Info` (TimestampScale, default 1,000,000 ns),
  *     `Tracks` (TrackEntry: TrackNumber, TrackType 1=video/2=audio,
  *     CodecID) and `Cluster`s (Timestamp, then SimpleBlocks);
  *   - a SimpleBlock's payload is: track number VINT, 2-byte signed
  *     big-endian timestamp relative to the cluster timestamp, one
  *     flags byte (0x80 keyframe, bits 1-2 lacing), then frames.
  *     All three lacing schemes are parsed (Xiph 255-run sizes, EBML
  *     first-VINT + signed-delta sizes, fixed equal split) — laced
  *     audio is the WebM norm; laced frames share the block's
  *     timestamp and key flag, and every lace-header size is treated
  *     as untrusted (checked against the block extent before use).
  *
  * Scale notes (100 TB): one blob in, sample rows out — a narrow
  * per-partition flatMap, no shuffle; cost linear in blob size, one
  * cursor, no allocation beyond the rows. Every VINT/size is
  * UNTRUSTED: lengths are bounds-checked before any read, a size that
  * overruns its parent rejects the blob with a typed reason, and
  * unknown-size recursion is bounded by the outer walk — a poison
  * blob costs one error row, never a scan overrun or a task death.
  */
object Matroska {

  // element IDs (raw byte encoding, marker kept — the registry values)
  private[ext] val IdEbml = 0x1A45DFA3L
  private[ext] val IdSegment = 0x18538067L
  private[ext] val IdInfo = 0x1549A966L
  private[ext] val IdTimestampScale = 0x2AD7B1L
  private[ext] val IdTracks = 0x1654AE6BL
  private[ext] val IdTrackEntry = 0xAEL
  private[ext] val IdTrackNumber = 0xD7L
  private[ext] val IdTrackType = 0x83L
  private[ext] val IdCodecId = 0x86L
  private[ext] val IdCluster = 0x1F43B675L
  private[ext] val IdTimestamp = 0xE7L
  private[ext] val IdSimpleBlock = 0xA3L
  private[ext] val IdBlockGroup = 0xA0L
  private[ext] val IdBlock = 0xA1L
  private[ext] val IdReferenceBlock = 0xFBL

  final case class WebmSample(trackId: Long, trackType: Int, codecId: String,
                              sampleIdx: Int, tsTicks: Long, tsScale: Long,
                              isKey: Boolean, size: Int, payloadSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  /** Read a VINT at `pos`: returns (value, width, allOnes) where
    * `value` has the marker stripped and `allOnes` flags the
    * unknown-size encoding. Left on truncation or a zero first byte
    * (no marker in 8 bits = width > 8, which Matroska never uses).
    */
  private def readVint(b: Array[Byte], pos: Int,
                       limit: Int): Either[String, (Long, Int, Boolean)] = {
    if (pos >= limit) return Left("truncated vint")
    val first = u(b(pos))
    if (first == 0) return Left("bad vint width")
    val width = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    if (pos + width > limit) return Left("truncated vint")
    var v = (first & (0xFF >>> width)).toLong
    var ones = first == ((0xFF >>> width) | (0x100 >>> width))
    var i = 1
    while (i < width) {
      val x = u(b(pos + i))
      if (x != 0xFF) ones = false
      v = (v << 8) | x
      i += 1
    }
    Right((v, width, ones && v == (1L << (7 * width)) - 1))
  }

  /** Read an element ID (marker kept, as the registry lists them). */
  private def readId(b: Array[Byte], pos: Int,
                     limit: Int): Either[String, (Long, Int)] = {
    if (pos >= limit) return Left("truncated element id")
    val first = u(b(pos))
    if (first == 0) return Left("bad element id")
    val width = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    if (width > 4) return Left("bad element id")
    if (pos + width > limit) return Left("truncated element id")
    var v = first.toLong
    var i = 1
    while (i < width) { v = (v << 8) | u(b(pos + i)); i += 1 }
    Right((v, width))
  }

  /** Big-endian unsigned integer payload (size 1..8). */
  private def beUint(b: Array[Byte], pos: Int, len: Int): Long = {
    var v = 0L; var i = 0
    while (i < len) { v = (v << 8) | u(b(pos + i)); i += 1 }
    v
  }

  private final case class Track(number: Long, ttype: Int, codec: String)

  /** Walk one blob into its sample table. Strict and total. */
  def webmSampleTable(bytes: Array[Byte])
      : Either[String, (Long, Seq[WebmSample])] =
    webmSampleTableCore(bytes).map { case (sc, ss) => (sc, ss.map(_._1)) }

  /** Samples plus their frame-byte extents `(sample, from, until)`. */
  private def webmSampleTableBytes(bytes: Array[Byte])
      : Either[String, Seq[(WebmSample, Int, Int)]] =
    webmSampleTableCore(bytes).map(_._2)

  private def webmSampleTableCore(bytes: Array[Byte])
      : Either[String, (Long, Seq[(WebmSample, Int, Int)])] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val n = bytes.length
    // EBML header first (payload skipped — version pinning is not the
    // pipeline's business; a non-EBML magic is the fast poison filter)
    var pos = 0
    val (hid, hw) = readId(bytes, pos, n) match {
      case Left(e) => return Left(e); case Right(x) => x }
    if (hid != IdEbml) return Left("not an EBML stream")
    pos += hw
    val (hsz, hszw, hones) = readVint(bytes, pos, n) match {
      case Left(e) => return Left(e); case Right(x) => x }
    if (hones) return Left("unknown-size EBML header")
    pos += hszw
    if (hsz > n - pos) return Left("truncated EBML header")
    pos += hsz.toInt
    // Segment
    val (sid, sw) = readId(bytes, pos, n) match {
      case Left(e) => return Left(e); case Right(x) => x }
    if (sid != IdSegment) return Left("no segment")
    pos += sw
    val (ssz, sszw, sones) = readVint(bytes, pos, n) match {
      case Left(e) => return Left(e); case Right(x) => x }
    pos += sszw
    val segEnd =
      if (sones) n
      else {
        if (ssz > n - pos) return Left("truncated segment")
        pos + ssz.toInt
      }

    var tsScale = 1000000L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Track]
    val out = scala.collection.mutable.ArrayBuffer.empty[(WebmSample, Int, Int)]
    val perTrackIdx = scala.collection.mutable.Map.empty[Long, Int]

    def parseTrackEntry(from: Int, end: Int): Either[String, Track] = {
      var p = from
      var num = -1L; var ttype = -1; var codec: String = null
      while (p < end) {
        val (id, iw) = readId(bytes, p, end) match {
          case Left(e) => return Left(e); case Right(x) => x }
        p += iw
        val (sz, szw, ones) = readVint(bytes, p, end) match {
          case Left(e) => return Left(e); case Right(x) => x }
        if (ones) return Left("unknown-size track field")
        p += szw
        if (sz > end - p) return Left("truncated track field")
        val len = sz.toInt
        if (id == IdTrackNumber) num = beUint(bytes, p, len)
        else if (id == IdTrackType) ttype = beUint(bytes, p, len).toInt
        else if (id == IdCodecId)
          codec = new String(bytes, p, len,
            java.nio.charset.StandardCharsets.ISO_8859_1)
        p += len
      }
      if (num <= 0) Left("track without number") else Right(Track(num, ttype, codec))
    }

    // keyOverride: Block (inside a BlockGroup) has no keyframe flag —
    // keyness is the ABSENCE of a sibling ReferenceBlock, decided by
    // the caller; SimpleBlock carries it in flags bit 7.
    def parseSimpleBlock(from: Int, end: Int, cluTs: Long,
                         keyOverride: Option[Boolean] = None)
        : Either[String, Unit] = {
      val (tn, tw, _) = readVint(bytes, from, end) match {
        case Left(e) => return Left(e); case Right(x) => x }
      if (from + tw + 3 > end) return Left("truncated block header")
      val rel = ((u(bytes(from + tw)) << 8) | u(bytes(from + tw + 1))).toShort.toLong
      val flags = u(bytes(from + tw + 2))
      val trkOpt = tracks.find(_.number == tn)
      if (trkOpt.isEmpty) return Left("block for unknown track")
      val trk = trkOpt.get
      val isKey = keyOverride.getOrElse((flags & 0x80) != 0)
      def emit(frFrom: Int, frUntil: Int): Unit = {
        var sum = 0L
        var i = frFrom
        while (i < frUntil) { sum += u(bytes(i)); i += 1 }
        val idx = perTrackIdx.getOrElse(tn, 0)
        perTrackIdx(tn) = idx + 1
        out += ((WebmSample(tn, trk.ttype, trk.codec, idx, cluTs + rel,
          tsScale, isKey, frUntil - frFrom, sum), frFrom, frUntil))
      }
      // lacing (flags bits 1-2): 0 none, 1 Xiph, 2 fixed-size, 3 EBML.
      // Laced frames share the block's timestamp and key flag; sizes
      // come from the lace header (all UNTRUSTED — every arithmetic
      // checked before any extent is trusted).
      val lacing = (flags & 0x06) >> 1
      val dataFrom = from + tw + 3
      if (lacing == 0) { emit(dataFrom, end); return Right(()) }
      if (dataFrom >= end) return Left("truncated lace header")
      val nFrames = u(bytes(dataFrom)) + 1
      var p = dataFrom + 1
      val sizes = new Array[Int](nFrames)
      if (lacing == 1) { // Xiph: 255-run coding for frames 0..n-2
        var i = 0
        while (i < nFrames - 1) {
          var sz = 0
          var b = 0xFF
          while (b == 0xFF) {
            if (p >= end) return Left("truncated lace sizes")
            b = u(bytes(p)); p += 1
            sz += b
            if (sz > end - dataFrom) return Left("bad lace sizes")
          }
          sizes(i) = sz; i += 1
        }
      } else if (lacing == 3) { // EBML: first VINT, then signed deltas
        if (nFrames >= 2) {
          val (v0, w0, _) = readVint(bytes, p, end) match {
            case Left(e) => return Left(e); case Right(x) => x }
          if (v0 > end - dataFrom) return Left("bad lace sizes")
          sizes(0) = v0.toInt
          p += w0
          var i = 1
          while (i < nFrames - 1) {
            val (dv, dw, _) = readVint(bytes, p, end) match {
              case Left(e) => return Left(e); case Right(x) => x }
            val delta = dv - ((1L << (7 * dw - 1)) - 1)
            val sz = sizes(i - 1).toLong + delta
            if (sz < 0 || sz > end - dataFrom) return Left("bad lace sizes")
            sizes(i) = sz.toInt
            p += dw; i += 1
          }
        }
      } // lacing == 2 (fixed): no size data
      val remaining = end - p
      if (remaining < 0) return Left("bad lace sizes")
      if (lacing == 2) {
        if (remaining % nFrames != 0) return Left("bad fixed lacing")
        java.util.Arrays.fill(sizes, remaining / nFrames)
      } else {
        var known = 0L
        var i = 0
        while (i < nFrames - 1) { known += sizes(i); i += 1 }
        val last = remaining - known
        if (last < 0) return Left("bad lace sizes")
        sizes(nFrames - 1) = last.toInt
      }
      var i = 0
      while (i < nFrames) {
        emit(p, p + sizes(i))
        p += sizes(i)
        i += 1
      }
      Right(())
    }

    // segment-level walk
    while (pos < segEnd) {
      val (id, iw) = readId(bytes, pos, segEnd) match {
        case Left(e) => return Left(e); case Right(x) => x }
      pos += iw
      val (sz, szw, ones) = readVint(bytes, pos, segEnd) match {
        case Left(e) => return Left(e); case Right(x) => x }
      pos += szw
      if (ones && id != IdCluster) return Left("unknown-size element")
      val known = !ones
      if (known && sz > segEnd - pos) return Left("truncated element")

      if (id == IdInfo) {
        val end = pos + sz.toInt
        var p = pos
        while (p < end) {
          val (fid, fw) = readId(bytes, p, end) match {
            case Left(e) => return Left(e); case Right(x) => x }
          p += fw
          val (fsz, fszw, fones) = readVint(bytes, p, end) match {
            case Left(e) => return Left(e); case Right(x) => x }
          if (fones) return Left("unknown-size info field")
          p += fszw
          if (fsz > end - p) return Left("truncated info field")
          if (fid == IdTimestampScale) tsScale = beUint(bytes, p, fsz.toInt)
          p += fsz.toInt
        }
        pos = end
      } else if (id == IdTracks) {
        val end = pos + sz.toInt
        var p = pos
        while (p < end) {
          val (fid, fw) = readId(bytes, p, end) match {
            case Left(e) => return Left(e); case Right(x) => x }
          p += fw
          val (fsz, fszw, fones) = readVint(bytes, p, end) match {
            case Left(e) => return Left(e); case Right(x) => x }
          if (fones) return Left("unknown-size track entry")
          p += fszw
          if (fsz > end - p) return Left("truncated track entry")
          if (fid == IdTrackEntry)
            parseTrackEntry(p, p + fsz.toInt) match {
              case Left(e) => return Left(e)
              case Right(t) => tracks += t
            }
          p += fsz.toInt
        }
        pos = end
      } else if (id == IdCluster) {
        // unknown-size cluster: children end at the next segment-level
        // ID (Cluster/Info/Tracks) or segment end — the demuxer rule
        var cluTs = 0L
        var p = pos
        var done = false
        val cluLim = if (known) pos + sz.toInt else segEnd
        while (!done && p < cluLim) {
          val (fid, fw) = readId(bytes, p, segEnd) match {
            case Left(e) => return Left(e); case Right(x) => x }
          if (!known && (fid == IdCluster || fid == IdInfo || fid == IdTracks)) {
            done = true
          } else {
            p += fw
            val (fsz, fszw, fones) = readVint(bytes, p, cluLim) match {
              case Left(e) => return Left(e); case Right(x) => x }
            if (fones) return Left("unknown-size cluster field")
            p += fszw
            if (fsz > cluLim - p) return Left("truncated cluster field")
            if (fid == IdTimestamp) cluTs = beUint(bytes, p, fsz.toInt)
            else if (fid == IdSimpleBlock)
              parseSimpleBlock(p, p + fsz.toInt, cluTs) match {
                case Left(e) => return Left(e)
                case Right(_) => ()
              }
            else if (fid == IdBlockGroup) {
              // two passes: ReferenceBlock may follow the Block, and
              // its PRESENCE (not value) decides keyness
              val gEnd = p + fsz.toInt
              var gp = p
              var blockFrom = -1; var blockUntil = -1
              var hasRef = false
              while (gp < gEnd) {
                val (gid, gw) = readId(bytes, gp, gEnd) match {
                  case Left(e) => return Left(e); case Right(x) => x }
                gp += gw
                val (gsz, gszw, gones) = readVint(bytes, gp, gEnd) match {
                  case Left(e) => return Left(e); case Right(x) => x }
                if (gones) return Left("unknown-size group field")
                gp += gszw
                if (gsz > gEnd - gp) return Left("truncated group field")
                if (gid == IdBlock) {
                  blockFrom = gp; blockUntil = gp + gsz.toInt
                } else if (gid == IdReferenceBlock) hasRef = true
                gp += gsz.toInt
              }
              if (blockFrom < 0) return Left("block group without block")
              parseSimpleBlock(blockFrom, blockUntil, cluTs,
                keyOverride = Some(!hasRef)) match {
                case Left(e) => return Left(e)
                case Right(_) => ()
              }
            }
            p += fsz.toInt
          }
        }
        pos = if (known) pos + sz.toInt else p
      } else {
        // unknown segment-level element: skip (void, cues, chapters…)
        pos += sz.toInt
      }
    }
    if (tracks.isEmpty) Left("no tracks") else Right((tsScale, out.toSeq))
  }

  /** Explode a binary WebM column into one row per SimpleBlock sample.
    * Poison blobs yield zero rows (container-explode convention);
    * [[webmErrors]] is the error channel. Narrow per-partition flatMap.
    */
  def extractWebmSamples(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("track_id", LongType, nullable = false),
        StructField("track_type", IntegerType, nullable = false),
        StructField("codec_id", StringType, nullable = true),
        StructField("sample_idx", IntegerType, nullable = false),
        StructField("ts_ticks", LongType, nullable = false),
        StructField("ts_scale", LongType, nullable = false),
        StructField("is_key", BooleanType, nullable = false),
        StructField("sample_size", IntegerType, nullable = false),
        StructField("payload_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        webmSampleTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right((_, samples)) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            samples.iterator.map { sm =>
              val arr = new Array[Any](nKeep + 9)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = sm.trackId; arr(nKeep + 1) = sm.trackType
              arr(nKeep + 2) = sm.codecId; arr(nKeep + 3) = sm.sampleIdx
              arr(nKeep + 4) = sm.tsTicks; arr(nKeep + 5) = sm.tsScale
              arr(nKeep + 6) = sm.isKey; arr(nKeep + 7) = sm.size
              arr(nKeep + 8) = sm.payloadSum
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Like [[extractWebmSamples]] but emitting the raw frame BYTES
    * (`frame` binary column) instead of the payload digest — the input
    * to per-frame decode/hash operators ([[Multimodal.imageHash]],
    * [[Multimodal.decodeAudio]]), mirroring
    * [[Multimodal.extractMp4SampleBytes]] so the two container walks
    * feed the same downstream dedup machinery.
    */
  def extractWebmSampleBytes(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("track_id", LongType, nullable = false),
        StructField("track_type", IntegerType, nullable = false),
        StructField("sample_idx", IntegerType, nullable = false),
        StructField("ts_ticks", LongType, nullable = false),
        StructField("is_key", BooleanType, nullable = false),
        StructField("frame", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = r.getAs[Array[Byte]](idx)
        webmSampleTableBytes(blob) match {
          case Left(_) => Iterator.empty
          case Right(samples) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            samples.iterator.map { case (sm, from, until) =>
              val arr = new Array[Any](nKeep + 6)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = sm.trackId; arr(nKeep + 1) = sm.trackType
              arr(nKeep + 2) = sm.sampleIdx; arr(nKeep + 3) = sm.tsTicks
              arr(nKeep + 4) = sm.isKey
              arr(nKeep + 5) = java.util.Arrays.copyOfRange(blob, from, until)
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: one row per blob, `(n_samples, ok, error)`. */
  def webmErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("n_samples", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false),
        StructField("error", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.map { r =>
        val res = webmSampleTable(r.getAs[Array[Byte]](idx))
        val arr = new Array[Any](nKeep + 3)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        res match {
          case Left(e) =>
            arr(nKeep) = 0; arr(nKeep + 1) = false; arr(nKeep + 2) = e
          case Right((_, ss)) =>
            arr(nKeep) = ss.length; arr(nKeep + 1) = true
            arr(nKeep + 2) = null
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // Synthetic fixtures (REAL EBML bytes — an independent demuxer
  // would parse them; fixture-as-spec, as Multimodal.syntheticMp4).
  // ------------------------------------------------------------------

  private[ext] def vintSize(v: Long): Array[Byte] = {
    // smallest width whose value space holds v (marker bit excluded)
    var width = 1
    while (width <= 8 && v >= (1L << (7 * width)) - 1) width += 1
    require(width <= 8, "vint overflow")
    val out = new Array[Byte](width)
    var x = v | (1L << (7 * width))
    var i = width - 1
    while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
    out
  }

  private[ext] def idBytes(id: Long): Array[Byte] = {
    var width = 1
    var x = id
    while (x > 0xFF) { width += 1; x >>= 8 }
    val out = new Array[Byte](width)
    x = id
    var i = width - 1
    while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
    out
  }

  private[ext] def elem(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ vintSize(payload.length.toLong) ++ payload

  /** Unknown-size element: all-ones size VINT of the given width. */
  private[ext] def elemUnknown(id: Long, payload: Array[Byte],
                          szWidth: Int = 1): Array[Byte] = {
    val sz = new Array[Byte](szWidth)
    java.util.Arrays.fill(sz, 0xFF.toByte)
    sz(0) = ((0xFF >> (szWidth - 1)) | (0x100 >> szWidth)).toByte
    idBytes(id) ++ sz ++ payload
  }

  private[ext] def uintPayload(v: Long): Array[Byte] = {
    var width = 1
    var x = v
    while (x > 0xFF) { width += 1; x >>= 8 }
    val out = new Array[Byte](width)
    x = v
    var i = width - 1
    while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
    out
  }

  def buildSimpleBlock(track: Long, rel: Int, key: Boolean,
                       payload: Array[Byte]): Array[Byte] = {
    val head = vintSize(track) ++ Array(
      ((rel >> 8) & 0xFF).toByte, (rel & 0xFF).toByte,
      (if (key) 0x80 else 0x00).toByte)
    elem(IdSimpleBlock, head ++ payload)
  }

  /** Signed VINT (EBML lace deltas): value stored as
    * `delta + 2^(7·width−1) − 1` in the smallest width that holds it.
    */
  private[ext] def vintSigned(delta: Long): Array[Byte] = {
    var width = 1
    while (width <= 8 && (delta < -((1L << (7 * width - 1)) - 1) ||
        delta > (1L << (7 * width - 1)) - 1)) width += 1
    require(width <= 8, "signed vint overflow")
    vintSizeWidth(delta + (1L << (7 * width - 1)) - 1, width)
  }

  private[ext] def vintSizeWidth(v: Long, width: Int): Array[Byte] = {
    val out = new Array[Byte](width)
    var x = v | (1L << (7 * width))
    var i = width - 1
    while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
    out
  }

  /** A laced SimpleBlock: `mode` 1 = Xiph, 2 = fixed-size, 3 = EBML.
    * Fixed-size requires equal frame lengths (the format's own
    * constraint).
    */
  def buildSimpleBlockLaced(track: Long, rel: Int, key: Boolean,
                            frames: Seq[Array[Byte]],
                            mode: Int): Array[Byte] = {
    require(frames.nonEmpty && frames.length <= 256, "1..256 laced frames")
    require(mode >= 1 && mode <= 3, "lace mode 1..3")
    require(mode != 2 || frames.map(_.length).distinct.length == 1,
      "fixed lacing needs equal frame sizes")
    val head = vintSize(track) ++ Array(
      ((rel >> 8) & 0xFF).toByte, (rel & 0xFF).toByte,
      ((if (key) 0x80 else 0x00) | (mode << 1)).toByte,
      (frames.length - 1).toByte)
    val laceSizes: Array[Byte] = mode match {
      case 1 => // Xiph 255-run for all but the last frame
        frames.dropRight(1).flatMap { f =>
          val full = f.length / 255
          Array.fill(full)(0xFF.toByte) :+ (f.length % 255).toByte
        }.toArray
      case 2 => Array.empty[Byte]
      case 3 =>
        if (frames.length < 2) Array.empty[Byte]
        else vintSize(frames.head.length.toLong) ++
          frames.sliding(2).toSeq.dropRight(1).flatMap { pair =>
            vintSigned(pair(1).length.toLong - pair(0).length.toLong)
          }
    }
    elem(IdSimpleBlock, head ++ laceSizes ++ frames.flatten.toArray)
  }

  /** A BlockGroup carrying one Block (no keyframe flag — keyness is
    * decided by `referenced`: a ReferenceBlock sibling AFTER the Block
    * marks it a dependent, non-key frame, the real-muxer layout).
    */
  def buildBlockGroup(track: Long, rel: Int, referenced: Boolean,
                      payload: Array[Byte]): Array[Byte] = {
    val blockPayload = vintSize(track) ++ Array(
      ((rel >> 8) & 0xFF).toByte, (rel & 0xFF).toByte, 0x00.toByte) ++
      payload
    elem(IdBlockGroup, elem(IdBlock, blockPayload) ++
      (if (referenced) elem(IdReferenceBlock, Array(0xFF.toByte))
       else Array.empty[Byte]))
  }

  /** The q165 gate fixture: the SAME logical samples carried as
    * SimpleBlocks (key flag in the header) or as BlockGroups (keyness
    * = no ReferenceBlock) — real muxers use the latter for dependent
    * video frames.
    */
  def syntheticWebmGrouped(id: Long, useGroups: Boolean): Array[Byte] = {
    val nclu = 2 + (id % 3).toInt
    val ebml = elem(IdEbml, Array[Byte]())
    val info = elem(IdInfo, elem(IdTimestampScale, uintPayload(1000000L)))
    val tracksEl = elem(IdTracks, elem(IdTrackEntry,
      elem(IdTrackNumber, uintPayload(1L)) ++
      elem(IdTrackType, uintPayload(1L)) ++
      elem(IdCodecId, "V_TEST1".getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1))))
    val clusters = (0 until nclu).map { c =>
      val blocks = (0 until 3).map { f =>
        val sz = 8 + ((id + c * 5 + f * 7) % 9).toInt
        val payload = new Array[Byte](sz)
        java.util.Arrays.fill(payload,
          ((id + c * 17 + f * 31) % 251).toByte)
        val key = (c + f) % 2 == 0
        val rel = 10 * f + c
        if (useGroups) buildBlockGroup(1L, rel, referenced = !key, payload)
        else buildSimpleBlock(1L, rel, key, payload)
      }.reduce(_ ++ _)
      elem(IdCluster,
        elem(IdTimestamp, uintPayload(c * 1000L + (id % 7) * 10)) ++ blocks)
    }
    val segBody = info ++ tracksEl ++ clusters.reduce(_ ++ _)
    ebml ++ elem(IdSegment, segBody)
  }

  /** The q164 gate fixture: one audio track, `2 + id % 3` clusters of
    * THREE equal-size frames each (equal so fixed lacing is legal in
    * every mode), carried per `mode`: 0 = three separate SimpleBlocks
    * sharing one relative timestamp, 1/2/3 = one laced block. The
    * logical samples are IDENTICAL across modes.
    */
  def syntheticWebmLaced(id: Long, mode: Int): Array[Byte] = {
    val nclu = 2 + (id % 3).toInt
    val ebml = elem(IdEbml, Array[Byte]())
    val info = elem(IdInfo, elem(IdTimestampScale, uintPayload(1000000L)))
    val tracksEl = elem(IdTracks, elem(IdTrackEntry,
      elem(IdTrackNumber, uintPayload(1L)) ++
      elem(IdTrackType, uintPayload(2L)) ++
      elem(IdCodecId, "A_TEST1".getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1))))
    val clusters = (0 until nclu).map { c =>
      val sz = 8 + ((id + c) % 9).toInt
      val key = c % 2 == 0
      val frames = (0 until 3).map { f =>
        val payload = new Array[Byte](sz)
        java.util.Arrays.fill(payload,
          ((id + c * 17 + f * 31) % 251).toByte)
        payload
      }
      val blocks =
        if (mode == 0) frames.map(buildSimpleBlock(1L, 5, key, _))
          .reduce(_ ++ _)
        else buildSimpleBlockLaced(1L, 5, key, frames, mode)
      elem(IdCluster,
        elem(IdTimestamp, uintPayload(c * 1000L + (id % 7) * 10)) ++ blocks)
    }
    val segBody = info ++ tracksEl ++ clusters.reduce(_ ++ _)
    ebml ++ elem(IdSegment, segBody)
  }

  /** The q157 gate fixture. `1 + (id/3) % 3` tracks (odd = video,
    * even = audio), `2 + id % 3` clusters, one block per (cluster,
    * track); id parity picks known-size vs UNKNOWN-size Segment and
    * Clusters (the streamed-WebM shape — a parser that requires sizes
    * returns nothing for half the corpus); `id % 5 == 0` doubles the
    * TimestampScale. All sample arithmetic is container-mode-
    * independent (the q146 discipline).
    */
  def syntheticWebm(id: Long, forceUnknown: Int = -1): Array[Byte] = {
    val nt = 1 + ((id / 3) % 3).toInt
    val nclu = 2 + (id % 3).toInt
    val unknownSize =
      if (forceUnknown >= 0) forceUnknown == 1 else id % 2 == 1
    val scale = 1000000L * (1 + (id % 5) / 4) // 2x on id%5==4
    val ebml = elem(IdEbml, Array[Byte]())
    val info = elem(IdInfo, elem(IdTimestampScale, uintPayload(scale)))
    val trackEntries = (1 to nt).map { d =>
      elem(IdTrackEntry,
        elem(IdTrackNumber, uintPayload(d.toLong)) ++
        elem(IdTrackType, uintPayload(if (d % 2 == 1) 1L else 2L)) ++
        elem(IdCodecId, (if (d % 2 == 1) s"V_TEST$d" else s"A_TEST$d")
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
    }
    val tracksEl = elem(IdTracks, trackEntries.reduce(_ ++ _))
    val clusters = (0 until nclu).map { c =>
      val ts = c * 1000L + (id % 7) * 10
      val blocks = (1 to nt).map { d =>
        val size = 8 + ((d * 7 + c * 5 + id) % 9).toInt
        val fill = ((d * 31 + c * 17 + id) % 251).toInt
        val payload = new Array[Byte](size)
        java.util.Arrays.fill(payload, fill.toByte)
        buildSimpleBlock(d.toLong, 10 * d + c, key = (d + c) % 2 == 0, payload)
      }
      val body = elem(IdTimestamp, uintPayload(ts)) ++ blocks.reduce(_ ++ _)
      if (unknownSize) elemUnknown(IdCluster, body) else elem(IdCluster, body)
    }
    val segBody = info ++ tracksEl ++ clusters.reduce(_ ++ _)
    val seg =
      if (unknownSize) elemUnknown(IdSegment, segBody, szWidth = 8)
      else elem(IdSegment, segBody)
    ebml ++ seg
  }

  /** Single-video-track fixture carrying CALLER-SUPPLIED frame
    * payloads (e.g. real PNGs) — the WebM side of cross-container
    * dedup gates: the same logical media wrapped in this container and
    * in [[Multimodal.syntheticMp4]] must extract byte-identically.
    * Frames are split across clusters of up to 3 blocks, all keyed.
    */
  def syntheticWebmMedia(frames: Seq[Array[Byte]], codec: String,
                         unknownSize: Boolean): Array[Byte] = {
    require(frames.nonEmpty, "syntheticWebmMedia: no frames")
    val ebml = elem(IdEbml, Array[Byte]())
    val info = elem(IdInfo, elem(IdTimestampScale, uintPayload(1000000L)))
    val tracksEl = elem(IdTracks, elem(IdTrackEntry,
      elem(IdTrackNumber, uintPayload(1L)) ++
      elem(IdTrackType, uintPayload(1L)) ++
      elem(IdCodecId, codec.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1))))
    val clusters = frames.zipWithIndex.grouped(3).zipWithIndex.map {
      case (group, c) =>
        val body = elem(IdTimestamp, uintPayload(c * 1000L)) ++
          group.map { case (f, j) =>
            buildSimpleBlock(1L, j * 40, key = true, f)
          }.reduce(_ ++ _)
        if (unknownSize) elemUnknown(IdCluster, body) else elem(IdCluster, body)
    }.toSeq
    val segBody = info ++ tracksEl ++ clusters.reduce(_ ++ _)
    val seg =
      if (unknownSize) elemUnknown(IdSegment, segBody, szWidth = 8)
      else elem(IdSegment, segBody)
    ebml ++ seg
  }
}
