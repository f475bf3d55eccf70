package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Standalone gzip (RFC 1952) member walk — the wrapper the bulk of a
  * crawled corpus still arrives in (`.gz` text shards, `.tar.gz`
  * bundles, `.warc.gz` archives). [[WebArchive]] already inflates
  * multi-member WARC blobs via `GZIPInputStream`, but that path
  * discards everything the header carries and verifies nothing the
  * JDK doesn't: this walk parses every member's header fields
  * (FTEXT/FHCRC/FEXTRA/FNAME/FCOMMENT, MTIME, XFL, OS — FNAME is the
  * original filename, the one piece of provenance a bare `.gz` shard
  * has), verifies the optional FHCRC header checksum, inflates the
  * raw-deflate body under a bomb cap, and verifies BOTH trailer
  * integrity fields (CRC-32 of the decoded bytes and ISIZE = decoded
  * length mod 2^32). A reader that trusts the trailer, skips FHCRC, or
  * mis-walks the optional header fields mis-parses every subsequent
  * member boundary.
  *
  * Strict and total: reserved FLG bits reject, every length is
  * bounds-checked, truncation anywhere is a typed reject, and decoded
  * output is capped (the [[ZipArchive]]/[[WebArchive]] bomb argument).
  */
object Gzip {

  final case class GzipMember(idx: Int, isText: Boolean, mtime: Long,
                              xfl: Int, os: Int, extraLen: Int,
                              fname: String, comment: String,
                              hcrcPresent: Boolean, compLen: Long,
                              decompLen: Long, contentSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  private def le16(b: Array[Byte], p: Int): Int = u(b(p)) | (u(b(p + 1)) << 8)

  private def le32(b: Array[Byte], p: Int): Long =
    (u(b(p)) | (u(b(p + 1)) << 8) | (u(b(p + 2)) << 16)).toLong |
      (u(b(p + 3)).toLong << 24)

  /** Inflate-bomb cap: deflate is ≤ ~1030:1; 64× compressed size
    * (floor 16 MiB) passes real data and bounds a bomb.
    */
  private def inflateCap(compressedLen: Int): Long =
    math.max(16L << 20, compressedLen.toLong * 64)

  /** NUL-terminated Latin-1 string starting at `p`; returns
    * (value, positionAfterNul) or null on missing terminator.
    */
  private def zString(b: Array[Byte], p: Int): (String, Int) = {
    var i = p
    while (i < b.length && b(i) != 0) i += 1
    if (i >= b.length) null
    else (new String(b, p, i - p,
      java.nio.charset.StandardCharsets.ISO_8859_1), i + 1)
  }

  /** Walk one blob of concatenated gzip members. Total: returns a
    * typed `Left` on any structural violation, never throws.
    */
  def gzipMemberTable(bytes: Array[Byte],
                      maxDecode: Long = -1L)
      : Either[String, Seq[GzipMember]] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val n = bytes.length
    val cap = if (maxDecode > 0) maxDecode else inflateCap(n)
    val out = scala.collection.mutable.ArrayBuffer.empty[GzipMember]
    var pos = 0
    var idx = 0
    while (pos < n) {
      if (n - pos < 10) return Left("truncated member header")
      if (u(bytes(pos)) != 0x1F || u(bytes(pos + 1)) != 0x8B)
        return Left("bad gzip magic")
      if (u(bytes(pos + 2)) != 8) return Left("unknown compression method")
      val flg = u(bytes(pos + 3))
      if ((flg & 0xE0) != 0) return Left("reserved FLG bits set")
      val mtime = le32(bytes, pos + 4)
      val xfl = u(bytes(pos + 8))
      val os = u(bytes(pos + 9))
      var p = pos + 10
      var extraLen = 0
      if ((flg & 0x04) != 0) { // FEXTRA
        if (n - p < 2) return Left("truncated FEXTRA length")
        extraLen = le16(bytes, p)
        p += 2
        if (n - p < extraLen) return Left("FEXTRA out of bounds")
        p += extraLen
      }
      var fname: String = null
      if ((flg & 0x08) != 0) { // FNAME
        val r = zString(bytes, p)
        if (r == null) return Left("unterminated FNAME")
        fname = r._1; p = r._2
      }
      var comment: String = null
      if ((flg & 0x10) != 0) { // FCOMMENT
        val r = zString(bytes, p)
        if (r == null) return Left("unterminated FCOMMENT")
        comment = r._1; p = r._2
      }
      val hcrcPresent = (flg & 0x02) != 0
      if (hcrcPresent) {
        if (n - p < 2) return Left("truncated FHCRC")
        val stored = le16(bytes, p)
        val crc = new java.util.zip.CRC32
        crc.update(bytes, pos, p - pos)
        if ((crc.getValue & 0xFFFF).toInt != stored)
          return Left("FHCRC mismatch")
        p += 2
      }
      // raw deflate body, bounded
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, p, n - p)
      val buf = new Array[Byte](64 << 10)
      var decompLen = 0L
      var contentSum = 0L
      val crc = new java.util.zip.CRC32
      while (!inf.finished()) {
        val k =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException =>
            inf.end(); return Left("bad deflate stream") }
        if (k == 0 && !inf.finished()) {
          inf.end(); return Left("truncated deflate stream")
        }
        if (decompLen + k > cap) { inf.end(); return Left("gzip inflate cap") }
        crc.update(buf, 0, k)
        var i = 0
        while (i < k) { contentSum += u(buf(i)); i += 1 }
        decompLen += k
      }
      val consumed = inf.getBytesRead
      inf.end()
      val trailerAt = p + consumed.toInt
      if (n - trailerAt < 8) return Left("truncated trailer")
      val storedCrc = le32(bytes, trailerAt)
      val storedIsize = le32(bytes, trailerAt + 4)
      if (storedCrc != crc.getValue) return Left("CRC32 mismatch")
      if (storedIsize != (decompLen & 0xFFFFFFFFL))
        return Left("ISIZE mismatch")
      out += GzipMember(idx, (flg & 0x01) != 0, mtime, xfl, os, extraLen,
        fname, comment, hcrcPresent, consumed, decompLen, contentSum)
      idx += 1
      pos = trailerAt + 8
    }
    Right(out.toSeq)
  }

  /** Decoded contents of every member, in order.
    *
    * CONTRACT — validate first, same cap: callers MUST have run the
    * validating [[gzipMemberTable]] walk over the same bytes with the
    * SAME `cap` before calling this. This walk assumes well-formed
    * input (no per-field bounds checks) and, when its own backstop
    * bomb guard trips, it returns the members decoded SO FAR rather
    * than an error — a caller that skipped validation, or validated
    * with a larger cap, would silently drop the remaining members.
    * The guard here is a defense-in-depth backstop against unbounded
    * inflation, not an error channel; the validating pass is where
    * poison becomes a typed `Left`.
    */
  private def memberContents(bytes: Array[Byte], cap: Long)
      : Seq[(Int, String, Array[Byte])] = {
    val n = bytes.length
    val res = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Array[Byte])]
    var pos = 0
    var idx = 0
    while (pos < n) {
      val flg = u(bytes(pos + 3))
      var p = pos + 10
      if ((flg & 0x04) != 0) { p += 2 + le16(bytes, p) }
      var fname: String = null
      if ((flg & 0x08) != 0) { val r = zString(bytes, p); fname = r._1; p = r._2 }
      if ((flg & 0x10) != 0) { val r = zString(bytes, p); p = r._2 }
      if ((flg & 0x02) != 0) p += 2
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, p, n - p)
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 << 10)
      var produced = 0L
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && !inf.finished()) { inf.end(); return res.toSeq }
        produced += k
        // bomb guard enforced HERE too, not only in the validating
        // gzipMemberTable pass — a future caller that skips the
        // validation pass must not inherit an unbounded inflate loop
        if (produced > cap) { inf.end(); return res.toSeq }
        bos.write(buf, 0, k)
      }
      val consumed = inf.getBytesRead
      inf.end()
      res += ((idx, fname, bos.toByteArray))
      idx += 1
      pos = p + consumed.toInt + 8
    }
    res.toSeq
  }

  /** Explode a binary column of concatenated gzip members into one row
    * per member: `(…keep…, member_idx, is_text, mtime, os, extra_len,
    * fname, comment, decomp_len, content_sum)`. Poison blobs yield
    * zero rows; [[gzipErrors]] is the error channel. `comp_len` is
    * deliberately NOT in the row — deflate output length is a codec
    * artifact, not content.
    */
  def extractGzipMembers(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("member_idx", IntegerType, nullable = false),
        StructField("is_text", BooleanType, nullable = false),
        StructField("mtime", LongType, nullable = false),
        StructField("os", IntegerType, nullable = false),
        StructField("extra_len", IntegerType, nullable = false),
        StructField("fname", StringType, nullable = true),
        StructField("comment", StringType, nullable = true),
        StructField("decomp_len", LongType, nullable = false),
        StructField("content_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        gzipMemberTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(members) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            members.iterator.map { m =>
              val arr = new Array[Any](nKeep + 9)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = m.idx; arr(nKeep + 1) = m.isText
              arr(nKeep + 2) = m.mtime; arr(nKeep + 3) = m.os
              arr(nKeep + 4) = m.extraLen; arr(nKeep + 5) = m.fname
              arr(nKeep + 6) = m.comment; arr(nKeep + 7) = m.decompLen
              arr(nKeep + 8) = m.contentSum
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Decoded member content: `(…keep…, member_idx, fname, content)` —
    * the composition half (`.tar.gz` → [[TarShard]], `.gz` text →
    * corpus prep). Validates via [[gzipMemberTable]] first; poison
    * blobs yield zero rows.
    */
  def extractGzipContent(df: DataFrame, binCol: String,
                         maxDecode: Long = -1L): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("member_idx", IntegerType, nullable = false),
        StructField("fname", StringType, nullable = true),
        StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        gzipMemberTable(bytes, maxDecode) match {
          case Left(_) => Iterator.empty
          case Right(_) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            val cap = if (maxDecode > 0) maxDecode else inflateCap(bytes.length)
            memberContents(bytes, cap).iterator.map { case (mi, fn, c) =>
              val arr = new Array[Any](nKeep + 3)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = mi; arr(nKeep + 1) = fn; arr(nKeep + 2) = c
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: `(…keep…, error)` — one row per rejected blob. */
  def gzipErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("error", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        gzipMemberTable(r.getAs[Array[Byte]](idx)) match {
          case Left(e) =>
            val arr = new Array[Any](nKeep + 1)
            var i = 0
            while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
            arr(nKeep) = e
            Iterator.single(Row.fromSeq(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(arr)))
          case Right(_) => Iterator.empty
        }
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // Fixture writer

  /** One gzip member with real header fields, raw-deflate body, and a
    * correct CRC-32 + ISIZE trailer. `level` feeds
    * `java.util.zip.Deflater` directly.
    */
  def buildGzipMember(content: Array[Byte], fname: String = null,
                      comment: String = null, extra: Array[Byte] = null,
                      mtime: Long = 0L, os: Int = 255, isText: Boolean = false,
                      withHcrc: Boolean = false, level: Int = 6)
      : Array[Byte] = {
    val head = new java.io.ByteArrayOutputStream()
    var flg = 0
    if (isText) flg |= 0x01
    if (withHcrc) flg |= 0x02
    if (extra != null) flg |= 0x04
    if (fname != null) flg |= 0x08
    if (comment != null) flg |= 0x10
    head.write(0x1F); head.write(0x8B); head.write(8); head.write(flg)
    head.write((mtime & 0xFF).toInt); head.write(((mtime >> 8) & 0xFF).toInt)
    head.write(((mtime >> 16) & 0xFF).toInt)
    head.write(((mtime >> 24) & 0xFF).toInt)
    head.write(0) // XFL
    head.write(os)
    if (extra != null) {
      head.write(extra.length & 0xFF); head.write((extra.length >> 8) & 0xFF)
      head.write(extra, 0, extra.length)
    }
    if (fname != null) {
      head.write(fname.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)); head.write(0)
    }
    if (comment != null) {
      head.write(comment.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)); head.write(0)
    }
    if (withHcrc) {
      val crc = new java.util.zip.CRC32
      val hb = head.toByteArray
      crc.update(hb, 0, hb.length)
      val v = (crc.getValue & 0xFFFF).toInt
      head.write(v & 0xFF); head.write((v >> 8) & 0xFF)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.toByteArray)
    val defl = new java.util.zip.Deflater(level, true)
    defl.setInput(content); defl.finish()
    val buf = new Array[Byte](64 << 10)
    while (!defl.finished()) {
      val k = defl.deflate(buf)
      out.write(buf, 0, k)
    }
    defl.end()
    val crc = new java.util.zip.CRC32
    crc.update(content, 0, content.length)
    val cv = crc.getValue
    out.write((cv & 0xFF).toInt); out.write(((cv >> 8) & 0xFF).toInt)
    out.write(((cv >> 16) & 0xFF).toInt); out.write(((cv >> 24) & 0xFF).toInt)
    val is = content.length.toLong & 0xFFFFFFFFL
    out.write((is & 0xFF).toInt); out.write(((is >> 8) & 0xFF).toInt)
    out.write(((is >> 16) & 0xFF).toInt); out.write(((is >> 24) & 0xFF).toInt)
    out.toByteArray
  }
}
