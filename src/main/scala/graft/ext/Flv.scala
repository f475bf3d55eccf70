package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** FLV tag walk (Adobe's published FLV file format — the legacy web
  * video wrapper; old crawls carry it in volume next to [[Avi]]):
  * 9-byte header (`FLV`, version 1, audio/video presence flags,
  * data offset), then a back-pointer chain of tags — each tag is
  * `type(1) dataSize(3 BE) timestamp(3 BE + 1 extended) streamId(3)`
  * followed by its payload and a 4-byte BE PreviousTagSize that must
  * equal 11 + dataSize. The back-pointer chain is FLV's only
  * integrity device, so it is VERIFIED on every tag — a reader that
  * skips it silently resynchronizes on garbage.
  *
  * Strict and total: reserved header flag bits reject, the declared
  * header flags must AGREE with the tag types actually present
  * (a video-flagged file with no video tags is corruption), stream
  * id must be zero, unknown tag types reject, every length is
  * bounds-checked, truncation is typed.
  */
object Flv {

  final case class FlvTag(idx: Int, tagType: Int, dataSize: Long,
                          timestampMs: Long, payloadSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  private def be24(b: Array[Byte], p: Int): Long =
    ((u(b(p)) << 16) | (u(b(p + 1)) << 8) | u(b(p + 2))).toLong

  private def be32(b: Array[Byte], p: Int): Long =
    (u(b(p)).toLong << 24) | (u(b(p + 1)) << 16).toLong |
      (u(b(p + 2)) << 8).toLong | u(b(p + 3)).toLong

  /** Walk one FLV blob. */
  def flvTagTable(bytes: Array[Byte]): Either[String, Seq[FlvTag]] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try flvTagTableWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def flvTagTableWalk(bytes: Array[Byte]): Either[String, Seq[FlvTag]] = {
    if (bytes == null || bytes.length < 13) return Left("too short")
    if (!(bytes(0) == 'F' && bytes(1) == 'L' && bytes(2) == 'V'))
      return Left("bad magic")
    if (u(bytes(3)) != 1) return Left("unsupported flv version")
    val flags = u(bytes(4))
    if ((flags & ~0x05) != 0) return Left("reserved header flags")
    val hasAudio = (flags & 0x04) != 0
    val hasVideo = (flags & 0x01) != 0
    val dataOffset = be32(bytes, 5)
    if (dataOffset < 9 || dataOffset > bytes.length - 4)
      return Left("bad data offset")
    var p = dataOffset.toInt
    if (be32(bytes, p) != 0L) return Left("nonzero first back-pointer")
    p += 4
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[FlvTag]
    var idx = 0
    var sawAudio = false
    var sawVideo = false
    while (p < n) {
      if (n - p < 11) return Left("truncated tag header")
      val tt = u(bytes(p))
      if (tt != 8 && tt != 9 && tt != 18) return Left("unknown tag type")
      if (tt == 8) sawAudio = true
      if (tt == 9) sawVideo = true
      val dataSize = be24(bytes, p + 1)
      val ts = be24(bytes, p + 4) | (u(bytes(p + 7)).toLong << 24)
      if (be24(bytes, p + 8) != 0L) return Left("nonzero stream id")
      if (dataSize > n - p - 11 - 4) return Left("tag out of bounds")
      var sum = 0L
      var i = p + 11
      val lim = p + 11 + dataSize.toInt
      while (i < lim) { sum += u(bytes(i)); i += 1 }
      // back-pointer verification: FLV's only integrity device
      if (be32(bytes, lim) != 11L + dataSize)
        return Left("back-pointer mismatch")
      out += FlvTag(idx, tt, dataSize, ts, sum)
      idx += 1
      p = lim + 4
    }
    if (hasAudio != sawAudio || hasVideo != sawVideo)
      return Left("header flags disagree with tags")
    if (out.isEmpty) return Left("no tags")
    Right(out.toSeq)
  }

  /** One row per tag: `(…keep…, tag_idx, tag_type, data_size,
    * timestamp_ms, payload_sum)`.
    */
  def extractFlvTags(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("tag_idx", IntegerType, nullable = false),
        StructField("tag_type", IntegerType, nullable = false),
        StructField("data_size", LongType, nullable = false),
        StructField("timestamp_ms", LongType, nullable = false),
        StructField("payload_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        flvTagTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(tags) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            tags.iterator.map { t =>
              val arr = new Array[Any](nKeep + 5)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = t.idx; arr(nKeep + 1) = t.tagType
              arr(nKeep + 2) = t.dataSize; arr(nKeep + 3) = t.timestampMs
              arr(nKeep + 4) = t.payloadSum
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Decoded payloads of tags of `tagType`:
    * `(…keep…, chunk_idx, content)` — the composition half. Validates
    * via [[flvTagTable]] first; poison blobs yield zero rows.
    */
  def extractFlvPayloads(df: DataFrame, binCol: String,
                         tagType: Int): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("chunk_idx", IntegerType, nullable = false),
        StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        flvTagTable(bytes) match {
          case Left(_) => Iterator.empty
          case Right(_) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            val out = scala.collection.mutable.ArrayBuffer
              .empty[Array[Byte]]
            var p = be32(bytes, 5).toInt + 4
            while (p < bytes.length) {
              val tt = u(bytes(p))
              val sz = be24(bytes, p + 1).toInt
              if (tt == tagType)
                out += java.util.Arrays.copyOfRange(bytes, p + 11,
                  p + 11 + sz)
              p += 11 + sz + 4
            }
            out.iterator.zipWithIndex.map { case (c, ci) =>
              val arr = new Array[Any](nKeep + 2)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = ci; arr(nKeep + 1) = c
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: `(…keep…, error)`. */
  def flvErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("error", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        flvTagTable(r.getAs[Array[Byte]](idx)) match {
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

  /** Build an FLV from `(tagType, timestampMs, payload)` tags; header
    * flags derived from the tag types present.
    */
  def buildFlv(tags: Seq[(Int, Long, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('F'); out.write('L'); out.write('V'); out.write(1)
    var flags = 0
    if (tags.exists(_._1 == 8)) flags |= 0x04
    if (tags.exists(_._1 == 9)) flags |= 0x01
    out.write(flags)
    out.write(0); out.write(0); out.write(0); out.write(9) // data offset
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    be32(0L)
    tags.foreach { case (tt, ts, payload) =>
      out.write(tt)
      out.write((payload.length >> 16) & 0xFF)
      out.write((payload.length >> 8) & 0xFF)
      out.write(payload.length & 0xFF)
      out.write(((ts >> 16) & 0xFF).toInt); out.write(((ts >> 8) & 0xFF).toInt)
      out.write((ts & 0xFF).toInt); out.write(((ts >> 24) & 0xFF).toInt)
      out.write(0); out.write(0); out.write(0) // stream id
      out.write(payload, 0, payload.length)
      be32(11L + payload.length)
    }
    out.toByteArray
  }
}
