package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** AVI (RIFF) container walk — the legacy video wrapper a long-tail
  * web crawl still carries in volume (OpenDML/AVI 1.0, Microsoft's
  * published RIFF/AVI structure): `RIFF('AVI ' LIST('hdrl' avih
  * LIST('strl' strh strf …)…) LIST('movi' ##dc/##wb …) [idx1])`.
  * Per-stream metadata (type, timebase scale/rate, declared length)
  * joins a movi chunk inventory (count + payload sum per stream) —
  * what a frame-sampling policy needs before any codec work.
  *
  * Strict and total: RIFF/LIST sizes are bounds-checked, the header's
  * declared stream count must match the `strl` list count, movi data
  * chunks must reference a declared stream (an orphan chunk is
  * corruption), odd-size chunks respect RIFF's pad byte, and
  * truncation anywhere is a typed reject.
  */
object Avi {

  final case class AviStream(idx: Int, fccType: String, scale: Long,
                             rate: Long, length: Long, nChunks: Int,
                             payloadSum: Long)

  final case class AviMeta(width: Long, height: Long, totalFrames: Long,
                           usPerFrame: Long, streams: Seq[AviStream])

  private def u(b: Byte): Int = b & 0xFF

  private def le32(b: Array[Byte], p: Int): Long =
    (u(b(p)) | (u(b(p + 1)) << 8) | (u(b(p + 2)) << 16)).toLong |
      (u(b(p + 3)).toLong << 24)

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse one AVI blob. */
  def aviTable(bytes: Array[Byte]): Either[String, AviMeta] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try aviTableWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def aviTableWalk(bytes: Array[Byte]): Either[String, AviMeta] = {
    if (bytes == null || bytes.length < 12) return Left("too short")
    if (fourcc(bytes, 0) != "RIFF") return Left("bad riff magic")
    val riffSize = le32(bytes, 4)
    if (riffSize + 8 > bytes.length) return Left("riff size out of bounds")
    if (fourcc(bytes, 8) != "AVI ") return Left("not an avi form")
    val end = (riffSize + 8).toInt
    var width = -1L
    var height = -1L
    var totalFrames = -1L
    var usPerFrame = -1L
    var declaredStreams = -1L
    val streams = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long)]
    val chunkCount = scala.collection.mutable.Map.empty[Int, (Int, Long)]

    def walkHdrl(from: Int, until: Int): Either[String, Unit] = {
      var p = from
      while (p < until) {
        if (until - p < 8) return Left("truncated header chunk")
        val id = fourcc(bytes, p)
        val sz = le32(bytes, p + 4)
        if (sz > until - p - 8) return Left("header chunk out of bounds")
        val body = p + 8
        if (id == "avih") {
          if (sz < 40) return Left("avih too short")
          usPerFrame = le32(bytes, body)
          totalFrames = le32(bytes, body + 16)
          declaredStreams = le32(bytes, body + 24)
          width = le32(bytes, body + 32)
          height = le32(bytes, body + 36)
        } else if (id == "LIST" && sz >= 4 &&
            fourcc(bytes, body) == "strl") {
          // first subchunk must be strh
          if (sz < 4 + 8) return Left("strl too short")
          val sid = fourcc(bytes, body + 4)
          val ssz = le32(bytes, body + 8)
          if (sid != "strh") return Left("strl without strh")
          if (ssz < 36 || ssz > sz - 4 - 8) return Left("strh out of bounds")
          val sb = body + 12
          streams += ((fourcc(bytes, sb), le32(bytes, sb + 20),
            le32(bytes, sb + 24), le32(bytes, sb + 32)))
        }
        p = body + sz.toInt + (sz.toInt & 1)
      }
      Right(())
    }

    def walkMovi(from: Int, until: Int): Either[String, Unit] = {
      var p = from
      while (p < until) {
        if (until - p < 8) return Left("truncated movi chunk")
        val id = fourcc(bytes, p)
        val sz = le32(bytes, p + 4)
        if (sz > until - p - 8) return Left("movi chunk out of bounds")
        val body = p + 8
        if (id == "LIST") {
          // 'rec ' grouping: recurse into it
          if (sz < 4) return Left("movi list too short")
          walkMovi(body + 4, body + sz.toInt) match {
            case Left(e) => return Left(e)
            case _ =>
          }
        } else {
          val d0 = id.charAt(0); val d1 = id.charAt(1)
          if (!d0.isDigit || !d1.isDigit) return Left("bad movi chunk id")
          val sidx = (d0 - '0') * 10 + (d1 - '0')
          if (sidx >= streams.length) return Left("orphan stream chunk")
          val kind = id.substring(2)
          if (kind != "dc" && kind != "db" && kind != "wb" && kind != "tx")
            return Left("unknown movi chunk kind")
          var sum = 0L
          var i = body
          val lim = body + sz.toInt
          while (i < lim) { sum += u(bytes(i)); i += 1 }
          val (c0, s0) = chunkCount.getOrElse(sidx, (0, 0L))
          chunkCount(sidx) = (c0 + 1, s0 + sum)
        }
        p = body + sz.toInt + (sz.toInt & 1)
      }
      Right(())
    }

    var p = 12
    var sawHdrl = false
    var sawMovi = false
    while (p < end) {
      if (end - p < 8) return Left("truncated chunk")
      val id = fourcc(bytes, p)
      val sz = le32(bytes, p + 4)
      if (sz > end - p - 8) return Left("chunk out of bounds")
      val body = p + 8
      if (id == "LIST") {
        if (sz < 4) return Left("list too short")
        val lt = fourcc(bytes, body)
        if (lt == "hdrl") {
          sawHdrl = true
          walkHdrl(body + 4, body + sz.toInt) match {
            case Left(e) => return Left(e)
            case _ =>
          }
        } else if (lt == "movi") {
          sawMovi = true
          walkMovi(body + 4, body + sz.toInt) match {
            case Left(e) => return Left(e)
            case _ =>
          }
        }
        // other lists (INFO, odml) skipped structurally
      }
      // bare chunks (idx1, JUNK) skipped structurally
      p = body + sz.toInt + (sz.toInt & 1)
    }
    if (!sawHdrl) return Left("missing hdrl")
    if (!sawMovi) return Left("missing movi")
    if (declaredStreams != streams.length.toLong)
      return Left("stream count mismatch")
    val out = streams.zipWithIndex.map { case ((t, sc, ra, len), i) =>
      val (nc, ps) = chunkCount.getOrElse(i, (0, 0L))
      AviStream(i, t, sc, ra, len, nc, ps)
    }
    Right(AviMeta(width, height, totalFrames, usPerFrame, out.toSeq))
  }

  /** One row per stream: `(…keep…, stream_idx, fcc_type, scale, rate,
    * length, n_chunks, payload_sum, width, height, total_frames)`.
    */
  def extractAviStreams(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("stream_idx", IntegerType, nullable = false),
        StructField("fcc_type", StringType, nullable = false),
        StructField("scale", LongType, nullable = false),
        StructField("rate", LongType, nullable = false),
        StructField("length", LongType, nullable = false),
        StructField("n_chunks", IntegerType, nullable = false),
        StructField("payload_sum", LongType, nullable = false),
        StructField("width", LongType, nullable = false),
        StructField("height", LongType, nullable = false),
        StructField("total_frames", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        aviTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(m) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            m.streams.iterator.map { s =>
              val arr = new Array[Any](nKeep + 10)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = s.idx; arr(nKeep + 1) = s.fccType
              arr(nKeep + 2) = s.scale; arr(nKeep + 3) = s.rate
              arr(nKeep + 4) = s.length; arr(nKeep + 5) = s.nChunks
              arr(nKeep + 6) = s.payloadSum; arr(nKeep + 7) = m.width
              arr(nKeep + 8) = m.height; arr(nKeep + 9) = m.totalFrames
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Decoded movi payloads of stream `streamIdx`:
    * `(…keep…, chunk_idx, content)` — the composition half (video
    * frame payloads into the image-hash / content-dedup paths).
    * Validates via [[aviTable]] first; poison blobs yield zero rows.
    */
  def extractAviPayloads(df: DataFrame, binCol: String,
                         streamIdx: Int): DataFrame = {
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
        aviTable(bytes) match {
          case Left(_) => Iterator.empty
          case Right(_) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            // second pass trusting validation: collect the stream's
            // movi chunk extents (the Gzip/Zip two-pass convention)
            val out = scala.collection.mutable.ArrayBuffer
              .empty[Array[Byte]]
            def walk(from: Int, until: Int): Unit = {
              var p = from
              while (p < until) {
                val id = fourcc(bytes, p)
                val sz = le32(bytes, p + 4).toInt
                val body = p + 8
                if (id == "LIST") {
                  val lt = fourcc(bytes, body)
                  if (lt == "movi" || lt == "rec ")
                    walk(body + 4, body + sz)
                } else if (id.charAt(0).isDigit && id.charAt(1).isDigit &&
                    (id.charAt(0) - '0') * 10 + (id.charAt(1) - '0')
                      == streamIdx) {
                  out += java.util.Arrays.copyOfRange(bytes, body, body + sz)
                }
                p = body + sz + (sz & 1)
              }
            }
            walk(12, (le32(bytes, 4) + 8).toInt)
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
  def aviErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("error", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        aviTable(r.getAs[Array[Byte]](idx)) match {
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

  private def w32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }
  private def tag(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    tag(out, id); w32(out, body.length.toLong)
    out.write(body, 0, body.length)
    if ((body.length & 1) == 1) out.write(0) // RIFF pad byte
    out.toByteArray
  }
  private def list(lt: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    tag(out, lt)
    out.write(body, 0, body.length)
    chunk("LIST", out.toByteArray)
  }

  /** Build an AVI: header with `streams` `(fccType, scale, rate,
    * length)`, then movi chunks `(streamIdx, kind, payload)`.
    */
  def buildAvi(width: Long, height: Long, totalFrames: Long,
               usPerFrame: Long,
               streams: Seq[(String, Long, Long, Long)],
               movi: Seq[(Int, String, Array[Byte])],
               withJunk: Boolean = false,
               recGroup: Boolean = false): Array[Byte] = {
    val avih = new java.io.ByteArrayOutputStream()
    w32(avih, usPerFrame); w32(avih, 1000000L); w32(avih, 0L); w32(avih, 0L)
    w32(avih, totalFrames); w32(avih, 0L); w32(avih, streams.length.toLong)
    w32(avih, 0L); w32(avih, width); w32(avih, height)
    w32(avih, 0L); w32(avih, 0L); w32(avih, 0L); w32(avih, 0L)
    val strls = streams.map { case (t, scale, rate, len) =>
      val strh = new java.io.ByteArrayOutputStream()
      tag(strh, t); tag(strh, "none")
      w32(strh, 0L); w32(strh, 0L); w32(strh, 0L)
      w32(strh, scale); w32(strh, rate); w32(strh, 0L); w32(strh, len)
      w32(strh, 0L); w32(strh, 0L); w32(strh, 0L); w32(strh, 0L); w32(strh, 0L)
      val strf = new Array[Byte](40)
      list("strl", chunk("strh", strh.toByteArray) ++ chunk("strf", strf))
    }
    val hdrl = list("hdrl",
      chunk("avih", avih.toByteArray) ++ strls.flatten.toArray)
    val moviChunks = movi.map { case (si, kind, payload) =>
      chunk(f"$si%02d$kind", payload)
    }
    val moviBody =
      if (recGroup && moviChunks.nonEmpty)
        list("rec ", moviChunks.head) ++
          moviChunks.tail.flatten.toArray
      else moviChunks.flatten.toArray
    val moviList = list("movi", moviBody)
    val junk = if (withJunk) chunk("JUNK", new Array[Byte](33)) else
      Array.empty[Byte]
    val form = new java.io.ByteArrayOutputStream()
    tag(form, "AVI ")
    form.write(hdrl, 0, hdrl.length)
    form.write(junk, 0, junk.length)
    form.write(moviList, 0, moviList.length)
    // RIFF size = bytes after the size field = "AVI " + contents
    val fb = form.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    tag(out, "RIFF"); w32(out, fb.length.toLong)
    out.write(fb, 0, fb.length)
    out.toByteArray
  }
}
