package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebP metadata walk (RIFF container + the three published WebP
  * bitstream headers; developers.google.com/speed/webp/docs/riff_container)
  * — the image format modern crawls are full of, and one the JDK's
  * ImageIO cannot read: the filter-before-decode pass extracts the
  * variant and geometry so a pipeline can route/deduplicate/quota
  * WebP assets without a native decoder.
  *
  *   VP8  (lossy):    keyframe tag (3 bytes, incl. the 0x9D012A sync),
  *                    14-bit width/height.
  *   VP8L (lossless): 0x2F signature, 14-bit width-1/height-1 packed
  *                    little-endian, alpha bit, 3-bit version (must
  *                    be 0).
  *   VP8X (extended): feature flags (ICC/alpha/EXIF/XMP/animation),
  *                    24-bit canvas width-1/height-1.
  *
  * Strict and total: RIFF sizes are bounds-checked against the blob,
  * the RIFF form must be "WEBP", chunk sizes pad to 2 bytes per RIFF,
  * sync/signature/version fields are enforced, and a VP8X canvas is
  * cross-checked against any inner VP8/VP8L geometry when the frame
  * is not animated/cropped (the common still-image case).
  */
object WebP {

  final case class WebPMeta(variant: String, width: Long, height: Long,
                            hasAlpha: Boolean, hasAnimation: Boolean,
                            nChunks: Int)

  private def u(b: Byte): Int = b & 0xFF

  private def le24(b: Array[Byte], p: Int): Int =
    u(b(p)) | (u(b(p + 1)) << 8) | (u(b(p + 2)) << 16)

  private def le32(b: Array[Byte], p: Int): Long =
    le24(b, p).toLong | (u(b(p + 3)).toLong << 24)

  private def fourCC(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse one WebP blob's metadata. */
  def webpMeta(bytes: Array[Byte]): Either[String, WebPMeta] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try webpMetaWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def webpMetaWalk(bytes: Array[Byte]): Either[String, WebPMeta] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val n = bytes.length
    if (n < 12 || fourCC(bytes, 0) != "RIFF") return Left("bad riff magic")
    val riffSize = le32(bytes, 4)
    if (riffSize + 8 > n) return Left("riff size out of bounds")
    if (fourCC(bytes, 8) != "WEBP") return Left("not a webp form")
    var pos = 12
    val end = (riffSize + 8).toInt
    var variant: String = null
    var width = -1L
    var height = -1L
    var alpha = false
    var anim = false
    var vp8xW = -1L
    var vp8xH = -1L
    var nChunks = 0
    while (pos < end) {
      if (end - pos < 8) return Left("truncated chunk header")
      val cc = fourCC(bytes, pos)
      val size = le32(bytes, pos + 4)
      val body = pos + 8
      if (size > end - body) return Left("chunk out of bounds")
      cc match {
        case "VP8 " =>
          if (size < 10) return Left("short vp8 chunk")
          // frame tag: 3 bytes; keyframe bit 0 == 0
          if ((u(bytes(body)) & 1) != 0) return Left("vp8 interframe first")
          if (!(u(bytes(body + 3)) == 0x9D && u(bytes(body + 4)) == 0x01 &&
                u(bytes(body + 5)) == 0x2A)) return Left("bad vp8 sync code")
          if (variant == null) variant = "vp8"
          val w = (u(bytes(body + 6)) | (u(bytes(body + 7)) << 8)) & 0x3FFF
          val h = (u(bytes(body + 8)) | (u(bytes(body + 9)) << 8)) & 0x3FFF
          width = w; height = h
        case "VP8L" =>
          if (size < 5) return Left("short vp8l chunk")
          if (u(bytes(body)) != 0x2F) return Left("bad vp8l signature")
          val bits = le32(bytes, body + 1)
          if (((bits >> 29) & 7) != 0) return Left("bad vp8l version")
          if (variant == null) variant = "vp8l"
          width = (bits & 0x3FFF) + 1
          height = ((bits >> 14) & 0x3FFF) + 1
          alpha = alpha || ((bits >> 28) & 1) == 1
        case "VP8X" =>
          if (size < 10) return Left("short vp8x chunk")
          val flags = u(bytes(body))
          alpha = alpha || (flags & 0x10) != 0
          anim = (flags & 0x02) != 0
          variant = "vp8x"
          vp8xW = le24(bytes, body + 4) + 1L
          vp8xH = le24(bytes, body + 7) + 1L
        case _ => // ALPH / ANMF / EXIF / XMP / ICCP / unknown: skipped
      }
      nChunks += 1
      pos = body + size.toInt + (size.toInt & 1) // RIFF 2-byte padding
    }
    if (variant == null) return Left("no image chunk")
    if (variant == "vp8x") {
      if (vp8xW < 1) return Left("short vp8x chunk")
      // still images: the canvas must agree with the inner bitstream
      if (!anim && width > 0 && (width != vp8xW || height != vp8xH))
        return Left("vp8x canvas mismatch")
      width = vp8xW; height = vp8xH
    }
    if (width < 1 || height < 1) return Left("missing geometry")
    Right(WebPMeta(variant, width, height, alpha, anim, nChunks))
  }

  /** One row per blob: `(…keep…, variant, width, height, has_alpha,
    * has_animation, n_chunks, ok, error)` — meta-pass convention.
    */
  def extractWebPMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("variant", StringType, nullable = true),
        StructField("width", LongType, nullable = true),
        StructField("height", LongType, nullable = true),
        StructField("has_alpha", BooleanType, nullable = true),
        StructField("has_animation", BooleanType, nullable = true),
        StructField("n_chunks", IntegerType, nullable = true),
        StructField("ok", BooleanType, nullable = false),
        StructField("error", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.map { r =>
        val res = webpMeta(r.getAs[Array[Byte]](idx))
        val arr = new Array[Any](nKeep + 8)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        res match {
          case Right(m) =>
            arr(nKeep) = m.variant; arr(nKeep + 1) = m.width
            arr(nKeep + 2) = m.height; arr(nKeep + 3) = m.hasAlpha
            arr(nKeep + 4) = m.hasAnimation; arr(nKeep + 5) = m.nChunks
            arr(nKeep + 6) = true; arr(nKeep + 7) = null
          case Left(e) =>
            arr(nKeep + 6) = false; arr(nKeep + 7) = e
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // fixture writers (header-accurate; pixel payload is filler — the
  // walk never decodes entropy data)

  private def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(cc.getBytes("US-ASCII"))
    val s = body.length
    out.write(s & 0xFF); out.write((s >> 8) & 0xFF)
    out.write((s >> 16) & 0xFF); out.write((s >> 24) & 0xFF)
    out.write(body)
    if ((s & 1) == 1) out.write(0) // RIFF padding
    out.toByteArray
  }

  private def riff(chunks: Array[Byte]*): Array[Byte] = {
    val payload = chunks.reduce(_ ++ _)
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val s = payload.length + 4
    out.write(s & 0xFF); out.write((s >> 8) & 0xFF)
    out.write((s >> 16) & 0xFF); out.write((s >> 24) & 0xFF)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }

  private def vp8Body(w: Int, h: Int, fillerLen: Int, fill: Byte): Array[Byte] = {
    val b = new Array[Byte](10 + fillerLen)
    java.util.Arrays.fill(b, 10, b.length, fill)
    b(0) = 0x10 // keyframe (bit0=0), version 0, show_frame
    b(3) = 0x9D.toByte; b(4) = 0x01; b(5) = 0x2A
    b(6) = (w & 0xFF).toByte; b(7) = ((w >> 8) & 0x3F).toByte
    b(8) = (h & 0xFF).toByte; b(9) = ((h >> 8) & 0x3F).toByte
    b
  }

  private def vp8lBody(w: Int, h: Int, alpha: Boolean, fillerLen: Int,
                       fill: Byte): Array[Byte] = {
    val b = new Array[Byte](5 + fillerLen)
    java.util.Arrays.fill(b, 5, b.length, fill)
    b(0) = 0x2F
    val bits = ((w - 1).toLong & 0x3FFF) | (((h - 1).toLong & 0x3FFF) << 14) |
      (if (alpha) 1L << 28 else 0L)
    var i = 0
    while (i < 4) { b(1 + i) = ((bits >> (8 * i)) & 0xFF).toByte; i += 1 }
    b
  }

  private def vp8xBody(w: Long, h: Long, alpha: Boolean,
                       anim: Boolean): Array[Byte] = {
    val b = new Array[Byte](10)
    b(0) = ((if (alpha) 0x10 else 0) | (if (anim) 0x02 else 0)).toByte
    val wm = w - 1; val hm = h - 1
    b(4) = (wm & 0xFF).toByte; b(5) = ((wm >> 8) & 0xFF).toByte
    b(6) = ((wm >> 16) & 0xFF).toByte
    b(7) = (hm & 0xFF).toByte; b(8) = ((hm >> 8) & 0xFF).toByte
    b(9) = ((hm >> 16) & 0xFF).toByte
    b
  }

  /** Simple lossy / lossless / extended fixtures. `style`: 0 = VP8,
    * 1 = VP8L (+alpha), 2 = VP8X wrapping VP8 (+EXIF chunk),
    * 3 = VP8X animated.
    */
  def syntheticWebP(style: Int, w: Int, h: Int, fillerLen: Int,
                    fill: Byte): Array[Byte] = style match {
    case 0 => riff(chunk("VP8 ", vp8Body(w, h, fillerLen, fill)))
    case 1 => riff(chunk("VP8L", vp8lBody(w, h, alpha = true, fillerLen, fill)))
    case 2 => riff(
      chunk("VP8X", vp8xBody(w, h, alpha = false, anim = false)),
      chunk("EXIF", Array.fill[Byte](9)(fill)), // odd size: padding live
      chunk("VP8 ", vp8Body(w, h, fillerLen, fill)))
    case _ => riff(
      chunk("VP8X", vp8xBody(w, h, alpha = true, anim = true)),
      chunk("ANMF", Array.fill[Byte](24)(fill)))
  }
}
