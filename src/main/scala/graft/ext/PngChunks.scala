package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PNG chunk-structure walk (RFC 2083 / ISO 15948) — the integrity
  * pass the decode path ([[Multimodal]] via ImageIO) does not give
  * you: EVERY chunk's CRC-32 is verified (over type + data, the PNG
  * convention), IHDR is enforced first with its field domains
  * checked, IEND last and empty. Emits the header fields and chunk
  * inventory WITHOUT inflating any pixel data — the
  * filter-before-decode shape, and the way a pipeline detects
  * corrupted-but-decoder-tolerated assets (many decoders ignore bad
  * CRCs; training pipelines should not).
  */
object PngChunks {

  final case class PngMeta(width: Long, height: Long, bitDepth: Int,
                           colorType: Int, interlace: Int, nChunks: Int,
                           idatBytes: Long)

  private def u(b: Byte): Int = b & 0xFF

  private def be32(b: Array[Byte], p: Int): Long =
    ((u(b(p)) << 24) | (u(b(p + 1)) << 16) | (u(b(p + 2)) << 8) |
      u(b(p + 3))).toLong & 0xFFFFFFFFL

  private val Signature =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Walk one PNG blob. */
  def pngMeta(bytes: Array[Byte]): Either[String, PngMeta] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try pngMetaWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def pngMetaWalk(bytes: Array[Byte]): Either[String, PngMeta] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val n = bytes.length
    if (n < 8 || !java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, 8), Signature))
      return Left("bad png signature")
    var pos = 8
    var meta: PngMeta = null
    var nChunks = 0
    var idatBytes = 0L
    var sawIend = false
    val crc = new java.util.zip.CRC32
    while (pos < n && !sawIend) {
      if (n - pos < 12) return Left("truncated chunk")
      val len = be32(bytes, pos)
      if (len > n - pos - 12) return Left("chunk out of bounds")
      val typ = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      crc.reset()
      crc.update(bytes, pos + 4, 4 + len.toInt)
      if (crc.getValue != be32(bytes, pos + 8 + len.toInt))
        return Left("bad chunk crc")
      if (nChunks == 0 && typ != "IHDR") return Left("ihdr not first")
      typ match {
        case "IHDR" =>
          if (meta != null) return Left("duplicate ihdr")
          if (len != 13) return Left("bad ihdr length")
          val w = be32(bytes, pos + 8)
          val h = be32(bytes, pos + 12)
          val depth = u(bytes(pos + 16))
          val color = u(bytes(pos + 17))
          val compression = u(bytes(pos + 18))
          val filter = u(bytes(pos + 19))
          val interlace = u(bytes(pos + 20))
          if (w < 1 || h < 1) return Left("bad ihdr geometry")
          if (!Set(1, 2, 4, 8, 16)(depth)) return Left("bad bit depth")
          if (!Set(0, 2, 3, 4, 6)(color)) return Left("bad color type")
          if (compression != 0 || filter != 0 || interlace > 1)
            return Left("bad ihdr fields")
          meta = PngMeta(w, h, depth, color, interlace, 0, 0L)
        case "IDAT" => idatBytes += len
        case "IEND" =>
          if (len != 0) return Left("bad iend length")
          sawIend = true
        case _ =>
      }
      nChunks += 1
      pos += 12 + len.toInt
    }
    if (!sawIend) return Left("missing iend")
    if (pos != n) return Left("trailing garbage")
    if (idatBytes == 0) return Left("missing idat")
    Right(meta.copy(nChunks = nChunks, idatBytes = idatBytes))
  }

  /** One row per blob: `(…keep…, width, height, bit_depth, color_type,
    * interlace, n_chunks, idat_bytes, ok, error)` — meta-pass
    * convention.
    */
  def extractPngMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("width", LongType, nullable = true),
        StructField("height", LongType, nullable = true),
        StructField("bit_depth", IntegerType, nullable = true),
        StructField("color_type", IntegerType, nullable = true),
        StructField("interlace", IntegerType, nullable = true),
        StructField("n_chunks", IntegerType, nullable = true),
        StructField("idat_bytes", LongType, nullable = true),
        StructField("ok", BooleanType, nullable = false),
        StructField("error", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.map { r =>
        val res = pngMeta(r.getAs[Array[Byte]](idx))
        val arr = new Array[Any](nKeep + 9)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        res match {
          case Right(m) =>
            arr(nKeep) = m.width; arr(nKeep + 1) = m.height
            arr(nKeep + 2) = m.bitDepth; arr(nKeep + 3) = m.colorType
            arr(nKeep + 4) = m.interlace; arr(nKeep + 5) = m.nChunks
            arr(nKeep + 6) = m.idatBytes
            arr(nKeep + 7) = true; arr(nKeep + 8) = null
          case Left(e) =>
            arr(nKeep + 7) = false; arr(nKeep + 8) = e
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }
}
