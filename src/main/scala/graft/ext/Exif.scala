package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JPEG segment walk + EXIF (TIFF IFD0) metadata extraction — the
  * filter-before-decode pass of an image pipeline: orientation (a
  * training-data correctness issue — pixels are stored rotated and
  * the flag says so), declared geometry, and tag inventory, WITHOUT
  * decoding pixels (JEITA CP-3451 / TIFF 6.0; both published specs).
  *
  * The walk validates JPEG marker structure (SOI, FF-prefixed
  * segments, big-endian lengths that include themselves, standalone
  * RST/EOI markers, entropy data after SOS) and parses the first
  * APP1 `Exif\0\0` payload as TIFF: byte order (`II` little / `MM`
  * big — BOTH live in the wild and the gate decorrelates them), magic
  * 42, IFD0 entry table. Values are read inline or through the
  * 4-byte offset indirection, every offset bounds-checked against the
  * TIFF extent. A JPEG WITHOUT EXIF is not poison — it surfaces as
  * `has_exif=false` with null fields (quarantine semantics);
  * structural malformations are typed rejects.
  */
object Exif {

  final case class ExifMeta(hasExif: Boolean, byteOrderLE: Boolean,
                            orientation: Option[Int], width: Option[Long],
                            height: Option[Long], nEntries: Option[Int])

  private def u(b: Byte): Int = b & 0xFF

  private def be16(b: Array[Byte], p: Int): Int = (u(b(p)) << 8) | u(b(p + 1))

  /** Walk one JPEG blob. */
  def exifMeta(bytes: Array[Byte]): Either[String, ExifMeta] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try exifMetaWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def exifMetaWalk(bytes: Array[Byte]): Either[String, ExifMeta] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val n = bytes.length
    if (n < 2 || u(bytes(0)) != 0xFF || u(bytes(1)) != 0xD8)
      return Left("bad soi")
    var pos = 2
    var exif: ExifMeta = null
    var done = false
    while (!done) {
      if (n - pos < 2) return Left("truncated marker")
      if (u(bytes(pos)) != 0xFF) return Left("bad marker")
      val m = u(bytes(pos + 1))
      if (m == 0xD9) { // EOI
        done = true
        pos += 2
      } else if (m == 0xDA) { // SOS: entropy-coded data to EOI; stop here
        done = true
      } else if (m >= 0xD0 && m <= 0xD7) { // standalone RST
        pos += 2
      } else if (m == 0xFF) { // fill byte
        pos += 1
      } else {
        if (n - pos < 4) return Left("truncated segment")
        val len = be16(bytes, pos + 2)
        if (len < 2 || pos + 2 + len > n) return Left("truncated segment")
        if (m == 0xE1 && exif == null && len >= 2 + 6 + 8 &&
            bytes(pos + 4) == 'E' && bytes(pos + 5) == 'x' &&
            bytes(pos + 6) == 'i' && bytes(pos + 7) == 'f' &&
            bytes(pos + 8) == 0 && bytes(pos + 9) == 0) {
          exifParse(bytes, pos + 10, pos + 2 + len) match {
            case Left(e)  => return Left(e)
            case Right(x) => exif = x
          }
        }
        pos += 2 + len
      }
    }
    Right(if (exif != null) exif
          else ExifMeta(hasExif = false, byteOrderLE = false,
            None, None, None, None))
  }

  private def exifParse(b: Array[Byte], tiff: Int,
                        end: Int): Either[String, ExifMeta] = {
    if (end - tiff < 8) return Left("bad tiff header")
    val le =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return Left("bad tiff header")
    def r16(p: Int): Int =
      if (le) u(b(p)) | (u(b(p + 1)) << 8) else (u(b(p)) << 8) | u(b(p + 1))
    def r32(p: Int): Long = {
      if (le)
        (u(b(p)) | (u(b(p + 1)) << 8) | (u(b(p + 2)) << 16)).toLong |
          (u(b(p + 3)).toLong << 24)
      else
        (u(b(p + 3)) | (u(b(p + 2)) << 8) | (u(b(p + 1)) << 16)).toLong |
          (u(b(p)).toLong << 24)
    }
    if (r16(tiff + 2) != 42) return Left("bad tiff magic")
    val ifd0 = r32(tiff + 4)
    if (ifd0 < 8 || tiff + ifd0 + 2 > end) return Left("bad ifd offset")
    val ip = tiff + ifd0.toInt
    val count = r16(ip)
    if (ip + 2 + count * 12 + 4 > end) return Left("truncated ifd")
    var orientation: Option[Int] = None
    var width: Option[Long] = None
    var height: Option[Long] = None
    var i = 0
    while (i < count) {
      val ep = ip + 2 + i * 12
      val tag = r16(ep)
      val typ = r16(ep + 2)
      val cnt = r32(ep + 4)
      // SHORT (3) inline or LONG (4) inline, single value — the only
      // forms these three tags legally take (TIFF 6.0 §8)
      def value: Option[Long] =
        if (cnt != 1) None
        else if (typ == 3) Some(r16(ep + 8).toLong)
        else if (typ == 4) Some(r32(ep + 8))
        else None
      tag match {
        case 0x0112 => orientation = value.map(_.toInt)
          if (orientation.exists(v => v < 1 || v > 8))
            return Left("bad orientation value")
        case 0x0100 => width = value
        case 0x0101 => height = value
        case _ =>
      }
      i += 1
    }
    Right(ExifMeta(hasExif = true, byteOrderLE = le, orientation,
      width, height, Some(count)))
  }

  /** One row per blob: `(…keep…, has_exif, byte_order_le, orientation,
    * width, height, n_entries, ok, error)` — meta-pass convention
    * (error channel in-row, like [[Multimodal.decodeAudio]]).
    */
  def extractExif(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("has_exif", BooleanType, nullable = false),
        StructField("byte_order_le", BooleanType, nullable = false),
        StructField("orientation", IntegerType, nullable = true),
        StructField("width", LongType, nullable = true),
        StructField("height", LongType, nullable = true),
        StructField("n_entries", IntegerType, nullable = true),
        StructField("ok", BooleanType, nullable = false),
        StructField("error", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.map { r =>
        val res = exifMeta(r.getAs[Array[Byte]](idx))
        val arr = new Array[Any](nKeep + 8)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        res match {
          case Right(m) =>
            arr(nKeep) = m.hasExif; arr(nKeep + 1) = m.byteOrderLE
            arr(nKeep + 2) = m.orientation.orNull
            arr(nKeep + 3) = m.width.orNull
            arr(nKeep + 4) = m.height.orNull
            arr(nKeep + 5) = m.nEntries.orNull
            arr(nKeep + 6) = true; arr(nKeep + 7) = null
          case Left(e) =>
            arr(nKeep) = false; arr(nKeep + 1) = false
            arr(nKeep + 2) = null; arr(nKeep + 3) = null
            arr(nKeep + 4) = null; arr(nKeep + 5) = null
            arr(nKeep + 6) = false; arr(nKeep + 7) = e
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // fixture writer

  /** APP1 Exif segment bytes: TIFF IFD0 with width (LONG), height
    * (LONG), orientation (SHORT) in tag order, plus `extraTags`
    * unknown SHORT entries the parser must count but skip.
    */
  def exifApp1(le: Boolean, orientation: Int, width: Long, height: Long,
               extraTags: Int = 0): Array[Byte] = {
    val nEntries = 3 + extraTags
    val body = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { body.write(v & 0xFF); body.write((v >> 8) & 0xFF) }
      else { body.write((v >> 8) & 0xFF); body.write(v & 0xFF) }
    def w32(v: Long): Unit =
      if (le) {
        body.write((v & 0xFF).toInt); body.write(((v >> 8) & 0xFF).toInt)
        body.write(((v >> 16) & 0xFF).toInt); body.write(((v >> 24) & 0xFF).toInt)
      } else {
        body.write(((v >> 24) & 0xFF).toInt); body.write(((v >> 16) & 0xFF).toInt)
        body.write(((v >> 8) & 0xFF).toInt); body.write((v & 0xFF).toInt)
      }
    body.write(if (le) 'I' else 'M'); body.write(if (le) 'I' else 'M')
    w16(42)
    w32(8L) // IFD0 right after the header
    w16(nEntries)
    def entry(tag: Int, typ: Int, value: Long): Unit = {
      w16(tag); w16(typ); w32(1L)
      if (typ == 3) { w16(value.toInt); w16(0) } else w32(value)
    }
    entry(0x0100, 4, width)
    entry(0x0101, 4, height)
    entry(0x0112, 3, orientation)
    (0 until extraTags).foreach(k => entry(0x9000 + k, 3, (k + 1).toLong))
    w32(0L) // no next IFD
    val tiffBytes = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    val segLen = 2 + 6 + tiffBytes.length
    out.write(0xFF); out.write(0xE1)
    out.write((segLen >> 8) & 0xFF); out.write(segLen & 0xFF)
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    out.write(tiffBytes)
    out.toByteArray
  }

  /** Insert an APP1 segment right after an existing JPEG's SOI —
    * produces a REAL decodeable JPEG carrying EXIF.
    */
  def withExif(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xFF) == 0xFF &&
      (jpeg(1) & 0xFF) == 0xD8, "not a jpeg")
    val out = new Array[Byte](jpeg.length + app1.length)
    out(0) = jpeg(0); out(1) = jpeg(1)
    System.arraycopy(app1, 0, out, 2, app1.length)
    System.arraycopy(jpeg, 2, out, 2 + app1.length, jpeg.length - 2)
    out
  }
}
