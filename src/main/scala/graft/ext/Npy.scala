package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** NumPy `.npy` array ingest (the NumPy NEP-1 `.npy` format, public
  * spec) — the other tensor sidecar a data pipeline meets next to
  * [[SafeTensors]]: precomputed embeddings, token-id arrays, and
  * label vectors routinely ship as `.npy` / `.npz` (a ZIP of `.npy`
  * members — [[ZipArchive.extractZipPayloads]] composes).
  *
  * Format: magic `\x93NUMPY`, version (1.x: 2-byte LE header length;
  * 2.x/3.x: 4-byte), a Python-dict-literal header
  * `{'descr': '<i4', 'fortran_order': False, 'shape': (3, 4), }`,
  * then raw elements. The header dict is parsed by a strict
  * tokenizer (exactly the three spec keys, any order), and integer
  * arrays are DECODED (little-endian, signed/unsigned, 1/2/4/8-byte
  * widths) so `elem_sum` pins byte-exact endianness handling — a
  * big-endian or wrong-width reader fails the sum. Float arrays
  * surface `byte_sum` only (no float arithmetic in oracles).
  *
  * Strict and total: header length bounds-checked before allocation,
  * the data region must be EXACTLY `product(shape) · itemsize`, and
  * unsupported descr (big-endian, structured dtypes, objects) are
  * typed quarantine rejects.
  */
object Npy {

  final case class NpyMeta(descr: String, fortran: Boolean, ndim: Int,
                           shape0: Long, shape1: Long, nElems: Long,
                           elemSum: Option[Long], byteSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  private val itemSizes: Map[String, Int] = Map(
    "|u1" -> 1, "|i1" -> 1, "|b1" -> 1,
    "<i2" -> 2, "<u2" -> 2, "<i4" -> 4, "<u4" -> 4,
    "<i8" -> 8, "<u8" -> 8, "<f4" -> 4, "<f8" -> 8)

  private def isInt(descr: String): Boolean =
    descr != "<f4" && descr != "<f8"

  /** Parse one `.npy` blob. */
  def npyTable(bytes: Array[Byte], maxHeader: Int = 1 << 20)
      : Either[String, NpyMeta] = {
    if (bytes == null || bytes.length < 10) return Left("too short")
    if (u(bytes(0)) != 0x93 || bytes(1) != 'N' || bytes(2) != 'U' ||
        bytes(3) != 'M' || bytes(4) != 'P' || bytes(5) != 'Y')
      return Left("bad magic")
    val major = u(bytes(6))
    if (major < 1 || major > 3) return Left("unsupported npy version")
    var p = 8
    val hlen: Long =
      if (major == 1) { (u(bytes(8)) | (u(bytes(9)) << 8)).toLong }
      else {
        if (bytes.length < 12) return Left("too short")
        p = 10
        (u(bytes(8)) | (u(bytes(9)) << 8) | (u(bytes(10)) << 16)).toLong |
          (u(bytes(11)).toLong << 24)
      }
    val hstart = if (major == 1) 10 else 12
    if (hlen > maxHeader) return Left("header length cap")
    if (hlen > bytes.length - hstart) return Left("header out of bounds")
    val header = new String(bytes, hstart, hlen.toInt,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // strict dict-literal parse: the three spec keys in any order
    var descr: String = null
    var fortran: Option[Boolean] = None
    var shape: Seq[Long] = null
    val t = header.trim
    if (!t.startsWith("{") || !t.endsWith("}")) return Left("bad header dict")
    var body = t.substring(1, t.length - 1).trim
    while (body.nonEmpty) {
      if (body.charAt(0) == ',') { body = body.substring(1).trim }
      else {
        if (body.charAt(0) != '\'') return Left("bad header dict")
        val ke = body.indexOf('\'', 1)
        if (ke < 0) return Left("bad header dict")
        val key = body.substring(1, ke)
        body = body.substring(ke + 1).trim
        if (body.isEmpty || body.charAt(0) != ':')
          return Left("bad header dict")
        body = body.substring(1).trim
        key match {
          case "descr" =>
            if (body.isEmpty || body.charAt(0) != '\'')
              return Left("bad header dict")
            val ve = body.indexOf('\'', 1)
            if (ve < 0) return Left("bad header dict")
            descr = body.substring(1, ve)
            body = body.substring(ve + 1).trim
          case "fortran_order" =>
            if (body.startsWith("False")) {
              fortran = Some(false); body = body.substring(5).trim
            } else if (body.startsWith("True")) {
              fortran = Some(true); body = body.substring(4).trim
            } else return Left("bad header dict")
          case "shape" =>
            if (body.isEmpty || body.charAt(0) != '(')
              return Left("bad header dict")
            val ve = body.indexOf(')')
            if (ve < 0) return Left("bad header dict")
            val inner = body.substring(1, ve).trim
            shape =
              if (inner.isEmpty) Seq.empty
              else inner.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
                .map { s =>
                  if (!s.forall(_.isDigit) || s.length > 18)
                    return Left("bad shape literal")
                  s.toLong
                }
            body = body.substring(ve + 1).trim
          case _ => return Left("unknown header key")
        }
      }
    }
    if (descr == null || fortran.isEmpty || shape == null)
      return Left("missing header key")
    val isize = itemSizes.get(descr) match {
      case Some(v) => v
      case None => return Left("unsupported descr")
    }
    var nElems = 1L
    shape.foreach { d =>
      if (d != 0 && nElems > Long.MaxValue / math.max(d, 1L))
        return Left("shape overflow")
      nElems *= d
    }
    val dataStart = hstart + hlen.toInt
    val dataLen = (bytes.length - dataStart).toLong
    if (nElems * isize != dataLen) return Left("data size mismatch")
    var byteSum = 0L
    var i = dataStart
    while (i < bytes.length) { byteSum += u(bytes(i)); i += 1 }
    val elemSum: Option[Long] =
      if (!isInt(descr)) None
      else {
        var sum = 0L
        var p2 = dataStart
        val signed = descr.charAt(1) == 'i' || descr == "|b1"
        while (p2 < bytes.length) {
          var v = 0L
          var k = isize - 1
          while (k >= 0) { v = (v << 8) | u(bytes(p2 + k)); k -= 1 }
          if (signed && isize < 8) {
            val shift = 64 - isize * 8
            v = (v << shift) >> shift
          }
          sum += v
          p2 += isize
        }
        Some(sum)
      }
    Right(NpyMeta(descr, fortran.get, shape.length,
      if (shape.nonEmpty) shape.head else -1L,
      if (shape.length > 1) shape(1) else -1L,
      nElems, elemSum, byteSum))
  }

  /** One row per blob: `(…keep…, descr, fortran, ndim, shape0, shape1,
    * n_elems, elem_sum, byte_sum)`. Poison blobs yield zero rows;
    * [[npyErrors]] is the error channel.
    */
  def extractNpyMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("descr", StringType, nullable = false),
        StructField("fortran", BooleanType, nullable = false),
        StructField("ndim", IntegerType, nullable = false),
        StructField("shape0", LongType, nullable = false),
        StructField("shape1", LongType, nullable = false),
        StructField("n_elems", LongType, nullable = false),
        StructField("elem_sum", LongType, nullable = true),
        StructField("byte_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        npyTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(m) =>
            val arr = new Array[Any](nKeep + 8)
            var i = 0
            while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
            arr(nKeep) = m.descr; arr(nKeep + 1) = m.fortran
            arr(nKeep + 2) = m.ndim; arr(nKeep + 3) = m.shape0
            arr(nKeep + 4) = m.shape1; arr(nKeep + 5) = m.nElems
            arr(nKeep + 6) = m.elemSum.map(Long.box).orNull
            arr(nKeep + 7) = m.byteSum
            Iterator.single(Row.fromSeq(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(arr)))
        }
      }
    }(enc)
  }

  /** Error channel: `(…keep…, error)`. */
  def npyErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("error", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        npyTable(r.getAs[Array[Byte]](idx)) match {
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

  /** Build a `.npy` blob of integer elements (LE, width per `descr`),
    * v1 header padded to a 64-byte boundary with spaces + '\n' the
    * way NumPy writes it.
    */
  def buildNpy(descr: String, shape: Seq[Long], values: Seq[Long],
               fortran: Boolean = false, version: Int = 1): Array[Byte] = {
    val isize = itemSizes(descr)
    require(values.length.toLong == shape.product || shape.isEmpty &&
      values.length == 1, "values must fill the shape")
    val dict = s"{'descr': '$descr', 'fortran_order': " +
      s"${if (fortran) "True" else "False"}, 'shape': " +
      s"(${shape.mkString(", ")}${if (shape.length == 1) "," else ""}), }"
    val lenFieldLen = if (version == 1) 2 else 4
    val base = 8 + lenFieldLen + dict.length
    val pad = (64 - (base + 1) % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x93); out.write('N'); out.write('U'); out.write('M')
    out.write('P'); out.write('Y')
    out.write(version); out.write(0)
    val hl = header.length
    out.write(hl & 0xFF); out.write((hl >> 8) & 0xFF)
    if (version > 1) { out.write((hl >> 16) & 0xFF); out.write((hl >> 24) & 0xFF) }
    out.write(header.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    values.foreach { v =>
      var x = v
      var k = 0
      while (k < isize) { out.write((x & 0xFF).toInt); x >>= 8; k += 1 }
    }
    out.toByteArray
  }
}
