package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** ORC file-tail walk (Apache ORC specification, public) — the other
  * columnar shard next to [[ParquetMeta]]: 3-byte `ORC` head magic,
  * then at the tail `[metadata][footer][postscript][psLen: 1 byte]`.
  * The postscript (never compressed, ≤ 255 bytes, protobuf) carries
  * the footer length and compression kind and ends with its own `ORC`
  * magic; the footer (protobuf, chunk-compressed under the declared
  * codec) carries stripes, the type tree, and row counts.
  *
  * The chunk framing is ORC's own: a 3-byte little-endian header
  * `(chunkLen << 1) | isOriginal` per chunk — decompressed here with
  * raw deflate (ORC "ZLIB"), [[Snappy]] and the LZ4 BLOCK decoder
  * ([[Lz4.decodeRawBlock]]), all from-spec. LZO and ZSTD (no JDK /
  * from-spec decoder) are typed quarantine rejects.
  *
  * Strict and total: every length bounds-checked, the declared
  * `numberOfRows` is cross-checked against the stripe sum (the
  * [[ParquetMeta]] contract), and protobuf varints are width-capped.
  */
object Orc {

  final case class OrcMeta(compression: String, nStripes: Int,
                           nCols: Int, numRows: Long, contentLength: Long,
                           stripeRowsSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  private case class Walk(msg: String) extends Exception(msg)

  private final class Cur(val b: Array[Byte], var p: Int, val end: Int)

  private def varU(c: Cur): Long = {
    var v = 0L
    var shift = 0
    while (shift <= 63) {
      if (c.p >= c.end) throw Walk("truncated varint")
      val x = u(c.b(c.p)); c.p += 1
      v |= (x & 0x7FL) << shift
      if ((x & 0x80) == 0) return v
      shift += 7
    }
    throw Walk("oversized varint")
  }

  /** Iterate protobuf fields of `[from, end)`, calling
    * `f(fieldNo, wireType, cur)`; `f` must consume the value.
    */
  private def fields(c: Cur)(f: (Long, Int, Cur) => Unit): Unit = {
    while (c.p < c.end) {
      val key = varU(c)
      val wt = (key & 7).toInt
      val no = key >>> 3
      f(no, wt, c)
    }
  }

  private def skip(c: Cur, wt: Int): Unit = wt match {
    case 0 => varU(c)
    case 1 =>
      if (c.end - c.p < 8) throw Walk("truncated fixed64"); c.p += 8
    case 2 =>
      val len = varU(c)
      if (len < 0 || len > c.end - c.p) throw Walk("length out of bounds")
      c.p += len.toInt
    case 5 =>
      if (c.end - c.p < 4) throw Walk("truncated fixed32"); c.p += 4
    case _ => throw Walk("unsupported wire type")
  }

  private def lenDelimited(c: Cur): (Int, Int) = {
    val len = varU(c)
    if (len < 0 || len > c.end - c.p) throw Walk("length out of bounds")
    val r = (c.p, c.p + len.toInt)
    c.p += len.toInt
    r
  }

  private val codecNames = Map(0 -> "NONE", 1 -> "ZLIB", 2 -> "SNAPPY",
    3 -> "LZO", 4 -> "LZ4", 5 -> "ZSTD")

  /** Decompress an ORC chunk-framed stream. */
  private def dechunk(bytes: Array[Byte], from: Int, until: Int,
                      codec: Int, maxOut: Long): Array[Byte] = {
    if (codec == 0)
      return java.util.Arrays.copyOfRange(bytes, from, until)
    val out = new java.io.ByteArrayOutputStream()
    var p = from
    while (p < until) {
      if (until - p < 3) throw Walk("truncated chunk header")
      val h = u(bytes(p)) | (u(bytes(p + 1)) << 8) | (u(bytes(p + 2)) << 16)
      p += 3
      val isOriginal = (h & 1) == 1
      val clen = h >>> 1
      if (clen > until - p) throw Walk("chunk out of bounds")
      if (isOriginal) {
        if (out.size.toLong + clen > maxOut) throw Walk("decompress cap")
        out.write(bytes, p, clen)
      } else codec match {
        case 1 => // ORC "ZLIB" is raw deflate
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(bytes, p, clen)
          val buf = new Array[Byte](8192)
          try {
            while (!inf.finished()) {
              val got =
                try inf.inflate(buf)
                catch { case _: java.util.zip.DataFormatException =>
                  throw Walk("bad deflate chunk") }
              if (got == 0 && !inf.finished())
                throw Walk("bad deflate chunk")
              if (out.size.toLong + got > maxOut) throw Walk("decompress cap")
              out.write(buf, 0, got)
            }
          } finally inf.end()
        case 2 =>
          Snappy.decode(bytes, p, p + clen, maxOut - out.size) match {
            case Left(e) => throw Walk(e)
            case Right(d) => out.write(d, 0, d.length)
          }
        case 4 =>
          Lz4.decodeRawBlock(bytes, p, p + clen, maxOut - out.size) match {
            case Left(e) => throw Walk(e)
            case Right(d) => out.write(d, 0, d.length)
          }
        case _ => throw Walk("unsupported compression")
      }
      p += clen
    }
    out.toByteArray
  }

  /** Parse one ORC blob's tail. */
  def orcFooterTable(bytes: Array[Byte],
                     maxDecode: Long = 16L << 20): Either[String, OrcMeta] = {
    if (bytes == null || bytes.length < 8) return Left("too short")
    if (!(bytes(0) == 'O' && bytes(1) == 'R' && bytes(2) == 'C'))
      return Left("bad head magic")
    val n = bytes.length
    val psLen = u(bytes(n - 1))
    if (psLen < 4 || psLen > n - 4) return Left("bad postscript length")
    val psStart = n - 1 - psLen
    try {
      var footerLen = -1L
      var codec = 0
      var sawMagic = false
      val pc = new Cur(bytes, psStart, n - 1)
      fields(pc) { (no, wt, c) =>
        (no, wt) match {
          case (1L, 0) => footerLen = varU(c)
          case (2L, 0) => codec = varU(c).toInt
          case (8000L, 2) =>
            val (a, b) = lenDelimited(c)
            sawMagic = b - a == 3 && bytes(a) == 'O' && bytes(a + 1) == 'R' &&
              bytes(a + 2) == 'C'
            if (!sawMagic) throw Walk("bad postscript magic")
          case (_, w) => skip(c, w)
        }
      }
      if (!sawMagic) return Left("missing postscript magic")
      if (footerLen < 0) return Left("missing footer length")
      if (!codecNames.contains(codec)) return Left("unknown compression")
      if (codec == 3 || codec == 5) return Left("unsupported compression")
      if (footerLen > psStart - 3) return Left("footer out of bounds")
      val fStart = psStart - footerLen.toInt
      val footer = dechunk(bytes, fStart, psStart, codec, maxDecode)
      // footer protobuf: 2 contentLength, 3 stripes, 4 types, 6 numberOfRows
      var contentLength = 0L
      var numRows = -1L
      var nStripes = 0
      var stripeRows = 0L
      var nCols = 0
      var sawRootType = false
      val fc = new Cur(footer, 0, footer.length)
      fields(fc) { (no, wt, c) =>
        (no, wt) match {
          case (2L, 0) => contentLength = varU(c)
          case (3L, 2) =>
            val (a, b) = lenDelimited(c)
            nStripes += 1
            val sc = new Cur(footer, a, b)
            fields(sc) { (sno, swt, s) =>
              if (sno == 5L && swt == 0) stripeRows += varU(s)
              else skip(s, swt)
            }
          case (4L, 2) =>
            val (a, b) = lenDelimited(c)
            if (!sawRootType) {
              // root type: count its subtypes (field 2, packed or not)
              sawRootType = true
              val tc = new Cur(footer, a, b)
              fields(tc) { (tno, twt, t) =>
                if (tno == 2L && twt == 2) {
                  val (sa, sb) = lenDelimited(t)
                  val pc2 = new Cur(footer, sa, sb)
                  while (pc2.p < pc2.end) { varU(pc2); nCols += 1 }
                } else if (tno == 2L && twt == 0) { varU(t); nCols += 1 }
                else skip(t, twt)
              }
            }
          case (6L, 0) => numRows = varU(c)
          case (_, w) => skip(c, w)
        }
      }
      if (numRows < 0) return Left("missing row count")
      if (nStripes > 0 && stripeRows != numRows)
        return Left("row count mismatch")
      Right(OrcMeta(codecNames(codec), nStripes, nCols, numRows,
        contentLength, stripeRows))
    } catch {
      case Walk(m) => Left(m)
      case _: ArrayIndexOutOfBoundsException => Left("tail overrun")
    }
  }

  /** One row per blob: `(…keep…, compression, n_stripes, n_cols,
    * num_rows, content_length)`.
    */
  def extractOrcMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("compression", StringType, nullable = false),
        StructField("n_stripes", IntegerType, nullable = false),
        StructField("n_cols", IntegerType, nullable = false),
        StructField("num_rows", LongType, nullable = false),
        StructField("content_length", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        orcFooterTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(m) =>
            val arr = new Array[Any](nKeep + 5)
            var i = 0
            while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
            arr(nKeep) = m.compression; arr(nKeep + 1) = m.nStripes
            arr(nKeep + 2) = m.nCols; arr(nKeep + 3) = m.numRows
            arr(nKeep + 4) = m.contentLength
            Iterator.single(Row.fromSeq(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(arr)))
        }
      }
    }(enc)
  }

  /** Error channel: `(…keep…, error)`. */
  def orcErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("error", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        orcFooterTable(r.getAs[Array[Byte]](idx)) match {
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

  private def wVarint(out: java.io.ByteArrayOutputStream, no: Int,
                      v: Long): Unit = {
    wKey(out, no, 0); wVar(out, v)
  }
  private def wKey(out: java.io.ByteArrayOutputStream, no: Int,
                   wt: Int): Unit = wVar(out, (no.toLong << 3) | wt)
  private def wVar(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def wBytes(out: java.io.ByteArrayOutputStream, no: Int,
                     b: Array[Byte]): Unit = {
    wKey(out, no, 2); wVar(out, b.length.toLong); out.write(b, 0, b.length)
  }

  /** Chunk-compress a stream under the ORC framing. `codec`: 0 NONE,
    * 1 ZLIB (raw deflate), 2 SNAPPY, 4 LZ4 (block). `chunkEvery`
    * splits the input to exercise multi-chunk reassembly; chunks
    * whose compressed form would not shrink are written `isOriginal`.
    */
  def chunkCompress(data: Array[Byte], codec: Int,
                    chunkEvery: Int = 1 << 14): Array[Byte] = {
    if (codec == 0) return data
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < data.length || (data.isEmpty && off == 0)) {
      val len = math.min(chunkEvery, data.length - off)
      val comp: Array[Byte] = codec match {
        case 1 =>
          val d = new java.util.zip.Deflater(6, true)
          d.setInput(data, off, len); d.finish()
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end()
          bos.toByteArray
        case 2 =>
          Snappy.encodeLiteral(java.util.Arrays.copyOfRange(
            data, off, off + len))
        case 4 =>
          // literal-only lz4 block
          Lz4.buildLz4Block(Seq(Lz4.Lit(java.util.Arrays.copyOfRange(
            data, off, off + len))))
        case _ => throw new IllegalArgumentException("codec")
      }
      val (payload, original) =
        if (comp.length < len) (comp, false)
        else (java.util.Arrays.copyOfRange(data, off, off + len), true)
      val h = (payload.length << 1) | (if (original) 1 else 0)
      out.write(h & 0xFF); out.write((h >> 8) & 0xFF); out.write((h >> 16) & 0xFF)
      out.write(payload, 0, payload.length)
      off += len
      if (data.isEmpty) return out.toByteArray
    }
    out.toByteArray
  }

  /** Build an ORC blob: head magic + filler body, a footer with
    * `nCols` top-level columns and the given per-stripe row counts,
    * chunk-compressed under `codec`, and a postscript.
    */
  def buildOrc(codec: Int, nCols: Int, stripeRows: Seq[Long],
               contentLength: Long, bodyLen: Int,
               chunkEvery: Int = 1 << 14): Array[Byte] = {
    val footer = new java.io.ByteArrayOutputStream()
    wVarint(footer, 1, 16L) // headerLength
    wVarint(footer, 2, contentLength)
    stripeRows.zipWithIndex.foreach { case (rows, i) =>
      val s = new java.io.ByteArrayOutputStream()
      wVarint(s, 1, 16L + i * 100L) // offset
      wVarint(s, 2, 10L)            // indexLength
      wVarint(s, 3, 80L + i)        // dataLength
      wVarint(s, 4, 20L)            // footerLength
      wVarint(s, 5, rows)           // numberOfRows
      wBytes(footer, 3, s.toByteArray)
    }
    // types: root struct with packed subtypes [1..nCols], then leaves
    locally {
      val root = new java.io.ByteArrayOutputStream()
      wVarint(root, 1, 12L) // kind = STRUCT
      val packed = new java.io.ByteArrayOutputStream()
      (1 to nCols).foreach(i => wVar(packed, i.toLong))
      wBytes(root, 2, packed.toByteArray)
      (0 until nCols).foreach { i =>
        wBytes(root, 3, s"c$i".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      }
      wBytes(footer, 4, root.toByteArray)
    }
    (0 until nCols).foreach { _ =>
      val leaf = new java.io.ByteArrayOutputStream()
      wVarint(leaf, 1, 4L) // kind = LONG
      wBytes(footer, 4, leaf.toByteArray)
    }
    wVarint(footer, 6, stripeRows.sum)
    wVarint(footer, 8, 10000L) // rowIndexStride
    val footerBytes = chunkCompress(footer.toByteArray, codec, chunkEvery)
    val ps = new java.io.ByteArrayOutputStream()
    wVarint(ps, 1, footerBytes.length.toLong)
    wVarint(ps, 2, codec.toLong)
    wVarint(ps, 3, (1L << 18))
    wVarint(ps, 6, 1L) // writerVersion
    wBytes(ps, 8000, "ORC".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val psBytes = ps.toByteArray
    require(psBytes.length <= 255, "postscript too long")
    val out = new java.io.ByteArrayOutputStream()
    out.write('O'); out.write('R'); out.write('C')
    out.write(new Array[Byte](bodyLen), 0, bodyLen)
    out.write(footerBytes, 0, footerBytes.length)
    out.write(psBytes, 0, psBytes.length)
    out.write(psBytes.length)
    out.toByteArray
  }
}
