package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Parquet footer walk (Apache Parquet file format + Thrift compact
  * protocol — both public specifications): reads the FileMetaData
  * struct straight from a blob's tail WITHOUT any Parquet library —
  * the shard-integrity triage a 100 TB ingest runs before trusting a
  * file to a real reader (both magics present? footer length sane?
  * does the declared num_rows match the row-group sum?). The walk is
  * schema-free at the Thrift layer (the [[ProtoWire]] discipline, for
  * the compact protocol): unknown/optional fields of any type are
  * skipped structurally, so footers written by any producer (Spark,
  * parquet-mr, arrow) walk cleanly — pinned by an interop spec over a
  * footer Spark itself wrote.
  *
  * Strict and total: varints are width-capped, every length is
  * bounds-checked, recursion depth is bounded (a crafted
  * deeply-nested struct cannot stack-overflow an executor), and the
  * declared-vs-summed row count mismatch is a typed reject.
  */
object ParquetMeta {

  final case class PqMeta(version: Int, numRows: Long, nRowGroups: Int,
                          nColumns: Int, totalBytes: Long,
                          createdBy: String)

  private def u(b: Byte): Int = b & 0xFF

  private final class Cursor(val b: Array[Byte], var p: Int, val end: Int)

  private def varU(c: Cursor): Long = {
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

  private def zig(c: Cursor): Long = { val v = varU(c); (v >>> 1) ^ -(v & 1) }

  private case class Walk(msg: String) extends Exception(msg)

  /** Skip one compact-protocol value of `tpe`; recursion bounded. */
  private def skipValue(c: Cursor, tpe: Int, depth: Int): Unit = {
    if (depth > 32) throw Walk("nesting too deep")
    tpe match {
      case 1 | 2 => // bool true/false encoded in the field header
      case 3 => if (c.p >= c.end) throw Walk("truncated byte"); c.p += 1
      case 4 | 5 | 6 => zig(c)
      case 7 =>
        if (c.end - c.p < 8) throw Walk("truncated double"); c.p += 8
      case 8 =>
        val len = varU(c)
        if (len < 0 || len > c.end - c.p) throw Walk("binary out of bounds")
        c.p += len.toInt
      case 9 | 10 =>
        val (n, et) = listHeader(c)
        var i = 0L
        while (i < n) { skipValue(c, et, depth + 1); i += 1 }
      case 11 =>
        if (c.p >= c.end) throw Walk("truncated map header")
        val first = u(c.b(c.p))
        if (first == 0) { c.p += 1 }
        else {
          val n = varU(c)
          if (c.p >= c.end) throw Walk("truncated map types")
          val kt = (u(c.b(c.p)) >> 4) & 0xF
          val vt = u(c.b(c.p)) & 0xF
          c.p += 1
          var i = 0L
          while (i < n) {
            skipValue(c, kt, depth + 1); skipValue(c, vt, depth + 1)
            i += 1
          }
        }
      case 12 => skipStruct(c, depth + 1)
      case _ => throw Walk("unknown thrift type")
    }
  }

  private def listHeader(c: Cursor): (Long, Int) = {
    if (c.p >= c.end) throw Walk("truncated list header")
    val h = u(c.b(c.p)); c.p += 1
    val et = h & 0xF
    val sz = (h >> 4) & 0xF
    val n = if (sz == 15) varU(c) else sz.toLong
    if (n < 0 || n > c.end - c.p) throw Walk("list size out of bounds")
    (n, et)
  }

  private def skipStruct(c: Cursor, depth: Int): Unit = {
    if (depth > 32) throw Walk("nesting too deep")
    var lastId = 0L
    var stop = false
    while (!stop) {
      if (c.p >= c.end) throw Walk("truncated struct")
      val h = u(c.b(c.p)); c.p += 1
      if (h == 0) stop = true
      else {
        val delta = (h >> 4) & 0xF
        val tpe = h & 0xF
        lastId = if (delta != 0) lastId + delta else zig(c)
        skipValue(c, tpe, depth)
      }
    }
  }

  /** Iterate a struct's fields, calling `f(fieldId, typeId)`; `f`
    * must consume the value (or call [[skipValue]] via the cursor).
    */
  private def walkStruct(c: Cursor, depth: Int)
                        (f: (Long, Int) => Unit): Unit = {
    var lastId = 0L
    var stop = false
    while (!stop) {
      if (c.p >= c.end) throw Walk("truncated struct")
      val h = u(c.b(c.p)); c.p += 1
      if (h == 0) stop = true
      else {
        val delta = (h >> 4) & 0xF
        val tpe = h & 0xF
        lastId = if (delta != 0) lastId + delta else zig(c)
        f(lastId, tpe)
      }
    }
  }

  private def readBinary(c: Cursor): String = {
    val len = varU(c)
    if (len < 0 || len > c.end - c.p) throw Walk("binary out of bounds")
    val s = new String(c.b, c.p, len.toInt,
      java.nio.charset.StandardCharsets.UTF_8)
    c.p += len.toInt
    s
  }

  /** Parse the footer of one Parquet blob. */
  def parquetFooterTable(bytes: Array[Byte]): Either[String, PqMeta] = {
    if (bytes == null || bytes.length < 12) return Left("too short")
    val n = bytes.length
    if (!(bytes(0) == 'P' && bytes(1) == 'A' && bytes(2) == 'R' &&
        bytes(3) == '1')) return Left("bad head magic")
    if (!(bytes(n - 4) == 'P' && bytes(n - 3) == 'A' && bytes(n - 2) == 'R' &&
        bytes(n - 1) == '1')) return Left("bad tail magic")
    val flen = (u(bytes(n - 8)) | (u(bytes(n - 7)) << 8) |
      (u(bytes(n - 6)) << 16) | (u(bytes(n - 5)) << 24)).toLong
    if (flen < 0 || flen > n - 12) return Left("footer length out of bounds")
    val start = n - 8 - flen.toInt
    val c = new Cursor(bytes, start, n - 8)
    var version = 0
    var numRows = -1L
    var nRowGroups = 0
    var nColumns = 0
    var totalBytes = 0L
    var rgRows = 0L
    var createdBy: String = null
    try {
      walkStruct(c, 0) { (fid, tpe) =>
        (fid, tpe) match {
          case (1L, 5) => version = zig(c).toInt
          case (2L, 9) => // schema: list<SchemaElement>; leaves have a type
            val (cnt, et) = listHeader(c)
            if (et != 12) throw Walk("bad schema element type")
            var i = 0L
            while (i < cnt) {
              var isLeaf = false
              walkStruct(c, 1) { (sfid, stpe) =>
                if (sfid == 1L) isLeaf = true // field 1 'type' set ⇒ leaf
                skipValue(c, stpe, 1)
              }
              if (isLeaf) nColumns += 1
              i += 1
            }
          case (3L, 6) => numRows = zig(c)
          case (4L, 9) => // row_groups
            val (cnt, et) = listHeader(c)
            if (et != 12) throw Walk("bad row group type")
            nRowGroups = cnt.toInt
            var i = 0L
            while (i < cnt) {
              walkStruct(c, 1) { (rfid, rtpe) =>
                (rfid, rtpe) match {
                  case (2L, 6) => totalBytes += zig(c)
                  case (3L, 6) => rgRows += zig(c)
                  case _ => skipValue(c, rtpe, 1)
                }
              }
              i += 1
            }
          case (6L, 8) => createdBy = readBinary(c)
          case _ => skipValue(c, tpe, 0)
        }
      }
    } catch {
      case Walk(m) => return Left(m)
      case _: ArrayIndexOutOfBoundsException => return Left("footer overrun")
    }
    if (c.p != n - 8) return Left("footer length mismatch")
    if (numRows < 0) return Left("missing num_rows")
    if (nRowGroups > 0 && rgRows != numRows)
      return Left("row count mismatch")
    Right(PqMeta(version, numRows, nRowGroups, nColumns, totalBytes,
      createdBy))
  }

  /** One row per blob: `(…keep…, version, num_rows, n_row_groups,
    * n_columns, total_bytes, created_by)`. Poison blobs yield zero
    * rows; [[parquetErrors]] is the error channel.
    */
  def extractParquetMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("version", IntegerType, nullable = false),
        StructField("num_rows", LongType, nullable = false),
        StructField("n_row_groups", IntegerType, nullable = false),
        StructField("n_columns", IntegerType, nullable = false),
        StructField("total_bytes", LongType, nullable = false),
        StructField("created_by", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parquetFooterTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(m) =>
            val arr = new Array[Any](nKeep + 6)
            var i = 0
            while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
            arr(nKeep) = m.version; arr(nKeep + 1) = m.numRows
            arr(nKeep + 2) = m.nRowGroups; arr(nKeep + 3) = m.nColumns
            arr(nKeep + 4) = m.totalBytes; arr(nKeep + 5) = m.createdBy
            Iterator.single(Row.fromSeq(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(arr)))
        }
      }
    }(enc)
  }

  /** Error channel: `(…keep…, error)`. */
  def parquetErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("error", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parquetFooterTable(r.getAs[Array[Byte]](idx)) match {
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
  // Fixture writer (Thrift compact encode of a minimal FileMetaData)

  private final class W {
    val out = new java.io.ByteArrayOutputStream()
    var lastId = 0L
    def header(id: Long, tpe: Int): Unit = {
      val delta = id - lastId
      if (delta >= 1 && delta <= 15) out.write((delta.toInt << 4) | tpe)
      else { out.write(tpe); zig(id) }
      lastId = id
    }
    def zig(v: Long): Unit = varu((v << 1) ^ (v >> 63))
    def varu(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def i32(id: Long, v: Long): Unit = { header(id, 5); zig(v) }
    def i64(id: Long, v: Long): Unit = { header(id, 6); zig(v) }
    def binary(id: Long, s: String): Unit = {
      header(id, 8)
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      varu(b.length.toLong); out.write(b, 0, b.length)
    }
    def listOfStructs(id: Long, n: Int): Unit = {
      header(id, 9)
      if (n < 15) out.write((n << 4) | 12)
      else { out.write((15 << 4) | 12); varu(n.toLong) }
    }
    def stop(): Unit = out.write(0)
  }

  /** A minimal, spec-conformant Parquet blob: head magic, `bodyLen`
    * filler bytes, a FileMetaData footer (version, schema of
    * `columnNames.length` leaves under a root, row groups whose
    * num_rows sum to `rowGroupRows.sum`), footer length, tail magic.
    */
  def buildParquetBlob(version: Int, columnNames: Seq[String],
                       rowGroupRows: Seq[Long],
                       rowGroupBytes: Seq[Long],
                       createdBy: String, bodyLen: Int): Array[Byte] = {
    val w = new W
    w.i32(1, version.toLong)
    // field 2: schema list (root + leaves)
    w.listOfStructs(2, 1 + columnNames.length)
    locally { // root element: name + num_children
      val e = new W
      e.binary(4, "root")
      e.i32(5, columnNames.length.toLong)
      e.stop()
      w.out.write(e.out.toByteArray, 0, e.out.size())
    }
    columnNames.foreach { name =>
      val e = new W
      e.i32(1, 6L) // type = BYTE_ARRAY: presence marks a leaf
      e.i32(3, 1L) // repetition_type
      e.binary(4, name)
      e.stop()
      w.out.write(e.out.toByteArray, 0, e.out.size())
    }
    w.i64(3, rowGroupRows.sum)
    w.listOfStructs(4, rowGroupRows.length)
    rowGroupRows.zip(rowGroupBytes).foreach { case (rows, tb) =>
      val g = new W
      // field 1: columns — one ColumnChunk per leaf with file_offset
      g.listOfStructs(1, columnNames.length)
      columnNames.indices.foreach { i =>
        val cc = new W
        cc.i64(2, (i * 100).toLong)
        cc.stop()
        g.out.write(cc.out.toByteArray, 0, cc.out.size())
      }
      g.i64(2, tb)
      g.i64(3, rows)
      g.stop()
      w.out.write(g.out.toByteArray, 0, g.out.size())
    }
    w.binary(6, createdBy)
    w.stop()
    val footer = w.out.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write('P'); out.write('A'); out.write('R'); out.write('1')
    out.write(new Array[Byte](bodyLen), 0, bodyLen)
    out.write(footer, 0, footer.length)
    val fl = footer.length
    out.write(fl & 0xFF); out.write((fl >> 8) & 0xFF)
    out.write((fl >> 16) & 0xFF); out.write((fl >> 24) & 0xFF)
    out.write('P'); out.write('A'); out.write('R'); out.write('1')
    out.toByteArray
  }
}
