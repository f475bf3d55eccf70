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
  def parquetFooterTable(bytes: Array[Byte]): Either[String, PqMeta] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try parquetFooterTableWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def parquetFooterTableWalk(bytes: Array[Byte]): Either[String, PqMeta] = {
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

  final case class PqColStat(rgIdx: Int, column: String, numValues: Long,
                             nullCount: Long, minV: Option[Long],
                             maxV: Option[Long])

  /** Per-column-chunk statistics from the footer (ColumnMetaData
    * field 12): num_values, null_count, and min_value/max_value
    * decoded as little-endian INT64 when 8 bytes wide (the physical
    * encoding Spark writes for LongType) — the zone-map layer a
    * 100 TB reader audits before trusting predicate pushdown to
    * someone else's files.
    */
  def parquetColumnStats(bytes: Array[Byte])
      : Either[String, Seq[PqColStat]] = {
    if (bytes == null || bytes.length < 12) return Left("too short")
    val n = bytes.length
    if (!(bytes(0) == 'P' && bytes(1) == 'A' && bytes(2) == 'R' &&
        bytes(3) == '1')) return Left("bad head magic")
    if (!(bytes(n - 4) == 'P' && bytes(n - 3) == 'A' && bytes(n - 2) == 'R' &&
        bytes(n - 1) == '1')) return Left("bad tail magic")
    val flen = (u(bytes(n - 8)) | (u(bytes(n - 7)) << 8) |
      (u(bytes(n - 6)) << 16) | (u(bytes(n - 5)) << 24)).toLong
    if (flen < 0 || flen > n - 12) return Left("footer length out of bounds")
    val c = new Cursor(bytes, n - 8 - flen.toInt, n - 8)
    val out = scala.collection.mutable.ArrayBuffer.empty[PqColStat]
    var rgIdx = 0
    try {
      walkStruct(c, 0) { (fid, tpe) =>
        if (fid == 4L && tpe == 9) { // row_groups
          val (cnt, et) = listHeader(c)
          if (et != 12) throw Walk("bad row group type")
          var i = 0L
          while (i < cnt) {
            walkStruct(c, 1) { (rfid, rtpe) =>
              if (rfid == 1L && rtpe == 9) { // columns
                val (ccnt, cet) = listHeader(c)
                if (cet != 12) throw Walk("bad column chunk type")
                var j = 0L
                while (j < ccnt) {
                  var colName: String = null
                  var numValues = -1L
                  var nullCount = -1L
                  var minV: Option[Long] = None
                  var maxV: Option[Long] = None
                  walkStruct(c, 2) { (cfid, ctpe) =>
                    if (cfid == 3L && ctpe == 12) { // ColumnMetaData
                      walkStruct(c, 3) { (mfid, mtpe) =>
                        (mfid, mtpe) match {
                          case (3L, 9) => // path_in_schema
                            val (pn, pet) = listHeader(c)
                            if (pet != 8) throw Walk("bad path type")
                            val parts = new Array[String](pn.toInt)
                            var k = 0L
                            while (k < pn) {
                              parts(k.toInt) = readBinary(c); k += 1
                            }
                            colName = parts.mkString(".")
                          case (5L, 6) => numValues = zig(c)
                          case (12L, 12) => // Statistics
                            walkStruct(c, 4) { (sfid, stpe) =>
                              (sfid, stpe) match {
                                case (3L, 6) => nullCount = zig(c)
                                case (5L, 8) => maxV = leI64Binary(c)
                                case (6L, 8) => minV = leI64Binary(c)
                                case (_, w) => skipValue(c, w, 5)
                              }
                            }
                          case (_, w) => skipValue(c, w, 4)
                        }
                      }
                    } else skipValue(c, ctpe, 3)
                  }
                  out += PqColStat(rgIdx, colName, numValues, nullCount,
                    minV, maxV)
                  j += 1
                }
              } else skipValue(c, rtpe, 2)
            }
            rgIdx += 1
            i += 1
          }
        } else skipValue(c, tpe, 0)
      }
    } catch {
      case Walk(m) => return Left(m)
      case _: ArrayIndexOutOfBoundsException => return Left("footer overrun")
    }
    Right(out.toSeq)
  }

  /** Read a binary stat field; decode as LE int64 when 8 bytes. */
  private def leI64Binary(c: Cursor): Option[Long] = {
    val len = varU(c)
    if (len < 0 || len > c.end - c.p) throw Walk("binary out of bounds")
    val r =
      if (len == 8L) {
        var v = 0L
        var i = 7
        while (i >= 0) { v = (v << 8) | u(c.b(c.p + i)); i -= 1 }
        Some(v)
      } else None
    c.p += len.toInt
    r
  }

  /** One row per column chunk: `(…keep…, rg_idx, column, num_values,
    * null_count, min_v, max_v)`.
    */
  def extractParquetColumnStats(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("rg_idx", IntegerType, nullable = false),
        StructField("column", StringType, nullable = true),
        StructField("num_values", LongType, nullable = false),
        StructField("null_count", LongType, nullable = false),
        StructField("min_v", LongType, nullable = true),
        StructField("max_v", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parquetColumnStats(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(stats) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            stats.iterator.map { s =>
              val arr = new Array[Any](nKeep + 6)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = s.rgIdx; arr(nKeep + 1) = s.column
              arr(nKeep + 2) = s.numValues; arr(nKeep + 3) = s.nullCount
              arr(nKeep + 4) = s.minV.map(Long.box).orNull
              arr(nKeep + 5) = s.maxV.map(Long.box).orNull
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
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
    def listOfStructs(id: Long, n: Int): Unit = listOf(id, n, 12)
    def listOf(id: Long, n: Int, elemType: Int): Unit = {
      header(id, 9)
      if (n < 15) out.write((n << 4) | elemType)
      else { out.write((15 << 4) | elemType); varu(n.toLong) }
    }
    def rawBinary(id: Long, b: Array[Byte]): Unit = {
      header(id, 8); varu(b.length.toLong); out.write(b, 0, b.length)
    }
    def stop(): Unit = out.write(0)
  }

  private def le8(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var x = v
    var i = 0
    while (i < 8) { b(i) = (x & 0xFF).toByte; x >>= 8; i += 1 }
    b
  }

  /** Like [[buildParquetBlob]] but each column chunk carries full
    * ColumnMetaData with `path_in_schema`, `num_values`, and a
    * Statistics struct (`null_count`, LE-int64 `min_value` /
    * `max_value`) — the zone-map fixture. `stats(g, c)` returns
    * (numValues, nullCount, min, max) for row group `g`, column `c`.
    */
  def buildParquetBlobStats(version: Int, columnNames: Seq[String],
                            rowGroupRows: Seq[Long],
                            createdBy: String, bodyLen: Int,
                            stats: (Int, Int) => (Long, Long, Long, Long))
      : Array[Byte] = {
    val w = new W
    w.i32(1, version.toLong)
    w.listOfStructs(2, 1 + columnNames.length)
    locally {
      val e = new W
      e.binary(4, "root")
      e.i32(5, columnNames.length.toLong)
      e.stop()
      w.out.write(e.out.toByteArray, 0, e.out.size())
    }
    columnNames.foreach { name =>
      val e = new W
      e.i32(1, 6L); e.i32(3, 1L); e.binary(4, name)
      e.stop()
      w.out.write(e.out.toByteArray, 0, e.out.size())
    }
    w.i64(3, rowGroupRows.sum)
    w.listOfStructs(4, rowGroupRows.length)
    rowGroupRows.zipWithIndex.foreach { case (rows, g) =>
      val rg = new W
      rg.listOfStructs(1, columnNames.length)
      columnNames.zipWithIndex.foreach { case (name, ci) =>
        val (nv, nc, mn, mx) = stats(g, ci)
        val cc = new W
        cc.i64(2, (ci * 100).toLong) // file_offset
        locally { // field 3: ColumnMetaData
          cc.header(3, 12)
          val md = new W
          md.listOf(3, 1, 8)
          md.varu(name.getBytes("UTF-8").length.toLong)
          md.out.write(name.getBytes("UTF-8"))
          md.i64(5, nv)
          locally { // field 12: Statistics
            md.header(12, 12)
            val st = new W
            st.i64(3, nc)
            st.rawBinary(5, le8(mx))
            st.rawBinary(6, le8(mn))
            st.stop()
            md.out.write(st.out.toByteArray, 0, st.out.size())
          }
          md.stop()
          cc.out.write(md.out.toByteArray, 0, md.out.size())
        }
        cc.stop()
        rg.out.write(cc.out.toByteArray, 0, cc.out.size())
      }
      rg.i64(2, 1000L + g)
      rg.i64(3, rows)
      rg.stop()
      w.out.write(rg.out.toByteArray, 0, rg.out.size())
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
