package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Arrow IPC file (Feather V2) structural walk — the fourth columnar
  * shard format after Parquet/ORC/Avro (round-12 verdict ask #6):
  * ML pipelines dump precomputed datasets as `.arrow`/`.feather`
  * files, and a shard-triage tier must classify and size them without
  * a full read. Library-free, like every walk in this package: the
  * flatbuffers envelope is read with a minimal bounds-checked
  * flatbuffer cursor (vtable-indirected tables, offset vectors,
  * structs), the [[ParquetMeta]] structural-skip discipline applied to
  * Arrow's metadata encoding.
  *
  * Layout walked (Arrow columnar format spec, File variant):
  * 8-byte head magic `ARROW1\0\0`; encapsulated messages; a FOOTER
  * flatbuffer (schema + record-batch/dictionary Block arrays) followed
  * by int32 footer length and the 6-byte tail magic. Each Block's
  * message is re-read and cross-checked against the footer (kind must
  * be RecordBatch, body length must agree) — a forged footer is a
  * typed reject, not a silent misparse.
  *
  * Strict and total: every flatbuffer access is bounds-checked, field
  * and batch counts are capped, poison blobs yield typed Lefts
  * ([[arrowErrors]]). 100 TB shape: the walk reads ONLY metadata
  * regions (footer + per-batch headers), never buffer bodies — cost
  * per blob is O(schema + batches), not O(data).
  */
object ArrowIpc {

  private val MaxFields = 4096
  private val MaxBatches = 100000

  private final case class Walk(msg: String)
    extends RuntimeException(msg, null, false, false)
  private def fail(msg: String): Nothing = throw Walk(msg)

  // ------------------------------------------------ flatbuffer cursor

  /** Bounds-checked little-endian reads over one flatbuffer region. */
  private final class Fb(b: Array[Byte], lo: Int, hi: Int) {
    private def chk(p: Int, w: Int): Unit =
      if (p < lo || w > hi - p) fail("flatbuffer out of bounds")
    def u8(p: Int): Int = { chk(p, 1); b(p) & 0xFF }
    def i16(p: Int): Int = { chk(p, 2); (b(p) & 0xFF) | (b(p + 1) << 8) }
    def u16(p: Int): Int = i16(p) & 0xFFFF
    def i32(p: Int): Int = {
      chk(p, 4)
      (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
        ((b(p + 2) & 0xFF) << 16) | (b(p + 3) << 24)
    }
    def i64(p: Int): Long = {
      chk(p, 8)
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (b(p + i) & 0xFF); i -= 1 }
      v
    }
    /** Root table position of the region. */
    def root(): Int = {
      val off = i32(lo)
      if (off < 0) fail("bad root offset")
      lo + off
    }
    /** Field position inside table `t` for field id `id`, or -1. */
    def field(t: Int, id: Int): Int = {
      val so = i32(t)
      val vt = t - so
      if (vt < lo) fail("vtable out of bounds")
      val vtLen = u16(vt)
      val slot = 4 + 2 * id
      if (slot + 2 > vtLen) return -1
      val fo = u16(vt + slot)
      if (fo == 0) -1 else t + fo
    }
    def tableAt(p: Int): Int = { // offset-indirected table/vector/string
      val off = i32(p)
      if (off <= 0) fail("bad forward offset")
      p + off
    }
    def str(p: Int): String = {
      val v = tableAt(p)
      val len = i32(v)
      if (len < 0 || len > (1 << 20)) fail("bad string length")
      chk(v + 4, len)
      new String(b, v + 4, len, java.nio.charset.StandardCharsets.UTF_8)
    }
    def vecLen(p: Int): Int = {
      val v = tableAt(p)
      val len = i32(v)
      if (len < 0 || len > (1 << 24)) fail("bad vector length")
      len
    }
    def vecBase(p: Int): Int = tableAt(p) + 4
  }

  private def typeName(id: Int): String = id match {
    case 1 => "null"
    case 2 => "int"
    case 3 => "floatingpoint"
    case 4 => "binary"
    case 5 => "utf8"
    case 6 => "bool"
    case 7 => "decimal"
    case 8 => "date"
    case 9 => "time"
    case 10 => "timestamp"
    case 11 => "interval"
    case 12 => "list"
    case 13 => "struct"
    case 14 => "union"
    case 15 => "fixedsizebinary"
    case 16 => "fixedsizelist"
    case 17 => "map"
    case 18 => "duration"
    case 19 => "largebinary"
    case 20 => "largeutf8"
    case 21 => "largelist"
    case other => s"type$other"
  }

  final case class ArrowField(name: String, tpe: String, nullable: Boolean)
  final case class ArrowMeta(fields: Seq[ArrowField], nBatches: Int,
                             nDicts: Int, nRows: Long, bodyBytes: Long)

  /** Schema table → field list (names, type-union tags, nullability). */
  private def readSchema(fb: Fb, schemaPos: Int): Seq[ArrowField] = {
    val fieldsP = fb.field(schemaPos, 1)
    if (fieldsP < 0) return Nil
    val n = fb.vecLen(fieldsP)
    if (n > MaxFields) fail("too many fields")
    val base = fb.vecBase(fieldsP)
    (0 until n).map { i =>
      val f = fb.tableAt(base + 4 * i)
      val nameP = fb.field(f, 0)
      val name = if (nameP < 0) "" else fb.str(nameP)
      val nullP = fb.field(f, 1)
      val nullable = nullP >= 0 && fb.u8(nullP) != 0
      val ttP = fb.field(f, 2)
      val tt = if (ttP < 0) 0 else fb.u8(ttP)
      ArrowField(name, typeName(tt), nullable)
    }
  }

  /** Walk one blob. */
  private[ext] def parseArrow(bytes: Array[Byte])
      : Either[String, ArrowMeta] =
    try {
      if (bytes == null || bytes.length < 32) return Left("too short")
      val n = bytes.length
      def ascii(off: Int, s: String): Boolean =
        (0 until s.length).forall(i => (bytes(off + i) & 0xFF) == s.charAt(i))
      if (!ascii(0, "ARROW1") || bytes(6) != 0 || bytes(7) != 0)
        return Left("bad head magic")
      if (!ascii(n - 6, "ARROW1")) return Left("bad tail magic")
      val whole = new Fb(bytes, 0, n)
      val footerLen = whole.i32(n - 10)
      if (footerLen <= 0 || footerLen > n - 10 - 8)
        return Left("bad footer length")
      val f0 = n - 10 - footerLen
      val fb = new Fb(bytes, f0, n - 10)
      val footer = fb.root()
      val schemaP = fb.field(footer, 1)
      if (schemaP < 0) return Left("footer missing schema")
      val fields = readSchema(fb, fb.tableAt(schemaP))
      // Block struct: offset int64, metaDataLength int32 (+pad), body int64
      def blocks(fieldId: Int): Seq[(Long, Int, Long)] = {
        val p = fb.field(footer, fieldId)
        if (p < 0) Nil
        else {
          val cnt = fb.vecLen(p)
          if (cnt > MaxBatches) fail("too many blocks")
          val base = fb.vecBase(p)
          (0 until cnt).map { i =>
            val s = base + 24 * i
            (fb.i64(s), fb.i32(s + 8), fb.i64(s + 16))
          }
        }
      }
      val dicts = blocks(2)
      val batches = blocks(3)
      var rows = 0L
      var body = 0L
      batches.foreach { case (off, metaLen, bodyLen) =>
        if (off < 8 || metaLen < 8 || off > n.toLong - metaLen)
          fail("block out of bounds")
        val o = off.toInt
        // encapsulated message: continuation marker + metadata length
        // (legacy pre-0.15 layout: length only)
        val (msgStart, declaredLen) =
          if (whole.i32(o) == -1) (o + 8, whole.i32(o + 4))
          else (o + 4, whole.i32(o))
        if (declaredLen <= 0 || declaredLen > n - msgStart)
          fail("message metadata out of bounds")
        val mfb = new Fb(bytes, msgStart, msgStart + declaredLen)
        val msg = mfb.root()
        val htP = mfb.field(msg, 1)
        val ht = if (htP < 0) 0 else mfb.u8(htP)
        if (ht != 3) fail("footer block is not a RecordBatch")
        val blP = mfb.field(msg, 3)
        val bl = if (blP < 0) 0L else mfb.i64(blP)
        if (bl != bodyLen) fail("footer/message body length mismatch")
        val hdrP = mfb.field(msg, 2)
        if (hdrP < 0) fail("message missing header")
        val rb = mfb.tableAt(hdrP)
        val lenP = mfb.field(rb, 0)
        val batchRows = if (lenP < 0) 0L else mfb.i64(lenP)
        if (batchRows < 0) fail("negative batch length")
        rows += batchRows
        body += bodyLen
      }
      Right(ArrowMeta(fields, batches.length, dicts.length, rows, body))
    } catch {
      case Walk(m) => Left(m)
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
    }

  // ---------------------------------------------------- DataFrame layer

  /** One row per blob: `(…keep…, n_fields, n_batches, n_dicts, n_rows,
    * body_bytes)`.
    */
  def extractArrowMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("n_fields", IntegerType, nullable = false),
        StructField("n_batches", IntegerType, nullable = false),
        StructField("n_dicts", IntegerType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("body_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parseArrow(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(m) =>
            val arr = new Array[Any](nKeep + 5)
            var i = 0
            while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
            arr(nKeep) = m.fields.length
            arr(nKeep + 1) = m.nBatches
            arr(nKeep + 2) = m.nDicts
            arr(nKeep + 3) = m.nRows
            arr(nKeep + 4) = m.bodyBytes
            Iterator.single(Row.fromSeq(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(arr)))
        }
      }
    }(enc)
  }

  /** One row per schema field: `(…keep…, field_idx, name, type,
    * nullable)`.
    */
  def extractArrowFields(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("field_idx", IntegerType, nullable = false),
        StructField("name", StringType, nullable = false),
        StructField("type", StringType, nullable = false),
        StructField("nullable", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parseArrow(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(m) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            m.fields.iterator.zipWithIndex.map { case (f, fi) =>
              val arr = new Array[Any](nKeep + 4)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = fi; arr(nKeep + 1) = f.name
              arr(nKeep + 2) = f.tpe; arr(nKeep + 3) = f.nullable
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: `(…keep…, error)`. */
  def arrowErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) :+
      StructField("error", StringType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        parseArrow(r.getAs[Array[Byte]](idx)) match {
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

  // --------------------------------------------------- fixture writer

  /** Build a REAL Arrow IPC file through the apache arrow-java writer
    * Spark bundles (the interop guarantee: the official writer's
    * output is what the walk reads). Schema: `id: int64 not null,
    * txt: utf8` (+ `score: float64` when `withScore`); `rows` rows
    * split into batches of `batchRows`.
    */
  def buildArrowFile(rows: Int, batchRows: Int, seed: Long,
                     withScore: Boolean = false): Array[Byte] = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import scala.jdk.CollectionConverters._
    require(rows >= 0 && batchRows >= 1, "bad fixture geometry")
    val alloc = new org.apache.arrow.memory.RootAllocator(64L << 20)
    try {
      val fields = Seq(
        new Field("id", new FieldType(false, new ArrowType.Int(64, true), null),
          java.util.Collections.emptyList()),
        new Field("txt", FieldType.nullable(new ArrowType.Utf8()),
          java.util.Collections.emptyList())) ++
        (if (withScore) Seq(new Field("score",
          FieldType.nullable(new ArrowType.FloatingPoint(
            FloatingPointPrecision.DOUBLE)),
          java.util.Collections.emptyList()))
        else Nil)
      val schema = new ASchema(fields.asJava)
      val root = VectorSchemaRoot.create(schema, alloc)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val ch = java.nio.channels.Channels.newChannel(bos)
        val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch)
        w.start()
        var done = 0
        while (done < rows) {
          val k = math.min(batchRows, rows - done)
          root.setRowCount(k)
          val idV = root.getVector("id").asInstanceOf[BigIntVector]
          val txtV = root.getVector("txt").asInstanceOf[VarCharVector]
          (0 until k).foreach { i =>
            idV.setSafe(i, seed + done + i)
            txtV.setSafe(i,
              s"row ${done + i} of $seed".getBytes("UTF-8"))
          }
          if (withScore) {
            val sc = root.getVector("score").asInstanceOf[Float8Vector]
            (0 until k).foreach(i => sc.setSafe(i, (done + i) * 0.5))
          }
          root.setRowCount(k)
          w.writeBatch()
          done += k
        }
        w.end()
        w.close()
        bos.toByteArray
      } finally root.close()
    } finally alloc.close()
  }
}
