package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** BSON structural walk (bsonspec.org 1.1 — what `mongodump` corpora
  * ship): a blob is a stream of concatenated documents, each a
  * little-endian int32 total length, elements (`type, cstring name,
  * value`), and a trailing NUL. Every element type in common use
  * decodes — double, string, embedded document, array, binary,
  * ObjectId, bool, UTC datetime, null, int32, int64, timestamp,
  * decimal128 — into the [[MsgPack]]/[[Cbor]] per-family inventory,
  * plus a `key_bytes` mass (element-name text is where a Mongo
  * corpus hides its schema).
  *
  * Strict and total: every document's DECLARED length must equal its
  * walked length exactly (BSON's only integrity device), string
  * lengths must be ≥ 1 and NUL-terminated, bool bytes must be 0/1,
  * unknown element types reject, and recursion depth is capped.
  */
object Bson {

  final case class FamilyStat(family: String, n: Long, valSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  private case class Walk(msg: String) extends Exception(msg)

  private final class Cur(val b: Array[Byte], var p: Int) {
    def need(k: Int): Unit =
      if (k < 0 || k > b.length - p) throw Walk("truncated element")
  }

  private def le32(c: Cur): Long = {
    c.need(4)
    val v = (u(c.b(c.p)) | (u(c.b(c.p + 1)) << 8) |
      (u(c.b(c.p + 2)) << 16)).toLong | (u(c.b(c.p + 3)).toLong << 24)
    c.p += 4
    v.toInt.toLong // int32 is signed
  }

  private def le64(c: Cur): Long = {
    c.need(8)
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | u(c.b(c.p + i)); i -= 1 }
    c.p += 8
    v
  }

  private final class Acc {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    def add(fam: String, sum: Long): Unit = {
      val (n0, s0) = m.getOrElse(fam, (0L, 0L))
      m(fam) = (n0 + 1, s0 + sum)
    }
  }

  private def cstring(c: Cur): Int = { // returns byte length (sans NUL)
    val start = c.p
    while (c.p < c.b.length && c.b(c.p) != 0) c.p += 1
    if (c.p >= c.b.length) throw Walk("unterminated cstring")
    val len = c.p - start
    c.p += 1
    len
  }

  /** Walk one document whose length header is at the cursor; `top`
    * controls which family the document itself lands in.
    */
  private def document(c: Cur, acc: Acc, fam: String, depth: Int): Unit = {
    if (depth > 64) throw Walk("nesting too deep")
    val start = c.p
    val total = le32(c)
    if (total < 5 || total > c.b.length - start)
      throw Walk("document length out of bounds")
    val end = start + total.toInt
    var nElems = 0L
    var done = false
    while (!done) {
      if (c.p >= end) throw Walk("document overruns its length")
      val t = u(c.b(c.p)); c.p += 1
      if (t == 0) {
        if (c.p != end) throw Walk("document length mismatch")
        done = true
      } else {
        acc.add("key", cstring(c).toLong)
        nElems += 1
        t match {
          case 0x01 => c.need(8); c.p += 8; acc.add("double", 0L)
          case 0x02 =>
            val len = le32(c)
            if (len < 1 || len > c.b.length - c.p)
              throw Walk("string length out of bounds")
            if (c.b(c.p + len.toInt - 1) != 0)
              throw Walk("string missing terminator")
            acc.add("string", len - 1)
            c.p += len.toInt
          case 0x03 => document(c, acc, "doc", depth + 1)
          case 0x04 => document(c, acc, "array", depth + 1)
          case 0x05 =>
            val len = le32(c)
            c.need(1); c.p += 1 // subtype
            if (len < 0 || len > c.b.length - c.p)
              throw Walk("binary length out of bounds")
            acc.add("binary", len)
            c.p += len.toInt
          case 0x07 => c.need(12); c.p += 12; acc.add("objectid", 0L)
          case 0x08 =>
            c.need(1)
            val v = u(c.b(c.p)); c.p += 1
            if (v > 1) throw Walk("bad bool byte")
            acc.add("bool", v.toLong)
          case 0x09 => acc.add("datetime", le64(c))
          case 0x0A => acc.add("null", 0L)
          case 0x10 => acc.add("int", le32(c))
          case 0x11 => c.need(8); c.p += 8; acc.add("timestamp", 0L)
          case 0x12 => acc.add("int", le64(c))
          case 0x13 => c.need(16); c.p += 16; acc.add("decimal128", 0L)
          case _ => throw Walk("unknown element type")
        }
      }
    }
    acc.add(fam, nElems)
  }

  /** Walk a blob of concatenated documents into family stats. */
  def bsonTable(bytes: Array[Byte]): Either[String, Seq[FamilyStat]] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val c = new Cur(bytes, 0)
    val acc = new Acc
    try {
      while (c.p < bytes.length) document(c, acc, "doc", 0)
    } catch {
      case Walk(m) => return Left(m)
      case _: ArrayIndexOutOfBoundsException => return Left("doc overrun")
    }
    Right(acc.m.toSeq.map { case (f, (n, s)) => FamilyStat(f, n, s) })
  }

  /** One row per (blob, family): `(…keep…, family, n, val_sum)`. */
  def extractBsonStats(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("family", StringType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("val_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        bsonTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(stats) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            stats.iterator.map { s =>
              val arr = new Array[Any](nKeep + 3)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = s.family; arr(nKeep + 1) = s.n
              arr(nKeep + 2) = s.valSum
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: `(…keep…, error)`. */
  def bsonErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("error", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        bsonTable(r.getAs[Array[Byte]](idx)) match {
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

  final class DocBuilder {
    private val body = new java.io.ByteArrayOutputStream()
    private def name(n: String): Unit = {
      body.write(n.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      body.write(0)
    }
    private def i32(v: Long): Unit = {
      var x = v
      var i = 0
      while (i < 4) { body.write((x & 0xFF).toInt); x >>= 8; i += 1 }
    }
    private def i64(v: Long): Unit = {
      var x = v
      var i = 0
      while (i < 8) { body.write((x & 0xFF).toInt); x >>= 8; i += 1 }
    }
    def int32(n: String, v: Int): DocBuilder = {
      body.write(0x10); name(n); i32(v.toLong); this
    }
    def int64(n: String, v: Long): DocBuilder = {
      body.write(0x12); name(n); i64(v); this
    }
    def string(n: String, s: String): DocBuilder = {
      body.write(0x02); name(n)
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i32(b.length + 1L); body.write(b, 0, b.length); body.write(0)
      this
    }
    def boolV(n: String, v: Boolean): DocBuilder = {
      body.write(0x08); name(n); body.write(if (v) 1 else 0); this
    }
    def nullV(n: String): DocBuilder = { body.write(0x0A); name(n); this }
    def double(n: String, v: Double): DocBuilder = {
      body.write(0x01); name(n)
      i64(java.lang.Double.doubleToLongBits(v)); this
    }
    def datetime(n: String, ms: Long): DocBuilder = {
      body.write(0x09); name(n); i64(ms); this
    }
    def objectId(n: String, fill: Int): DocBuilder = {
      body.write(0x07); name(n)
      (0 until 12).foreach(_ => body.write(fill)); this
    }
    def binary(n: String, b: Array[Byte]): DocBuilder = {
      body.write(0x05); name(n); i32(b.length.toLong); body.write(0)
      body.write(b, 0, b.length); this
    }
    def doc(n: String, d: DocBuilder): DocBuilder = {
      body.write(0x03); name(n)
      val b = d.bytes; body.write(b, 0, b.length); this
    }
    def array(n: String, d: DocBuilder): DocBuilder = {
      body.write(0x04); name(n)
      val b = d.bytes; body.write(b, 0, b.length); this
    }
    def bytes: Array[Byte] = {
      val b = body.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      var x = (b.length + 5).toLong
      var i = 0
      while (i < 4) { out.write((x & 0xFF).toInt); x >>= 8; i += 1 }
      out.write(b, 0, b.length)
      out.write(0)
      out.toByteArray
    }
  }
}
