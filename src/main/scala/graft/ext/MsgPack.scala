package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** MessagePack structural walk (the msgpack specification, public) —
  * the compact binary-JSON family data tooling ships next to protobuf
  * ([[ProtoWire]]) and Avro: a blob is a stream of concatenated
  * top-level values (the msgpack streaming convention), each decoded
  * COMPLETELY — every fixint/fixstr/fixmap/fixarray form, all
  * uint8-64/int8-64 widths (big-endian), str/bin 8/16/32, ext +
  * fixext, float32/64, nil/bool, arrays and maps recursively. The
  * walk emits a per-type-family inventory (count + value mass), the
  * [[ProtoWire]] shape: schema-free shard inspection.
  *
  * Strict and total: the reserved byte 0xC1 rejects, every length is
  * bounds-checked before the read, recursion depth is capped (a
  * crafted nesting bomb cannot stack-overflow an executor), and
  * truncation anywhere is a typed reject.
  */
object MsgPack {

  final case class FamilyStat(family: String, n: Long, valSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  private case class Walk(msg: String) extends Exception(msg)

  private final class Cur(val b: Array[Byte], var p: Int) {
    def need(k: Int): Unit =
      if (k < 0 || k > b.length - p) throw Walk("truncated value")
  }

  private def be(b: Array[Byte], p: Int, k: Int): Long = {
    var v = 0L
    var i = 0
    while (i < k) { v = (v << 8) | u(b(p + i)); i += 1 }
    v
  }

  private final class Acc {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    def add(fam: String, sum: Long): Unit = {
      val (n0, s0) = m.getOrElse(fam, (0L, 0L))
      m(fam) = (n0 + 1, s0 + sum)
    }
  }

  /** Decode one value at the cursor, accumulating family stats. */
  private def value(c: Cur, acc: Acc, depth: Int): Unit = {
    if (depth > 64) throw Walk("nesting too deep")
    c.need(1)
    val t = u(c.b(c.p)); c.p += 1
    def str(len: Long): Unit = {
      if (len < 0 || len > c.b.length - c.p) throw Walk("length out of bounds")
      acc.add("str", len); c.p += len.toInt
    }
    def bin(len: Long): Unit = {
      if (len < 0 || len > c.b.length - c.p) throw Walk("length out of bounds")
      acc.add("bin", len); c.p += len.toInt
    }
    def arr(n: Long): Unit = {
      acc.add("array", n)
      var i = 0L
      while (i < n) { value(c, acc, depth + 1); i += 1 }
    }
    def map(n: Long): Unit = {
      acc.add("map", n)
      var i = 0L
      while (i < n) {
        value(c, acc, depth + 1); value(c, acc, depth + 1); i += 1
      }
    }
    def ext(len: Long): Unit = {
      c.need(1); c.p += 1 // ext type byte
      if (len < 0 || len > c.b.length - c.p) throw Walk("length out of bounds")
      acc.add("ext", len); c.p += len.toInt
    }
    t match {
      case x if x <= 0x7F => acc.add("int", x.toLong)
      case x if x >= 0x80 && x <= 0x8F => map((x & 0xF).toLong)
      case x if x >= 0x90 && x <= 0x9F => arr((x & 0xF).toLong)
      case x if x >= 0xA0 && x <= 0xBF => str((x & 0x1F).toLong)
      case 0xC0 => acc.add("nil", 0L)
      case 0xC1 => throw Walk("reserved byte 0xc1")
      case 0xC2 => acc.add("bool", 0L)
      case 0xC3 => acc.add("bool", 1L)
      case 0xC4 => c.need(1); val l = be(c.b, c.p, 1); c.p += 1; bin(l)
      case 0xC5 => c.need(2); val l = be(c.b, c.p, 2); c.p += 2; bin(l)
      case 0xC6 => c.need(4); val l = be(c.b, c.p, 4); c.p += 4; bin(l)
      case 0xC7 => c.need(1); val l = be(c.b, c.p, 1); c.p += 1; ext(l)
      case 0xC8 => c.need(2); val l = be(c.b, c.p, 2); c.p += 2; ext(l)
      case 0xC9 => c.need(4); val l = be(c.b, c.p, 4); c.p += 4; ext(l)
      case 0xCA => c.need(4); c.p += 4; acc.add("float", 0L)
      case 0xCB => c.need(8); c.p += 8; acc.add("float", 0L)
      case 0xCC => c.need(1); acc.add("int", be(c.b, c.p, 1)); c.p += 1
      case 0xCD => c.need(2); acc.add("int", be(c.b, c.p, 2)); c.p += 2
      case 0xCE => c.need(4); acc.add("int", be(c.b, c.p, 4)); c.p += 4
      case 0xCF => c.need(8); acc.add("int", be(c.b, c.p, 8)); c.p += 8
      case 0xD0 =>
        c.need(1); acc.add("int", c.b(c.p).toLong); c.p += 1
      case 0xD1 =>
        c.need(2); acc.add("int", be(c.b, c.p, 2).toShort.toLong); c.p += 2
      case 0xD2 =>
        c.need(4); acc.add("int", be(c.b, c.p, 4).toInt.toLong); c.p += 4
      case 0xD3 => c.need(8); acc.add("int", be(c.b, c.p, 8)); c.p += 8
      case 0xD4 => ext(1L)
      case 0xD5 => ext(2L)
      case 0xD6 => ext(4L)
      case 0xD7 => ext(8L)
      case 0xD8 => ext(16L)
      case 0xD9 => c.need(1); val l = be(c.b, c.p, 1); c.p += 1; str(l)
      case 0xDA => c.need(2); val l = be(c.b, c.p, 2); c.p += 2; str(l)
      case 0xDB => c.need(4); val l = be(c.b, c.p, 4); c.p += 4; str(l)
      case 0xDC => c.need(2); val n = be(c.b, c.p, 2); c.p += 2; arr(n)
      case 0xDD => c.need(4); val n = be(c.b, c.p, 4); c.p += 4; arr(n)
      case 0xDE => c.need(2); val n = be(c.b, c.p, 2); c.p += 2; map(n)
      case 0xDF => c.need(4); val n = be(c.b, c.p, 4); c.p += 4; map(n)
      case x => acc.add("int", (x - 256).toLong) // negative fixint
    }
  }

  /** Walk a blob of concatenated top-level values into family stats. */
  def msgPackTable(bytes: Array[Byte]): Either[String, Seq[FamilyStat]] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val c = new Cur(bytes, 0)
    val acc = new Acc
    try {
      while (c.p < bytes.length) value(c, acc, 0)
    } catch {
      case Walk(m) => return Left(m)
      case _: ArrayIndexOutOfBoundsException => return Left("value overrun")
    }
    Right(acc.m.toSeq.map { case (f, (n, s)) => FamilyStat(f, n, s) })
  }

  /** One row per (blob, family): `(…keep…, family, n, val_sum)`. */
  def extractMsgPackStats(df: DataFrame, binCol: String): DataFrame = {
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
        msgPackTable(r.getAs[Array[Byte]](idx)) match {
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
  def msgPackErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("error", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        msgPackTable(r.getAs[Array[Byte]](idx)) match {
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
  // Fixture writer (spec-minimal encoder; picks canonical smallest
  // encodings so every width family is reachable by value choice)

  final class Packer {
    val out = new java.io.ByteArrayOutputStream()
    private def be(v: Long, k: Int): Unit = {
      var i = (k - 1) * 8
      while (i >= 0) { out.write(((v >> i) & 0xFF).toInt); i -= 8 }
    }
    def int(v: Long): Packer = {
      if (v >= 0) {
        if (v <= 0x7F) out.write(v.toInt)
        else if (v <= 0xFF) { out.write(0xCC); be(v, 1) }
        else if (v <= 0xFFFF) { out.write(0xCD); be(v, 2) }
        else if (v <= 0xFFFFFFFFL) { out.write(0xCE); be(v, 4) }
        else { out.write(0xCF); be(v, 8) }
      } else {
        if (v >= -32) out.write((v & 0xFF).toInt)
        else if (v >= Byte.MinValue) { out.write(0xD0); be(v & 0xFF, 1) }
        else if (v >= Short.MinValue) { out.write(0xD1); be(v & 0xFFFF, 2) }
        else if (v >= Int.MinValue) { out.write(0xD2); be(v & 0xFFFFFFFFL, 4) }
        else { out.write(0xD3); be(v, 8) }
      }
      this
    }
    def str(s: String): Packer = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (b.length <= 31) out.write(0xA0 | b.length)
      else if (b.length <= 0xFF) { out.write(0xD9); be(b.length.toLong, 1) }
      else { out.write(0xDA); be(b.length.toLong, 2) }
      out.write(b, 0, b.length)
      this
    }
    def binV(b: Array[Byte]): Packer = {
      out.write(0xC4); be(b.length.toLong, 1); out.write(b, 0, b.length)
      this
    }
    def arrHeader(n: Int): Packer = {
      if (n <= 15) out.write(0x90 | n)
      else { out.write(0xDC); be(n.toLong, 2) }
      this
    }
    def mapHeader(n: Int): Packer = {
      if (n <= 15) out.write(0x80 | n)
      else { out.write(0xDE); be(n.toLong, 2) }
      this
    }
    def bool(v: Boolean): Packer = { out.write(if (v) 0xC3 else 0xC2); this }
    def nil(): Packer = { out.write(0xC0); this }
    def float64(v: Double): Packer = {
      out.write(0xCB); be(java.lang.Double.doubleToLongBits(v), 8); this
    }
    def bytes: Array[Byte] = out.toByteArray
  }
}
