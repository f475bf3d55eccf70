package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** CBOR structural walk (RFC 8949) — the IETF binary-JSON family next
  * to [[MsgPack]]: a blob is a stream of concatenated top-level data
  * items, each decoded completely — all five argument widths per
  * major type, negative integers (`-1 - n`), definite AND indefinite
  * byte/text strings (chunk reassembly under the RFC's same-type
  * chunk rule), definite and indefinite arrays/maps, tags (the tag
  * number counts as family mass; the tagged item is walked), and the
  * simple/float space (false/true/null/undefined, half/single/double).
  * Emits the per-family (count, value-mass) inventory — the
  * [[ProtoWire]]/[[MsgPack]] schema-free shard-inspection shape.
  *
  * Strict and total: reserved additional-info values (28-30) reject,
  * indefinite-length chunks of the wrong major type reject (RFC
  * 8949 §3.2.3), a break outside an indefinite context rejects,
  * every length is bounds-checked before the read, and recursion
  * depth is capped.
  */
object Cbor {

  final case class FamilyStat(family: String, n: Long, valSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  private case class Walk(msg: String) extends Exception(msg)

  private final class Cur(val b: Array[Byte], var p: Int) {
    def need(k: Int): Unit =
      if (k < 0 || k > b.length - p) throw Walk("truncated item")
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

  /** Read the argument for additional-info `ai`; -1 = indefinite. */
  private def arg(c: Cur, ai: Int): Long = ai match {
    case x if x < 24 => x.toLong
    case 24 => c.need(1); val v = be(c.b, c.p, 1); c.p += 1; v
    case 25 => c.need(2); val v = be(c.b, c.p, 2); c.p += 2; v
    case 26 => c.need(4); val v = be(c.b, c.p, 4); c.p += 4; v
    case 27 => c.need(8); val v = be(c.b, c.p, 8); c.p += 8; v
    case 31 => -1L
    case _ => throw Walk("reserved additional info")
  }

  /** True when the next byte is the break stop code (and consumes it). */
  private def atBreak(c: Cur): Boolean = {
    c.need(1)
    if (u(c.b(c.p)) == 0xFF) { c.p += 1; true } else false
  }

  private def skipLen(c: Cur, len: Long): Unit = {
    if (len < 0 || len > c.b.length - c.p) throw Walk("length out of bounds")
    c.p += len.toInt
  }

  /** Total byte length of a definite or indefinite string of major
    * type `maj` whose header has been consumed up to the argument.
    */
  private def stringLen(c: Cur, maj: Int, a: Long): Long = {
    if (a >= 0) { skipLen(c, a); a }
    else {
      // indefinite: same-major-type definite chunks until break
      var total = 0L
      var done = false
      while (!done) {
        if (atBreak(c)) done = true
        else {
          val h = u(c.b(c.p)); c.p += 1
          if ((h >> 5) != maj) throw Walk("bad indefinite chunk type")
          val ca = arg(c, h & 0x1F)
          if (ca < 0) throw Walk("nested indefinite string")
          skipLen(c, ca)
          total += ca
        }
      }
      total
    }
  }

  private def item(c: Cur, acc: Acc, depth: Int): Unit = {
    if (depth > 64) throw Walk("nesting too deep")
    c.need(1)
    val h = u(c.b(c.p)); c.p += 1
    if (h == 0xFF) throw Walk("unexpected break")
    val maj = h >> 5
    val ai = h & 0x1F
    maj match {
      case 0 => acc.add("int", arg(c, ai))
      case 1 => acc.add("int", -1L - arg(c, ai))
      case 2 => acc.add("bytes", stringLen(c, 2, arg(c, ai)))
      case 3 => acc.add("text", stringLen(c, 3, arg(c, ai)))
      case 4 =>
        val a = arg(c, ai)
        if (a >= 0) {
          acc.add("array", a)
          var i = 0L
          while (i < a) { item(c, acc, depth + 1); i += 1 }
        } else {
          var n = 0L
          while (!atBreak(c)) { item(c, acc, depth + 1); n += 1 }
          acc.add("array", n)
        }
      case 5 =>
        val a = arg(c, ai)
        if (a >= 0) {
          acc.add("map", a)
          var i = 0L
          while (i < a) {
            item(c, acc, depth + 1); item(c, acc, depth + 1); i += 1
          }
        } else {
          var n = 0L
          while (!atBreak(c)) {
            item(c, acc, depth + 1); item(c, acc, depth + 1); n += 1
          }
          acc.add("map", n)
        }
      case 6 =>
        val tag = arg(c, ai)
        if (tag < 0) throw Walk("indefinite tag")
        acc.add("tag", tag)
        item(c, acc, depth + 1)
      case _ => ai match {
        case 20 => acc.add("bool", 0L)
        case 21 => acc.add("bool", 1L)
        case 22 => acc.add("null", 0L)
        case 23 => acc.add("undefined", 0L)
        case 24 => c.need(1); c.p += 1; acc.add("simple", 0L)
        case 25 => c.need(2); c.p += 2; acc.add("float", 0L)
        case 26 => c.need(4); c.p += 4; acc.add("float", 0L)
        case 27 => c.need(8); c.p += 8; acc.add("float", 0L)
        case x if x < 20 => acc.add("simple", 0L)
        case _ => throw Walk("reserved additional info")
      }
    }
  }

  /** Walk a blob of concatenated top-level items into family stats. */
  def cborTable(bytes: Array[Byte]): Either[String, Seq[FamilyStat]] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val c = new Cur(bytes, 0)
    val acc = new Acc
    try {
      while (c.p < bytes.length) item(c, acc, 0)
    } catch {
      case Walk(m) => return Left(m)
      case _: ArrayIndexOutOfBoundsException => return Left("item overrun")
    }
    Right(acc.m.toSeq.map { case (f, (n, s)) => FamilyStat(f, n, s) })
  }

  /** One row per (blob, family): `(…keep…, family, n, val_sum)`. */
  def extractCborStats(df: DataFrame, binCol: String): DataFrame = {
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
        cborTable(r.getAs[Array[Byte]](idx)) match {
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
  def cborErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("error", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        cborTable(r.getAs[Array[Byte]](idx)) match {
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
  // Fixture writer (canonical smallest-width arguments)

  final class Writer {
    val out = new java.io.ByteArrayOutputStream()
    private def head(maj: Int, v: Long): Unit = {
      if (v < 24) out.write((maj << 5) | v.toInt)
      else if (v <= 0xFF) { out.write((maj << 5) | 24); out.write(v.toInt) }
      else if (v <= 0xFFFF) {
        out.write((maj << 5) | 25)
        out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
      } else if (v <= 0xFFFFFFFFL) {
        out.write((maj << 5) | 26)
        var i = 24
        while (i >= 0) { out.write(((v >> i) & 0xFF).toInt); i -= 8 }
      } else {
        out.write((maj << 5) | 27)
        var i = 56
        while (i >= 0) { out.write(((v >> i) & 0xFF).toInt); i -= 8 }
      }
    }
    def int(v: Long): Writer = {
      if (v >= 0) head(0, v) else head(1, -1L - v)
      this
    }
    def text(s: String): Writer = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      head(3, b.length.toLong); out.write(b, 0, b.length)
      this
    }
    /** Indefinite-length text: `chunks` definite pieces + break. */
    def textIndef(chunks: Seq[String]): Writer = {
      out.write((3 << 5) | 31)
      chunks.foreach(text)
      out.write(0xFF)
      this
    }
    def bytesV(b: Array[Byte]): Writer = {
      head(2, b.length.toLong); out.write(b, 0, b.length)
      this
    }
    def arrHeader(n: Int): Writer = { head(4, n.toLong); this }
    def arrIndefStart(): Writer = { out.write((4 << 5) | 31); this }
    def mapHeader(n: Int): Writer = { head(5, n.toLong); this }
    def breakStop(): Writer = { out.write(0xFF); this }
    def tag(t: Long): Writer = { head(6, t); this }
    def bool(v: Boolean): Writer = {
      out.write((7 << 5) | (if (v) 21 else 20)); this
    }
    def nullV(): Writer = { out.write((7 << 5) | 22); this }
    def float64(v: Double): Writer = {
      out.write((7 << 5) | 27)
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 56
      while (i >= 0) { out.write(((bits >> i) & 0xFF).toInt); i -= 8 }
      this
    }
    def bytes: Array[Byte] = out.toByteArray
  }
}
