package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-free protobuf wire-format walk (protobuf encoding spec,
  * protobuf.dev/programming-guides/encoding) — what a pipeline does to
  * a tf.Example / proto shard BEFORE it has (or trusts) a schema:
  * inventory every field's number, wire type, occurrence count, and
  * value mass, without materializing any value payloads. Composes
  * with [[TfRecord.extractTfRecordPayloads]] for the standard
  * TFRecord-of-protos shape.
  *
  * Strict and total: keys and varints are bounds- and length-checked
  * (an 11-byte varint, a length running past the message, a reserved
  * or deprecated wire type — SGROUP/EGROUP — are typed rejects).
  * `value_sum` semantics per wire type: varint → sum of values
  * (wrapping 64-bit); 32/64-bit fixed → sum of raw little-endian
  * values; length-delimited → total payload LENGTH (content stays
  * opaque — that's the point of schema-freedom).
  */
object ProtoWire {

  final case class ProtoField(fieldNo: Int, wireType: Int, nOccur: Long,
                              valueSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  /** Plain (non-zigzag) varint; null on overrun or >10 bytes. */
  private def varint(b: Array[Byte], p: Int, limit: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var i = p
    while (i < limit && shift <= 63) {
      val x = u(b(i))
      v |= (x & 0x7FL) << shift
      i += 1
      if ((x & 0x80) == 0) return (v, i)
      shift += 7
    }
    null
  }

  /** Aggregate field inventory of ONE message, ordered by
    * (fieldNo, wireType) first appearance.
    */
  def protoFieldTable(bytes: Array[Byte]): Either[String, Seq[ProtoField]] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try protoFieldTableWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def protoFieldTableWalk(bytes: Array[Byte]): Either[String, Seq[ProtoField]] = {
    if (bytes == null) return Left("empty message")
    val n = bytes.length
    val order = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val acc = scala.collection.mutable.Map.empty[(Int, Int), (Long, Long)]
    var pos = 0
    while (pos < n) {
      val k = varint(bytes, pos, n)
      if (k == null) return Left("bad field key")
      val (key, p1) = k
      val wt = (key & 7).toInt
      val fieldNo = (key >>> 3).toInt
      if (fieldNo < 1 || (key >>> 3) > Int.MaxValue)
        return Left("bad field number")
      var value = 0L
      var next = p1
      wt match {
        case 0 =>
          val v = varint(bytes, p1, n)
          if (v == null) return Left("bad varint value")
          value = v._1; next = v._2
        case 1 =>
          if (n - p1 < 8) return Left("truncated fixed64")
          var i = 7
          while (i >= 0) { value = (value << 8) | u(bytes(p1 + i)); i -= 1 }
          next = p1 + 8
        case 2 =>
          val l = varint(bytes, p1, n)
          if (l == null) return Left("bad length")
          if (l._1 < 0 || l._1 > n - l._2) return Left("length out of bounds")
          value = l._1; next = l._2 + l._1.toInt
        case 5 =>
          if (n - p1 < 4) return Left("truncated fixed32")
          var i = 3
          while (i >= 0) { value = (value << 8) | u(bytes(p1 + i)); i -= 1 }
          next = p1 + 4
        case 3 | 4 => return Left("deprecated group wire type")
        case _ => return Left("reserved wire type")
      }
      val id = (fieldNo, wt)
      acc.get(id) match {
        case Some((c, s)) => acc(id) = (c + 1, s + value)
        case None => order += id; acc(id) = (1L, value)
      }
      pos = next
    }
    Right(order.map { case (f, w) =>
      val (c, s) = acc((f, w))
      ProtoField(f, w, c, s)
    }.toSeq)
  }

  /** Explode a binary proto-message column into one row per distinct
    * (field, wire type): `(…keep…, field_no, wire_type, n_occur,
    * value_sum)`. Poison messages yield zero rows.
    */
  def protoFields(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("field_no", IntegerType, nullable = false),
        StructField("wire_type", IntegerType, nullable = false),
        StructField("n_occur", LongType, nullable = false),
        StructField("value_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        protoFieldTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(fields) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            fields.iterator.map { f =>
              val arr = new Array[Any](nKeep + 4)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = f.fieldNo; arr(nKeep + 1) = f.wireType
              arr(nKeep + 2) = f.nOccur; arr(nKeep + 3) = f.valueSum
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // fixture writer

  final class MsgBuilder {
    private val out = new java.io.ByteArrayOutputStream()
    private def vi(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0) { out.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def addVarint(fieldNo: Int, value: Long): MsgBuilder = {
      vi((fieldNo.toLong << 3) | 0); vi(value); this
    }
    def addBytes(fieldNo: Int, payload: Array[Byte]): MsgBuilder = {
      vi((fieldNo.toLong << 3) | 2); vi(payload.length)
      out.write(payload); this
    }
    def addFixed32(fieldNo: Int, value: Long): MsgBuilder = {
      vi((fieldNo.toLong << 3) | 5)
      var i = 0
      while (i < 4) { out.write(((value >> (8 * i)) & 0xFF).toInt); i += 1 }
      this
    }
    def addFixed64(fieldNo: Int, value: Long): MsgBuilder = {
      vi((fieldNo.toLong << 3) | 1)
      var i = 0
      while (i < 8) { out.write(((value >> (8 * i)) & 0xFF).toInt); i += 1 }
      this
    }
    def bytes: Array[Byte] = out.toByteArray
  }
}
