package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord ingest — the TensorFlow shard format (tensorflow.org
  * TFRecord spec; `tensorflow/core/lib/io/record_writer.h`), the
  * OTHER standard wrapper large ML training corpora ship in next to
  * WebDataset tar ([[TarShard]]). A record is:
  *
  *   uint64 length (LE)
  *   uint32 masked_crc32c(length bytes)   (LE)
  *   byte   data[length]
  *   uint32 masked_crc32c(data)           (LE)
  *
  * with CRC32C (Castagnoli, reflected poly 0x82F63B78) and the mask
  * `rotr15(crc) + 0xa282ead8` — both checksums are VERIFIED per
  * record; one flipped bit anywhere (length or payload) is a typed
  * reject, as is a length that runs past the blob or a record cut by
  * truncation. Record payloads stream out as (size, byte-sum) —
  * never materialized — the container-family discipline.
  *
  * 100 TB shape: one shard = one blob row, the walk is a narrow
  * per-partition map; a corrupted shard quarantines via the error
  * channel instead of poisoning the batch.
  */
object TfRecord {

  final case class TfRec(idx: Int, size: Long, payloadSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  // CRC32C (Castagnoli), reflected, init ~0, final xor ~ — the
  // standard table-driven form (RFC 3720 appendix; public domain).
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i
      var j = 0
      while (j < 8) {
        r = if ((r & 1) != 0) (r >>> 1) ^ 0x82F63B78 else r >>> 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private def crc32c(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0xFFFFFFFF
    var i = from
    while (i < until) {
      c = (c >>> 8) ^ CrcTable((c ^ u(b(i))) & 0xFF)
      i += 1
    }
    ~c
  }

  /** TFRecord's CRC mask: rotate right 15, add the magic. */
  private def mask(crc: Int): Int =
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8

  private def le32(b: Array[Byte], p: Int): Int =
    u(b(p)) | (u(b(p + 1)) << 8) | (u(b(p + 2)) << 16) | (u(b(p + 3)) << 24)

  private def le64(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | u(b(p + i)); i -= 1 }
    v
  }

  /** TFRecord has no magic — but its length header carries a masked
    * CRC32C of itself, so a valid first header identifies the format
    * with a ~1-in-2^32 false-positive rate (the [[FormatSniffer]]
    * rule).
    */
  def looksLikeTfRecord(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 16) return false
    val len = le64(bytes, 0)
    if (len < 0 || len > bytes.length - 16) return false
    le32(bytes, 8) == mask(crc32c(bytes, 0, 8))
  }

  /** Walk one TFRecord shard into its record table. */
  def tfRecordTable(bytes: Array[Byte]): Either[String, Seq[TfRec]] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try tfRecordTableWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def tfRecordTableWalk(bytes: Array[Byte]): Either[String, Seq[TfRec]] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[TfRec]
    var pos = 0
    var idx = 0
    while (pos < n) {
      if (n - pos < 12) return Left("truncated record header")
      val len = le64(bytes, pos)
      if (len < 0 || len > n - pos - 16) return Left("record length out of bounds")
      if (le32(bytes, pos + 8) != mask(crc32c(bytes, pos, pos + 8)))
        return Left("bad length crc")
      val dataStart = pos + 12
      val dataEnd = dataStart + len.toInt
      if (le32(bytes, dataEnd) != mask(crc32c(bytes, dataStart, dataEnd)))
        return Left("bad data crc")
      var sum = 0L
      var i = dataStart
      while (i < dataEnd) { sum += u(bytes(i)); i += 1 }
      out += TfRec(idx, len, sum)
      idx += 1
      pos = dataEnd + 4
    }
    Right(out.toSeq)
  }

  /** Explode a binary TFRecord column into one row per record:
    * `(…keep…, rec_idx, rsize, payload_sum)`. Poison blobs yield zero
    * rows; [[tfRecordErrors]] is the error channel.
    */
  def extractTfRecords(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("rec_idx", IntegerType, nullable = false),
        StructField("rsize", LongType, nullable = false),
        StructField("payload_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        tfRecordTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(recs) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            recs.iterator.map { rec =>
              val arr = new Array[Any](nKeep + 3)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = rec.idx; arr(nKeep + 1) = rec.size
              arr(nKeep + 2) = rec.payloadSum
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Explode record PAYLOADS: `(…keep…, rec_idx, payload)` — the
    * consumption half (tf.Example bytes flow into [[ProtoWire]] or a
    * decoder). CRCs are verified exactly as in [[extractTfRecords]].
    */
  def extractTfRecordPayloads(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("rec_idx", IntegerType, nullable = false),
        StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        tfRecordTable(bytes) match {
          case Left(_) => Iterator.empty
          case Right(recs) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            // record i's payload starts after i prior records' framing
            var off = 0
            recs.iterator.map { rec =>
              val arr = new Array[Any](nKeep + 2)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = rec.idx
              arr(nKeep + 1) = java.util.Arrays.copyOfRange(bytes,
                off + 12, off + 12 + rec.size.toInt)
              off += 12 + rec.size.toInt + 4
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: one row per blob, `(n_records, ok, error)`. */
  def tfRecordErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("n_records", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false),
        StructField("error", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.map { r =>
        val res = tfRecordTable(r.getAs[Array[Byte]](idx))
        val arr = new Array[Any](nKeep + 3)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        res match {
          case Right(rs) =>
            arr(nKeep) = rs.length; arr(nKeep + 1) = true; arr(nKeep + 2) = null
          case Left(e) =>
            arr(nKeep) = 0; arr(nKeep + 1) = false; arr(nKeep + 2) = e
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }

  /** Fixture writer: records with real masked CRC32Cs. */
  def buildTfRecord(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    payloads.foreach { p =>
      val lenB = new Array[Byte](8)
      var v = p.length.toLong
      var i = 0
      while (i < 8) { lenB(i) = (v & 0xFF).toByte; v >>= 8; i += 1 }
      out.write(lenB)
      w32(mask(crc32c(lenB, 0, 8)))
      out.write(p)
      w32(mask(crc32c(p, 0, p.length)))
    }
    out.toByteArray
  }
}
