package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Apache Avro Object Container File ingest (Avro spec, "Object
  * Container Files") — the data-engineering shard format next to
  * TFRecord ([[TfRecord]]) and tar ([[TarShard]]): header magic
  * `Obj\x01`, an Avro map of metadata (`avro.schema`, `avro.codec`),
  * a 16-byte sync marker, then data blocks of
  * `(record count, byte size, payload, sync)` with EVERY block's sync
  * marker verified against the header's — Avro's splittable-read
  * contract (a 100 TB reader seeks to any offset and scans for the
  * sync to re-align; a block whose sync does not match is corruption,
  * not coincidence, since the marker is 128 random bits per file).
  *
  * Strict and total: varints are bounds- and length-checked (a >10
  * byte zigzag long is a typed reject), metadata map blocks support
  * the negative-count + byte-size form, `null` and `deflate` codecs
  * are decoded with an inflate cap (the [[ZipArchive]] bomb
  * argument), `snappy` blocks are decoded with the from-spec raw
  * decoder ([[Snappy]]) and their trailing 4-byte big-endian CRC-32
  * of the UNCOMPRESSED data (Avro's snappy framing) verified;
  * anything else (unknown) is a typed quarantine reject. Record
  * payloads are never materialized — blocks stream out
  * as (count, decompressed size, byte sum); record-level decoding is
  * schema-driven and belongs to the consumer.
  */
object AvroOcf {

  final case class AvroBlock(idx: Int, nRecords: Long, usize: Long,
                             payloadSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  /** Zigzag varint long; returns (value, nextPos) or null on
    * malformation/overrun.
    */
  private def varLong(b: Array[Byte], p: Int, limit: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var i = p
    while (i < limit && shift <= 63) {
      val x = u(b(i))
      v |= (x & 0x7FL) << shift
      i += 1
      if ((x & 0x80) == 0) {
        return ((v >>> 1) ^ -(v & 1), i) // zigzag decode
      }
      shift += 7
    }
    null
  }

  /** Walk one OCF blob. `maxInflate` caps decompressed bytes per
    * block.
    */
  def avroBlockTable(bytes: Array[Byte],
                     maxInflate: Long = 64L * 1024 * 1024)
      : Either[String, Seq[AvroBlock]] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val n = bytes.length
    if (n < 4 || bytes(0) != 'O' || bytes(1) != 'b' || bytes(2) != 'j' ||
        bytes(3) != 1) return Left("bad magic")
    var pos = 4
    // metadata map: blocks of (count, [size when count<0], entries), 0-end
    var codec = "null"
    var sawSchema = false
    var done = false
    while (!done) {
      val c = varLong(bytes, pos, n)
      if (c == null) return Left("bad metadata varint")
      var (count, p) = c
      if (count == 0) { pos = p; done = true }
      else {
        if (count < 0) {
          count = -count
          val sz = varLong(bytes, p, n)
          if (sz == null) return Left("bad metadata varint")
          p = sz._2 // byte size of the block: redundant, entries follow
        }
        var k = 0L
        while (k < count) {
          val kl = varLong(bytes, p, n)
          if (kl == null) return Left("bad metadata varint")
          if (kl._1 < 0 || kl._1 > n - kl._2) return Left("bad metadata length")
          val key = new String(bytes, kl._2, kl._1.toInt,
            java.nio.charset.StandardCharsets.UTF_8)
          p = kl._2 + kl._1.toInt
          val vl = varLong(bytes, p, n)
          if (vl == null) return Left("bad metadata varint")
          if (vl._1 < 0 || vl._1 > n - vl._2) return Left("bad metadata length")
          if (key == "avro.codec")
            codec = new String(bytes, vl._2, vl._1.toInt,
              java.nio.charset.StandardCharsets.UTF_8)
          if (key == "avro.schema") sawSchema = true
          p = vl._2 + vl._1.toInt
          k += 1
        }
        pos = p
      }
    }
    if (!sawSchema) return Left("missing avro.schema")
    if (codec != "null" && codec != "deflate" && codec != "snappy")
      return Left("unsupported codec")
    if (n - pos < 16) return Left("truncated sync marker")
    val syncAt = pos
    pos += 16
    val out = scala.collection.mutable.ArrayBuffer.empty[AvroBlock]
    var idx = 0
    while (pos < n) {
      val c = varLong(bytes, pos, n)
      if (c == null) return Left("bad block varint")
      val (count, p1) = c
      if (count <= 0) return Left("bad block record count")
      val s = varLong(bytes, p1, n)
      if (s == null) return Left("bad block varint")
      val (size, p2) = s
      if (size < 0 || size > n - p2 - 16) return Left("block out of bounds")
      var sum = 0L
      var usize = 0L
      if (codec == "null") {
        var i = p2
        val lim = p2 + size.toInt
        while (i < lim) { sum += u(bytes(i)); i += 1 }
        usize = size
      } else if (codec == "snappy") {
        // snappy block + 4-byte BIG-endian CRC32 of the uncompressed
        // data (Avro object-container snappy framing)
        if (size < 5) return Left("snappy block too short")
        val dataEnd = p2 + size.toInt - 4
        Snappy.decode(bytes, p2, dataEnd, maxInflate) match {
          case Left(e) => return Left(e)
          case Right(dec) =>
            val crc = new java.util.zip.CRC32
            crc.update(dec, 0, dec.length)
            val stored = ((u(bytes(dataEnd)).toLong << 24) |
              (u(bytes(dataEnd + 1)).toLong << 16) |
              (u(bytes(dataEnd + 2)).toLong << 8) |
              u(bytes(dataEnd + 3)).toLong)
            if (stored != crc.getValue)
              return Left("snappy crc mismatch")
            usize = dec.length.toLong
            var i = 0
            while (i < dec.length) { sum += u(dec(i)); i += 1 }
        }
      } else {
        val inf = new java.util.zip.Inflater(true) // avro deflate is raw
        try {
          inf.setInput(bytes, p2, size.toInt)
          val buf = new Array[Byte](8192)
          var fin = false
          while (!fin) {
            val got =
              try inf.inflate(buf)
              catch {
                case _: java.util.zip.DataFormatException =>
                  return Left("bad deflate stream")
              }
            if (got > 0) {
              usize += got
              if (usize > maxInflate) return Left("block exceeds inflate cap")
              var i = 0
              while (i < got) { sum += u(buf(i)); i += 1 }
            } else if (inf.finished()) fin = true
            else if (inf.needsInput() || inf.needsDictionary())
              return Left("bad deflate stream")
          }
          if (inf.getBytesRead != size) return Left("deflate length mismatch")
        } finally inf.end()
      }
      val syncPos = p2 + size.toInt
      var i = 0
      while (i < 16) {
        if (bytes(syncPos + i) != bytes(syncAt + i))
          return Left("sync marker mismatch")
        i += 1
      }
      out += AvroBlock(idx, count, usize, sum)
      idx += 1
      pos = syncPos + 16
    }
    Right(out.toSeq)
  }

  /** Explode a binary OCF column into one row per block:
    * `(…keep…, block_idx, n_records, usize, payload_sum)`. Poison
    * blobs yield zero rows; [[avroErrors]] is the error channel.
    */
  def extractAvroBlocks(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("block_idx", IntegerType, nullable = false),
        StructField("n_records", LongType, nullable = false),
        StructField("usize", LongType, nullable = false),
        StructField("payload_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        avroBlockTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(blocks) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            blocks.iterator.map { b =>
              val arr = new Array[Any](nKeep + 4)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = b.idx; arr(nKeep + 1) = b.nRecords
              arr(nKeep + 2) = b.usize; arr(nKeep + 3) = b.payloadSum
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: one row per blob, `(n_blocks, ok, error)`. */
  def avroErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("n_blocks", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false),
        StructField("error", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.map { r =>
        val res = avroBlockTable(r.getAs[Array[Byte]](idx))
        val arr = new Array[Any](nKeep + 3)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        res match {
          case Right(bs) =>
            arr(nKeep) = bs.length; arr(nKeep + 1) = true; arr(nKeep + 2) = null
          case Left(e) =>
            arr(nKeep) = 0; arr(nKeep + 1) = false; arr(nKeep + 2) = e
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // fixture writer

  private def writeVarLong(out: java.io.ByteArrayOutputStream,
                           value: Long): Unit = {
    var v = (value << 1) ^ (value >> 63) // zigzag encode
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Build an OCF: metadata (schema + codec), formula sync marker,
    * blocks of (count, payload).
    */
  def buildAvro(schemaJson: String, codec: String, sync: Array[Byte],
                blocks: Seq[(Long, Array[Byte])]): Array[Byte] = {
    require(sync.length == 16, "sync marker must be 16 bytes")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('O', 'b', 'j', 1))
    def entry(k: String, v: Array[Byte]): Unit = {
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      writeVarLong(out, kb.length); out.write(kb)
      writeVarLong(out, v.length); out.write(v)
    }
    writeVarLong(out, 2)
    entry("avro.schema",
      schemaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    entry("avro.codec",
      codec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    writeVarLong(out, 0)
    out.write(sync)
    blocks.foreach { case (count, payload) =>
      val data =
        if (codec == "null") payload
        else if (codec == "snappy") {
          val comp = Snappy.encodeLiteral(payload)
          val crc = new java.util.zip.CRC32
          crc.update(payload, 0, payload.length)
          val v = crc.getValue
          comp ++ Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
            (v >> 8).toByte, v.toByte)
        } else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(payload); d.finish()
          val buf = new Array[Byte](payload.length + 64)
          val ob = new java.io.ByteArrayOutputStream()
          while (!d.finished()) ob.write(buf, 0, d.deflate(buf))
          d.end()
          ob.toByteArray
        }
      writeVarLong(out, count)
      writeVarLong(out, data.length)
      out.write(data)
      out.write(sync)
    }
    out.toByteArray
  }
}
