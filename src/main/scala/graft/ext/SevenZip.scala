package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** 7z signature-header triage (the published 7z format, signature +
  * start header; LZMA-coded archive metadata stays quarantined — the
  * JDK has no LZMA decoder, the [[Zstd]] honest-scope argument): the
  * 32-byte start block carries the magic, version, a CRC-32 over the
  * next-header locator fields, and the locator (offset/size/CRC of
  * the end header). BOTH CRCs are verified — the locator CRC against
  * the 20 locator bytes and the next-header CRC against the actual
  * end-header bytes — so a truncated or tampered archive is a typed
  * reject before any byte of the (possibly huge) payload is read.
  * This is the route/quarantine decision a 100 TB ingest needs for
  * `.7z` blobs: integrity and extent without an LZMA dependency.
  */
object SevenZip {

  final case class SevenZipMeta(verMajor: Int, verMinor: Int,
                                nextHeaderOffset: Long,
                                nextHeaderSize: Long,
                                nextHeaderSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  private def le32(b: Array[Byte], p: Int): Long =
    (u(b(p)) | (u(b(p + 1)) << 8) | (u(b(p + 2)) << 16)).toLong |
      (u(b(p + 3)).toLong << 24)

  private def le64(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | u(b(p + i)); i -= 1 }
    v
  }

  /** Parse one 7z blob's signature header. */
  def sevenZipTable(bytes: Array[Byte]): Either[String, SevenZipMeta] =
    try sevenZipWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
    }

  private def sevenZipWalk(bytes: Array[Byte])
      : Either[String, SevenZipMeta] = {
    if (bytes == null || bytes.length < 32) return Left("too short")
    if (!(u(bytes(0)) == '7' && u(bytes(1)) == 'z' && u(bytes(2)) == 0xBC &&
        u(bytes(3)) == 0xAF && u(bytes(4)) == 0x27 && u(bytes(5)) == 0x1C))
      return Left("bad magic")
    val verMajor = u(bytes(6))
    val verMinor = u(bytes(7))
    if (verMajor != 0) return Left("unsupported version")
    val startCrc = le32(bytes, 8)
    val crc = new java.util.zip.CRC32
    crc.update(bytes, 12, 20)
    if (crc.getValue != startCrc) return Left("start header crc mismatch")
    val nhOffset = le64(bytes, 12)
    val nhSize = le64(bytes, 20)
    val nhCrc = le32(bytes, 28)
    // subtraction form: nhOffset/nhSize are attacker-controlled 64-bit
    // values whose sum can wrap negative and bypass a combined check;
    // also reject nhSize = 0 so a forged nhCrc = 0 (the CRC32 of zero
    // bytes) cannot pass the "both CRCs verified" gate
    if (nhOffset < 0 || nhSize <= 0 ||
        nhSize > bytes.length - 32L ||
        nhOffset > bytes.length - 32L - nhSize)
      return Left("next header out of bounds")
    val at = (32 + nhOffset).toInt
    val crc2 = new java.util.zip.CRC32
    crc2.update(bytes, at, nhSize.toInt)
    if (crc2.getValue != nhCrc) return Left("next header crc mismatch")
    var sum = 0L
    var i = at
    val lim = at + nhSize.toInt
    while (i < lim) { sum += u(bytes(i)); i += 1 }
    Right(SevenZipMeta(verMajor, verMinor, nhOffset, nhSize, sum))
  }

  /** One row per blob: `(…keep…, ver_major, ver_minor,
    * next_header_offset, next_header_size, next_header_sum)`.
    */
  def extractSevenZipMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("ver_major", IntegerType, nullable = false),
        StructField("ver_minor", IntegerType, nullable = false),
        StructField("next_header_offset", LongType, nullable = false),
        StructField("next_header_size", LongType, nullable = false),
        StructField("next_header_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        sevenZipTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(m) =>
            val arr = new Array[Any](nKeep + 5)
            var i = 0
            while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
            arr(nKeep) = m.verMajor; arr(nKeep + 1) = m.verMinor
            arr(nKeep + 2) = m.nextHeaderOffset
            arr(nKeep + 3) = m.nextHeaderSize
            arr(nKeep + 4) = m.nextHeaderSum
            Iterator.single(Row.fromSeq(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(arr)))
        }
      }
    }(enc)
  }

  /** Error channel: `(…keep…, error)`. */
  def sevenZipErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("error", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        sevenZipTable(r.getAs[Array[Byte]](idx)) match {
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

  /** A structurally valid 7z blob: signature + CRC'd start header,
    * `bodyLen` payload filler, then `nextHeader` bytes with a real
    * CRC in the locator.
    */
  def buildSevenZip(bodyLen: Int, nextHeader: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('7'); out.write('z'); out.write(0xBC); out.write(0xAF)
    out.write(0x27); out.write(0x1C)
    out.write(0); out.write(4) // version 0.4
    val loc = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    loc.putLong(bodyLen.toLong).putLong(nextHeader.length.toLong)
    val nhCrc = new java.util.zip.CRC32
    nhCrc.update(nextHeader, 0, nextHeader.length)
    loc.putInt(nhCrc.getValue.toInt)
    val lb = loc.array()
    val startCrc = new java.util.zip.CRC32
    startCrc.update(lb, 0, 20)
    val sc = startCrc.getValue
    out.write((sc & 0xFF).toInt); out.write(((sc >> 8) & 0xFF).toInt)
    out.write(((sc >> 16) & 0xFF).toInt); out.write(((sc >> 24) & 0xFF).toInt)
    out.write(lb, 0, 20)
    out.write(new Array[Byte](bodyLen), 0, bodyLen)
    out.write(nextHeader, 0, nextHeader.length)
    out.toByteArray
  }
}
