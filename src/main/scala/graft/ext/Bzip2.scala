package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** bzip2 split-point discovery (the published bzip2 stream layout —
  * what Wikipedia/public-data dumps still ship in volume): bzip2
  * blocks are BIT-aligned, so a splittable reader (Hadoop's
  * Bzip2Codec discipline) finds block boundaries by scanning for the
  * 48-bit block magic `0x314159265359` (and the end-of-stream magic
  * `0x177245385090`) at EVERY bit offset. This walk is that scan:
  * header check (`BZh` + level digit), block-magic census across all
  * 8 bit phases, and the end-of-stream magic required present — the
  * split-planning pass a 100 TB `.bz2` ingest runs before assigning
  * byte ranges to tasks. Huffman payload decode stays quarantined
  * (the [[SevenZip]]/[[Xz]] honest-scope argument).
  *
  * The scan is a single pass holding a 64-bit shift register — O(n)
  * per blob with no allocation, and the magic census is exact: 48
  * random bits false-positive at 2^-48 per position.
  */
object Bzip2 {

  final case class Bz2Meta(level: Int, nBlocks: Long, eosAtBit: Long)

  private def u(b: Byte): Int = b & 0xFF

  private val BlockMagic = 0x314159265359L
  private val EosMagic = 0x177245385090L
  private val Mask48 = (1L << 48) - 1

  /** Scan one blob. Returns the level, the count of block magics, and
    * the bit position of the end-of-stream magic (-1 = absent →
    * reject).
    */
  def bzip2Table(bytes: Array[Byte]): Either[String, Bz2Meta] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try bzip2TableWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def bzip2TableWalk(bytes: Array[Byte]): Either[String, Bz2Meta] = {
    if (bytes == null || bytes.length < 14) return Left("too short")
    if (!(bytes(0) == 'B' && bytes(1) == 'Z' && bytes(2) == 'h'))
      return Left("bad magic")
    val level = bytes(3) - '0'
    if (level < 1 || level > 9) return Left("bad level digit")
    var reg = 0L
    var nBlocks = 0L
    var eosAt = -1L
    var i = 4
    var bitPos = 32L
    while (i < bytes.length) {
      val b = u(bytes(i))
      var k = 7
      while (k >= 0) {
        reg = ((reg << 1) | ((b >> k) & 1)) & Mask48
        bitPos += 1
        if (bitPos >= 48 + 32) {
          if (reg == BlockMagic) nBlocks += 1
          else if (reg == EosMagic && eosAt < 0) eosAt = bitPos - 48
        }
        k -= 1
      }
      i += 1
    }
    if (nBlocks == 0) return Left("no block magic")
    if (eosAt < 0) return Left("missing end-of-stream magic")
    Right(Bz2Meta(level, nBlocks, eosAt))
  }

  /** One row per blob: `(…keep…, level, n_blocks, eos_at_bit)`. */
  def extractBzip2Meta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("level", IntegerType, nullable = false),
        StructField("n_blocks", LongType, nullable = false),
        StructField("eos_at_bit", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        bzip2Table(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(m) =>
            val arr = new Array[Any](nKeep + 3)
            var i = 0
            while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
            arr(nKeep) = m.level; arr(nKeep + 1) = m.nBlocks
            arr(nKeep + 2) = m.eosAtBit
            Iterator.single(Row.fromSeq(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(arr)))
        }
      }
    }(enc)
  }

  /** Error channel: `(…keep…, error)`. */
  def bzip2Errors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("error", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        bzip2Table(r.getAs[Array[Byte]](idx)) match {
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
  // Fixture writer — a BIT-LEVEL stream with block magics planted at
  // chosen bit offsets (the scan does not decode Huffman content, so
  // the filler between magics is arbitrary non-magic bits)

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }
    def bits(v: Long, width: Int): Unit = {
      var k = width - 1
      while (k >= 0) { bit(((v >> k) & 1L).toInt); k -= 1 }
    }
    def byteAligned: Boolean = nBits == 0
    def bytes: Array[Byte] = {
      while (nBits != 0) bit(0)
      out.toByteArray
    }
  }

  /** Plant `gaps.length` blocks: each block magic preceded by that
    * many filler bits (filler is an alternating 10-pattern that can
    * never contain either 48-bit magic), then the EOS magic and a
    * 32-bit fake combined CRC.
    */
  def buildBzip2(level: Int, gaps: Seq[Int]): Array[Byte] = {
    val w = new BitWriter
    w.bits('B'.toLong, 8); w.bits('Z'.toLong, 8); w.bits('h'.toLong, 8)
    w.bits(('0' + level).toLong, 8)
    gaps.foreach { g =>
      var i = 0
      while (i < g) { w.bit(i & 1); i += 1 }
      w.bits(BlockMagic, 48)
    }
    w.bits(EosMagic, 48)
    w.bits(0x12345678L, 32)
    w.bytes
  }
}
