package graft.ext

/** Raw Snappy block decode (Google's Snappy format description —
  * public; the codec Avro/Parquet/ORC shards most commonly ship).
  * Like [[Lz4]], Snappy has no entropy stage — literals and
  * backward copies only — so the decode is COMPLETE in plain Scala:
  * varint preamble (declared uncompressed length), literal tags with
  * 1-4 extra length bytes, and the three copy forms (1-byte offset /
  * 2-byte offset / 4-byte offset), overlap allowed.
  *
  * Strict and total: every length is bounds-checked, zero or
  * out-of-window offsets reject, the decoded size must land EXACTLY on
  * the declared preamble (a mismatch is corruption, not slack), and
  * `maxOut` bounds the declared size before any allocation (the
  * [[ZipArchive]]/[[Gzip]] bomb argument — a 5-byte preamble can claim
  * 4 GiB).
  */
object Snappy {

  private def u(b: Byte): Int = b & 0xFF

  /** Decode one raw-snappy block from `src[from, until)`. */
  def decode(src: Array[Byte], from: Int, until: Int,
             maxOut: Long = 64L * 1024 * 1024)
      : Either[String, Array[Byte]] = {
    if (src == null || until - from < 1) return Left("empty snappy block")
    // varint32 preamble
    var p = from
    var declared = 0L
    var shift = 0
    var more = true
    while (more) {
      if (p >= until || shift > 28) return Left("bad snappy preamble")
      val x = u(src(p)); p += 1
      declared |= (x & 0x7FL) << shift
      shift += 7
      more = (x & 0x80) != 0
    }
    if (declared > maxOut) return Left("snappy decode cap")
    val out = new Array[Byte](declared.toInt)
    var o = 0
    while (p < until) {
      val tag = u(src(p)); p += 1
      (tag & 3) match {
        case 0 => // literal
          var len = (tag >>> 2) + 1
          if (len > 60) {
            val extra = len - 60 // 1..4 length bytes
            if (until - p < extra) return Left("truncated literal length")
            var v = 0L
            var i = extra - 1
            while (i >= 0) { v = (v << 8) | u(src(p + i)); i -= 1 }
            if (v > Int.MaxValue - 1) return Left("literal length overflow")
            len = v.toInt + 1
            p += extra
          }
          if (len > until - p) return Left("literals out of bounds")
          if (o + len > out.length) return Left("output overrun")
          System.arraycopy(src, p, out, o, len)
          p += len; o += len
        case c =>
          var len = 0
          var offset = 0
          if (c == 1) {
            if (p >= until) return Left("truncated copy")
            len = ((tag >>> 2) & 7) + 4
            offset = ((tag >>> 5) << 8) | u(src(p)); p += 1
          } else if (c == 2) {
            if (until - p < 2) return Left("truncated copy")
            len = (tag >>> 2) + 1
            offset = u(src(p)) | (u(src(p + 1)) << 8); p += 2
          } else {
            if (until - p < 4) return Left("truncated copy")
            len = (tag >>> 2) + 1
            val off = (u(src(p)).toLong | (u(src(p + 1)).toLong << 8) |
              (u(src(p + 2)).toLong << 16) | (u(src(p + 3)).toLong << 24))
            if (off > Int.MaxValue) return Left("copy offset overflow")
            offset = off.toInt; p += 4
          }
          if (offset == 0 || offset > o) return Left("copy offset out of window")
          if (o + len > out.length) return Left("output overrun")
          var m = o - offset
          var i = 0
          while (i < len) { out(o + i) = out(m); m += 1; i += 1 }
          o += len
      }
    }
    if (o != out.length) return Left("snappy length mismatch")
    Right(out)
  }

  // ------------------------------------------------------------------
  // Fixture writers

  sealed trait Op
  final case class Lit(bytes: Array[Byte]) extends Op
  final case class Copy(offset: Int, len: Int) extends Op

  /** Replay ops to decoded bytes — spec/oracle-side ground truth. */
  def replayOps(ops: Seq[Op]): Array[Byte] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    ops.foreach {
      case Lit(b) => buf ++= b
      case Copy(off, len) =>
        var m = buf.length - off
        var i = 0
        while (i < len) { buf += buf(m); m += 1; i += 1 }
    }
    buf.toArray
  }

  private def writePreamble(out: java.io.ByteArrayOutputStream,
                            len: Long): Unit = {
    var v = len
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** Byte-level encode of explicit ops (copies use the smallest legal
    * tag form; long literals use extension bytes) — lets fixtures
    * exercise every tag family deterministically.
    */
  def buildRaw(ops: Seq[Op]): Array[Byte] = {
    val decoded = replayOps(ops)
    val out = new java.io.ByteArrayOutputStream()
    writePreamble(out, decoded.length.toLong)
    ops.foreach {
      case Lit(b) =>
        var off = 0
        while (off < b.length) {
          val len = math.min(b.length - off, 1 << 16)
          if (len <= 60) out.write(((len - 1) << 2))
          else if (len <= 256) {
            out.write((60 << 2)); out.write(len - 1)
          } else {
            out.write((61 << 2))
            out.write((len - 1) & 0xFF); out.write(((len - 1) >> 8) & 0xFF)
          }
          out.write(b, off, len)
          off += len
        }
      case Copy(offset, len0) =>
        var rem = len0
        while (rem > 0) {
          // prefer the 1-byte-offset form when legal, else 2-byte
          if (rem >= 4 && rem <= 11 && offset < 2048) {
            out.write(1 | ((rem - 4) << 2) | ((offset >> 8) << 5))
            out.write(offset & 0xFF)
            rem = 0
          } else {
            val len = math.min(rem, 64)
            // avoid a <4-byte tail the 1-byte form cannot express
            val take = if (rem - len != 0 && rem - len < 4) rem - 4 else len
            val t = math.max(1, take)
            out.write(2 | ((t - 1) << 2))
            out.write(offset & 0xFF); out.write((offset >> 8) & 0xFF)
            rem -= t
          }
        }
    }
    out.toByteArray
  }

  /** Practical encoder: one (chunked) literal run — legal snappy for
    * any content; what the fixture writers use when compression is
    * incidental.
    */
  def encodeLiteral(content: Array[Byte]): Array[Byte] =
    buildRaw(Seq(Lit(content)))
}
