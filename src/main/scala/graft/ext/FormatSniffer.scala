package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-level format identification — the FIRST pass over a 100 TB
  * crawl of unlabeled blobs: route every blob to its family's walker
  * (container/audio/image/archive/compression) from its magic bytes
  * alone, before trusting any filename or Content-Type header (both
  * lie in crawled data). Every rule reads a bounded prefix (≤ 512
  * bytes + the tar header block); nothing is decoded.
  *
  * Detection rules (most-specific first; all published magics):
  * RIFF forms (WAVE/WEBP/AVI ), ftyp-boxed ISO-BMFF (mp4/mov), EBML
  * (webm/mkv), OggS, fLaC, PNG, JPEG, GIF8, ZIP (PK\x03\x04), gzip
  * (1F 8B), zstd (28 B5 2F FD) + skippable, LZ4 (04 22 4D 18),
  * Avro (Obj\x01), Parquet (PAR1), NumPy (\x93NUMPY), safetensors
  * (no magic — in-bounds brace-delimited LE header length, the
  * TFRecord structural-check precedent), WARC
  * (`WARC/1.`), ustar (magic at 257 — checked AFTER the
  * offset-0 magics so a tar of a small file can't be shadowed),
  * ID3/MPEG-sync MP3, TFRecord (no magic — identified by its
  * masked-CRC32C length header, a 1-in-2^32 false-positive check),
  * and `text` as the printable-prefix fallback. Unknown → 'unknown',
  * never a guess.
  */
object FormatSniffer {

  private def u(b: Byte): Int = b & 0xFF

  private def ascii(b: Array[Byte], p: Int, s: String): Boolean = {
    if (b.length < p + s.length) return false
    var i = 0
    while (i < s.length) {
      if (b(p + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** Identify one blob; bounded prefix reads only. */
  def sniff(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length == 0) return "empty"
    val n = bytes.length
    if (ascii(bytes, 0, "RIFF") && n >= 12) {
      if (ascii(bytes, 8, "WAVE")) return "wav"
      if (ascii(bytes, 8, "WEBP")) return "webp"
      if (ascii(bytes, 8, "AVI ")) return "avi"
      return "riff"
    }
    if (n >= 12 && ascii(bytes, 4, "ftyp")) return "mp4"
    if (n >= 4 && u(bytes(0)) == 0x1A && u(bytes(1)) == 0x45 &&
        u(bytes(2)) == 0xDF && u(bytes(3)) == 0xA3) return "webm"
    if (ascii(bytes, 0, "OggS")) return "ogg"
    if (ascii(bytes, 0, "fLaC")) return "flac"
    if (n >= 8 && u(bytes(0)) == 0x89 && ascii(bytes, 1, "PNG")) return "png"
    if (n >= 3 && u(bytes(0)) == 0xFF && u(bytes(1)) == 0xD8 &&
        u(bytes(2)) == 0xFF) return "jpeg"
    if (ascii(bytes, 0, "GIF8")) return "gif"
    if (n >= 4 && bytes(0) == 'P' && bytes(1) == 'K' && bytes(2) == 3 &&
        bytes(3) == 4) return "zip"
    if (n >= 2 && u(bytes(0)) == 0x1F && u(bytes(1)) == 0x8B) return "gzip"
    if (n >= 4 && u(bytes(0)) == 0x28 && u(bytes(1)) == 0xB5 &&
        u(bytes(2)) == 0x2F && u(bytes(3)) == 0xFD) return "zstd"
    if (n >= 4 && le32(bytes, 0) == 0x184D2204L) return "lz4"
    if (n >= 4 && (le32(bytes, 0) & 0xFFFFFFF0L) == 0x184D2A50L)
      return "zstd" // skippable opener (magic family shared with lz4)
    if (n >= 4 && ascii(bytes, 0, "Obj") && bytes(3) == 1) return "avro"
    if (n >= 12 && ascii(bytes, 0, "PAR1")) return "parquet"
    if (n >= 32 && ascii(bytes, 0, "ARROW1") && bytes(6) == 0 &&
        bytes(7) == 0) return "arrow"
    if (n >= 8 && ascii(bytes, 0, "ORC") && u(bytes(n - 1)) >= 4 &&
        u(bytes(n - 1)) < n - 4) return "orc" // head magic + sane psLen
    if (n >= 9 && ascii(bytes, 0, "FLV") && u(bytes(3)) == 1) return "flv"
    if (n >= 24 && ascii(bytes, 0, ".snd")) return "au"
    if (n >= 14 && bytes(0) == 'B' && bytes(1) == 'Z' && bytes(2) == 'h' &&
        bytes(3) >= '1' && bytes(3) <= '9') return "bzip2"
    if (n >= 12 && u(bytes(0)) == 0xFD && bytes(1) == '7' &&
        bytes(2) == 'z' && bytes(3) == 'X' && bytes(4) == 'Z' &&
        bytes(5) == 0) return "xz"
    if (n >= 32 && u(bytes(0)) == '7' && u(bytes(1)) == 'z' &&
        u(bytes(2)) == 0xBC && u(bytes(3)) == 0xAF &&
        u(bytes(4)) == 0x27 && u(bytes(5)) == 0x1C) return "7z"
    if (n >= 8 && ((u(bytes(0)) == 'I' && u(bytes(1)) == 'I' &&
        u(bytes(2)) == 42 && u(bytes(3)) == 0) ||
      (u(bytes(0)) == 'M' && u(bytes(1)) == 'M' && u(bytes(2)) == 0 &&
        u(bytes(3)) == 42))) return "tiff"
    if (n >= 8 && u(bytes(0)) == 0x93 && ascii(bytes, 1, "NUMPY"))
      return "npy"
    if (ascii(bytes, 0, "WARC/1.")) return "warc"
    if (n >= 263 && ascii(bytes, 257, "ustar")) return "tar"
    if (ascii(bytes, 0, "ID3")) return "mp3"
    if (n >= 2 && u(bytes(0)) == 0xFF && (u(bytes(1)) & 0xE0) == 0xE0)
      return "mp3" // bare MPEG audio sync
    if (TfRecord.looksLikeTfRecord(bytes)) return "tfrecord"
    // safetensors has NO magic: 8-byte LE header length whose region
    // is in-bounds and brace-delimited (the TFRecord no-magic
    // precedent — structural, not a guess; checked AFTER the
    // CRC-verified TFRecord test, which is the stronger check)
    if (n >= 10 && bytes(8) == '{') {
      var hl = 0L
      var i = 7
      while (i >= 0) { hl = (hl << 8) | u(bytes(i)); i -= 1 }
      if (hl >= 2 && hl <= n - 8 && bytes(8 + hl.toInt - 1) == '}')
        return "safetensors"
    }
    // printable-prefix fallback
    val lim = math.min(n, 512)
    var i = 0
    var printable = 0
    while (i < lim) {
      val c = u(bytes(i))
      if (c == 9 || c == 10 || c == 13 || (c >= 32 && c < 127)) printable += 1
      i += 1
    }
    if (printable == lim) "text" else "unknown"
  }

  private def le32(b: Array[Byte], p: Int): Long =
    (u(b(p)) | (u(b(p + 1)) << 8) | (u(b(p + 2)) << 16)).toLong |
      (u(b(p + 3)).toLong << 24)

  /** One row per blob: `(…keep…, format)`. Narrow map; prefix reads. */
  def sniffFormats(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) :+
      StructField("format", StringType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.map { r =>
        val arr = new Array[Any](nKeep + 1)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        arr(nKeep) = sniff(r.getAs[Array[Byte]](idx))
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }
}
