package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ZIP archive ingest (PKWARE APPNOTE.TXT / ISO 21320-1) — the second
  * crawled-archive family next to tar ([[TarShard]]): datasets and
  * scraped site bundles overwhelmingly arrive as .zip.
  *
  * The walk is CENTRAL-DIRECTORY-FIRST — the structure a scale reader
  * actually uses: locate the end-of-central-directory record from the
  * tail (bounded comment scan), walk the central directory, and
  * verify each entry against its local header before touching
  * payload bytes. This is what makes ZIP random-access: at 100 TB a
  * reader lists members from the CD (a few KB at the blob tail)
  * without streaming the archive — the opposite of tar's sequential
  * walk, and the reason both families exist.
  *
  * Strict and total over untrusted bytes, the container-family
  * discipline: every offset/size field is bounds-checked before use,
  * CD and local metadata must AGREE (name, method, sizes), every
  * entry's CRC-32 is verified against the decompressed payload, and
  * inflation is capped (`maxInflate`) so a zip bomb cannot allocate
  * its claimed size — the [[WebArchive]] gzip-bomb argument. Stored
  * (method 0) and deflated (method 8) entries are decoded; ZIP64
  * (APPNOTE 4.5 — what any >4 GiB shard or >65535-entry store
  * carries) is fully supported: EOCD64 locator/record and per-entry
  * 0x0001 extra fields resolve the 0xFFFF/0xFFFFFFFF markers, with
  * every resolved value re-bounds-checked. Encrypted entries and
  * data-descriptor streams stay typed rejects (quarantine,
  * spec-pinned).
  */
object ZipArchive {

  final case class ZipEntry(idx: Int, name: String, method: Int,
                            usize: Long, csize: Long, payloadSum: Long)

  private def u(b: Byte): Int = b & 0xFF

  private def le16(b: Array[Byte], p: Int): Int = u(b(p)) | (u(b(p + 1)) << 8)

  private def le32(b: Array[Byte], p: Int): Long =
    (u(b(p)) | (u(b(p + 1)) << 8) | (u(b(p + 2)) << 16)).toLong |
      (u(b(p + 3)).toLong << 24)

  private def le64(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | u(b(p + i)); i -= 1 }
    v
  }

  /** One central-directory entry with ZIP64 (APPNOTE 4.5) extra-field
    * resolution: 0xFFFFFFFF-marked usize/csize/lhOff are read from the
    * 0x0001 extra field in spec order. `entryLen` is the full CD
    * record length (for cursor advance).
    */
  private final case class CdEntry(name: String, nameLen: Int, flags: Int,
                                   method: Int, crc: Long, csize: Long,
                                   usize: Long, lhOff: Long, entryLen: Int)

  private def readCdEntry(bytes: Array[Byte], cp: Int, cdEnd: Int)
      : Either[String, CdEntry] = {
    if (cdEnd - cp < 46) return Left("truncated central directory entry")
    if (!(bytes(cp) == 'P' && bytes(cp + 1) == 'K' && bytes(cp + 2) == 1 &&
          bytes(cp + 3) == 2)) return Left("bad central directory signature")
    val flags = le16(bytes, cp + 8)
    val method = le16(bytes, cp + 10)
    val crc = le32(bytes, cp + 16)
    var csize = le32(bytes, cp + 20)
    var usize = le32(bytes, cp + 24)
    val nameLen = le16(bytes, cp + 28)
    val extraLen = le16(bytes, cp + 30)
    val commentLen = le16(bytes, cp + 32)
    var lhOff = le32(bytes, cp + 42)
    if (cdEnd - cp < 46 + nameLen + extraLen + commentLen)
      return Left("truncated central directory entry")
    val name = new String(bytes, cp + 46, nameLen,
      java.nio.charset.StandardCharsets.UTF_8)
    if (usize == 0xFFFFFFFFL || csize == 0xFFFFFFFFL ||
        lhOff == 0xFFFFFFFFL) {
      // walk extra fields for the ZIP64 record
      var ep = cp + 46 + nameLen
      val eEnd = ep + extraLen
      var found = false
      while (ep + 4 <= eEnd && !found) {
        val id = le16(bytes, ep)
        val sz = le16(bytes, ep + 2)
        if (ep + 4 + sz > eEnd) return Left("extra field out of bounds")
        if (id == 0x0001) {
          var fp = ep + 4
          val fEnd = ep + 4 + sz
          def take8(): Either[String, Long] = {
            if (fp + 8 > fEnd) Left("zip64 extra too short")
            else { val v = le64(bytes, fp); fp += 8; Right(v) }
          }
          if (usize == 0xFFFFFFFFL) take8() match {
            case Left(e) => return Left(e); case Right(v) => usize = v
          }
          if (csize == 0xFFFFFFFFL) take8() match {
            case Left(e) => return Left(e); case Right(v) => csize = v
          }
          if (lhOff == 0xFFFFFFFFL) take8() match {
            case Left(e) => return Left(e); case Right(v) => lhOff = v
          }
          found = true
        } else ep += 4 + sz
      }
      if (!found) return Left("missing zip64 extra field")
    }
    Right(CdEntry(name, nameLen, flags, method, crc, csize, usize, lhOff,
      46 + nameLen + extraLen + commentLen))
  }

  /** Walk one ZIP blob via its central directory. `maxInflate` caps
    * the total decompressed bytes per entry.
    */
  def zipEntryTable(bytes: Array[Byte],
                    maxInflate: Long = 64L * 1024 * 1024)
      : Either[String, Seq[ZipEntry]] =
    // Defense in depth: every offset below is checked in subtraction
    // form against the blob length, but a crafted archive must never
    // crash a task — one poison blob yields a typed reject, not a
    // failed Spark job (the Xz.xzTable discipline).
    try zipEntryWalk(bytes, maxInflate)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def zipEntryWalk(bytes: Array[Byte], maxInflate: Long)
      : Either[String, Seq[ZipEntry]] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val n = bytes.length
    // EOCD: scan back over the (≤ 65535-byte) comment for PK\x05\x06
    if (n < 22) return Left("too short for eocd")
    var eocd = -1
    val scanLimit = math.max(0, n - 22 - 65535)
    var p = n - 22
    while (eocd < 0 && p >= scanLimit) {
      if (bytes(p) == 'P' && bytes(p + 1) == 'K' && bytes(p + 2) == 5 &&
          bytes(p + 3) == 6 && p + 22 + le16(bytes, p + 20) == n)
        eocd = p
      p -= 1
    }
    if (eocd < 0) return Left("no end-of-central-directory")
    if (le16(bytes, eocd + 4) != 0 || le16(bytes, eocd + 6) != 0)
      return Left("multi-disk archive unsupported")
    var nEntries = le16(bytes, eocd + 10).toLong
    if (le16(bytes, eocd + 8).toLong != nEntries)
      return Left("disk/total entry count mismatch")
    var cdSize = le32(bytes, eocd + 12)
    var cdOff = le32(bytes, eocd + 16)
    if (nEntries == 0xFFFFL || cdOff == 0xFFFFFFFFL ||
        cdSize == 0xFFFFFFFFL) {
      // ZIP64 (APPNOTE 4.5): EOCD64 locator immediately precedes EOCD
      if (eocd < 20) return Left("missing zip64 locator")
      val loc = eocd - 20
      if (!(bytes(loc) == 'P' && bytes(loc + 1) == 'K' &&
            bytes(loc + 2) == 6 && bytes(loc + 3) == 7))
        return Left("missing zip64 locator")
      if (le32(bytes, loc + 4) != 0L || le32(bytes, loc + 16) != 1L)
        return Left("multi-disk archive unsupported")
      val e64 = le64(bytes, loc + 8)
      // subtraction form: e64 is attacker-controlled 64-bit, a sum
      // with 56 could wrap negative and bypass the check
      if (e64 < 0 || e64 > loc - 56L) return Left("zip64 eocd out of bounds")
      val ep = e64.toInt
      if (!(bytes(ep) == 'P' && bytes(ep + 1) == 'K' &&
            bytes(ep + 2) == 6 && bytes(ep + 3) == 6))
        return Left("bad zip64 eocd signature")
      if (le32(bytes, ep + 16) != 0L || le32(bytes, ep + 20) != 0L)
        return Left("multi-disk archive unsupported")
      nEntries = le64(bytes, ep + 32)
      if (le64(bytes, ep + 24) != nEntries)
        return Left("disk/total entry count mismatch")
      cdSize = le64(bytes, ep + 40)
      cdOff = le64(bytes, ep + 48)
      if (nEntries < 0 || nEntries > Int.MaxValue)
        return Left("zip64 entry count out of bounds")
      if (cdSize < 0 || cdOff < 0 || cdSize > e64 || cdOff > e64 - cdSize)
        return Left("central directory out of bounds")
    } else if (cdOff + cdSize > eocd)
      return Left("central directory out of bounds")
    val out = scala.collection.mutable.ArrayBuffer.empty[ZipEntry]
    var cp = cdOff.toInt
    val cdEnd = (cdOff + cdSize).toInt
    var idx = 0
    while (idx < nEntries) {
      val e = readCdEntry(bytes, cp, cdEnd) match {
        case Left(err) => return Left(err)
        case Right(v) => v
      }
      val name = e.name
      val method = e.method
      val csize = e.csize
      val usize = e.usize
      val crc = e.crc
      if (name.isEmpty) return Left("empty entry name")
      if ((e.flags & 0x0001) != 0) return Left("encrypted entry unsupported")
      if (method != 0 && method != 8) return Left("unsupported method")
      if (usize > maxInflate) return Left("entry exceeds inflate cap")
      // local header agreement + payload location
      if (e.lhOff < 0 || e.lhOff > n - 30L)
        return Left("local header out of bounds")
      val lp = e.lhOff.toInt
      if (!(bytes(lp) == 'P' && bytes(lp + 1) == 'K' && bytes(lp + 2) == 3 &&
            bytes(lp + 3) == 4)) return Left("bad local header signature")
      val lNameLen = le16(bytes, lp + 26)
      val lExtraLen = le16(bytes, lp + 28)
      if (csize < 0 || csize > n - 30L - lNameLen - lExtraLen - e.lhOff)
        return Left("entry payload out of bounds")
      if (lNameLen != e.nameLen ||
          !java.util.Arrays.equals(
            java.util.Arrays.copyOfRange(bytes, lp + 30, lp + 30 + lNameLen),
            java.util.Arrays.copyOfRange(bytes, cp + 46, cp + 46 + e.nameLen)))
        return Left("central/local name mismatch")
      if (le16(bytes, lp + 8) != method)
        return Left("central/local method mismatch")
      val dataOff = lp + 30 + lNameLen + lExtraLen
      // decode + verify
      val crcCalc = new java.util.zip.CRC32
      var sum = 0L
      var produced = 0L
      if (method == 0) {
        if (csize != usize) return Left("stored entry size mismatch")
        var i = dataOff
        val lim = dataOff + csize.toInt
        while (i < lim) { sum += u(bytes(i)); i += 1 }
        crcCalc.update(bytes, dataOff, csize.toInt)
        produced = csize
      } else {
        val inf = new java.util.zip.Inflater(true) // raw deflate
        try {
          inf.setInput(bytes, dataOff, csize.toInt)
          val buf = new Array[Byte](8192)
          var done = false
          while (!done) {
            val got =
              try inf.inflate(buf)
              catch {
                case _: java.util.zip.DataFormatException =>
                  return Left("bad deflate stream")
              }
            if (got > 0) {
              produced += got
              if (produced > maxInflate || produced > usize)
                return Left("inflated size mismatch")
              var i = 0
              while (i < got) { sum += u(buf(i)); i += 1 }
              crcCalc.update(buf, 0, got)
            } else if (inf.finished()) done = true
            else if (inf.needsInput() || inf.needsDictionary())
              return Left("bad deflate stream")
          }
          if (inf.getBytesRead != csize) return Left("deflate length mismatch")
        } finally inf.end()
      }
      if (produced != usize) return Left("inflated size mismatch")
      if (crcCalc.getValue != crc) return Left("bad entry crc")
      if ((e.flags & 0x0008) != 0) {
        // GP bit 3: a STREAMING writer (java.util.zip on a non-seekable
        // sink, most network writers) zeroed the local header's
        // crc/sizes and appended a data descriptor after the payload
        // (APPNOTE 4.3.9). The central directory above carries the
        // authoritative values — here we additionally require the
        // descriptor to agree with them, in either its 32-bit or
        // zip64 (64-bit sizes) form, optional signature included.
        val dd = dataOff.toLong + csize
        if (dd + 12 > n) return Left("truncated data descriptor")
        var d = dd.toInt
        if (le32(bytes, d) == 0x08074b50L) {
          if (dd + 16 > n) return Left("truncated data descriptor")
          d += 4
        }
        val dCrc = le32(bytes, d)
        val ok32 = dCrc == crc &&
          le32(bytes, d + 4) == (csize & 0xFFFFFFFFL) &&
          le32(bytes, d + 8) == (usize & 0xFFFFFFFFL)
        val ok64 = d + 20 <= n && dCrc == crc &&
          le64(bytes, d + 4) == csize && le64(bytes, d + 12) == usize
        if (!ok32 && !ok64) return Left("data descriptor mismatch")
      }
      out += ZipEntry(idx, name, method, usize, csize, sum)
      cp += e.entryLen
      idx += 1
    }
    if (cp != cdEnd) return Left("central directory size mismatch")
    Right(out.toSeq)
  }

  /** Decoded payloads of entries whose name ends with `suffix`
    * (empty = all files): `(idx, name, content)`. Validates via
    * [[zipEntryTable]] first (every CRC verified), then re-walks
    * collecting content — the [[Gzip]] two-pass convention.
    */
  /** Validated payload fetch for sibling modules ([[Docx]]): runs the
    * full CRC-verified [[zipEntryTable]] walk first, then returns the
    * decoded entries whose name ends with `suffix`.
    */
  private[ext] def payloadsOf(bytes: Array[Byte], suffix: String,
                              maxInflate: Long = 64L * 1024 * 1024)
      : Either[String, Seq[(Int, String, Array[Byte])]] =
    zipEntryTable(bytes, maxInflate)
      .map(_ => zipPayloads(bytes, suffix, maxInflate))

  private def zipPayloads(bytes: Array[Byte], suffix: String,
                          maxInflate: Long)
      : Seq[(Int, String, Array[Byte])] = {
    val res = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Array[Byte])]
    val n = bytes.length
    // locate EOCD again (validated to exist)
    var p = n - 22
    while (!(bytes(p) == 'P' && bytes(p + 1) == 'K' && bytes(p + 2) == 5 &&
        bytes(p + 3) == 6)) p -= 1
    var nEntries = le16(bytes, p + 10).toLong
    var cpL = le32(bytes, p + 16)
    if (nEntries == 0xFFFFL || cpL == 0xFFFFFFFFL) {
      val ep = le64(bytes, p - 20 + 8).toInt // EOCD64 via its locator
      nEntries = le64(bytes, ep + 32)
      cpL = le64(bytes, ep + 48)
    }
    var cp = cpL.toInt
    var idx = 0
    while (idx < nEntries) {
      val e = readCdEntry(bytes, cp, n) match {
        case Left(_) => return res.toSeq
        case Right(v) => v
      }
      val method = e.method
      val csize = e.csize
      val lp = e.lhOff.toInt
      val name = e.name
      if ((suffix.isEmpty || name.endsWith(suffix)) && !name.endsWith("/")) {
        val dataOff = lp + 30 + le16(bytes, lp + 26) + le16(bytes, lp + 28)
        val content =
          if (method == 0)
            java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + csize.toInt)
          else {
            val inf = new java.util.zip.Inflater(true)
            inf.setInput(bytes, dataOff, csize.toInt)
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            while (!inf.finished()) {
              val got = inf.inflate(buf)
              if (got == 0 && !inf.finished()) { inf.end(); return res.toSeq }
              bos.write(buf, 0, got)
            }
            inf.end()
            bos.toByteArray
          }
        res += ((idx, name, content))
      }
      cp += e.entryLen
      idx += 1
    }
    res.toSeq
  }

  /** Explode decoded entry payloads of a ZIP column:
    * `(…keep…, entry_idx, name, content)` — the composition half
    * (`.npz` → [[Npy]], zip WebDataset → image hashing). Poison blobs
    * yield zero rows.
    */
  def extractZipPayloads(df: DataFrame, binCol: String,
                         suffix: String = "",
                         maxInflate: Long = 64L * 1024 * 1024): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("entry_idx", IntegerType, nullable = false),
        StructField("name", StringType, nullable = false),
        StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        zipEntryTable(bytes, maxInflate) match {
          case Left(_) => Iterator.empty
          case Right(_) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            zipPayloads(bytes, suffix, maxInflate).iterator.map {
              case (ei, name, content) =>
                val arr = new Array[Any](nKeep + 3)
                System.arraycopy(prefix, 0, arr, 0, nKeep)
                arr(nKeep) = ei; arr(nKeep + 1) = name
                arr(nKeep + 2) = content
                Row.fromSeq(scala.collection.immutable.ArraySeq
                  .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Explode a binary ZIP column into one row per entry:
    * `(…keep…, entry_idx, name, method, usize, payload_sum)`.
    * Poison blobs yield zero rows; [[zipErrors]] is the error channel.
    */
  def extractZipEntries(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("entry_idx", IntegerType, nullable = false),
        StructField("name", StringType, nullable = false),
        StructField("method", IntegerType, nullable = false),
        StructField("usize", LongType, nullable = false),
        StructField("payload_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        zipEntryTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(entries) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            entries.iterator.map { e =>
              val arr = new Array[Any](nKeep + 5)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = e.idx; arr(nKeep + 1) = e.name
              arr(nKeep + 2) = e.method; arr(nKeep + 3) = e.usize
              arr(nKeep + 4) = e.payloadSum
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel: one row per blob, `(n_entries, ok, error)`. */
  def zipErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("n_entries", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false),
        StructField("error", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.map { r =>
        val res = zipEntryTable(r.getAs[Array[Byte]](idx))
        val arr = new Array[Any](nKeep + 3)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        res match {
          case Right(es) =>
            arr(nKeep) = es.length; arr(nKeep + 1) = true; arr(nKeep + 2) = null
          case Left(e) =>
            arr(nKeep) = 0; arr(nKeep + 1) = false; arr(nKeep + 2) = e
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // fixture writer

  /** Build a ZIP from (name, method, payload) — method 0 stored or
    * 8 deflated; real CRC-32s, coherent central directory.
    */
  def buildZip(entries: Seq[(String, Int, Array[Byte])],
               comment: String = "",
               forceZip64: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    val metas = entries.map { case (name, method, payload) =>
      val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val crc = new java.util.zip.CRC32
      crc.update(payload)
      val data =
        if (method == 0) payload
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(payload); d.finish()
          val buf = new Array[Byte](payload.length + 64)
          val outB = new java.io.ByteArrayOutputStream()
          while (!d.finished()) {
            val got = d.deflate(buf)
            outB.write(buf, 0, got)
          }
          d.end()
          outB.toByteArray
        }
      val off = out.size()
      out.write(Array[Byte]('P', 'K', 3, 4))
      w16(20); w16(0); w16(method); w16(0); w16(0)
      w32(crc.getValue); w32(data.length); w32(payload.length)
      w16(nameBytes.length); w16(0)
      out.write(nameBytes); out.write(data)
      (nameBytes, method, crc.getValue, data.length.toLong,
        payload.length.toLong, off.toLong)
    }
    def w64(v: Long): Unit = {
      var x = v
      var i = 0
      while (i < 8) { out.write((x & 0xFF).toInt); x >>= 8; i += 1 }
    }
    val cdOff = out.size()
    metas.foreach { case (nameBytes, method, crc, csize, usize, off) =>
      out.write(Array[Byte]('P', 'K', 1, 2))
      w16(if (forceZip64) 45 else 20); w16(if (forceZip64) 45 else 20)
      w16(0); w16(method); w16(0); w16(0)
      if (forceZip64) {
        // 0xFFFFFFFF markers; real values live in the 0x0001 extra
        w32(crc); w32(0xFFFFFFFFL); w32(0xFFFFFFFFL)
        w16(nameBytes.length); w16(4 + 24); w16(0); w16(0); w16(0)
        w32(0); w32(0xFFFFFFFFL)
        out.write(nameBytes)
        w16(0x0001); w16(24)
        w64(usize); w64(csize); w64(off)
      } else {
        w32(crc); w32(csize); w32(usize)
        w16(nameBytes.length); w16(0); w16(0); w16(0); w16(0)
        w32(0); w32(off)
        out.write(nameBytes)
      }
    }
    val cdSize = out.size() - cdOff
    val cb = comment.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    if (forceZip64) {
      val e64 = out.size()
      out.write(Array[Byte]('P', 'K', 6, 6))
      w64(44L) // size of remaining record
      w16(45); w16(45); w32(0L); w32(0L)
      w64(metas.length.toLong); w64(metas.length.toLong)
      w64(cdSize.toLong); w64(cdOff.toLong)
      out.write(Array[Byte]('P', 'K', 6, 7)) // locator
      w32(0L); w64(e64.toLong); w32(1L)
      out.write(Array[Byte]('P', 'K', 5, 6))
      w16(0); w16(0); w16(0xFFFF); w16(0xFFFF)
      w32(0xFFFFFFFFL); w32(0xFFFFFFFFL); w16(cb.length)
    } else {
      out.write(Array[Byte]('P', 'K', 5, 6))
      w16(0); w16(0); w16(metas.length); w16(metas.length)
      w32(cdSize); w32(cdOff); w16(cb.length)
    }
    out.write(cb)
    out.toByteArray
  }
}
