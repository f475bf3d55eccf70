package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tar shard ingest (POSIX ustar, IEEE 1003.1) + WebDataset sample
  * grouping — the storage layout large multimodal training corpora
  * actually ship in: many-GB tar "shards" whose members are sample
  * components grouped by a shared basename key (`000017.jpg`,
  * `000017.txt`, `000017.json` → one sample), read sequentially
  * (the WebDataset convention, webdataset/webdataset on GitHub).
  *
  * The walk is strict and total over untrusted bytes, the discipline
  * of the container family ([[Multimodal]]/[[Matroska]]/[[Ogg]]):
  * every header checksum is VERIFIED (sum of the 512 header bytes
  * with the checksum field read as spaces), sizes are bounds-checked
  * before any skip, and every malformation is a typed reject —
  * truncated header/member, bad magic, bad checksum, non-octal or
  * base-256 sizes, unsupported member types (pax/GNU-longname), and
  * a missing or dirty end-of-archive. Payload bytes are never
  * materialized: members stream as `(name, size, byte-sum)`.
  *
  * 100 TB shape: one shard = one blob row; the member walk is a
  * narrow per-partition map (no shuffle), and WebDataset grouping is
  * a `groupBy(shard, sample_key)` whose groups are tiny (a sample's
  * 2-5 components) — the shuffle moves component metadata only.
  * The reference's closest surface is its tagged `.bin` container
  * scan (`/root/reference/lib/deduplicator/binary_utils.ex:26-49`):
  * same read-a-header, trust-nothing, walk-forward shape.
  */
object TarShard {

  final case class TarMember(idx: Int, name: String, size: Long,
                             typeflag: Int, payloadSum: Long,
                             dataOff: Int)

  private def u(b: Byte): Int = b & 0xFF

  /** NUL-terminated (or field-filling) string at `[off, off+len)`. */
  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val lim = off + len
    while (end < lim && b(end) != 0) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Octal numeric field: leading spaces/NULs, octal digits, then
    * space/NUL padding. None on any other byte, on overflow, or on a
    * base-256 (high-bit) encoding.
    */
  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    if ((u(b(off)) & 0x80) != 0) return None // base-256: unsupported
    var i = off
    val lim = off + len
    while (i < lim && (b(i) == ' ' || b(i) == 0)) i += 1
    var v = 0L
    var digits = 0
    while (i < lim && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0')
      if (v < 0) return None
      digits += 1
      i += 1
    }
    if (digits == 0) return None
    while (i < lim && (b(i) == ' ' || b(i) == 0)) i += 1
    if (i != lim) return None
    Some(v)
  }

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    val lim = off + 512
    while (i < lim) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Walk one tar blob into its member table. Regular files carry
    * their payload byte-sum; directories and link members are emitted
    * with size-0 payload semantics (typeflag preserved, NUL normalized
    * to '0').
    */
  def tarMemberTable(bytes: Array[Byte]): Either[String, Seq[TarMember]] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try tarMemberTableWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def tarMemberTableWalk(bytes: Array[Byte]): Either[String, Seq[TarMember]] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[TarMember]
    var pos = 0
    var idx = 0
    while (true) {
      if (n - pos < 512) return Left("truncated header")
      if (isZeroBlock(bytes, pos)) {
        // end-of-archive: a second zero block, then only zeros
        if (n - pos < 1024) return Left("truncated end-of-archive")
        if (!isZeroBlock(bytes, pos + 512)) return Left("dirty end-of-archive")
        var p = pos + 1024
        while (p < n) {
          if (bytes(p) != 0) return Left("garbage after end-of-archive")
          p += 1
        }
        return Right(out.toSeq)
      }
      // magic: "ustar" + (NUL | ' ') covers POSIX ustar and GNU tar
      if (!(bytes(pos + 257) == 'u' && bytes(pos + 258) == 's' &&
            bytes(pos + 259) == 't' && bytes(pos + 260) == 'a' &&
            bytes(pos + 261) == 'r' &&
            (bytes(pos + 262) == 0 || bytes(pos + 262) == ' ')))
        return Left("bad magic")
      val stored = octal(bytes, pos + 148, 8) match {
        case Some(v) => v
        case None    => return Left("bad checksum field")
      }
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) 0x20 else u(bytes(pos + i)))
        i += 1
      }
      if (sum != stored) return Left("bad checksum")
      val size = octal(bytes, pos + 124, 12) match {
        case Some(v) => v
        case None    => return Left("bad size field")
      }
      val tfRaw = bytes(pos + 156)
      val tf = if (tfRaw == 0) '0'.toInt else tfRaw.toInt
      if (tf != '0' && tf != '5' && tf != '1' && tf != '2')
        return Left("unsupported member type")
      val base = str(bytes, pos, 100)
      if (base.isEmpty) return Left("empty member name")
      val prefix = str(bytes, pos + 345, 155)
      val name = if (prefix.isEmpty) base else prefix + "/" + base
      val dataStart = pos + 512
      if (size > n - dataStart) return Left("truncated member")
      var psum = 0L
      if (tf == '0') {
        var j = dataStart
        val lim = dataStart + size.toInt
        while (j < lim) { psum += u(bytes(j)); j += 1 }
      }
      out += TarMember(idx, name, size, tf, psum, dataStart)
      idx += 1
      pos = dataStart + (((size + 511) / 512) * 512).toInt
    }
    sys.error("unreachable")
  }

  /** Explode a binary tar-shard column into one row per member:
    * `(…keep…, member_idx, name, msize, typeflag, is_file,
    * payload_sum)`. Poison blobs yield zero rows; [[tarErrors]] is the
    * error channel.
    */
  def extractTarMembers(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("member_idx", IntegerType, nullable = false),
        StructField("name", StringType, nullable = false),
        StructField("msize", LongType, nullable = false),
        StructField("typeflag", IntegerType, nullable = false),
        StructField("is_file", BooleanType, nullable = false),
        StructField("payload_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        tarMemberTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(members) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            members.iterator.map { m =>
              val arr = new Array[Any](nKeep + 6)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = m.idx; arr(nKeep + 1) = m.name
              arr(nKeep + 2) = m.size; arr(nKeep + 3) = m.typeflag
              arr(nKeep + 4) = m.typeflag == '0'.toInt
              arr(nKeep + 5) = m.payloadSum
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Explode the PAYLOADS of regular-file members whose name ends in
    * `suffix` (case-sensitive; empty = all files):
    * `(…keep…, member_idx, name, payload)`. This is the consumption
    * half of the WebDataset convention — component bytes flow into the
    * image/audio decode passes ([[Multimodal.imageHash]] etc.). Only
    * matching members' bytes are copied out; everything else stays a
    * sum, so a shard of mostly-text with sparse images copies only the
    * images.
    */
  def extractTarPayloads(df: DataFrame, binCol: String,
                         suffix: String = ""): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("member_idx", IntegerType, nullable = false),
        StructField("name", StringType, nullable = false),
        StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        tarMemberTable(bytes) match {
          case Left(_) => Iterator.empty
          case Right(members) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            members.iterator
              .filter(m => m.typeflag == '0'.toInt &&
                (suffix.isEmpty || m.name.endsWith(suffix)))
              .map { m =>
                val arr = new Array[Any](nKeep + 3)
                System.arraycopy(prefix, 0, arr, 0, nKeep)
                arr(nKeep) = m.idx; arr(nKeep + 1) = m.name
                arr(nKeep + 2) = java.util.Arrays.copyOfRange(bytes,
                  m.dataOff, m.dataOff + m.size.toInt)
                Row.fromSeq(scala.collection.immutable.ArraySeq
                  .unsafeWrapArray(arr))
              }
        }
      }
    }(enc)
  }

  /** Error channel: one row per blob, `(n_members, ok, error)`. */
  def tarErrors(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("n_members", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false),
        StructField("error", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.map { r =>
        val res = tarMemberTable(r.getAs[Array[Byte]](idx))
        val arr = new Array[Any](nKeep + 3)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        res match {
          case Right(ms) =>
            arr(nKeep) = ms.length; arr(nKeep + 1) = true; arr(nKeep + 2) = null
          case Left(e) =>
            arr(nKeep) = 0; arr(nKeep + 1) = false; arr(nKeep + 2) = e
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }

  /** WebDataset sample grouping over a member table (regular files
    * only): the sample key is the member path up to the FIRST dot of
    * its basename (directories included) — `shard3/000017.seg.json`
    * and `shard3/000017.jpg` both key to `shard3/000017`. Returns one
    * row per (grouping columns, sample): `(…group…, sample_key,
    * n_components, exts, total_bytes)` with `exts` the
    * lexicographically-sorted comma-joined extension list.
    *
    * Pure Catalyst expressions — no UDF; groups are sample-sized
    * (a handful of components), so no skew risk at any corpus size.
    */
  def webdatasetSamples(members: DataFrame,
                        groupCols: Seq[String] = Seq("doc_id")): DataFrame = {
    val basename = substring_index(col("name"), "/", -1)
    val keyBase = substring_index(basename, ".", 1)
    val dir = expr("substring(name, 1, length(name) - " +
      "length(substring_index(name, '/', -1)))")
    val ext = when(length(basename) > length(keyBase),
        expr("substring(substring_index(name, '/', -1), " +
          "length(substring_index(substring_index(name, '/', -1), '.', 1)) + 2)"))
      .otherwise(lit(""))
    members.where(col("is_file"))
      .select(groupCols.map(col) ++ Seq(
        concat(dir, keyBase).as("sample_key"), ext.as("ext"),
        col("msize")): _*)
      .groupBy((groupCols :+ "sample_key").map(col): _*)
      .agg(count(lit(1)).as("n_components"),
        array_join(sort_array(collect_list(col("ext"))), ",").as("exts"),
        sum("msize").as("total_bytes"))
  }

  // ------------------------------------------------------------------
  // fixture writer (tests + gates)

  /** Build a POSIX ustar archive from (name, typeflag, payload).
    * Correct checksums; names over 100 chars split into the ustar
    * prefix field at a '/' boundary.
    */
  def buildTar(members: Seq[(String, Char, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, tf, payload) =>
      val hdr = new Array[Byte](512)
      val (prefix, base) =
        if (name.length <= 100) ("", name)
        else {
          // base = name after the cut slash (<= 100), prefix = before
          // it (<= 155): search the latest '/' at or before index 155
          val cut = name.lastIndexOf('/', 155)
          require(cut > 0 && name.length - cut - 1 <= 100,
            s"tar fixture: unsplittable long name $name")
          (name.substring(0, cut), name.substring(cut + 1))
        }
      def put(off: Int, s: String): Unit = {
        val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        System.arraycopy(b, 0, hdr, off, b.length)
      }
      put(0, base)
      put(100, "0000644")
      put(108, "0000000")
      put(116, "0000000")
      put(124, f"${payload.length}%011o")
      put(136, "00000000000")
      hdr(156) = tf.toByte
      put(257, "ustar")
      hdr(262) = 0
      put(263, "00")
      if (prefix.nonEmpty) put(345, prefix)
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      var sum = 0L
      hdr.foreach(b => sum += (b & 0xFF))
      put(148, f"$sum%06o")
      hdr(154) = 0
      hdr(155) = ' '
      out.write(hdr)
      out.write(payload)
      val pad = (512 - payload.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Synthetic WebDataset-style shard: a leading directory member,
    * then `2 + id%3` samples each carrying a formula-determined
    * component set (`txt` always; `jpg` when (id+j)%2==0; `json` when
    * (id+j)%3==0), sizes `10 + (13·id + 7·j + 3·e) mod 200` and
    * constant fill byte `(id + 31·j + 17·e) mod 251` (so payload_sum
    * = msize · fill — pure arithmetic for the oracle).
    */
  def syntheticTar(id: Long): Array[Byte] = {
    val members = scala.collection.mutable.ArrayBuffer
      .empty[(String, Char, Array[Byte])]
    members += ((f"shard${id % 7}", '5', Array.empty[Byte]))
    val nSamples = (2 + id % 3).toInt
    (0 until nSamples).foreach { j =>
      val exts = Seq(("txt", 0)) ++
        (if ((id + j) % 2 == 0) Seq(("jpg", 1)) else Nil) ++
        (if ((id + j) % 3 == 0) Seq(("json", 2)) else Nil)
      exts.foreach { case (ext, e) =>
        val size = (10 + (13 * id + 7 * j + 3 * e) % 200).toInt
        val fill = ((id + 31 * j + 17 * e) % 251).toByte
        val payload = new Array[Byte](size)
        java.util.Arrays.fill(payload, fill)
        members += ((f"shard${id % 7}/s${id}%05d_$j%02d.$ext", '0', payload))
      }
    }
    buildTar(members.toSeq)
  }
}
