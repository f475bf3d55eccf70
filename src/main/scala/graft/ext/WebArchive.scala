package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) web-archive plumbing — the ingest format of any
  * crawl-derived 100 TB text corpus (Common Crawl ships ~64k WARC
  * files per monthly crawl). The reference engine stops at opaque
  * binary chunks (`/root/reference/lib/deduplicator.ex` reads flat
  * files); a crawl pipeline needs the layer ABOVE that: split an
  * archive blob into records, parse the HTTP response envelope, and
  * hand the payload to the text/dedup operators.
  *
  * Format facts used here are from the public WARC 1.0/1.1 spec
  * (ISO 28500) and Common Crawl's published layout:
  *   - a WARC file is a concatenation of records; each record is a
  *     CRLF-terminated header block (`WARC/1.0` version line, then
  *     `Name: value` fields, then an empty line), `Content-Length`
  *     bytes of content block, and a `\r\n\r\n` terminator;
  *   - Common Crawl compresses each record as its OWN gzip member and
  *     concatenates the members, so a range-request can decompress one
  *     record — [[warcRecordTable]] accepts both the plain and the
  *     member-gzipped form transparently (multi-member inflate);
  *   - `response` records carry an HTTP/1.x message as content:
  *     status line, headers, `\r\n\r\n`, body.
  *
  * Scale notes (100 TB): parsing is a narrow per-partition map — no
  * shuffle, no driver involvement. One crawl file is one blob here
  * (bounded by the 2 GB array limit — CC files are ~1 GB gzipped);
  * parallelism comes from the file count (tens of thousands), exactly
  * how a 1000-executor cluster wants it sliced. All length fields in
  * the blob are UNTRUSTED: every read is bounds-checked first, the
  * inflate path carries an output cap (gzip-bomb guard), and the
  * header block is capped, so a poison archive costs one typed error
  * row, never an allocation bomb or a task death.
  */
object WebArchive {

  /** One parsed WARC record. `content` is the raw content block
    * (an HTTP message for `response` records).
    */
  final case class WarcRecord(idx: Int, version: String, warcType: String,
                              recordId: String, targetUri: String,
                              date: String, contentType: String,
                              refersTo: String, contentLength: Int,
                              content: Array[Byte])

  /** Max size of one record's header block — real WARC headers are a
    * few hundred bytes; 1 MiB tolerates pathological-but-legal URIs
    * while bounding the line scan on garbage input.
    */
  private val MaxHeaderBlock = 1 << 20

  /** Cap on the inflated size of a gzipped archive blob (gzip-bomb
    * guard): deflate is ≤ ~1030:1, real crawl data is ~3-4:1, so 64×
    * the compressed size (floor 16 MiB) passes everything legitimate
    * and stops a bomb at a bounded cost.
    */
  private def inflateCap(compressedLen: Int): Long =
    math.max(16L << 20, compressedLen.toLong * 64)

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B

  /** Inflate a (possibly multi-member) gzip stream with an output cap.
    * `GZIPInputStream` handles member concatenation natively — the
    * Common Crawl record-per-member layout needs nothing extra.
    */
  private def inflateAll(bytes: Array[Byte]): Either[String, Array[Byte]] = {
    val cap = inflateCap(bytes.length)
    // size HINT only (the stream grows): clamp to 64 MiB so a ~1 GiB
    // compressed blob cannot drive the hint past Int.MaxValue
    val out = new java.io.ByteArrayOutputStream(
      math.min(64L << 20, math.min(cap, bytes.length.toLong * 4)).toInt)
    val buf = new Array[Byte](64 << 10)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      var n = in.read(buf)
      while (n > 0) {
        if (out.size.toLong + n > cap) return Left("gzip inflate cap")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close()
      Right(out.toByteArray)
    } catch {
      case _: java.io.IOException => Left("bad gzip stream")
    }
  }

  /** Find the next CRLF at or after `from`, bounded by `limit`
    * (exclusive); -1 if absent. WARC mandates CRLF line ends — a
    * LF-only header block is malformed and rejected (strict parse:
    * crawl-scale pipelines route malformed archives to quarantine
    * rather than guessing).
    */
  private def findCrlf(b: Array[Byte], from: Int, limit: Int): Int = {
    var i = from
    val end = math.min(limit, b.length) - 1
    while (i <= end - 1 || (i == end && false)) {
      if (b(i) == '\r' && i + 1 < b.length && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Parse one archive blob into its records. Strict: any structural
    * violation (bad version line, missing/oversized/negative
    * `Content-Length`, missing record terminator, truncation) rejects
    * the whole blob with a typed reason — total, never throws.
    */
  def warcRecordTable(bytes: Array[Byte]): Either[String, Seq[WarcRecord]] =
    // total under ANY malformation: a crafted blob that slips past a
    // bounds check is a typed reject, never a task crash
    try warcRecordTableWalk(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException => Left("structural overrun")
      case _: NegativeArraySizeException => Left("structural overrun")
    }

  private def warcRecordTableWalk(bytes: Array[Byte]): Either[String, Seq[WarcRecord]] = {
    if (bytes == null || bytes.isEmpty) return Left("empty blob")
    val data0 =
      if (isGzip(bytes)) inflateAll(bytes) match {
        case Left(e) => return Left(e)
        case Right(d) => d
      } else bytes
    val data = data0
    val n = data.length
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    var idx = 0
    while (pos < n) {
      val headerLimit = math.min(n, pos + MaxHeaderBlock)
      // version line
      val vEnd = findCrlf(data, pos, headerLimit)
      if (vEnd < 0) return Left("no version line")
      val version = ascii(data, pos, vEnd)
      if (!version.startsWith("WARC/")) return Left("bad version line")
      // header fields until the empty line
      var p = vEnd + 2
      var warcType: String = null
      var recordId: String = null
      var targetUri: String = null
      var date: String = null
      var contentType: String = null
      var refersTo: String = null
      var contentLength = -1L
      var done = false
      while (!done) {
        val lEnd = findCrlf(data, p, headerLimit)
        if (lEnd < 0) return Left("unterminated header block")
        if (lEnd == p) { done = true; p += 2 } // empty line
        else {
          val line = ascii(data, p, lEnd)
          val colon = line.indexOf(':')
          if (colon <= 0) return Left("bad header field")
          val name = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          name match {
            case "warc-type" => warcType = value
            case "warc-record-id" => recordId = value
            case "warc-target-uri" => targetUri = value
            case "warc-date" => date = value
            case "content-type" => contentType = value
            case "warc-refers-to" => refersTo = value
            case "content-length" =>
              try contentLength = java.lang.Long.parseLong(value)
              catch { case _: NumberFormatException =>
                return Left("bad content-length") }
              if (contentLength < 0) return Left("negative content-length")
            case _ => () // other WARC fields pass through unread
          }
          p = lEnd + 2
        }
      }
      if (contentLength < 0) return Left("missing content-length")
      // bounds BEFORE any slice: the length field is untrusted
      if (contentLength > n.toLong - p) return Left("truncated content")
      val bodyEnd = p + contentLength.toInt
      if (bodyEnd + 4 > n) return Left("missing record terminator")
      if (!(data(bodyEnd) == '\r' && data(bodyEnd + 1) == '\n' &&
            data(bodyEnd + 2) == '\r' && data(bodyEnd + 3) == '\n'))
        return Left("bad record terminator")
      val content = java.util.Arrays.copyOfRange(data, p, bodyEnd)
      out += WarcRecord(idx, version, warcType, recordId, targetUri, date,
        contentType, refersTo, contentLength.toInt, content)
      idx += 1
      pos = bodyEnd + 4
    }
    if (out.isEmpty) Left("no records") else Right(out.toSeq)
  }

  /** Parsed HTTP response envelope from a `response` record's content
    * block: `(status, contentType, bodyOffset)` — body is
    * `content[bodyOffset ..)`. None when the content is not an HTTP/1.x
    * message (the caller emits null HTTP columns, not an error — a
    * `warcinfo` or `request` record is not malformed).
    */
  private def parseHttpResponse(c: Array[Byte]): Option[(Int, String, Int)] = {
    val limit = math.min(c.length, MaxHeaderBlock)
    val sEnd = findCrlf(c, 0, limit)
    if (sEnd < 0) return None
    val status = ascii(c, 0, sEnd)
    if (!status.startsWith("HTTP/1.")) return None
    val parts = status.split(" ", 3)
    if (parts.length < 2) return None
    val code = try parts(1).toInt catch {
      case _: NumberFormatException => return None }
    var p = sEnd + 2
    var ctype: String = null
    while (true) {
      val lEnd = findCrlf(c, p, limit)
      if (lEnd < 0) return None
      if (lEnd == p) return Some((code, ctype, p + 2))
      val line = ascii(c, p, lEnd)
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim.equalsIgnoreCase("content-type"))
        ctype = line.substring(colon + 1).trim
      p = lEnd + 2
    }
    None // unreachable
  }

  /** Explode a binary WARC column into one row per record, with the
    * HTTP response envelope parsed where present. Poison blobs yield
    * zero rows (the container-explode convention shared with
    * [[Multimodal.extractMp4Samples]]); use [[warcErrors]] for the
    * error channel. Narrow per-partition flatMap — no shuffle.
    *
    * Output columns appended: `rec_idx, warc_type, rec_id, target_uri,
    * refers_to, content_len, http_status, http_ctype, body` (body =
    * HTTP body for response records, else the whole content block).
    * `refers_to` carries WARC-Refers-To — the crawl-level dedup
    * pointer `revisit` records use to reference the capture that
    * holds the actual payload (resolved by joining back on `rec_id`,
    * possibly across archives).
    */
  def extractWarcRecords(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      Seq(StructField("rec_idx", IntegerType, nullable = false),
        StructField("warc_type", StringType, nullable = true),
        StructField("rec_id", StringType, nullable = true),
        StructField("target_uri", StringType, nullable = true),
        StructField("refers_to", StringType, nullable = true),
        StructField("content_len", IntegerType, nullable = false),
        StructField("http_status", IntegerType, nullable = true),
        StructField("http_ctype", StringType, nullable = true),
        StructField("body", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == binCol).map(_._2)
    val nKeep = keepIdx.length
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        warcRecordTable(r.getAs[Array[Byte]](idx)) match {
          case Left(_) => Iterator.empty
          case Right(records) =>
            val prefix = new Array[Any](nKeep)
            var i = 0
            while (i < nKeep) { prefix(i) = r.get(keepIdx(i)); i += 1 }
            records.iterator.map { rec =>
              val http =
                if (rec.warcType == "response") parseHttpResponse(rec.content)
                else None
              val arr = new Array[Any](nKeep + 9)
              System.arraycopy(prefix, 0, arr, 0, nKeep)
              arr(nKeep) = rec.idx
              arr(nKeep + 1) = rec.warcType
              arr(nKeep + 2) = rec.recordId
              arr(nKeep + 3) = rec.targetUri
              arr(nKeep + 4) = rec.refersTo
              arr(nKeep + 5) = rec.contentLength
              http match {
                case Some((code, ctype, off)) =>
                  arr(nKeep + 6) = code
                  arr(nKeep + 7) = ctype
                  arr(nKeep + 8) = java.util.Arrays.copyOfRange(
                    rec.content, off, rec.content.length)
                case None =>
                  arr(nKeep + 6) = null
                  arr(nKeep + 7) = null
                  arr(nKeep + 8) = rec.content
              }
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(arr))
            }
        }
      }
    }(enc)
  }

  /** Error channel for the explode: one row per input blob with
    * `(n_records, ok, error)` — the filter-before-parse diagnostic
    * pass (same shape as [[Multimodal.decodeVideo]]).
    */
  def warcErrors(df: DataFrame, binCol: String): DataFrame = {
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
        val res = warcRecordTable(r.getAs[Array[Byte]](idx))
        val arr = new Array[Any](nKeep + 3)
        var i = 0
        while (i < nKeep) { arr(i) = r.get(keepIdx(i)); i += 1 }
        res match {
          case Left(e) =>
            arr(nKeep) = 0; arr(nKeep + 1) = false; arr(nKeep + 2) = e
          case Right(rs) =>
            arr(nKeep) = rs.length; arr(nKeep + 1) = true
            arr(nKeep + 2) = null
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // Synthetic fixtures (test/gate side — the same fixture-as-spec
  // discipline as Multimodal.syntheticMp4: the builder writes REAL
  // format bytes so an independent WARC reader would parse them).
  // ------------------------------------------------------------------

  private val CRLF = "\r\n"

  private def gzipOne(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.finish(); gz.close()
    bos.toByteArray
  }

  /** Build one WARC record's bytes from header fields + content. */
  def buildWarcRecord(warcType: String, recordId: String, targetUri: String,
                      date: String, contentType: String,
                      content: Array[Byte],
                      refersTo: String = null): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(CRLF)
    sb.append("WARC-Type: ").append(warcType).append(CRLF)
    sb.append("WARC-Record-ID: ").append(recordId).append(CRLF)
    sb.append("WARC-Date: ").append(date).append(CRLF)
    if (refersTo != null)
      sb.append("WARC-Refers-To: ").append(refersTo).append(CRLF)
    if (targetUri != null)
      sb.append("WARC-Target-URI: ").append(targetUri).append(CRLF)
    if (contentType != null)
      sb.append("Content-Type: ").append(contentType).append(CRLF)
    sb.append("Content-Length: ").append(content.length).append(CRLF)
    sb.append(CRLF)
    val head = sb.toString.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](head.length + content.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(content, 0, out, head.length, content.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Build an HTTP/1.1 response content block. */
  def buildHttpResponse(status: Int, reason: String, contentType: String,
                        body: Array[Byte]): Array[Byte] = {
    val head = (s"HTTP/1.1 $status $reason" + CRLF +
      s"Content-Type: $contentType" + CRLF +
      s"Content-Length: ${body.length}" + CRLF + CRLF)
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](head.length + body.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out
  }

  /** Concatenate records into an archive blob; `memberGzip=true`
    * compresses each record as its own gzip member (the Common Crawl
    * layout), exercising the multi-member inflate path.
    */
  def buildWarcArchive(records: Seq[Array[Byte]],
                       memberGzip: Boolean): Array[Byte] = {
    val parts = if (memberGzip) records.map(gzipOne) else records
    val total = parts.map(_.length).sum
    val out = new Array[Byte](total)
    var p = 0
    parts.foreach { b =>
      System.arraycopy(b, 0, out, p, b.length); p += b.length }
    out
  }

  /** The q154 gate fixture: a deterministic archive for `id` with
    * `3 + id % 5` records — one `warcinfo`, then alternating
    * `request` / `response`; response bodies are single-character
    * repeats so the DuckDB oracle restates every output column with
    * pure string arithmetic. `id % 2 == 1` archives are member-gzipped
    * (the oracle is mode-independent — a gzip-unaware parser fails
    * half the corpus).
    */
  def syntheticWarc(id: Long): Array[Byte] = {
    val n = 3 + (id % 5).toInt
    val date = "2026-01-02T03:04:05Z"
    val records = (0 until n).map { j =>
      val rid = s"<urn:uuid:$id-$j>"
      if (j == 0)
        buildWarcRecord("warcinfo", rid, null, date,
          "application/warc-fields",
          s"software: graft $id".getBytes(
            java.nio.charset.StandardCharsets.ISO_8859_1))
      else {
        val uri = s"http://ex.com/$id/$j"
        if (j % 2 == 1)
          buildWarcRecord("request", rid, uri, date,
            "application/http; msgtype=request",
            (s"GET /$id/$j HTTP/1.1" + CRLF + "Host: ex.com" + CRLF + CRLF)
              .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        else {
          val blen = 5 + ((id * 3 + j * 11) % 40).toInt
          val ch = ('a' + ((id + j) % 26).toInt).toChar
          val body = Array.fill(blen)(ch.toByte)
          val status = Seq(200, 301, 404, 503)(((id * 7 + j) % 4).toInt)
          val ctype = if ((id + j) % 2 == 0) "text/html" else "text/plain"
          buildWarcRecord("response", rid, uri, date,
            "application/http; msgtype=response",
            buildHttpResponse(status, "X", ctype, body))
        }
      }
    }
    buildWarcArchive(records, memberGzip = id % 2 == 1)
  }
}
