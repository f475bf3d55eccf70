package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.ISO_8859_1

class WebArchiveSpec extends SparkFunSuite {

  private def rec(t: String, uri: String, ct: String,
                  body: String): Array[Byte] =
    WebArchive.buildWarcRecord(t, s"<urn:uuid:$t>", uri,
      "2026-01-02T03:04:05Z", ct, body.getBytes(ISO_8859_1))

  private val sampleRecords = Seq(
    rec("warcinfo", null, "application/warc-fields", "software: graft"),
    rec("request", "http://ex.com/a", "application/http; msgtype=request",
      "GET /a HTTP/1.1\r\nHost: ex.com\r\n\r\n"),
    WebArchive.buildWarcRecord("response", "<urn:uuid:r>", "http://ex.com/a",
      "2026-01-02T03:04:05Z", "application/http; msgtype=response",
      WebArchive.buildHttpResponse(200, "OK", "text/html",
        "hello".getBytes(ISO_8859_1))))

  test("record round-trip: plain and member-gzipped archives parse identically") {
    val plain = WebArchive.buildWarcArchive(sampleRecords, memberGzip = false)
    val gz = WebArchive.buildWarcArchive(sampleRecords, memberGzip = true)
    val Right(a) = WebArchive.warcRecordTable(plain): @unchecked
    val Right(b) = WebArchive.warcRecordTable(gz): @unchecked
    assert(a.length == 3 && b.length == 3)
    assert(a.map(_.warcType) == Seq("warcinfo", "request", "response"))
    assert(a.head.targetUri == null && a(1).targetUri == "http://ex.com/a")
    // full field + content parity between the two container modes
    (a zip b).foreach { case (x, y) =>
      assert(x.warcType == y.warcType && x.recordId == y.recordId &&
        x.targetUri == y.targetUri && x.date == y.date &&
        x.contentType == y.contentType &&
        x.contentLength == y.contentLength)
      assert(java.util.Arrays.equals(x.content, y.content))
    }
    // content lengths are the declared ones
    assert(a.forall(r => r.content.length == r.contentLength))
  }

  test("truncation totality: every prefix parses to a typed result, never throws") {
    val full = WebArchive.buildWarcArchive(sampleRecords, memberGzip = false)
    var lefts = 0
    (0 to full.length).foreach { k =>
      WebArchive.warcRecordTable(full.take(k)) match {
        case Left(_) => lefts += 1
        case Right(rs) => // a record-boundary prefix IS a valid archive
          assert(rs.nonEmpty && rs.length <= 3)
      }
    }
    assert(lefts > full.length / 2) // most cut points are mid-record
    // gzipped truncations too (corrupt deflate stream -> typed error)
    val gz = WebArchive.buildWarcArchive(sampleRecords, memberGzip = true)
    (0 until gz.length by 7).foreach { k =>
      WebArchive.warcRecordTable(gz.take(k)) // must not throw
    }
  }

  test("malformed archives: distinct typed reasons") {
    def s2b(s: String) = s.getBytes(ISO_8859_1)
    assert(WebArchive.warcRecordTable(null) == Left("empty blob"))
    assert(WebArchive.warcRecordTable(Array.empty[Byte]) == Left("empty blob"))
    assert(WebArchive.warcRecordTable(s2b("HTTP/1.1 200\r\n\r\n"))
      == Left("bad version line"))
    // LF-only header block is malformed (WARC mandates CRLF)
    assert(WebArchive.warcRecordTable(
      s2b("WARC/1.0\nWARC-Type: x\nContent-Length: 0\n\n\n")).isLeft)
    assert(WebArchive.warcRecordTable(
      s2b("WARC/1.0\r\nWARC-Type: x\r\n\r\n"))
      == Left("missing content-length"))
    assert(WebArchive.warcRecordTable(
      s2b("WARC/1.0\r\nContent-Length: -4\r\n\r\n"))
      == Left("negative content-length"))
    assert(WebArchive.warcRecordTable(
      s2b("WARC/1.0\r\nContent-Length: 99999\r\n\r\nx"))
      == Left("truncated content"))
    assert(WebArchive.warcRecordTable(
      s2b("WARC/1.0\r\nContent-Length: 12345678901234567890\r\n\r\n"))
      == Left("bad content-length"))
    assert(WebArchive.warcRecordTable(
      s2b("WARC/1.0\r\nContent-Length: 1\r\n\r\nX\r\n--"))
      == Left("bad record terminator"))
    assert(WebArchive.warcRecordTable(
      s2b("no header line at all")) == Left("no version line"))
    // record terminator present but header field without a colon
    assert(WebArchive.warcRecordTable(
      s2b("WARC/1.0\r\nbogus line\r\n\r\n"))
      == Left("bad header field"))
  }

  test("header block cap: oversized header rejected at bounded cost") {
    val big = "WARC/1.0\r\nX-Pad: " + ("a" * (2 << 20)) + "\r\n"
    assert(WebArchive.warcRecordTable(big.getBytes(ISO_8859_1)).isLeft)
  }

  test("gzip bomb: inflate cap yields a typed error, not an allocation") {
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      val zeros = new Array[Byte](1 << 20)
      (0 until 100).foreach(_ => gz.write(zeros)) // 100 MiB of zeros
      gz.finish(); gz.close()
      bos.toByteArray
    }
    assert(bomb.length < (1 << 20)) // compresses far below the cap base
    assert(WebArchive.warcRecordTable(bomb) == Left("gzip inflate cap"))
  }

  test("extractWarcRecords: HTTP envelope parsed for responses; poison -> zero rows; errors typed") {
    val s = spark; import s.implicits._
    val ok = WebArchive.buildWarcArchive(sampleRecords, memberGzip = true)
    val df = Seq(
      (1L, ok),
      (2L, ok.dropRight(2)),      // broken final terminator
      (3L, Array.empty[Byte])
    ).toDF("id", "blob")
    val out = WebArchive.extractWarcRecords(df, "blob")
    val rows = out.orderBy("id", "rec_idx").collect()
    assert(rows.forall(_.getAs[Long]("id") == 1L) && rows.length == 3)
    val resp = rows.find(_.getAs[String]("warc_type") == "response").get
    assert(resp.getAs[Int]("http_status") == 200)
    assert(resp.getAs[String]("http_ctype") == "text/html")
    assert(new String(resp.getAs[Array[Byte]]("body"), ISO_8859_1) == "hello")
    // non-response records: null HTTP columns, whole content as body
    val req = rows.find(_.getAs[String]("warc_type") == "request").get
    assert(req.isNullAt(req.fieldIndex("http_status")))
    assert(new String(req.getAs[Array[Byte]]("body"), ISO_8859_1)
      .startsWith("GET /a HTTP/1.1"))
    val errs = WebArchive.warcErrors(df, "blob").orderBy("id").collect()
    assert(errs.map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("ok"))).toSeq
      == Seq((1L, true), (2L, false), (3L, false)))
    assert(errs(0).getAs[Int]("n_records") == 3)
    assert(errs(2).getAs[String]("error") == "empty blob")
  }

  test("revisit records: WARC-Refers-To round-trips and resolves by record id") {
    val s = spark; import s.implicits._
    val resp = WebArchive.buildWarcRecord("response", "<urn:uuid:orig>",
      "http://ex.com/a", "2026-01-02T03:04:05Z",
      "application/http; msgtype=response",
      WebArchive.buildHttpResponse(200, "OK", "text/plain",
        "payload".getBytes(ISO_8859_1)))
    val revisit = WebArchive.buildWarcRecord("revisit", "<urn:uuid:rev>",
      "http://ex.com/a", "2026-01-03T03:04:05Z", "message/http",
      Array.empty[Byte], refersTo = "<urn:uuid:orig>")
    val Right(rs) = WebArchive.warcRecordTable(
      WebArchive.buildWarcArchive(Seq(resp, revisit),
        memberGzip = true)): @unchecked
    assert(rs.length == 2)
    assert(rs(0).refersTo == null && rs(1).refersTo == "<urn:uuid:orig>")
    assert(rs(1).contentLength == 0) // empty content block is legal
    // the DataFrame form resolves across blobs (cross-archive join)
    val df = Seq(
      (1L, WebArchive.buildWarcArchive(Seq(resp), memberGzip = false)),
      (2L, WebArchive.buildWarcArchive(Seq(revisit), memberGzip = true))
    ).toDF("id", "blob")
    val recs = WebArchive.extractWarcRecords(df, "blob")
    val resolved = recs.where(col("warc_type") === "revisit")
      .select(col("id").as("rev_doc"), col("refers_to"))
      .join(recs.where(col("warc_type") === "response")
        .select(col("id").as("orig_doc"), col("rec_id"),
          col("body").cast("string").as("body_str")),
        col("refers_to") === col("rec_id"))
      .collect()
    assert(resolved.length == 1)
    assert(resolved.head.getAs[Long]("rev_doc") == 2L)
    assert(resolved.head.getAs[Long]("orig_doc") == 1L)
    assert(resolved.head.getAs[String]("body_str") == "payload")
  }

  test("syntheticWarc: mode-independent record content; response body arithmetic matches the oracle formulas") {
    (0L until 12L).foreach { id =>
      val Right(rs) = WebArchive.warcRecordTable(
        WebArchive.syntheticWarc(id)): @unchecked
      assert(rs.length == 3 + (id % 5).toInt)
      assert(rs.head.warcType == "warcinfo")
      rs.zipWithIndex.drop(1).foreach { case (r, j) =>
        assert(r.targetUri == s"http://ex.com/$id/$j")
        if (j % 2 == 0) {
          val blen = 5 + ((id * 3 + j * 11) % 40).toInt
          val ch = ('a' + ((id + j) % 26).toInt).toChar
          val body = new String(r.content, ISO_8859_1).split("\r\n\r\n", 2)(1)
          assert(body == ch.toString * blen)
          val ctype = if ((id + j) % 2 == 0) "text/html" else "text/plain"
          assert(r.contentLength ==
            52 + ctype.length + blen.toString.length + blen)
        }
      }
    }
    // gzip-mode parity: the same ids re-built with the opposite container
    val plain = WebArchive.buildWarcArchive(sampleRecords, memberGzip = false)
    assert(WebArchive.warcRecordTable(plain).isRight)
  }
}
