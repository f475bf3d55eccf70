package graft

import org.apache.spark.sql.functions._
import graft.operators.{RangeJoin, SkewJoin, TemporalOps}
import graft.sources.ZOrderLayout

/** Emptiness and degenerate-input edges for the round-8 operators —
  * the shapes a pipeline composition hits in practice (first run with
  * no state, a filter that drops everything, a box outside the data).
  */
class OperatorEdgeSpec extends SparkFunSuite {
  import spark.implicits._

  test("asOfJoin with a completely empty right side keeps every left " +
    "row with null payload") {
    val left = Seq((1L, "u", "2024-01-01 10:00:00")).toDF("id", "u", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val right = Seq.empty[(String, java.sql.Timestamp, Double)]
      .toDF("u", "ts", "v")
    val out = TemporalOps.asOfJoin(left, right, Seq("u"), "ts", "ts",
      Seq("v")).collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(out(0).fieldIndex("v")))
    assert(out(0).isNullAt(out(0).fieldIndex("ts_matched_us")))
  }

  test("sessionize and sessionSummary on empty input return empty with " +
    "the right schema") {
    val empty = Seq.empty[(Long, String, java.sql.Timestamp)]
      .toDF("id", "u", "ts")
    val s1 = TemporalOps.sessionize(empty, Seq("u"), "ts", 10L, Seq("id"))
    assert(s1.columns.contains("session_idx") && s1.isEmpty)
    val s2 = TemporalOps.sessionSummary(empty, Seq("u"), "ts", 10L,
      Seq("id"))
    assert(s2.columns.toSeq ===
      Seq("u", "session_idx", "n_events", "start_us", "end_us", "span_us"))
    assert(s2.isEmpty)
  }

  test("saltedJoin with an empty build side is the empty inner join") {
    val probe = Seq((1L, "k")).toDF("id", "k")
    val build = Seq.empty[(String, Long)].toDF("k", "v")
    assert(SkewJoin.saltedJoin(probe, build, Seq("k"), 4, col("id"))
      .isEmpty)
  }

  test("pointInInterval with no intervals or no points is empty") {
    val points = Seq((1L, 5.0)).toDF("id", "v")
    val none = Seq.empty[(Double, Double, String)].toDF("lo", "hi", "band")
    assert(RangeJoin.pointInInterval(points, "v", none, "lo", "hi", 1.0)
      .isEmpty)
    val noPoints = Seq.empty[(Long, Double)].toDF("id", "v")
    val iv = Seq((0.0, 10.0, "a")).toDF("lo", "hi", "band")
    assert(RangeJoin.pointInInterval(noPoints, "v", iv, "lo", "hi", 1.0)
      .isEmpty)
  }

  test("readBox outside the data domain returns empty, not an error") {
    val data = Seq((1L, 2L, 3L)).toDF("id", "a", "b")
    val path = s"${tempDir("zorder-edge")}/layout"
    ZOrderLayout.writeZOrdered(data, path, "a", "b", 4, 3)
    assert(ZOrderLayout.readBox(spark, path, 14, 15, 14, 15).isEmpty)
  }

  test("reserved-prefix input columns fail loudly with the operator name") {
    val bad = Seq((1L, "x")).toDF("id", "_graft_tag")
    val err = intercept[IllegalArgumentException] {
      TemporalOps.sessionize(bad, Seq("id"), "_graft_tag", 1L, Seq("id"))
    }
    assert(err.getMessage.contains("sessionize") &&
      err.getMessage.contains("_graft_tag"))
  }

  // ---- round-9 operators

  test("web-prep edges: empty/degenerate text through c4LineFilter, " +
    "gopherFilter, spanCorrupt, fimTransform; null URL passes through") {
    val docs = Seq((1L, ""), (2L, "x"), (3L, "a b")).toDF("doc_id", "text")
    // empty text: 1 line, 1 token of length 0 — filters drop, no crash
    assert(graft.ext.TextAnalysis.c4LineFilter(docs, "doc_id", "text")
      .count() === 0L)
    val g = graft.ext.TextAnalysis.gopherFilter(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(g.size == 3 && !g(1L).getAs[Boolean]("keep"))
    assert(g(1L).getAs[Long]("n_words") == 1L) // split('') = ['']
    val sc = graft.ext.CorpusPrep.spanCorrupt(docs, "doc_id", "text",
      0.5, 3, "e").collect()
    assert(sc.length == 3, "every doc yields a row even if fully masked")
    val fim = graft.ext.CorpusPrep.fimTransform(docs, "doc_id", "text",
      65536, "e").collect()
    assert(fim.forall(_.getAs[Boolean]("fim")), "rate 65536 = always")
    assert(fim.forall(_.getAs[String]("out_text").contains("<MID>")))
    val nullUrl = Seq((1L, null.asInstanceOf[String])).toDF("id", "u")
      .select(graft.ext.TextAnalysis.normalizeUrl(col("u"))).head()
    assert(nullUrl.isNullAt(0), "null in, null out")
  }

  test("audioWindows: empty blob and non-audio bytes yield zero rows; " +
    "lengthBatches on empty input is empty") {
    val blobs = Seq((1L, Array.emptyByteArray),
      (2L, "not audio".getBytes("UTF-8"))).toDF("id", "blob")
    assert(graft.ext.Multimodal.audioWindows(blobs, "blob", 64)
      .count() === 0L)
    val empty = Seq.empty[(Long, Long)].toDF("id", "len")
    assert(graft.ext.CorpusPrep.lengthBatches(empty, col("id"),
      col("len"), 4, 8, "e").count() === 0L)
  }

  test("appendToMinHashIndex: an all-shingle-less batch appends " +
    "nothing and leaves the index probeable") {
    val docs = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("id", "text")
    val path = s"${tempDir("mh-edge")}/index"
    graft.ext.DocDedup.buildMinHashIndex(docs, "id", "text", path,
      bands = 4, rows = 2, sigBuckets = 2)
    val degenerate = Seq((10L, "one"), (11L, "")).toDF("id", "text")
    graft.ext.DocDedup.appendToMinHashIndex(degenerate, "id", "text", path)
    val twins = docs.where(col("id") === 1)
      .select((col("id") + 100L).as("id"), col("text"))
    assert(graft.ext.DocDedup.probeMinHashIndex(twins, docs, "id",
      "text", path, 7, 10).count() >= 1L)
  }
}
