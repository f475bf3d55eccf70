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
}
