package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** RangeJoin contract: exact parity with the theta-join it replaces
  * (including overlapping, empty, and bucket-boundary intervals) and a
  * physical plan with no nested-loop operator.
  */
class RangeJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private def points = (0 until 400)
    .map(i => (i.toLong, (i * 13 % 1000) / 10.0)).toDF("id", "v")

  private def intervals = Seq(
    (0.0, 25.0, "a"),    // spans several buckets
    (20.0, 50.0, "b"),   // overlaps a — points in [20,25) match both
    (50.0, 75.5, "c"),   // non-aligned hi
    (49.0, 56.0, "d"),   // straddles a bucket boundary at 49/56
    (98.0, 98.0, "e"),   // empty interval: must match nothing
    (21.0, 21.0001, "f") // sub-bucket-width sliver
  ).toDF("lo", "hi", "band")

  private def theta = points
    .join(intervals, col("v") >= col("lo") && col("v") < col("hi"))
    .select("id", "band")

  test("pointInInterval equals the theta join exactly " +
    "(overlaps, empty, boundary intervals)") {
    for (w <- Seq(7.0, 25.0, 1000.0)) {
      val fast = RangeJoin
        .pointInInterval(points, "v", intervals, "lo", "hi", w)
        .select("id", "band")
      assert(fast.count() === theta.count(), s"width $w row count")
      assert(fast.except(theta).isEmpty && theta.except(fast).isEmpty,
        s"width $w mismatch vs theta join")
    }
  }

  test("hi at an exact bucket multiple stays hi-exclusive") {
    val iv = Seq((0.0, 50.0, "x")).toDF("lo", "hi", "band")
    val p = Seq((1L, 49.999), (2L, 50.0)).toDF("id", "v")
    val out = RangeJoin.pointInInterval(p, "v", iv, "lo", "hi", 50.0)
      .select("id").as[Long].collect()
    assert(out.toSeq === Seq(1L))
  }

  test("the plan is a hash join on the bucket — no nested loop, " +
    "no cartesian") {
    val fast = RangeJoin
      .pointInInterval(points, "v", intervals, "lo", "hi", 7.0)
    fast.collect() // finalize AQE
    val plan = fast.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join must stay an equi-join on the bucket id:\n$plan")
    assert(plan.contains("HashJoin"),
      s"expected a hash join on _graft_bucket:\n$plan")
  }
}
