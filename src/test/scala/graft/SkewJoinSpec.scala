package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** SkewJoin contract: exact equivalence with the plain equi-join
  * (including build sides with several rows per key), and a physical
  * plan whose exchanges actually carry the salt — the point of the
  * operator.
  */
class SkewJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private def probe = (0 until 2000)
    .map(i => (i.toLong, s"k${i % 3}")) // 3 hot keys
    .toDF("id", "k")

  // two build rows for k1 — a probe row must match BOTH, once each
  private def build = Seq(
    ("k0", 10L), ("k1", 20L), ("k1", 21L), ("k2", 30L), ("k9", 99L))
    .toDF("k", "v")

  test("saltedJoin equals the plain join exactly, at any factor") {
    val plain = probe.join(build, Seq("k")).select("id", "v")
    for (factor <- Seq(1, 4, 32)) {
      val salted = SkewJoin
        .saltedJoin(probe, build, Seq("k"), factor, col("id"))
        .select("id", "v")
      assert(salted.count() === plain.count(), s"factor $factor")
      assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty,
        s"factor $factor result mismatch")
    }
  }

  test("the shuffle keys include the salt (hot key spread across " +
    "reducers)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SkewJoin.saltedJoin(probe, build, Seq("k"), 8, col("id"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("_graft_salt"),
        s"exchanges must partition by (key, salt):\n$plan")
      assert(
        "hashpartitioning\\(k[#,].*_graft_salt".r.findFirstIn(plan).isDefined ||
          plan.contains("hashpartitioning(k, _graft_salt") ||
          "hashpartitioning\\([^)]*_graft_salt".r.findFirstIn(plan).isDefined,
        s"salt must be part of the join partitioning:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
