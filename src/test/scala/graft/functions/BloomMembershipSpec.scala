package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class BloomMembershipSpec extends SparkFunSuite {

  private lazy val seenKeys = (0 until 2000).map(i => s"key-$i")

  private lazy val bloom = {
    val s = spark; import s.implicits._
    BloomMembership.buildBloom(
      seenKeys.toDF("k"), col("k"), expectedItems = 2000, fpp = 0.01)
  }

  test("no false negatives: every inserted key is flagged") {
    val s = spark; import s.implicits._
    val missed = seenKeys.toDF("k")
      .where(!BloomMembership.mightContain(bloom, col("k"))).count()
    assert(missed == 0L)
  }

  test("false-positive rate on 10k non-members stays near fpp") {
    val s = spark; import s.implicits._
    val probes = (0 until 10000).map(i => s"novel-$i").toDF("k")
    val fps = probes
      .where(BloomMembership.mightContain(bloom, col("k"))).count()
    // fpp = 1%; 5x headroom keeps the assertion falsifiable (a broken
    // hash alignment flags ~100%) but never flaky (binomial tail at
    // 5x the mean is astronomically small)
    assert(fps <= 500L, s"expected ~100 false positives of 10000, got $fps")
  }

  test("certainlyNovel returns only true non-members and keeps all " +
      "definite ones") {
    val s = spark; import s.implicits._
    val mixed = (1500 until 4000).map(i => s"key-$i").toDF("k")
    val novel = BloomMembership.certainlyNovel(mixed, bloom, col("k"))
      .collect().map(_.getString(0)).toSet
    // nothing seen may leak through (no false negatives)...
    assert(novel.forall { k =>
      k.stripPrefix("key-").toInt >= 2000
    })
    // ...and the overwhelming majority of the 2000 true novels remain
    assert(novel.size >= 1900, s"only ${novel.size} of 2000 novels kept")
  }

  test("the probe expression stays inside whole-stage codegen") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold
    // the filter at optimization time and leave no codegen stage to pin
    val df = spark.range(100)
      .select(concat(lit("k"), col("id")).as("k"))
      .where(BloomMembership.mightContain(bloom, col("k")))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n) Filter" = the probe filter fused into a codegen stage
    assert("""\*\(\d+\) Filter""".r.findFirstIn(plan).isDefined,
      s"might_contain must not break codegen:\n$plan")
  }

  test("build rejects nonsense sizing") {
    val s = spark; import s.implicits._
    val df = Seq("a").toDF("k")
    intercept[IllegalArgumentException] {
      BloomMembership.buildBloom(df, col("k"), expectedItems = 0)
    }
    intercept[IllegalArgumentException] {
      BloomMembership.buildBloom(df, col("k"), 10, fpp = 1.5)
    }
  }
}
