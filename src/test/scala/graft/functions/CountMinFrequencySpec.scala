package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkFunSuite

/** CountMinFrequency contracts: the CMS one-sided error model (never
  * undercounts; exact when the sketch is wide relative to the key set),
  * determinism, and the codegen'd probe path.
  */
class CountMinFrequencySpec extends SparkFunSuite {
  import spark.implicits._

  private def toks = (0 until 5000).map(i => s"k${i % 37}").toDF("k")

  test("estimates never undercount, and a wide sketch is exact") {
    val sk = CountMinFrequency.buildSketch(toks, col("k"),
      eps = 0.001, confidence = 0.999, seed = 7)
    val rows = toks.groupBy("k").agg(count(lit(1)).as("n"))
      .withColumn("est", CountMinFrequency.estimate(sk, col("k")))
      .collect()
    assert(rows.length === 37)
    rows.foreach { r =>
      val (n, est) = (r.getAs[Long]("n"), r.getAs[Long]("est"))
      assert(est >= n, s"CMS undercounted ${r.getAs[String]("k")}")
      // width ⌈2/ε⌉ = 2000 cells per row for 37 keys: collisions are
      // (practically) impossible in every depth row, so exact
      assert(est === n, s"wide sketch must be exact, got $est vs $n")
    }
  }

  test("build is deterministic for a fixed seed (merge order cannot " +
    "matter: CMS merge is cell-wise long addition)") {
    val a = CountMinFrequency.buildSketch(toks, col("k"), 0.01, 0.99, 11)
    val b = CountMinFrequency.buildSketch(
      toks.repartition(7), col("k"), 0.01, 0.99, 11)
    val probe = toks.distinct()
      .withColumn("ea", CountMinFrequency.estimate(a, col("k")))
      .withColumn("eb", CountMinFrequency.estimate(b, col("k")))
      .where(col("ea") =!= col("eb")).count()
    assert(probe === 0L)
  }

  test("an unseen key's estimate is bounded by eps·N (and is usually 0)") {
    val sk = CountMinFrequency.buildSketch(toks, col("k"), 0.001, 0.999, 7)
    val unseen = Seq("zzz-not-there").toDF("k")
      .select(CountMinFrequency.estimate(sk, col("k")).as("est"))
      .head().getLong(0)
    assert(unseen <= math.ceil(0.001 * 5000).toLong * 10)
  }

  test("the probe stays inside whole-stage codegen") {
    val sk = CountMinFrequency.buildSketch(toks, col("k"), 0.01, 0.99, 3)
    // a range source, not toDF: a LocalTableScan evaluates its
    // projection eagerly and never enters codegen at all
    val src = spark.range(1000)
      .select(concat(lit("k"), col("id") % 37).as("k"))
    val df = src.select(CountMinFrequency.estimate(sk, col("k")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("),
      s"CMS probe must not break whole-stage codegen:\n$plan")
  }
}
