package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrderLayout

/** ZOrderLayout contracts: the prefix→cell geometry tiles the plane,
  * box reads equal the full-scan filter exactly, and the executed scan
  * actually prunes partitions.
  */
class ZOrderSpec extends SparkFunSuite {
  import spark.implicits._

  test("prefix cells tile the plane disjointly at every depth") {
    val bits = 4
    for (prefixBits <- Seq(1, 3, 4, 7, 8)) {
      val boxes = (0L until (1L << prefixBits))
        .map(p => ZOrderLayout.prefixBox(p, bits, prefixBits))
      // every (a, b) cell is covered by exactly one prefix box
      for (a <- 0L until (1L << bits); b <- 0L until (1L << bits)) {
        val owners = boxes.count { case (a0, a1, b0, b1) =>
          a >= a0 && a <= a1 && b >= b0 && b <= b1 }
        assert(owners === 1,
          s"cell ($a,$b) covered by $owners boxes at depth $prefixBits")
      }
    }
  }

  test("zValue interleaves: prefix box contains its members' cells") {
    val bits = 4
    val df = (0 until 256).map(i => (i.toLong % 16, i.toLong / 16))
      .toDF("a", "b")
      .withColumn("z", ZOrderLayout.zValue(col("a"), col("b"), bits))
      .withColumn("p", shiftright(col("z"), 2 * bits - 5))
    df.collect().foreach { r =>
      val (a0, a1, b0, b1) =
        ZOrderLayout.prefixBox(r.getAs[Long]("p"), bits, 5)
      assert(r.getAs[Long]("a") >= a0 && r.getAs[Long]("a") <= a1)
      assert(r.getAs[Long]("b") >= b0 && r.getAs[Long]("b") <= b1)
    }
  }

  test("readBox equals the full-scan filter and prunes partitions") {
    val n = 4000
    val data = (0 until n).map { i =>
      (i.toLong, (i * 131 % 32).toLong, (i * 17 % 32).toLong)
    }.toDF("id", "ua", "hb")
    val path = s"${tempDir("zorder")}/layout"
    ZOrderLayout.writeZOrdered(data, path, "ua", "hb",
      bits = 5, prefixBits = 6)
    val (aLo, aHi, bLo, bHi) = (3L, 9L, 20L, 28L)
    val got = ZOrderLayout.readBox(spark, path, aLo, aHi, bLo, bHi)
    val expect = data.where(col("ua") >= aLo && col("ua") <= aHi &&
      col("hb") >= bLo && col("hb") <= bHi)
    assert(got.columns.sorted.toSeq === expect.columns.sorted.toSeq)
    val gids = got.select("id").as[Long].collect().sorted
    val eids = expect.select("id").as[Long].collect().sorted
    assert(gids.toSeq === eids.toSeq)

    // the executed scan must list strictly fewer partitions than exist
    val total = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("_graft_zp="))
    def scans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    got.collect()
    val scanned = scans(got.queryExecution.executedPlan)
      .map(_.selectedPartitions.partitionCount)
    assert(scanned.nonEmpty && scanned.min < total,
      s"box read scanned ${scanned.headOption} of $total partitions")
  }

  test("a full-plane box reads everything back exactly") {
    val data = (0 until 500).map(i =>
      (i.toLong, (i % 16).toLong, (i % 13).toLong)).toDF("id", "a", "b")
    val path = s"${tempDir("zorder-full")}/layout"
    ZOrderLayout.writeZOrdered(data, path, "a", "b", 4, 4)
    val back = ZOrderLayout.readBox(spark, path, 0, 15, 0, 15)
    assert(back.count() === 500L)
  }
}
