package graft

import org.apache.spark.sql.functions._

/** Scratch probe (main, not a test): the r11 verdict's q53 watch item
  * — q53_ann_ivf_index_planted ran 1.80× slower in the r11 driver
  * bench on BYTE-IDENTICAL code (only Multimodal/SparkEntry changed
  * that round), with the calibration epoch drifting 1.081 → 0.657 s
  * mid-run. This probe is the calibration-sandwiched A/B the verdict
  * asked for: alternate q51/q53/q55 five times, a calibration sample
  * between every round, so a reader can separate operator cost from
  * the disk/VM epoch. The three queries write + read real on-disk IVF
  * index state (the documented 5×-disk-variance class).
  * Run: sbt "Test/runMain graft.Q53ABProbe"
  */
object Q53ABProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def cal(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 2000000L, 1, 32)
        .select(((col("id") * 2654435761L) % 1000003L).as("k"))
        .withColumn("b", col("k") % 1024)
        .groupBy("b").agg(count(lit(1)).as("c"), sum("k").as("s"))
        .orderBy("b")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val names = Seq("q51_ann_index_planted", "q53_ann_ivf_index_planted",
      "q55_neardup_index_planted")
    println(s"[ab] queries: $names  warmup cal=${cal()}")
    (1 to 5).foreach { round =>
      val c = cal()
      val times = names.map(n => n -> run(n))
      println(f"[ab] round=$round cal=$c%6.3f " +
        times.map { case (n, s) => f"$n=$s%6.2f" }.mkString(" "))
    }
    println(f"[ab] final cal=${cal()}%6.3f")
    spark.stop()
  }
}
