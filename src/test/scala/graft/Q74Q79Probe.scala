package graft
// Scratch: round-9 verdict ask #3 — q74/q79 regressed ×4.1/×3.8 raw on a
// 1.28×-slower epoch with UNCHANGED query bodies. Six calibration-
// sandwiched runs each at sf0.1 (the W64Probe pattern): either the
// steady state is flat (epoch/JVM pollution) or the cause is real.
import org.apache.spark.sql.SparkSession
object Q74Q79Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def calibrate(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(0, 2000000L, 1, 32)
        .select(((col("id") * 2654435761L) % 1000003L).as("k"))
        .withColumn("b", col("k") % 1024)
        .groupBy("b").agg(count(lit(1)).as("c"), sum("k").as("s"))
        .orderBy("b")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (q <- Seq("q74_minhash_estimate", "q79_length_percentiles")) {
      val fn = SparkEntry.queries(q)
      (1 to 6).foreach { i =>
        val c0 = calibrate()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[$q] run=$i cal=$c0%.3f query=$sec%.3f s")
      }
    }
    spark.stop()
  }
}
