package graft
// Generic fresh-JVM single-query probe with epoch calibration (test
// scope): `Test/runMain graft.QCold q19_dedup_minhash_lsh [sfDir]`.
// Calibration before/after two runs separates epoch drift from plan
// cost the same way Bench's artifact samples do.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object QCold {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q15_dedup_ngram_jaccard")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("qcold")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc()
    }
    def cal(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 2000000L, 1, 32)
        .select(((col("id") * 2654435761L) % 1000003L).as("k"))
        .withColumn("b", col("k") % 1024)
        .groupBy("b").agg(count(lit(1)).as("c"), sum("k").as("s"))
        .orderBy("b")
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      cleanup(); s
    }
    val fn = SparkEntry.queries(name)
    cal() // JIT warmup, unrecorded
    println(f"CAL start: ${cal()}%.2f s")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"COLD $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      cleanup()
    }
    println(f"CAL end: ${cal()}%.2f s")
    spark.stop()
  }
}
