package graft
// Fresh-JVM q15 probe with epoch calibration (round-7 verdict #1):
// times the fixed in-memory calibration workload before and after two
// q15 runs, so a slow wall-time is attributable to the VM epoch or to
// the plan from this output alone.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q15Cold {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("q15cold")
      .config("spark.sql.shuffle.partitions", "32")
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
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println(f"CAL start: ${cal()}%.2f s")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.ext.DocDedup.ngramJaccardPairs(docs, "doc_id", "text", 7, 10)
        .write.format("noop").mode("overwrite").save()
      println(f"COLD q15 run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      cleanup()
    }
    println(f"CAL end: ${cal()}%.2f s")
    spark.stop()
  }
}
