package graft
// Scratch: isolated cold timing for q19/q39 (test scope).
import org.apache.spark.sql.SparkSession
object Q19Cold {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("q19cold")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"COLDQ $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
