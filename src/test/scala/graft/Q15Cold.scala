package graft
import org.apache.spark.sql.SparkSession
object Q15Cold {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("q15cold")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val t0 = System.nanoTime()
    graft.ext.DocDedup.ngramJaccardPairs(docs, "doc_id", "text", 7, 10)
      .write.format("noop").mode("overwrite").save()
    println(f"COLD q15: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
