package graft
// Scratch: dump q19 executed plan (test scope).
import org.apache.spark.sql.SparkSession
object Q19Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("q19x")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q19_dedup_minhash_lsh")(spark, "/root/testdata/sf0.1")
    // q19 ends in localCheckpoint: the interesting plan already executed.
    // Re-build the pre-checkpoint plan instead:
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println(s"checkpointed rows=${df.count()}")
    spark.stop()
  }
}
