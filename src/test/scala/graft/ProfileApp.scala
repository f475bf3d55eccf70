package graft
// Scratch profiler for ext/ operator stages (test scope only).
import org.apache.spark.sql.SparkSession
import graft.ext.DocDedup
object ProfileApp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("profile")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("warmup")(docs.count())
    time("simhash_pairs_oneshot")(DocDedup.simHashPairs(docs, "doc_id", "text", 3).count())
    time("simhash_pairs_again")(DocDedup.simHashPairs(docs, "doc_id", "text", 3).count())
    time("minhash_pairs_oneshot")(DocDedup.minHashPairs(docs, "doc_id", "text", 7, 10).count())
    spark.stop()
  }
}
