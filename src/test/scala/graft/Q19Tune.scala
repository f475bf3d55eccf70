package graft
// Scratch: MinHash band/row tuning — cold-ish timing + recall (test scope).
import org.apache.spark.sql.SparkSession
import graft.ext.DocDedup
object Q19Tune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("q19tune")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val exact = DocDedup.ngramJaccardPairs(docs, "doc_id", "text", 7, 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    spark.catalog.clearCache(); System.gc()
    for (Array(b, r) <- Seq(Array(16, 8), Array(10, 7), Array(8, 8), Array(12, 6))) {
      val t0 = System.nanoTime()
      val got = DocDedup.minHashPairs(docs, "doc_id", "text", 7, 10, b, r)
        .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TUNE b=$b r=$r hashes=${b * r} sec=$sec%.2f " +
        s"pairs=${got.size} missed=${(exact -- got).size} extra=${(got -- exact).size}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
