package graft
// Scratch: measure LSH recall vs exact siblings at each SF (test scope).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{DocDedup, Similarity}

object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("recall")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val exact = DocDedup.ngramJaccardPairs(docs, "doc_id", "text", 7, 10)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = DocDedup.minHashPairs(docs, "doc_id", "text", 7, 10)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"RECALL $sf text: exact=${exact.size} approx=${approx.size} " +
        s"found=${(exact & approx).size} extra=${(approx -- exact).size}")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val bf = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 5),
        "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Similarity.lshTopK(emb, emb.where(col("vec_id") < 5),
        "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"RECALL $sf ann: exact=${bf.size} approx=${lsh.size} " +
        s"found=${(bf & lsh).size}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
