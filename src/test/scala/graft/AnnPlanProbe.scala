package graft
// Scratch: does InferWindowGroupLimit give the ANN scoring tail a
// partial (map-side) top-k before the shuffle? Dump executed plans.
import org.apache.spark.sql.SparkSession
object AnnPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("annplan")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    import org.apache.spark.sql.functions.col
    val queries = emb.where(col("vec_id") < 5)
    val topk = graft.ext.Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
    topk.collect()
    println("=== bruteForceTopK executed plan ===")
    println(topk.queryExecution.executedPlan.toString.take(8000))
    val lsh = graft.ext.Similarity.lshTopK(emb, queries, "vec_id", "embedding", 10)
    lsh.collect()
    println("=== lshTopK executed plan ===")
    println(lsh.queryExecution.executedPlan.toString.take(9000))
    spark.stop()
  }
}
