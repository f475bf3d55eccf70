package graft
// Scratch: q22 recall per threshold (test scope).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

object RecallProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("recall3")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecExpressions.register(spark)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); th <- Seq(0.5, 0.7, 0.8, 0.9)) {
      val dir = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").persist()
      val v = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val dot = (a: String, b: String) => call_function("graft_vec_dot", col(a), col(b))
      val exact = v.toDF("id_a", "va").join(v.toDF("id_b", "vb"), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (dot("va", "vb") / sqrt(dot("va", "va")) / sqrt(dot("vb", "vb"))).as("sim"))
        .where(col("sim") >= th)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", th)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"RECALL3 $sf th=$th exact=${exact.size} approx=${approx.size} " +
        s"found=${(exact & approx).size} extra=${(approx -- exact).size}")
      emb.unpersist()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
