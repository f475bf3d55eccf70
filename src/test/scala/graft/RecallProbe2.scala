package graft
// Scratch: q22 cosineNearDupPairs vs exact all-pairs, per SF (test scope).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

object RecallProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("recall2")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecExpressions.register(spark)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").persist()
      val n = emb.count()
      val v = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val dot = (a: String, b: String) => call_function("graft_vec_dot", col(a), col(b))
      val exact = v.toDF("id_a", "va").join(v.toDF("id_b", "vb"), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (dot("va", "vb") / sqrt(dot("va", "va")) / sqrt(dot("vb", "vb"))).as("sim"))
        .where(col("sim") >= 0.25)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.25)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"RECALL2 $sf n=$n exact=${exact.size} approx=${approx.size} " +
        s"found=${(exact & approx).size} extra=${(approx -- exact).size}")
      emb.unpersist()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
