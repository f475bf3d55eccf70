package graft
// Scratch: dissect minHashPairs stage costs at sf0.1 (round-8 q19
// slowdown investigation; test scope only).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{DocDedup, TextAnalysis}
object Q19Dissect {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("q19d")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc()
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    graft.functions.VecExpressions.register(spark)
    for (round <- 1 to 2) {
      println(s"== round $round ==")
      val sh = DocDedup.shingles(docs, "doc_id", "text").persist()
      time("t_sh")(println(s"  sh=${sh.count()}"))
      val sig = docs.select(col("doc_id").as("id"),
        call_function("graft_minhash_band_sigs",
          TextAnalysis.wordBigrams(col("text")),
          lit(16), lit(8)).as("bs"))
      val banded = sig.where(col("bs").isNotNull)
        .select(col("id"), posexplode(col("bs")).as(Seq("band", "bsig")))
        .persist()
      time("t_banded")(println(s"  banded=${banded.count()}"))
      val cand = banded.toDF("id_a", "band", "bsig")
        .join(banded.toDF("id_b", "band", "bsig"), Seq("band", "bsig"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().persist()
      time("t_cand")(println(s"  cand=${cand.count()}"))
      val common = sh.toDF("id_a", "shingle")
        .join(cand, "id_a")
        .join(sh.toDF("id_b", "shingle"), Seq("id_b", "shingle"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
        .persist()
      time("t_common")(println(s"  common=${common.count()}"))
      cand.unpersist(); common.unpersist(); sh.unpersist(); banded.unpersist()
      cleanup()
    }
    spark.stop()
  }
}
