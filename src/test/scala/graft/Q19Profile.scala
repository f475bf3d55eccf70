package graft
// Scratch: dissect minHashPairs stage costs at sf0.1 (test scope).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{DocDedup, TextAnalysis}

object Q19Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("q19prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecExpressions.register(spark)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"P19 $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    val (bands, rows) = (16, 8)
    for (i <- 1 to 2) {
      val sh = DocDedup.shingles(docs, "doc_id", "text").persist()
      time(s"r$i shingles")(println(s"  rows=${sh.count()}"))
      val sig = docs.select(col("doc_id").as("id"),
        call_function("graft_minhash_band_sigs",
          TextAnalysis.wordBigrams(col("text")), lit(bands), lit(rows)).as("bs"))
      val banded = sig.where(col("bs").isNotNull)
        .select(col("id"), posexplode(col("bs")).as(Seq("band", "bsig")))
        .persist()
      time(s"r$i banded")(println(s"  rows=${banded.count()}"))
      val cand = banded.toDF("id_a", "band", "bsig")
        .join(banded.toDF("id_b", "band", "bsig"), Seq("band", "bsig"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().persist()
      time(s"r$i candidates")(println(s"  cand=${cand.count()}"))
      val common = sh.toDF("id_a", "shingle")
        .join(cand, "id_a")
        .join(sh.toDF("id_b", "shingle"), Seq("id_b", "shingle"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
      time(s"r$i verify")(println(s"  pairs=${common.count()}"))
      time(s"r$i full-op")(println(s"  n=${DocDedup.minHashPairs(docs, "doc_id", "text", 7, 10).count()}"))
      sh.unpersist(); banded.unpersist(); cand.unpersist()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
