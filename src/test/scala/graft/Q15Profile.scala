package graft
// Scratch profiler for q15 (exact n-gram Jaccard) plan variants at sf0.1
// (test scope only — not part of the library surface).
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{DocDedup, TextAnalysis}

object Q15Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("q15prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc()
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (num, den, tau) = (7, 10, 100)

    // ---- dissect the two-tier plan
    {
      val sh = DocDedup.shingles(docs, "doc_id", "text").persist()
      val dfq = sh.groupBy("shingle").agg(count(lit(1)).as("df")).persist()
      time("t_vocab_count")(println(s"  vocab=${dfq.count()}"))
      val rare = sh.join(dfq.where(col("df") <= tau), "shingle")
        .select("id", "shingle")
      val cand1 = rare.toDF("id_a", "shingle")
        .join(rare.toDF("id_b", "shingle"), "shingle")
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      time("t_cand1")(println(s"  cand1=${cand1.count()}"))
      val hotDominated = sh.join(dfq, "shingle")
        .groupBy("id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("df") > tau, 1L).otherwise(0L)).as("hot"))
        .where(lit(den) * col("hot") >= lit(num) * col("n"))
        .select("id")
      time("t_hotdocs")(println(s"  hot=${hotDominated.count()}"))
      val cand2 = hotDominated.toDF("id_a")
        .join(hotDominated.toDF("id_b"), col("id_a") < col("id_b"))
      time("t_cand2")(println(s"  cand2=${cand2.count()}"))
      val cand = cand1.unionByName(cand2).distinct().persist()
      time("t_cand_distinct")(println(s"  cand=${cand.count()}"))
      val vocabSize = dfq.count()
      val vocabIdx = dfq.select(col("shingle"),
        (row_number().over(Window.orderBy("shingle")) - 1).as("sid"))
      val nLongs = ((vocabSize + 63) / 64).toInt
      val toBitmap = udf((sids: Seq[Int]) => {
        val arr = new Array[Long](nLongs)
        sids.foreach(s => arr(s >> 6) |= (1L << (s & 63)))
        arr
      })
      val bitmaps = sh.join(vocabIdx, "shingle")
        .groupBy("id")
        .agg(collect_list("sid").as("sids"), count(lit(1)).as("n"))
        .select(col("id"), col("n"), toBitmap(col("sids")).as("bm"))
        .persist()
      time("t_bitmaps")(println(s"  bitmaps=${bitmaps.count()}"))
      val common = udf((a: Seq[Long], b: Seq[Long]) => {
        var i = 0; var c = 0
        while (i < a.length) { c += java.lang.Long.bitCount(a(i) & b(i)); i += 1 }
        c.toLong
      })
      val verified = cand
        .join(bitmaps.select(col("id").as("id_a"), col("n").as("na"),
          col("bm").as("bm_a")), "id_a")
        .join(bitmaps.select(col("id").as("id_b"), col("n").as("nb"),
          col("bm").as("bm_b")), "id_b")
        .withColumn("common", common(col("bm_a"), col("bm_b")))
        .where(lit(den) * col("common") >=
          lit(num) * (col("na") + col("nb") - col("common")))
        .select("id_a", "id_b", "common", "na", "nb")
      time("t_verify")(println(s"  pairs=${verified.count()}"))
      cand.unpersist(); bitmaps.unpersist(); dfq.unpersist(); sh.unpersist()
      cleanup()
    }

    // ---- whole op, as shipped
    for (i <- 1 to 2) {
      val n = time(s"twotier_run$i")(
        DocDedup.ngramJaccardPairs(docs, "doc_id", "text", 7, 10).count())
      println(s"  pairs=$n"); cleanup()
    }
    spark.stop()
  }
}
