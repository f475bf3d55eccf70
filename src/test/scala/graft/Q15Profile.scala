package graft
// Scratch profiler for q15 (exact n-gram Jaccard) at sf0.1 — dissects
// the SHIPPED dense-bitmap two-tier path (test scope only — not part
// of the library surface). Rewritten round 8: the old dissection
// profiled the superseded sparse path (12.5M-pair shuffled distinct +
// recount join), which is NOT what ngramJaccardPairs executes on this
// corpus.
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    val (num, den) = (7, 10)

    // ---- dissect the shipped dense two-tier path, twice (run 1 pays
    // JIT/codegen; run 2 is the steady state the bench min-of-2 sees)
    for (round <- 1 to 2) {
      println(s"== shipped-path dissection, round $round ==")
      val sh = DocDedup.shingles(docs, "doc_id", "text").persist()
      val dfq = sh.groupBy("shingle").agg(count(lit(1)).as("df")).persist()
      val nDocs = time("t_docs_count")(sh.select("id").distinct().count())
      val tau = math.max(100L, nDocs / 100)
      val vocabSize = time("t_vocab_count")(dfq.count())
      println(s"  docs=$nDocs tau=$tau vocab=$vocabSize")
      val rare = sh.join(dfq.where(col("df") <= tau), "shingle")
        .select("id", "shingle")
      val cand1 = rare.toDF("id_a", "shingle")
        .join(rare.toDF("id_b", "shingle"), "shingle")
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      time("t_cand1")(println(s"  cand1=${cand1.count()}"))

      val vocabIdx = dfq.select(col("shingle"), col("df"),
        (row_number().over(Window.orderBy("shingle")) - 1).as("sid"))
      val nLongs = ((vocabSize + 63) / 64).toInt
      val toBitmap = udf((sids: Seq[Int]) => {
        val arr = new Array[Long](nLongs)
        sids.foreach(s => arr(s >> 6) |= (1L << (s & 63)))
        arr
      })
      val docStats = sh.join(broadcast(vocabIdx), "shingle")
        .groupBy("id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("df") > tau, 1L).otherwise(0L)).as("hot"),
          collect_list("sid").as("sids"))
        .select(col("id"), col("n"), toBitmap(col("sids")).as("bm"),
          col("hot"))
        .persist()
      time("t_docstats")(println(s"  docStats=${docStats.count()}"))

      graft.functions.VecExpressions.register(spark)
      def common(a: Column, b: Column): Column =
        call_function("graft_bitmap_and_count", a, b)
      val jOk = lit(den) * col("common") >=
        lit(num) * (col("na") + col("nb") - col("common"))
      val sizeOk = lit(den) * col("na") >= lit(num) * col("nb") &&
        lit(den) * col("nb") >= lit(num) * col("na")
      val asA = docStats.select(col("id").as("id_a"), col("n").as("na"),
        col("bm").as("bm_a"), col("hot").as("hot_a"))
      val asB = docStats.select(col("id").as("id_b"), col("n").as("nb"),
        col("bm").as("bm_b"), col("hot").as("hot_b"))
      val hotA = asA.where(lit(den) * col("hot_a") >= lit(num) * col("na"))
      val hotB = asB.where(lit(den) * col("hot_b") >= lit(num) * col("nb"))
      val hotCount = time("t_hotcount")(hotA.count())
      println(s"  hot=$hotCount hotBytes=${hotCount * (nLongs * 8L + 64L)}")
      val tier2 = broadcast(hotA)
        .join(hotB, col("id_a") < col("id_b") && sizeOk)
        .withColumn("common", common(col("bm_a"), col("bm_b")))
        .where(jOk)
      time("t_tier2_bnlj_verify")(println(s"  tier2=${tier2.count()}"))
      val tier1 = cand1
        .join(asA, "id_a").join(asB, "id_b")
        .where(!(lit(den) * col("hot_a") >= lit(num) * col("na") &&
          lit(den) * col("hot_b") >= lit(num) * col("nb")) && sizeOk)
        .withColumn("common", common(col("bm_a"), col("bm_b")))
        .where(jOk)
      time("t_tier1_verify")(println(s"  tier1=${tier1.count()}"))
      docStats.unpersist(); dfq.unpersist(); sh.unpersist()
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
