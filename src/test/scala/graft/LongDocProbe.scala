package graft
// Long-document scaling probe (test scope): times the native CharChunks
// kernel vs the superseded transform/substr Column formulation on
// synthetic 64 KB / 512 KB / 2 MB documents. `Test/runMain graft.LongDocProbe`.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object LongDocProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("ldp")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecExpressions.register(spark)
    import spark.implicits._
    def timed(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"  $what%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n chunks)")
    }
    for (kb <- Seq(64, 512, 2048)) {
      println(s"doc size ${kb} KB x 32 docs, n=64")
      val docs = (0 until 32).map(i => (i.toLong, ("x" * 1023 + " ") * kb))
        .toDF("id", "text").localCheckpoint()
      timed("native CharChunks")(
        docs.select(explode(graft.ext.TextAnalysis.charChunks(col("text"), 64)))
          .count())
      timed("transform/substr (old)")(
        docs.select(explode(
          when(length(col("text")) === 0, array().cast("array<string>"))
            .otherwise(transform(
              sequence(lit(1), length(col("text")), lit(64)),
              s => col("text").substr(s, lit(64)))))).count())
    }
    spark.stop()
  }
}
