package graft

import org.apache.spark.sql.functions._

/** Scratch probe (main, not a test): wall-clock evidence that the
  * round-9 web-prep operators run at scan speed on data volumes well
  * past the gates' — the numbers behind SCALE.md's "narrow projection"
  * claims. Run:
  *   sbt "Test/runMain graft.WebPrepScaleProbe"
  */
object WebPrepScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // ~300-byte synthetic HTML page per doc, ~40 tokens of body text
    val docs = spark.range(5000000L).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(i =>
        concat(lit(s"w$i"), pmod(col("id") * 13 + i, lit(9999)))): _*)
        .as("text"))
      .localCheckpoint()
    println(s"[probe] docs = ${docs.count()}")
    val pages = docs.select(col("doc_id"), concat(
      lit("<html><head><title>T"), col("doc_id"),
      lit("</title><style>p{a:1}</style></head><body><script>var x=1;"
        + "</script><p>"), col("text"),
      lit(" &amp; tail</p></body></html>")).as("page"))

    time("stripHtml 5M pages (~1.9 GB html)") {
      pages.select(graft.ext.TextAnalysis.stripHtml(col("page")))
        .write.format("noop").mode("overwrite").save()
    }
    time("gopherFilter 5M docs") {
      graft.ext.TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("c4LineFilter 5M docs") {
      graft.ext.TextAnalysis.c4LineFilter(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    val urls = spark.range(20000000L).select(concat(
      lit("HTTP://Example"), pmod(col("id"), lit(1000)),
      lit(".COM:80/p/"), col("id"),
      lit("/?utm_source=x&b=2&a="), pmod(col("id"), lit(7)),
      lit("#frag")).as("u"))
    time("normalizeUrl 20M urls (native kernel)") {
      urls.select(graft.ext.TextAnalysis.normalizeUrl(col("u")))
        .write.format("noop").mode("overwrite").save()
    }
    time("compressionRatio 1M docs (real zlib)") {
      graft.ext.TextAnalysis.compressionRatio(
          docs.where(col("doc_id") < 1000000L), "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
