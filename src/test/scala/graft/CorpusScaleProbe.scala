package graft

import org.apache.spark.sql.functions._

/** Scratch probe (main, not a test): wall-clock evidence that the
  * corpus-prep heavyweights — the exact-substring dedup pair and the
  * distributed prefix-sum packer — scale by data volume, not by
  * per-key or per-partition pathology (round-8 verdict ask #7: convert
  * SCALE.md's two remaining prose-only claims into measured numbers).
  * Run:
  *   sbt "Test/runMain graft.CorpusScaleProbe"
  *
  * Corpus shape: synthetic docs of 30 one-word tokens drawn from a
  * 50k vocabulary by id arithmetic (unique bodies), with a 12-token
  * boilerplate phrase planted into every 10th doc — so w=8 window
  * dedup sees a real duplicated-window population (5 windows × n/10
  * docs) without any all-pairs structure to hide behind.
  */
object CorpusScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-48s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def corpus(n: Long) = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        when(col("id") % 10 === 0,
          lit("the quick brown fox jumps over the lazy dog again and again"))
          .otherwise(concat(lit("u"), col("id"))),
        array_join(transform(sequence(lit(0), lit(29)),
          i => concat(lit("w"), pmod(col("id") * 7 + i * 13, lit(50000)))),
          " ")).as("text"))

    // ---- exact substring dedup: detect tier, 2M docs / ~64M tokens
    val c2m = corpus(2000000L).localCheckpoint()
    println(s"[probe] corpus = ${c2m.count()} docs")
    time("duplicateWindows w=8, 2M docs / 64M tokens") {
      graft.ext.CorpusPrep.duplicateWindows(c2m, "doc_id", "text", 8)
        .write.format("noop").mode("overwrite").save()
    }

    // ---- strip tier: explode factor w on the covered set plus a full
    //      posexplode of the token stream — probe at 1M docs
    val c1m = corpus(1000000L).localCheckpoint()
    println(s"[probe] corpus = ${c1m.count()} docs")
    time("stripDuplicateWindows w=8, 1M docs / 32M tokens") {
      graft.ext.CorpusPrep.stripDuplicateWindows(c1m, "doc_id", "text", 8)
        .write.format("noop").mode("overwrite").save()
    }

    // ---- sequence packing: the two-level prefix sum at 50M docs —
    //      level-2 window is |ids|/bucketSize = 48 rows, never the
    //      row stream
    val toks = spark.range(50000000L).select(col("id"),
      (lit(100L) + col("id") % 900L).as("tok")).localCheckpoint()
    println(s"[probe] docs = ${toks.count()}")
    time("packSequences W=2048, 50M docs / ~27.5G tokens") {
      graft.ext.CorpusPrep.packSequences(toks, "id", col("tok"), 2048)
        .write.format("noop").mode("overwrite").save()
    }
    time("packWindowSlices W=2048, 50M docs") {
      graft.ext.CorpusPrep.packWindowSlices(toks, "id", col("tok"), 2048)
        .write.format("noop").mode("overwrite").save()
    }

    spark.stop()
  }
}
