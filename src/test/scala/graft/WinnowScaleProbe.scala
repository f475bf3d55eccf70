package graft

import org.apache.spark.sql.functions._

/** Scratch probe (main, not a test): wall-clock evidence for the
  * winnowing exact-substring operator at corpus scale, in the same
  * two regimes PrefixBlockScaleProbe pins for the edit-distance
  * blocker:
  *
  *   1. HOT: 200k docs, HALF sharing one 64-char boilerplate run.
  *      Its interior fingerprints land in ~100k docs each; without
  *      the hot-fingerprint cap the fp self-join would emit ~1e10
  *      candidate rows per hot fp. With the default cap they are
  *      excluded by one map-side-combined count.
  *   2. CLASS: 2,000 classes × 100 docs, each class sharing its own
  *      160-char block — every class's fingerprints stay under the
  *      cap, ~C(100,2)·classes verified pair rows flow through.
  *
  * Also times the fingerprint-selection map alone (the narrow stage
  * that dominates at 100 TB).
  *
  * Run: sbt "Test/runMain graft.WinnowScaleProbe"
  */
object WinnowScaleProbe {
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
      println(f"[probe] $label%-56s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val boiler = "We use cookies and similar technologies to improve " +
      "your experience."
    val hot = spark.range(200000L).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0,
        concat(lit(boiler), lit(" doc "), col("id"),
          lit(" unique tail material here")))
        .otherwise(concat(lit("doc "), col("id"),
          lit(" entirely unshared body text with nothing in common")))
        .as("text"))
      .localCheckpoint()
    println(s"[probe] hot corpus = ${hot.count()} docs, 100k sharing a " +
      s"${boiler.length}-char run")
    val nFps = time("fingerprint selection (narrow map) over 200k docs") {
      graft.ext.Winnow.fingerprints(hot, "doc_id", "text").count()
    }
    println(s"[probe] fingerprints selected = $nFps")
    val hotPairs = time("verifiedPairs hot regime, default cap") {
      graft.ext.Winnow.verifiedPairs(hot, "doc_id", "text").count()
    }
    println(s"[probe] hot-regime pair rows = $hotPairs (boilerplate " +
      "interior capped; residual pairs come from sub-cap boundary fps)")
    val hotCut = graft.ext.Winnow
      .hotFingerprints(hot, "doc_id", "text").count()
    println(s"[probe] hot fingerprints excluded = $hotCut")

    // class regime: 2,000 classes x 100 docs sharing a per-class block
    val cls = spark.range(200000L).select(
      col("id").as("doc_id"),
      concat(lit("doc "), col("id"), lit(" own text then "),
        concat_ws("", array((0 until 8).map(j =>
          concat(lit(s"blk$j-c"), col("id") % 2000, lit("-shared "))): _*)))
        .as("text"))
      .localCheckpoint()
    println(s"[probe] class corpus = ${cls.count()} docs, 2000 classes of 100")
    val clsPairs = time("verifiedPairs class regime (2000x100)") {
      graft.ext.Winnow.verifiedPairs(cls, "doc_id", "text").count()
    }
    println(s"[probe] class-regime pair rows = $clsPairs")
    spark.stop()
  }
}
