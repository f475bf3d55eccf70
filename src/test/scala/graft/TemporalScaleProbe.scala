package graft

import org.apache.spark.sql.functions._

/** Scratch probe (main, not a test): wall-clock evidence that the
  * round-8 temporal/layout operators scale by data volume, not by
  * per-key or per-partition pathology — the numbers quoted in
  * NOTES_r08's scale section. Run:
  *   sbt "Test/runMain graft.TemporalScaleProbe"
  */
object TemporalScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 20M events over 100k keys (~200 events/key), synthetic but
    // shuffled so keys are interleaved like a real log
    val n = 20000000L
    val keys = 100000L
    val ev = spark.range(n).select(
      col("id"),
      (col("id") % keys).as("u"),
      timestamp_micros(((col("id") * 2654435761L) % 100000000L) * 1000L
        + col("id") % 1000L).as("ts"))
      .localCheckpoint()
    println(s"[probe] events = ${ev.count()}")

    val right = ev.where(col("id") % 10 === 0)
      .select(col("u"), col("ts"), col("id").as("rid"))
      .groupBy("u", "ts").agg(max("rid").as("rid")) // unique (u, ts)
      .localCheckpoint()
    println(s"[probe] right = ${right.count()}")

    time("asOfJoin 20M x 2M, 100k keys") {
      graft.operators.TemporalOps.asOfJoin(
        ev.select("id", "u", "ts"), right, Seq("u"), "ts", "ts",
        Seq("rid"))
        .write.format("noop").mode("overwrite").save()
    }
    time("sessionSummary 20M, 100k keys") {
      graft.operators.TemporalOps.sessionSummary(
        ev.select("id", "u", "ts"), Seq("u"), "ts", 60L, Seq("id"))
        .write.format("noop").mode("overwrite").save()
    }

    // z-order: 10M rows, 2^12 cells, box = ~1/16 of the plane
    val tmp = java.nio.file.Files.createTempDirectory("zscale").toString
    val data = spark.range(10000000L).select(
      col("id"),
      ((col("id") * 2654435761L) % 4096L).as("a"),
      ((col("id") * 40503L) % 4096L).as("b"))
    time("writeZOrdered 10M rows, 256 partitions") {
      graft.sources.ZOrderLayout.writeZOrdered(
        data, s"$tmp/layout", "a", "b", bits = 12, prefixBits = 8)
    }
    // measure each read twice — run 1 pays scan JIT for whoever goes
    // first; run 2 is the steady-state number
    var box = 0L; var full = 0L
    for (round <- 1 to 2) {
      box = time(s"readBox ~1/16 plane (run $round)") {
        graft.sources.ZOrderLayout.readBox(
          spark, s"$tmp/layout", 0, 1023, 0, 1023).count()
      }
      full = time(s"full-scan filter (run $round)") {
        spark.read.parquet(s"$tmp/layout")
          .where(col("a") <= 1023 && col("b") <= 1023).count()
      }
    }
    println(s"[probe] box=$box full=$full equal=${box == full}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
