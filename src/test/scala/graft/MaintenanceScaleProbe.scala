package graft

import org.apache.spark.sql.functions._

/** Scratch probe (main, not a test): slope evidence for the r14
  * additions the verdict asked to MEASURE rather than assert (r14
  * ask #5) — index COMPACTION (the q237/q238 machinery) across a 4×
  * corpus doubling ladder. For each size n:
  *
  *   build (n docs) → 4 appends (n/10 docs each, the fragmentation a
  *   streaming month accumulates in miniature) → probe the fragmented
  *   index → compact → probe the compacted index,
  *
  * timing each stage and recording the data-file counts. What a
  * healthy slope looks like: build/append/compact wall-time grows
  * ~linearly with n (compaction is one clustered full rewrite — its
  * cost IS ∝ rows); the file count before compaction is ∝ appends
  * (layout, not data), the count after is the partition count
  * (constant in n); probe-post ≤ probe-pre at every size, and the
  * probe is sub-linear in n (pruned to the probe's buckets).
  *
  * Run: sbt "Test/runMain graft.MaintenanceScaleProbe"
  */
object MaintenanceScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-52s $sec%8.2f s")
      (r, sec)
    }

    // CorpusScaleProbe's corpus shape: unique 30-token bodies drawn
    // from a 50k vocabulary, boilerplate planted in every 10th doc so
    // the LSH buckets hold real duplicate populations.
    def corpus(from: Long, n: Long) = spark.range(from, from + n).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        when(col("id") % 10 === 0,
          lit("the quick brown fox jumps over the lazy dog again and again"))
          .otherwise(concat(lit("u"), col("id"))),
        array_join(transform(sequence(lit(0), lit(29)),
          i => concat(lit("w"), pmod(col("id") * 7 + i * 13, lit(50000)))),
          " ")).as("text"))

    // This VM shows multi-second host-steal stall epochs (the bench
    // mirror's calibration samples have caught 2.5x); a single-run
    // slope table would measure the epochs, not the operators. Each
    // ladder runs twice with fresh state and the per-stage MIN is the
    // reported number — the same min-of-2 protocol as Bench.
    for (n <- Seq(50000L, 100000L, 200000L)) {
      var best = Map.empty[String, Double].withDefaultValue(1e9)
      var filesBefore = 0L; var filesAfter = 0L; var rows = 0L
      for (rep <- 1 to 2) {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"graft-maint-probe-$n-$rep").toString
        val idx = s"$tmp/index"
        val base = corpus(0L, n).localCheckpoint()
        val (_, buildSec) = time(s"build minhash index, $n docs (rep $rep)") {
          graft.ext.DocDedup.buildMinHashIndex(base, "doc_id", "text", idx,
            bands = 16, rows = 8, sigBuckets = 8)
        }
        val (_, appendSec) = time(s"4 appends of ${n / 10} docs (rep $rep)") {
          (1 to 4).foreach { k =>
            graft.ext.DocDedup.appendToMinHashIndex(
              corpus(n * k, n / 10), "doc_id", "text", idx)
          }
        }
        filesBefore = graft.ext.IndexMaintenance.dataFileCount(spark, idx)
        val probes = corpus(0L, 1000L)
          .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
        val all = base.unionByName(
          (1 to 4).map(k => corpus(n * k, n / 10))
            .reduce(_ unionByName _)).localCheckpoint()
        val (preRows, preSec) = time(s"probe 1k docs, fragmented (rep $rep)") {
          graft.ext.DocDedup.probeMinHashIndex(probes, all,
            "doc_id", "text", idx, 7, 10).count()
        }
        val (stats, compactSec) = time(s"compact (rep $rep)") {
          graft.ext.DocDedup.compactMinHashIndex(spark, idx)
        }
        val (postRows, postSec) = time(s"probe 1k docs, compacted (rep $rep)") {
          graft.ext.DocDedup.probeMinHashIndex(probes, all,
            "doc_id", "text", idx, 7, 10).count()
        }
        require(preRows == postRows,
          s"probe row drift across compaction: $preRows vs $postRows")
        filesAfter = stats.filesAfter; rows = preRows
        best = best ++ Seq(
          "build" -> math.min(best("build"), buildSec),
          "append" -> math.min(best("append"), appendSec),
          "pre" -> math.min(best("pre"), preSec),
          "compact" -> math.min(best("compact"), compactSec),
          "post" -> math.min(best("post"), postSec))
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      }
      println(f"[probe] n=$n%7d MIN-OF-2  build ${best("build")}%6.2f" +
        f"  append ${best("append")}%6.2f  compact ${best("compact")}%6.2f" +
        f"  files $filesBefore%5d -> $filesAfter%4d" +
        f"  probe pre ${best("pre")}%5.2f post ${best("post")}%5.2f" +
        f"  rows $rows%d")
    }
    spark.stop()
  }
}
