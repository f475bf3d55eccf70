package graft.streaming

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths}

/** Mid-stream compaction for a second index family (CDC) — proves the
  * `compactEvery` maintenance window generalizes beyond the MinHash
  * stream that q238 gates: match output is identical to the
  * non-compacting run and the shared-prefix matches still surface
  * through the compacted index.
  */
class StreamingCdcDupSpec extends SparkFunSuite {

  test("mid-stream CDC index compaction: matches identical to the " +
    "uncompacted stream") {
    val s = spark; import s.implicits._
    def blob(seed: Int): Array[Byte] = {
      val shared = Array.tabulate(6000)(j => ((j * 31 + 7) % 251).toByte)
      val own = Array.tabulate(3000)(j => ((j * 17 + seed) % 251).toByte)
      shared ++ own
    }
    def batches: Seq[DataFrame] = Seq(
      (0 until 6).map(i => (i.toLong, blob(i))),
      (0 until 3).map(i => (i + 100L, blob(i))), // twins of batch 1
      (3 until 6).map(i => (i + 200L, blob(i)))) // twins after compact
      .map(_.toDF("id", "blob"))

    def run(tag: String, compactEvery: Option[Int]): Set[(Long, Long)] = {
      val dir = tempDir(s"scdc-$tag")
      val inDir = s"$dir/in"; val work = s"$dir/work"
      Files.createDirectories(Paths.get(inDir))
      batches.zipWithIndex.foreach { case (df, i) =>
        val tmp = s"$dir/stage-$i"
        df.repartition(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet")).get
        val dest = Paths.get(s"$inDir/b$i.parquet")
        Files.copy(part.toPath, dest)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(
            1700000000000L + i * 60000L))
      }
      StreamingCdcDup.start(spark, inDir, work,
        minSize = 256, avgBits = 9, maxSize = 4096, hashBuckets = 8,
        maxFilesPerTrigger = Some(1), compactEvery = compactEvery)
        .awaitTermination()
      spark.read.parquet(s"$work/matches").select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    val plain = run("plain", None)
    val compacted = run("compact", Some(2))
    assert(compacted == plain,
      s"compaction changed stream output:\n plain=$plain\n comp=$compacted")
    // batch 3's twins (ids 203..205 of originals 3..5) probe the
    // COMPACTED index and must still match through the shared prefix
    assert((3 until 6).forall(i => compacted.exists(p =>
      p._1 == i + 200L && p._2 == i.toLong)),
      s"post-compaction probe missed a twin: $compacted")
    val gauges = graft.Instr.snapshot().toMap
    assert(gauges("streamCdcDup.compact_files_after").last <
      gauges("streamCdcDup.compact_files_before").last)
  }
}
