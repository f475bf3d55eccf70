package graft.streaming

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class StreamingNearDupSpec extends SparkFunSuite {

  test("cross-batch near-dups are found through the persisted index; " +
    "within-batch dups are not missed; state accumulates") {
    val s = spark; import s.implicits._
    val blocksBefore = spark.sparkContext.getPersistentRDDs.keySet
    val dir = tempDir("snd")
    val inDir = s"$dir/in"
    Files.createDirectories(Paths.get(inDir))
    val work = s"$dir/work"

    // land one parquet FILE per batch in the watched dir (the file
    // source takes flat files; a df.write directory would not be listed)
    def writeBatch(df: DataFrame, name: String): Unit = {
      val tmp = s"$dir/stage-$name"
      df.repartition(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$inDir/$name.parquet"))
    }

    // batch 1: distinct docs, one within-batch identical pair (10, 11)
    writeBatch(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark engines shuffle data across the cluster nodes"),
      (10L, "identical text arriving twice in one single batch here"),
      (11L, "identical text arriving twice in one single batch here"))
      .toDF("id", "text"), "b1")
    StreamingNearDup.start(spark, inDir, work, 7, 10,
      bands = 8, rows = 4).awaitTermination()

    // batch 2: 100 is an identical twin of batch 1's doc 1; 101 is new.
    // The resumed stream deliberately passes DIFFERENT banding defaults
    // (16, 8): the index's pinned (8, 4, 8) must win for the appends.
    writeBatch(Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "completely unrelated content about training data pipelines"))
      .toDF("id", "text"), "b2")
    StreamingNearDup.start(spark, inDir, work, 7, 10).awaitTermination()

    val matches = spark.read.parquet(s"$work/matches")
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // within-batch pair from batch 1 (join form: a < b)
    assert(matches.contains((10L, 11L)), s"within-batch dup missed: $matches")
    // cross-batch: probe 100 found corpus doc 1 through the index
    assert(matches.contains((100L, 1L)), s"cross-batch dup missed: $matches")
    // and nothing invented a pair for the unrelated doc
    assert(!matches.exists(p => p._1 == 101L || p._2 == 101L))

    // state accumulated: corpus has all 6 docs; the index meta still
    // pins batch 1's parameters (stream-restart parameters ignored)
    assert(spark.read.parquet(s"$work/corpus").count() == 6)
    assert(new String(Files.readAllBytes(
      Paths.get(s"$work/index/_graft_minhash_meta")), "UTF-8")
      .startsWith("8,4,"))
    // no leaked storage blocks from the per-batch operators (delta vs
    // test start: the shared session may carry other suites' blocks)
    val leaked =
      spark.sparkContext.getPersistentRDDs.keySet -- blocksBefore
    assert(leaked.isEmpty, s"leaked blocks: $leaked")
  }

  test("mid-stream index compaction: matches identical to the " +
    "uncompacted stream, index files drop") {
    val s = spark; import s.implicits._
    def batches: Seq[DataFrame] = Seq(
      (0L to 9L).map(i => (i, s"base document $i about topic ${i % 3} " +
        "with plenty of shared phrasing between documents")),
      (0L to 4L).map(i => (i + 100L, s"base document $i about topic " +
        s"${i % 3} with plenty of shared phrasing between documents")),
      (5L to 9L).map(i => (i + 200L, s"base document $i about topic " +
        s"${i % 3} with plenty of shared phrasing between documents")))
      .map(_.toDF("id", "text"))

    def run(tag: String, compactEvery: Option[Int]): (Set[(Long, Long)], String) = {
      val dir = tempDir(s"sndc-$tag")
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
        // mod-time order = batch order under maxFilesPerTrigger=1
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(
            1700000000000L + i * 60000L))
      }
      val handle = StreamingNearDup.start(spark, inDir, work, 7, 10,
        bands = 8, rows = 4, sigBuckets = 4,
        maxFilesPerTrigger = Some(1), compactEvery = compactEvery)
      handle.awaitTermination()
      // the index stream's handle reports ITS maintenance events since
      // start: 3 batches at compactEvery=2 fire once; no policy, never
      val fires = handle.maintenanceStats()
        .getOrElse(graft.ext.MaintenanceEvents.CompactFire, 0L)
      assert(fires == compactEvery.map(_ => 1L).getOrElse(0L),
        s"handle stats: expected fire count for $compactEvery, got $fires")
      assert(handle.maintainedDirs == Seq(s"$work/index"))
      (spark.read.parquet(s"$work/matches").select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
        s"$work/index")
    }

    val (plain, _) = run("plain", None)
    val (compacted, idx) = run("compact", Some(2))
    // batch 1 compacts after batch index 1 (the 2nd); batch 2 then
    // probes the COMPACTED index — every cross-batch twin must still
    // be found, and nothing extra may appear
    assert(compacted == plain,
      s"compaction changed stream output:\n plain=$plain\n comp=$compacted")
    assert((5L to 9L).forall(i => compacted.contains((i + 200L, i))),
      s"post-compaction probe missed a twin: $compacted")
    // the compacted index holds one file per touched partition, fewer
    // than the 3 appends stacked (gauges recorded by the stream)
    val gauges = graft.Instr.snapshot().toMap
    val before = gauges("streamNearDup.compact_files_before").last
    val after = gauges("streamNearDup.compact_files_after").last
    assert(after < before, s"compaction did not drop files: $before -> $after")
  }
}
