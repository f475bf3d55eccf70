package graft
// Stage dissection of q39_catalog_merge (test scope):
// `Test/runMain graft.Q39Dissect [sfDir]`. Times each sequential piece
// of the gate — chunk+checkpoint, commit 1, known-hash read, commit 2,
// final links read — so "q39 is slow" decomposes into a specific stage.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

object Q39Dissect {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("q39d")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecExpressions.register(spark)
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $what%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"round $round")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-q39-dissect").toString
      val chunks = timed("chunk+hash+checkpoint") {
        spark.read.parquet(s"$dir/documents.parquet")
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            posexplode(TextAnalysis.charChunks(col("text"), 64))
              .as(Seq("pos", "chunk")))
          .select(col("doc_id"),
            md5(col("chunk").cast("binary")).as("hash"),
            (col("doc_id") * 1000000L + col("pos")).as("gl"))
          .localCheckpoint()
      }
      val r1 = chunks.where(col("doc_id") % 2 === 0)
      val r2 = chunks.where(col("doc_id") % 2 === 1)
      val cat = new graft.operators.Catalog(spark, tmp)
      val noDeltas = r1.where(lit(false))
        .select(col("hash"), lit(0L).as("delta"))
      timed("commit run1") {
        cat.commitRun("run1", 64, "md5",
          r1.groupBy("hash").agg(min("gl").as("line"),
            count(lit(1)).as("refs_num")),
          noDeltas)
      }
      val known = timed("links() for known") {
        val k = cat.links().select("hash")
        k.count(); k
      }
      timed("commit run2") {
        cat.commitRun("run2", 64, "md5",
          r2.join(known, Seq("hash"), "left_anti")
            .groupBy("hash").agg(min("gl").as("line"),
              count(lit(1)).as("refs_num")),
          r2.join(known, Seq("hash"), "left_semi")
            .groupBy("hash").agg(count(lit(1)).as("delta")))
      }
      timed("final links read") {
        cat.links().select("hash", "file_id", "line", "refs_num")
          .orderBy("hash").localCheckpoint()
      }
      val nFiles = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(tmp))
          .count(_.getName.startsWith("part-"))
      }
      println(s"  part-files in catalog: $nFiles")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
