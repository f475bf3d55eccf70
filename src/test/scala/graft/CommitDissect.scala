package graft
// Micro-dissection of the versioned bucket write (test scope):
// `Test/runMain graft.CommitDissect`. Times each physical piece of one
// commitRun on a q39-shaped links table: localCheckpoint, touched
// collect, plain write, partitionBy write, clustered partitionBy write.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CommitDissect {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("cd")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("COMMIT_ALGO", "1"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecExpressions.register(spark)
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $what%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val links = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(32)
      .select(col("doc_id"),
        posexplode(graft.ext.TextAnalysis.charChunks(col("text"), 64))
          .as(Seq("pos", "chunk")))
      .select(md5(col("chunk").cast("binary")).as("hash"),
        lit(1L).as("file_id"),
        (col("doc_id") * 1000000L + col("pos")).as("line"))
      .groupBy("hash", "file_id").agg(min("line").as("line"),
        count(lit(1)).as("refs_num"))
      .localCheckpoint()
    println(s"links rows: ${links.count()}")
    for (round <- 1 to 2) {
      println(s"round $round")
      val base = java.nio.file.Files
        .createTempDirectory("graft-commit-dissect").toString
      timed("localCheckpoint x2")(
        { links.limit(100000).localCheckpoint(); links.where(lit(false))
            .select(col("hash"), lit(0L).as("delta")).localCheckpoint() })
      timed("touched distinct collect")(
        links.select(substring(col("hash"), 1, 2).as("b"))
          .distinct().collect())
      timed("plain parquet write (32 files)")(
        links.write.mode("overwrite").parquet(s"$base/plain"))
      timed("partitionBy write, clustered")(
        links.withColumn("bucket", substring(col("hash"), 1, 2))
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$base/clustered"))
      timed("partitionBy write, unclustered")(
        links.withColumn("bucket", substring(col("hash"), 1, 2))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$base/unclustered"))
      // bucket-count scaling: is the cost per output DIRECTORY?
      for (nb <- Seq(1, 16, 256)) {
        timed(s"partitionBy write, $nb buckets")(
          links.withColumn("bucket",
              pmod(conv(substring(col("hash"), 1, 2), 16, 10)
                .cast("int"), lit(nb)))
            .repartition(col("bucket"))
            .write.mode("overwrite").partitionBy("bucket")
            .parquet(s"$base/nb$nb"))
      }
      timed("plain write, repartition(256)")(
        links.repartition(256).write.mode("overwrite")
          .parquet(s"$base/many"))
      def count(p: String) = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(p)).count(_.getName.startsWith("part-"))
      }
      println(s"  files clustered=${count(s"$base/clustered")} " +
        s"unclustered=${count(s"$base/unclustered")} " +
        s"many=${count(s"$base/many")}")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
    spark.stop()
  }
}
