package graft
// Scratch: Generator-vs-UDF chunker formulations on a many-files corpus
// (round-8; test scope only). Both formulations run from the same
// binaryFile scan so the delta is purely the explode shape.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.ChunkSource
object ChunkGenProbe {
  def main(args: Array[String]): Unit = {
    val width = args.headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]").appName("genprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("genprobe")
    // 16 x 4 MiB files of the bench fixture class
    val paths = (0 until 16).map { i =>
      val p = dir.resolve(s"f$i.bin")
      java.nio.file.Files.write(p, Bench.benchFixture(4 * 1024 * 1024, width))
      p.toString
    }
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc()
    }
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"PROFILE $name run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        cleanup()
      }
    }
    val scan = spark.read.format("binaryFile").load(paths: _*)
    val udfSplit = udf((content: Array[Byte]) => ChunkSource.split(content, width))
    time("udf+posexplode")(scan
      .select(col("path").as("file"), udfSplit(col("content")).as("parts"))
      .select(col("file"), posexplode(col("parts")))
      .select(col("file"), col("pos").cast("long").as("pos"),
        col("col").as("chunk")))
    time("generator     ")(ChunkSource.chunksOfFiles(spark, paths, width))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    spark.stop()
  }
}
