package graft
// Scratch profiler for pipeline stages (test scope only).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.{DedupOptions, Deduplicator}
import graft.sources.ChunkSource
object ProfileApp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("profile")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // the same aligned fixture Bench's dedup pipeline stat uses, so the
    // stage timings here are comparable to the bench numbers
    val data = Bench.benchFixture(64 * 1024 * 1024)
    val dir = java.nio.file.Files.createTempDirectory("prof")
    val input = dir.resolve("aligned.bin")
    java.nio.file.Files.write(input, data)

    time("chunks_udf_path")(
      ChunkSource.chunks(spark, input.toString, 64).count())
    time("chunks_ranged_path")(
      ChunkSource.chunksOfHugeFile(spark, input.toString, data.length.toLong, 64).count())
    val engine = new Deduplicator(spark, dir.resolve("w1").toString)
    time("dedup_full")(engine.deduplicateFile(input.toString, DedupOptions(chunkBytes = 64)))
    spark.stop()
  }
}
