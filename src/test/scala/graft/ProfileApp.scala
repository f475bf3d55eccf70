package graft
// Scratch profiler for pipeline stages (test scope only).
import org.apache.spark.sql.SparkSession
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
    // the same aligned fixture Bench's dedup pipeline stat uses
    val data = Bench.benchFixture(64 * 1024 * 1024)
    val dir = java.nio.file.Files.createTempDirectory("prof")
    val input = dir.resolve("aligned.bin")
    java.nio.file.Files.write(input, data)
    time("chunks_ranged_path")(
      ChunkSource.chunksOfHugeFile(spark, input.toString, data.length.toLong, 64).count())
    val engine = new Deduplicator(spark, dir.resolve("w1").toString)
    time("dedup_single_64MB")(engine.deduplicateFile(input.toString, DedupOptions(chunkBytes = 64)))
    // 16-file micro-batch, 4 MB each (content overlap across files)
    val paths = (0 until 16).map { i =>
      val p = dir.resolve(s"part$i.bin")
      java.nio.file.Files.write(p, data.slice(i * 2097152, i * 2097152 + 4194304))
      p.toString
    }
    val engine2 = new Deduplicator(spark, dir.resolve("w2").toString)
    val results = time("dedup_batch_16x4MB")(
      engine2.deduplicateBatch(paths, DedupOptions(chunkBytes = 64)))
    println(s"PROFILE-BATCH results: files=${results.size} " +
      s"chunks=${results.map(_.chunks).sum} pointers=${results.map(_.pointers).sum} " +
      s"catalogVersion=${engine2.catalog.currentVersion}")
    spark.stop()
  }
}
