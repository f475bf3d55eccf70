package graft
// Scratch: w64 throughput variance — 6 repeated runs, bucketChars=1, local[32]
import org.apache.spark.sql.SparkSession
object W64Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("w64")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("w64probe")
    val data = Bench.benchFixture(64 * 1024 * 1024, 64)
    val input = dir.resolve("aligned.bin")
    java.nio.file.Files.write(input, data)
    (1 to 6).foreach { i =>
      val engine = new graft.api.Deduplicator(spark,
        dir.resolve(s"work$i").toString, bucketChars = 1)
      val t0 = System.nanoTime()
      val r = engine.deduplicateFile(input.toString,
        graft.api.DedupOptions(chunkBytes = 64))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[w64] run=$i: $sec%.2f s, ${data.length / 1e6 / sec}%.2f MB/s, chunks=${r.chunks}")
    }
    spark.stop()
  }
}
