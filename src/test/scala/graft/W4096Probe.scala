package graft
// Scratch probe: isolate the 4 KiB dedup-width slowness seen in the r7
// bench smoke (w4096 2.5 MB/s vs w64 6.9 MB/s on the same corpus).
import org.apache.spark.sql.SparkSession

object W4096Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("w4096")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("w4096")
    Seq(64, 4096, 64, 4096).zipWithIndex.foreach { case (w, i) =>
      val data = Bench.benchFixture(64 * 1024 * 1024, w)
      val input = dir.resolve(s"aligned-$w-$i.bin")
      java.nio.file.Files.write(input, data)
      val engine = new graft.api.Deduplicator(spark,
        dir.resolve(s"work-$w-$i").toString)
      val t0 = System.nanoTime()
      val r = engine.deduplicateFile(input.toString,
        graft.api.DedupOptions(chunkBytes = w))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"== width=$w run=$i: $sec%.2f s, chunks=${r.chunks}, ptrs=${r.pointers}")
    }
    spark.stop()
  }
}
