package graft
// Scratch: extractMp4Samples throughput at web scale — 5M synthetic
// sampled MP4s (interleaved multi-chunk layouts + poison rows) through
// the sample extractor on local[32]; ~40M output rows. The
// Mp4ScaleProbe pattern, for the stsz/stsc/stco/stts/stss path.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Mp4SampleScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("mp4sprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 5000000L
    val mk = udf((id: Long) => {
      val brand = ((id % 3).toInt: @unchecked) match {
        case 0 => "isom"; case 1 => "mp42"; case 2 => "qt  "
      }
      val full = graft.ext.Multimodal.syntheticMp4(brand,
        600 * (1 + (id % 5).toInt), 600L * (1 + id % 11) + id,
        1 + (id % 3).toInt, (id % 2).toInt, withSamples = true)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.take(20) else full
    })
    val blobs = spark.range(0, n, 1, 32)
      .select(col("id"), mk(col("id")).as("blob")).localCheckpoint()
    val bytes = blobs.agg(sum(length(col("blob")))).head().getLong(0)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val r = graft.ext.Multimodal.extractMp4Samples(blobs, "blob")
        .agg(count(lit(1)), sum(col("byte_sum")),
          sum(when(col("is_sync"), 1L).otherwise(0L))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[mp4s] run=$i: $sec%.2f s, ${n / 1e6 / sec}%.2f M blobs/s, " +
        f"${bytes / 1e6 / sec}%.1f MB/s, rows=${r.getLong(0)}, " +
        f"bsum=${r.getLong(1)}, sync=${r.getLong(2)}")
    }
    // fragmented (DASH/CMAF) corpus: same scale, container mode keyed
    // by id — the moof/tfhd/trun walk must hold the same throughput
    // class and produce the SAME aggregate digests as the classic
    // corpus (the fixtures are mode-invariant)
    val mkFrag = udf((id: Long) => {
      val brand = ((id % 3).toInt: @unchecked) match {
        case 0 => "isom"; case 1 => "mp42"; case 2 => "qt  "
      }
      val full = graft.ext.Multimodal.syntheticMp4(brand,
        600 * (1 + (id % 5).toInt), 600L * (1 + id % 11) + id,
        1 + (id % 3).toInt, (id % 2).toInt, withSamples = true,
        fragmented = 1 + (id % 2).toInt)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.take(20) else full
    })
    val fragBlobs = spark.range(0, n, 1, 32)
      .select(col("id"), mkFrag(col("id")).as("blob")).localCheckpoint()
    val fragBytes = fragBlobs.agg(sum(length(col("blob")))).head().getLong(0)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val r = graft.ext.Multimodal.extractMp4Samples(fragBlobs, "blob")
        .agg(count(lit(1)), sum(col("byte_sum")),
          sum(when(col("is_sync"), 1L).otherwise(0L))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[mp4f] run=$i: $sec%.2f s, ${n / 1e6 / sec}%.2f M blobs/s, " +
        f"${fragBytes / 1e6 / sec}%.1f MB/s, rows=${r.getLong(0)}, " +
        f"bsum=${r.getLong(1)}, sync=${r.getLong(2)}")
    }
    spark.stop()
  }
}
