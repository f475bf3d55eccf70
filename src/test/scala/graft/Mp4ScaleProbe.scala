package graft
// Scratch: decodeMp4Bytes throughput at web scale — 5M synthetic MP4s
// (mixed variants + poison rows) through the decodeVideo operator on
// local[32], the WebPrepScaleProbe pattern.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Mp4ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("mp4probe")
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
        1 + (id % 3).toInt, (id % 2).toInt)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.take(20) else full
    })
    val blobs = spark.range(0, n, 1, 32)
      .select(col("id"), mk(col("id")).as("blob")).localCheckpoint()
    val bytes = blobs.agg(sum(length(col("blob")))).head().getLong(0)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val ok = graft.ext.Multimodal.decodeVideo(blobs, "blob")
        .agg(sum(when(col("video.ok"), 1L).otherwise(0L)),
          sum(col("video.n_video_tracks"))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[mp4] run=$i: $sec%.2f s, ${n / 1e6 / sec}%.2f M blobs/s, " +
        f"${bytes / 1e6 / sec}%.1f MB/s, ok=${ok.getLong(0)} vide=${ok.getLong(1)}")
    }
    spark.stop()
  }
}
