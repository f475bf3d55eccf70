package graft
// Scratch: imageHash throughput — 200k real PNG decodes + aHash on
// local[32] (the REAL-codec cost a LAION-style dedup pays per image),
// plus the downstream hammingPairs join on the resulting signatures.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ImageHashScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("imgprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 200000L
    val mk = udf((id: Long) => {
      val base = id % 100000
      graft.ext.Multimodal.syntheticGrayPng(
        30 + (base % 5).toInt * 7, 26 + (base % 3).toInt * 9, base,
        tweakMod = if (id >= 100000) 31 else 0)
    })
    val blobs = spark.range(0, n, 1, 32)
      .select(col("id"), mk(col("id")).as("blob")).localCheckpoint()
    val bytes = blobs.agg(sum(length(col("blob")))).head().getLong(0)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val sig = graft.ext.Multimodal.imageHash(blobs, "blob")
        .select(col("id"), col("img.ahash").as("ahash"))
      val r = sig.agg(count(lit(1)), sum(bit_count(col("ahash")))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[img] run=$i: $sec%.2f s, ${n / 1e3 / sec}%.1f K imgs/s, " +
        f"${bytes / 1e6 / sec}%.1f MB/s, rows=${r.getLong(0)}")
    }
    // pair join over the full signature set (100k planted twins)
    val sig = graft.ext.Multimodal.imageHash(blobs, "blob")
      .select(col("id"), col("img.ahash").as("ahash")).localCheckpoint()
    val t0 = System.nanoTime()
    val pairs = graft.ext.DocDedup.hammingPairs(sig, "id", "ahash", 3)
      .count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[img] hammingPairs over ${2 * 100000} sigs: $sec%.2f s, " +
      f"$pairs pairs")
    val t1 = System.nanoTime()
    val cl = graft.ext.DocDedup.hammingClusters(sig, "id", "ahash", 3)
      .agg(count(lit(1)), countDistinct(col("cluster"))).head()
    val sec1 = (System.nanoTime() - t1) / 1e9
    println(f"[img] hammingClusters over ${2 * 100000} sigs: $sec1%.2f s, " +
      f"${cl.getLong(0)} labeled, ${cl.getLong(1)} clusters")
    spark.stop()
  }
}
