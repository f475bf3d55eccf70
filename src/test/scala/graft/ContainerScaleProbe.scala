package graft

import org.apache.spark.sql.functions._

/** Scratch probe (main, not a test): wall-clock throughput of the
  * round-12 container walks — tar (ustar, checksum-verified), ZIP
  * (central-directory-first, CRC-verified, deflate), and FLAC
  * (bit-level subframe decode, CRC-8/16-verified) — each over 20k
  * synthetic blobs on local[32]. All three are narrow per-partition
  * maps; the number to watch is blobs/s and MB/s of the verify+decode
  * work, since at 100 TB these walks ARE the scan cost.
  *
  * Run: sbt "Test/runMain graft.ContainerScaleProbe"
  */
object ContainerScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-52s $sec%8.2f s")
      (r, sec)
    }
    val nBlobs = 20000L

    val mkTar = udf((id: Long) => graft.ext.TarShard.syntheticTar(id))
    val tar = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkTar(col("id")).as("blob"))
      .localCheckpoint()
    val tarMb = tar.select(sum(length(col("blob")))).collect()(0).getLong(0) / 1e6
    val (tarRows, tarSec) = time(f"tar member walk, 20k shards ($tarMb%.0f MB)") {
      graft.ext.TarShard.extractTarMembers(tar, "blob").count()
    }
    println(f"[probe] tar: $tarRows rows, ${nBlobs / tarSec}%.0f blobs/s, " +
      f"${tarMb / tarSec}%.0f MB/s")

    val mkZip = udf((id: Long) => graft.ext.ZipArchive.buildZip(
      (0 until 4).map { k =>
        val p = new Array[Byte](2000 + (id % 500).toInt)
        java.util.Arrays.fill(p, ((id + k) % 251).toByte)
        (f"e$id%06d_$k.dat", if (k % 2 == 0) 0 else 8, p)
      }))
    val zip = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkZip(col("id")).as("blob"))
      .localCheckpoint()
    val zipMb = zip.select(sum(length(col("blob")))).collect()(0).getLong(0) / 1e6
    val (zipRows, zipSec) = time(f"zip cd walk + inflate, 20k ($zipMb%.0f MB)") {
      graft.ext.ZipArchive.extractZipEntries(zip, "blob").count()
    }
    println(f"[probe] zip: $zipRows rows, ${nBlobs / zipSec}%.0f blobs/s, " +
      f"${zipMb / zipSec}%.0f MB/s (uncompressed ${nBlobs * 4 * 2250 / 1e6 / zipSec}%.0f MB/s)")

    val mkFlac = udf((id: Long) => {
      val frames = (0 until 4).map { f =>
        graft.ext.Flac.buildFlacFrame(f, 256, 16000L, 5, 1, 16,
          constant = None,
          verbatim = Some(Array(Array.tabulate(256)(sx =>
            ((id + f * 3 + sx * 11) % 200 - 100)))))
      }
      graft.ext.Flac.buildFlac(16000L, 1, 16, 1024L, frames)
    })
    val flac = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkFlac(col("id")).as("blob"))
      .localCheckpoint()
    val flacMb = flac.select(sum(length(col("blob")))).collect()(0).getLong(0) / 1e6
    val (flacRows, flacSec) = time(f"flac bit-walk, 20k blobs ($flacMb%.0f MB)") {
      graft.ext.Flac.extractFlacFrames(flac, "blob").count()
    }
    println(f"[probe] flac: $flacRows rows, ${nBlobs / flacSec}%.0f blobs/s, " +
      f"${flacMb / flacSec}%.0f MB/s")
    spark.stop()
  }
}
