package graft

import org.apache.spark.sql.functions._

/** Scratch probe (main, not a test): wall-clock throughput of the
  * compression-layer walks — gzip (header parse + FHCRC + inflate +
  * CRC-32/ISIZE verify), LZ4 (full block decode + XXH32 content
  * checksum), raw Snappy via Avro blocks (decode + big-endian CRC),
  * and the Parquet footer triage (Thrift-compact walk, no body read)
  * — each over synthetic blobs on local[32]. All narrow per-partition
  * maps; at 100 TB these ARE the scan cost of a compressed corpus.
  *
  * Run: sbt "Test/runMain graft.CompressionScaleProbe"
  */
object CompressionScaleProbe {
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
    val contentLen = 16000

    // content with mixed compressibility: half fill, half hash noise
    def mkContent(id: Long): Array[Byte] = {
      val c = new Array[Byte](contentLen)
      java.util.Arrays.fill(c, 0, contentLen / 2, (id % 251).toByte)
      var i = contentLen / 2
      var z = id * 0x9E3779B97F4A7C15L + 1
      while (i < contentLen) {
        z ^= z << 13; z ^= z >>> 7; z ^= z << 17
        c(i) = z.toByte
        i += 1
      }
      c
    }

    val mkGz = udf((id: Long) => graft.ext.Gzip.buildGzipMember(
      mkContent(id), fname = f"f$id%06d.txt", withHcrc = true))
    val gz = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkGz(col("id")).as("blob"))
      .localCheckpoint()
    val gzMb = gz.select(sum(length(col("blob")))).collect()(0).getLong(0) / 1e6
    val outMb = nBlobs * contentLen / 1e6
    val (gzRows, gzSec) = time(f"gzip walk+verify, 20k ($gzMb%.0f MB comp)") {
      graft.ext.Gzip.extractGzipMembers(gz, "blob").count()
    }
    println(f"[probe] gzip: $gzRows rows, ${nBlobs / gzSec}%.0f blobs/s, " +
      f"${gzMb / gzSec}%.0f MB/s comp, ${outMb / gzSec}%.0f MB/s decoded")

    val mkLz = udf((id: Long) => {
      val c = mkContent(id)
      graft.ext.Lz4.buildLz4Frame(
        Seq((false, graft.ext.Lz4.buildLz4Block(Seq(
          graft.ext.Lz4.Lit(c.take(1)),
          graft.ext.Lz4.MatchRef(1, contentLen / 2 - 1),
          graft.ext.Lz4.Lit(c.drop(contentLen / 2)))))), c,
        withContentChecksum = true, withBlockChecksum = true, bdCode = 4)
    })
    val lz = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkLz(col("id")).as("blob"))
      .localCheckpoint()
    val lzMb = lz.select(sum(length(col("blob")))).collect()(0).getLong(0) / 1e6
    val (lzRows, lzSec) = time(f"lz4 decode+xxh32, 20k ($lzMb%.0f MB comp)") {
      graft.ext.Lz4.extractLz4Frames(lz, "blob").count()
    }
    println(f"[probe] lz4: $lzRows rows, ${nBlobs / lzSec}%.0f blobs/s, " +
      f"${outMb / lzSec}%.0f MB/s decoded")

    val sync = Array.tabulate(16)(i => (i * 7 + 3).toByte)
    val mkAv = udf((id: Long) => graft.ext.AvroOcf.buildAvro(
      "\"bytes\"", "snappy", sync, Seq((4L, mkContent(id)))))
    val av = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkAv(col("id")).as("blob"))
      .localCheckpoint()
    val (avRows, avSec) = time(f"avro snappy decode+crc, 20k") {
      graft.ext.AvroOcf.extractAvroBlocks(av, "blob").count()
    }
    println(f"[probe] avro-snappy: $avRows rows, ${nBlobs / avSec}%.0f blobs/s, " +
      f"${outMb / avSec}%.0f MB/s decoded")

    val mkPq = udf((id: Long) => graft.ext.ParquetMeta.buildParquetBlob(
      1, (0 until 16).map(i => s"c$i"), Seq(1000L, 2000L, 3000L),
      Seq(1L << 20, 2L << 20, 3L << 20), "graft probe",
      bodyLen = 4096))
    val pq = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkPq(col("id")).as("blob"))
      .localCheckpoint()
    val (pqRows, pqSec) = time(f"parquet footer walk, 20k") {
      graft.ext.ParquetMeta.extractParquetMeta(pq, "blob").count()
    }
    println(f"[probe] parquet-meta: $pqRows rows, ${nBlobs / pqSec}%.0f blobs/s")

    val mkSt = udf((id: Long) => graft.ext.SafeTensors.buildSafeTensorsRaw(
      Seq(("emb", "F32", Seq(125L, 32L), mkContent(id))))) // 125·32·4 = 16000
    val st = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkSt(col("id")).as("blob"))
      .localCheckpoint()
    val (stRows, stSec) = time(f"safetensors vector decode, 20k") {
      graft.ext.SafeTensors.extractTensorVectors(st, "blob").count()
    }
    println(f"[probe] safetensors: $stRows vec rows, " +
      f"${nBlobs / stSec}%.0f blobs/s, ${outMb / stSec}%.0f MB/s decoded")

    val mkNp = udf((id: Long) => {
      val c = mkContent(id)
      graft.ext.Npy.buildNpy("|u1", Seq(c.length.toLong),
        c.toSeq.map(b => (b & 0xFF).toLong))
    })
    val np = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkNp(col("id")).as("blob"))
      .localCheckpoint()
    val (npRows, npSec) = time(f"npy integer decode, 20k") {
      graft.ext.Npy.extractNpyMeta(np, "blob").count()
    }
    println(f"[probe] npy: $npRows rows, ${nBlobs / npSec}%.0f blobs/s, " +
      f"${outMb / npSec}%.0f MB/s decoded")

    // record-format walks: 200 records per shard, mixed families
    val mkMp = udf((id: Long) => {
      val pk = new graft.ext.MsgPack.Packer
      (0 until 200).foreach { r =>
        pk.mapHeader(3)
        pk.str("id").int(id * 1000 + r)
        pk.str("text").str("x" * (20 + (id + r) % 40).toInt)
        pk.str("flag").bool((id + r) % 2 == 0)
      }
      pk.bytes
    })
    val mp = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkMp(col("id")).as("blob"))
      .localCheckpoint()
    val mpMb = mp.select(sum(length(col("blob")))).collect()(0).getLong(0) / 1e6
    val (mpRows, mpSec) = time(f"msgpack walk, 20k x 200 rec ($mpMb%.0f MB)") {
      graft.ext.MsgPack.extractMsgPackStats(mp, "blob").count()
    }
    println(f"[probe] msgpack: $mpRows rows, ${nBlobs / mpSec}%.0f blobs/s, " +
      f"${mpMb / mpSec}%.0f MB/s")

    val mkBs = udf((id: Long) => {
      val docs = (0 until 200).map { r =>
        val d = new graft.ext.Bson.DocBuilder
        d.int32("id", (id * 100 + r).toInt)
        d.string("text", "x" * (20 + (id + r) % 40).toInt)
        d.boolV("flag", (id + r) % 2 == 0)
        d.bytes
      }
      val out = new java.io.ByteArrayOutputStream()
      docs.foreach(b => out.write(b, 0, b.length))
      out.toByteArray
    })
    val bs = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkBs(col("id")).as("blob"))
      .localCheckpoint()
    val bsMb = bs.select(sum(length(col("blob")))).collect()(0).getLong(0) / 1e6
    val (bsRows, bsSec) = time(f"bson walk, 20k x 200 docs ($bsMb%.0f MB)") {
      graft.ext.Bson.extractBsonStats(bs, "blob").count()
    }
    println(f"[probe] bson: $bsRows rows, ${nBlobs / bsSec}%.0f blobs/s, " +
      f"${bsMb / bsSec}%.0f MB/s")

    spark.stop()
  }
}
