package graft.ext

import graft.SparkFunSuite

class FormatSnifferSpec extends SparkFunSuite {

  test("every family fixture sniffs to its label") {
    def flacBlob = Flac.buildFlac(8000L, 1, 16, 256L, Seq(
      Flac.buildFlacFrame(0, 256, 8000L, 4, 1, 16,
        constant = Some(Array(5L)), verbatim = None)))
    def gzBlob = {
      val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o)
      g.write("payload".getBytes("UTF-8")); g.close()
      o.toByteArray
    }
    val sync = Array.tabulate(16)(i => (i * 3 + 1).toByte)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "tar" -> TarShard.syntheticTar(5),
      "zip" -> ZipArchive.buildZip(Seq(("a.txt", 0, Array[Byte](1, 2)))),
      "flac" -> flacBlob,
      "ogg" -> Ogg.syntheticOgg(3),
      "webm" -> Matroska.syntheticWebm(2),
      "wav" -> Multimodal.syntheticWav(8000, 50, 1),
      "png" -> Multimodal.syntheticPng(8, 8, 1),
      "jpeg" -> Multimodal.solidJpeg(8, 8, 100),
      "gif" -> Multimodal.syntheticGif(8, 8, 2, 1),
      "webp" -> WebP.syntheticWebP(1, 32, 32, 10, 3),
      "zstd" -> Zstd.buildZstdFrame(Seq((false, Array[Byte](1, 2, 3))),
        withChecksum = false, 2, singleSegment = false),
      "zstd" -> Zstd.buildSkippable(Array[Byte](9)),
      "lz4" -> Lz4.buildLz4Frame(Seq((true, Array[Byte](1, 2, 3))),
        Array[Byte](1, 2, 3)),
      "parquet" -> ParquetMeta.buildParquetBlob(1, Seq("a"), Seq(3L),
        Seq(30L), "w", bodyLen = 8),
      "orc" -> Orc.buildOrc(2, 2, Seq(5L), 10L, bodyLen = 8),
      "npy" -> Npy.buildNpy("<i4", Seq(2L), Seq(1L, 2L)),
      "safetensors" -> SafeTensors.buildSafeTensors(
        Seq(("t", "U8", Seq(3L), 1))),
      "avro" -> AvroOcf.buildAvro("\"bytes\"", "null", sync,
        Seq((1L, Array[Byte](4)))),
      "gzip" -> gzBlob,
      "mp3" -> Mp3.syntheticMp3(0),
      "mp3" -> Mp3.syntheticMp3(1),
      "warc" -> WebArchive.buildWarcArchive(Seq(
        WebArchive.buildWarcRecord("response", "<urn:uuid:1>",
          "http://x/", "2024-01-01T00:00:00Z", "text/plain",
          "hi".getBytes("UTF-8"), null)), memberGzip = false),
      "tfrecord" -> TfRecord.buildTfRecord(Seq(Array[Byte](1, 2, 3))),
      "mp4" -> Multimodal.syntheticMp4("isom", 600, 600L, 1, 0))
    cases.foreach { case (want, blob) =>
      assert(FormatSniffer.sniff(blob) == want, want)
    }
    assert(FormatSniffer.sniff("plain prose, nothing else.".getBytes("UTF-8"))
      == "text")
    assert(FormatSniffer.sniff(Array[Byte](0, 1, 2, 3, 4)) == "unknown")
    assert(FormatSniffer.sniff(Array.empty[Byte]) == "empty")
    // tfrecord identification is the CRC check, not a magic: one
    // flipped length byte de-identifies it
    val tf = TfRecord.buildTfRecord(Seq(Array[Byte](1, 2, 3)))
    tf(0) = (tf(0) ^ 1).toByte
    assert(FormatSniffer.sniff(tf) != "tfrecord")
  }
}
