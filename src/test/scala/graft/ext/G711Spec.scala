package graft.ext

import graft.SparkFunSuite

class G711Spec extends SparkFunSuite {

  /** Decode all 256 byte values through the JDK's own G.711→PCM
    * converter (non-circular reference for our tables).
    */
  private def jdkDecode(enc: javax.sound.sampled.AudioFormat.Encoding)
      : Array[Int] = {
    val src = new javax.sound.sampled.AudioFormat(enc, 8000f, 8, 1, 1,
      8000f, false)
    val dst = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bytes = Array.tabulate(256)(_.toByte)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), src, 256L)
    val conv = javax.sound.sampled.AudioSystem.getAudioInputStream(dst, in)
    val out = conv.readAllBytes()
    Array.tabulate(256)(i =>
      ((out(2 * i + 1) << 8) | (out(2 * i) & 0xFF)))
  }

  test("mu-law table matches the JDK converter byte-for-byte") {
    val jdk = jdkDecode(javax.sound.sampled.AudioFormat.Encoding.ULAW)
    (0 until 256).foreach { b =>
      assert(Multimodal.ulaw2linear(b.toByte) == jdk(b),
        s"byte $b: ours=${Multimodal.ulaw2linear(b.toByte)} jdk=${jdk(b)}")
    }
  }

  test("A-law table matches the JDK converter byte-for-byte") {
    val jdk = jdkDecode(javax.sound.sampled.AudioFormat.Encoding.ALAW)
    (0 until 256).foreach { b =>
      assert(Multimodal.alaw2linear(b.toByte) == jdk(b),
        s"byte $b: ours=${Multimodal.alaw2linear(b.toByte)} jdk=${jdk(b)}")
    }
  }

  test("G.711 WAVs decode through decodeAudio with exact sums") {
    import spark.implicits._
    val n = 500
    val mu = Multimodal.syntheticWavG711(8000, n, 11L, alaw = false)
    val al = Multimodal.syntheticWavG711(8000, n, 11L, alaw = true)
    val df = Seq((1L, mu), (2L, al)).toDF("id", "blob")
    val rows = Multimodal.decodeAudio(df, "blob")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("audio.ok").as("ok"),
        org.apache.spark.sql.functions.col("audio.n_frames").as("n_frames"),
        org.apache.spark.sql.functions.col("audio.sample_sum")
          .as("sample_sum"))
      .orderBy("id").collect()
    assert(rows.length == 2)
    def expect(alaw: Boolean): Long =
      (0 until n).map { k =>
        val b = ((11L * 7 + k * 13) % 256).toByte
        (if (alaw) Multimodal.alaw2linear(b)
         else Multimodal.ulaw2linear(b)).toLong
      }.sum
    assert(rows(0).getAs[Boolean]("ok"))
    assert(rows(0).getAs[Long]("n_frames") == n.toLong)
    assert(rows(0).getAs[Long]("sample_sum") == expect(alaw = false))
    assert(rows(1).getAs[Long]("sample_sum") == expect(alaw = true))
  }
}
