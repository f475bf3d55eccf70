package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkFunSuite {

  private lazy val blobs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "a plausible media blob ####".getBytes("UTF-8")),
      (2L, Array.empty[Byte]),
      (3L, "another blob with other bytes".getBytes("UTF-8"))
    ).toDF("id", "blob")
  }

  test("decodeMeta: deterministic metadata; poison blob flagged in-row, job survives") {
    val out = Multimodal.decodeMeta(blobs, "blob")
      .select(col("id"), col("media.*")).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Boolean]("ok"), r.getAs[String]("error"))).toMap
    assert(out(1L)._3 && out(3L)._3)
    assert(out(1L)._1 >= 64 && out(1L)._2 >= 64)
    assert(!out(2L)._3 && out(2L)._4 == "empty blob") // error channel, no crash
    // deterministic: decoding again yields identical metadata
    val again = Multimodal.decodeMeta(blobs, "blob")
      .select(col("id"), col("media.*")).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Boolean]("ok"), r.getAs[String]("error"))).toMap
    assert(out == again)
  }

  test("extractFeatures: fixed-width array<float>, deterministic, ANN-ready") {
    val f = Multimodal.extractFeatures(blobs, "blob", 8)
    assert(f.schema("features").dataType.typeName == "array")
    val rows = f.select("id", "features").collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Float](1)).toMap
    assert(rows.values.forall(_.length == 8))
    assert(rows(1L) != rows(3L)) // distinct blobs → distinct features
    // features feed straight into Similarity ops
    val sim = Similarity.bruteForceTopK(
      f.select("id", "features"), f.select("id", "features").where(col("id") === 1),
      "id", "features", 1).collect()
    assert(sim.length == 1 && sim.head.getAs[Long]("query_id") == 1L)
  }

  test("resizeMedia: deterministic w*h*3 output in place; poison blob -> empty") {
    val out = Multimodal.resizeMedia(blobs, "blob", 8, 6)
      .select("id", "blob").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Array[Byte]]("blob")).toMap
    assert(out(1L).length == 8 * 6 * 3 && out(3L).length == 8 * 6 * 3)
    assert(!java.util.Arrays.equals(out(1L), out(3L))) // distinct inputs differ
    assert(out(2L).isEmpty, "undecodable blob must degrade to empty, not fail")
    // schema unchanged → composes with the rest of the pipeline
    assert(Multimodal.resizeMedia(blobs, "blob", 8, 6).schema == blobs.schema)
    val again = Multimodal.resizeMedia(blobs, "blob", 8, 6)
      .select("id", "blob").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Array[Byte]]("blob")).toMap
    assert(java.util.Arrays.equals(out(1L), again(1L)))
  }

  private def pngBytes(w: Int, h: Int, seed: Int): Array[Byte] =
    Multimodal.syntheticPng(w, h, seed.toLong)

  test("ImageIoDecoder: real PNG geometry; resize round-trips through the codec") {
    val png = pngBytes(32, 20, 7)
    val m = Multimodal.ImageIoDecoder.decode(png)
    assert(m.ok && m.width == 32 && m.height == 20 && m.channels == 3)
    // non-image bytes are flagged in the meta, not thrown
    val bad = Multimodal.ImageIoDecoder.decode("not an image".getBytes("UTF-8"))
    assert(!bad.ok && bad.error == "unrecognized image format")
    assert(!Multimodal.ImageIoDecoder.decode(Array.emptyByteArray).ok)
    // resize emits a real, decodable PNG at the target geometry —
    // deterministically
    val resized = Multimodal.ImageIoDecoder.resize(png, 8, 6)
    val m2 = Multimodal.ImageIoDecoder.decode(resized)
    assert(m2.ok && m2.width == 8 && m2.height == 6)
    assert(java.util.Arrays.equals(resized,
      Multimodal.ImageIoDecoder.resize(png, 8, 6)))
    // features: fixed width, [0,1], deterministic, discriminative
    val fa = Multimodal.ImageIoDecoder.features(png, 8)
    val fb = Multimodal.ImageIoDecoder.features(pngBytes(16, 16, 99), 8)
    assert(fa.length == 8 && fb.length == 8)
    assert(fa.forall(v => v >= 0f && v <= 1f))
    assert(!java.util.Arrays.equals(fa, fb))
    assert(java.util.Arrays.equals(fa, Multimodal.ImageIoDecoder.features(png, 8)))
  }

  test("ImageIoDecoder: through decodeMeta/extractFeatures/resizeMedia on executors") {
    val s = spark; import s.implicits._
    val df = Seq((1L, pngBytes(32, 20, 7)), (2L, pngBytes(16, 16, 99)),
      (3L, "poison, not an image".getBytes("UTF-8"))).toDF("id", "blob")
    val meta = Multimodal.decodeMeta(df, "blob", Multimodal.ImageIoDecoder)
      .select(col("id"), col("media.*")).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Boolean]("ok"))).toMap
    assert(meta(1L) == ((32, 20, true)) && meta(2L) == ((16, 16, true)))
    assert(!meta(3L)._3, "poison blob must flag in-row, not kill the job")
    // resize in place: images become 8x6 PNGs, poison degrades to empty
    val rs = Multimodal.resizeMedia(df, "blob", 8, 6, Multimodal.ImageIoDecoder)
      .select("id", "blob").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Array[Byte]]("blob")).toMap
    assert(Multimodal.ImageIoDecoder.decode(rs(1L)).width == 8)
    assert(Multimodal.ImageIoDecoder.decode(rs(2L)).height == 6)
    assert(rs(3L).isEmpty)
    // feature extraction over the image rows feeds Similarity directly
    val f = Multimodal.extractFeatures(
      df.where(col("id") < 3), "blob", 8, Multimodal.ImageIoDecoder)
    val rows = f.select("id", "features").collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Float](1)).toMap
    assert(rows(1L).length == 8 && rows(1L) != rows(2L))
  }

  test("sampleFrames: stride-sampled fixed windows with frame indexes") {
    val s = spark; import s.implicits._
    val ten = Seq((1L, "0123456789".getBytes("UTF-8"))).toDF("id", "blob")
    // frameBytes=4, stride=2 → sample offsets 1 and 9 → frames "0123", "89"
    val frames = Multimodal.sampleFrames(ten, "blob", 4, 2)
      .select("id", "frame_idx", "frame").collect()
      .map(r => (r.getAs[Int]("frame_idx"),
        new String(r.getAs[Array[Byte]]("frame"), "UTF-8")))
    assert(frames.toSeq == Seq((0, "0123"), (1, "89")))
  }

  test("ImageIoDecoder.frames: a real 8-frame GIF decodes to 8 real frames") {
    val gif = Multimodal.syntheticGif(12, 7, 8, seed = 42L)
    val fs = Multimodal.ImageIoDecoder.frames(gif)
    assert(fs.length == 8, s"expected 8 frames, got ${fs.length}")
    // every frame is a standalone, decodable image at the GIF's geometry
    fs.foreach { f =>
      val m = Multimodal.ImageIoDecoder.decode(f)
      assert(m.ok && m.width == 12 && m.height == 7)
    }
    // frames differ (the pixel pattern varies per frame index)
    assert(!java.util.Arrays.equals(fs(0), fs(1)))
    // deterministic across encode+decode runs
    val again = Multimodal.ImageIoDecoder
      .frames(Multimodal.syntheticGif(12, 7, 8, seed = 42L))
    assert(fs.zip(again).forall(p => java.util.Arrays.equals(p._1, p._2)))
    // a single-frame format yields exactly one frame
    assert(Multimodal.ImageIoDecoder.frames(pngBytes(10, 10, 3)).length == 1)
  }

  test("sampleMediaFrames: real codec on executors, stride sampling, " +
    "poison blob yields zero frames") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticGif(12, 7, 8, 42L)),
      (2L, Multimodal.syntheticGif(9, 5, 3, 7L)),
      (3L, "poison, not a gif".getBytes("UTF-8"))).toDF("id", "blob")
    val out = Multimodal.sampleMediaFrames(df, "blob", 3,
        Multimodal.ImageIoDecoder)
      .select("id", "frame_idx", "frame").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("frame_idx"),
        r.getAs[Array[Byte]]("frame")))
    // stride 3 keeps ORIGINAL indices 0,3,6 of the 8-frame gif; 0 of the
    // 3-frame one; nothing for the poison blob
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 0), (1L, 3), (1L, 6), (2L, 0)))
    // each sampled frame re-decodes at its source geometry
    assert(out.filter(_._1 == 1L).forall { t =>
      val m = Multimodal.ImageIoDecoder.decode(t._3)
      m.ok && m.width == 12 && m.height == 7
    })
    // blob column dropped from the exploded rows
    assert(!Multimodal.sampleMediaFrames(df, "blob", 3,
      Multimodal.ImageIoDecoder).schema.fieldNames.contains("blob"))
  }

  test("solidJpeg: real lossy encode round-trips a constant field " +
    "bit-exactly at quality 1.0 (DC-only DCT, all-ones quant tables)") {
    for (gray <- Seq(0, 7, 41, 128, 254, 255); (w, h) <- Seq((10, 6), (15, 9))) {
      val jpg = Multimodal.solidJpeg(w, h, gray)
      // really a JPEG container, not a re-labeled PNG
      assert((jpg(0) & 0xFF) == 0xFF && (jpg(1) & 0xFF) == 0xD8,
        "missing JPEG SOI marker")
      val m = Multimodal.ImageIoDecoder.decode(jpg)
      assert(m.ok && m.width == w && m.height == h && m.channels == 3)
      // the full Huffman+IDCT pixel path reconstructs the gray exactly
      val lum = Multimodal.ImageIoDecoder.features(jpg, 1)(0)
      assert(math.round(lum * 255.0) == gray,
        s"solid $gray decoded to mean ${lum * 255.0}")
    }
  }

  test("decodeAudio: real WAV codec on executors — header fields and " +
    "the decoded PCM stream digest; poison blob flags in-row") {
    val s = spark; import s.implicits._
    val n = 1000
    // predicted digest mirrors syntheticWav's sample function
    var sum = 0L; var peak = 0
    for (i <- 0 until n) {
      val v = ((7L * 2654435761L + i * 40503L) % 65536L - 32768L).toInt
      sum += v; peak = math.max(peak, math.abs(v))
    }
    val df = Seq(
      (1L, Multimodal.syntheticWav(8000, n, 7L)),
      (2L, Multimodal.syntheticWav(44100, 0, 3L)),
      (3L, "not audio at all".getBytes("UTF-8"))).toDF("id", "blob")
    val out = Multimodal.decodeAudio(df, "blob")
      .select("id", "audio.*").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    val a = out(1L)
    assert(a.getAs[Int]("sample_rate") == 8000 &&
      a.getAs[Int]("channels") == 1 && a.getAs[Int]("bits") == 16)
    assert(a.getAs[Long]("n_frames") == n.toLong)
    assert(a.getAs[Long]("sample_sum") == sum &&
      a.getAs[Int]("peak") == peak,
      "decoded PCM digest must match the synthesis arithmetic")
    // zero-sample stream is a valid decode, digest zeros
    assert(out(2L).getAs[Boolean]("ok") &&
      out(2L).getAs[Long]("n_frames") == 0L)
    assert(!out(3L).getAs[Boolean]("ok"),
      "poison blob must flag in-row, not kill the job")
  }

  test("real resize preserves a constant field exactly (any correct " +
    "kernel must) and emits the target geometry") {
    for (gray <- Seq(0, 7, 128, 255); (w, h) <- Seq((12, 7), (3, 3))) {
      val src = Multimodal.solidPng(w, h, gray)
      val out = Multimodal.ImageIoDecoder.resize(src, 5, 4)
      val m = Multimodal.ImageIoDecoder.decode(out)
      assert(m.ok && m.width == 5 && m.height == 4, s"gray=$gray ${w}x$h")
      val lum = Multimodal.ImageIoDecoder.features(out, 1)(0)
      assert(math.round(lum * 255.0) == gray,
        s"solid $gray resized to mean ${lum * 255.0}")
      // upscale too (interpolation reads past the edge clamp)
      val up = Multimodal.ImageIoDecoder.resize(src, 31, 17)
      val lumUp = Multimodal.ImageIoDecoder.features(up, 1)(0)
      assert(math.round(lumUp * 255.0) == gray,
        s"solid $gray upscaled to mean ${lumUp * 255.0}")
    }
  }

  test("audio digest loops survive an SPI returning non-sample-aligned " +
    "read() counts (remainder carried, no 8-bit sample shift)") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream}
    val wav = Multimodal.syntheticWav(8000, 777, 5L)
    val pcm = wav.drop(44) // raw little-endian PCM16 payload
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    // mimics a third-party SPI whose read() returns 3 bytes at a time —
    // every other read boundary splits a sample in half
    class OddAis(cap: Int) extends AudioInputStream(
        new java.io.ByteArrayInputStream(Array.empty[Byte]), fmt,
        pcm.length / 2) {
      private var pos = 0
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        if (pos >= pcm.length) -1
        else {
          val n = math.min(math.min(len, cap), pcm.length - pos)
          System.arraycopy(pcm, pos, b, off, n); pos += n; n
        }
    }
    def aligned() = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    for (cap <- Seq(1, 3, 7, 4097)) {
      assert(Multimodal.windowDigestLoop(new OddAis(cap), 256) ==
        Multimodal.windowDigestLoop(aligned(), 256), s"cap=$cap windows")
      assert(Multimodal.pcmDigest(new OddAis(cap)) ==
        Multimodal.pcmDigest(aligned()), s"cap=$cap digest")
    }
    // and the digest matches the synthesis arithmetic, not just itself
    val (n, s, _) = Multimodal.pcmDigest(new OddAis(3))
    val expSum = (0 until 777).map(i =>
      ((5L * 2654435761L + i * 40503L) % 65536L) - 32768L).sum
    assert(n == 777L && s == expSum)
    // the decimation loop is remainder-safe the same way, and matches
    // hand arithmetic INCLUDING the 1-sample trailing partial block
    // (777 = 194 blocks of 4 + 1) and truncating negative-sum means
    val samples = (0 until 777).map(i =>
      (((5L * 2654435761L + i * 40503L) % 65536L) - 32768L).toInt)
    val expected = samples.grouped(4)
      .map(g => (g.map(_.toLong).sum / g.length).toShort).toSeq
    for (cap <- Seq(1, 3, 7, 4097))
      assert(Multimodal.decimateLoop(new OddAis(cap), 4).toSeq == expected,
        s"cap=$cap decimate")
    // end-to-end bytes → bytes: a real re-encoded WAV at rate/4 whose
    // codec decode reproduces the decimated digest; unsupported
    // shapes degrade to empty
    val res = Multimodal.resampleWavBytes(wav, 4)
    val meta = Multimodal.decodeWavBytes(res)
    assert(meta.ok && meta.sampleRate == 2000 && meta.nFrames == 195)
    assert(meta.sampleSum == expected.map(_.toLong).sum)
    assert(Multimodal.resampleWavBytes(Array.empty[Byte], 4).isEmpty)
    assert(Multimodal.resampleWavBytes(wav, 3).isEmpty,
      "8000 % 3 != 0 must degrade, not mis-rate") // indivisible rate
    assert(Multimodal.resampleWavBytes("junk".getBytes("UTF-8"), 4).isEmpty)
  }

  test("audio width/channel generality: 8u/16/24/32-bit and stereo " +
    "streams digest to the canonical 16-bit mono arithmetic, at any " +
    "SPI read() alignment") {
    import javax.sound.sampled.AudioInputStream
    def raw16(seed: Long, k: Int): Int =
      (((seed * 2654435761L + k * 40503L) % 65536L) - 32768L).toInt
    // canonical per-frame value predicted from the synthesis formula
    def canon(seed: Long, bits: Int, ch: Int, frame: Int): Int = {
      val vals = (0 until ch).map { c =>
        val r = raw16(seed, frame * ch + c)
        if (bits == 8) (r >> 8) << 8 else r
      }
      (vals.map(_.toLong).sum / ch).toInt // truncating mean
    }
    for (bits <- Seq(8, 16, 24, 32); ch <- Seq(1, 2); seed <- Seq(5L, 77L)) {
      val nFrames = 777
      val wav = Multimodal.syntheticWavEx(8000, nFrames, seed, bits, ch)
      val meta = Multimodal.decodeWavBytes(wav)
      val expect = (0 until nFrames).map(canon(seed, bits, ch, _))
      assert(meta.ok && meta.bits == bits && meta.channels == ch &&
        meta.nFrames == nFrames, s"bits=$bits ch=$ch")
      assert(meta.sampleSum == expect.map(_.toLong).sum,
        s"bits=$bits ch=$ch seed=$seed sum")
      assert(meta.peak == expect.map(v => math.abs(v)).max,
        s"bits=$bits ch=$ch seed=$seed peak")
      // odd-chunk SPI alignment: frame widths up to 8 bytes now, so
      // the carried remainder can be up to 7 bytes
      val pcm = wav.drop(44)
      val fmt = new javax.sound.sampled.AudioFormat(
        if (bits == 8) javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        else javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        8000f, bits, ch, bits / 8 * ch, 8000f, false)
      class OddAis(cap: Int) extends AudioInputStream(
          new java.io.ByteArrayInputStream(Array.empty[Byte]), fmt,
          nFrames) {
        private var pos = 0
        override def read(b: Array[Byte], off: Int, len: Int): Int =
          if (pos >= pcm.length) -1
          else {
            val m = math.min(math.min(len, cap), pcm.length - pos)
            System.arraycopy(pcm, pos, b, off, m); pos += m; m
          }
      }
      for (cap <- Seq(1, 3, 7, 4097))
        assert(Multimodal.pcmDigest(new OddAis(cap)) ==
          (nFrames.toLong, expect.map(_.toLong).sum,
            expect.map(math.abs).max), s"bits=$bits ch=$ch cap=$cap")
      // resample accepts every width/channel shape and yields a REAL
      // PCM16 mono WAV whose decode matches the decimated canonical
      // stream
      val res = Multimodal.resampleWavBytes(wav, 4)
      val dec = expect.grouped(4)
        .map(g => (g.map(_.toLong).sum / g.length).toShort).toSeq
      val rmeta = Multimodal.decodeWavBytes(res)
      assert(rmeta.ok && rmeta.sampleRate == 2000 && rmeta.bits == 16 &&
        rmeta.channels == 1 && rmeta.nFrames == dec.length)
      assert(rmeta.sampleSum == dec.map(_.toLong).sum,
        s"bits=$bits ch=$ch resample sum")
    }
    // bits=16/ch=1 is byte-identical to the historical writer: every
    // existing PCM16 gate's fixture is unchanged
    assert(java.util.Arrays.equals(
      Multimodal.syntheticWavEx(8000, 777, 5L, 16, 1),
      Multimodal.syntheticWav(8000, 777, 5L)))
  }

  test("IEEE float32 WAV: fixed-point canonical view clamp(raw16*gain), " +
    "mono/stereo, any SPI read() alignment, non-finite samples total") {
    import javax.sound.sampled.AudioInputStream
    def raw16(seed: Long, k: Int): Int =
      (((seed * 2654435761L + k * 40503L) % 65536L) - 32768L).toInt
    def canon(seed: Long, gain: Int, ch: Int, frame: Int): Int = {
      val vals = (0 until ch).map { c =>
        val v = raw16(seed, frame * ch + c) * gain
        math.max(-32768, math.min(32767, v))
      }
      (vals.map(_.toLong).sum / ch).toInt
    }
    for (bits <- Seq(32, 64); gain <- Seq(1, 2, 4); ch <- Seq(1, 2);
         seed <- Seq(5L, 77L)) {
      val nFrames = 777
      val wav = Multimodal.syntheticWavEx(8000, nFrames, seed, bits, ch,
        floatPcm = true, floatGain = gain)
      val meta = Multimodal.decodeWavBytes(wav)
      val expect = (0 until nFrames).map(canon(seed, gain, ch, _))
      assert(meta.ok && meta.bits == bits && meta.channels == ch &&
        meta.nFrames == nFrames, s"bits=$bits gain=$gain ch=$ch")
      assert(meta.sampleSum == expect.map(_.toLong).sum,
        s"gain=$gain ch=$ch seed=$seed sum")
      assert(meta.peak == expect.map(math.abs).max,
        s"gain=$gain ch=$ch seed=$seed peak")
      if (gain > 1 && ch == 1)
        assert(expect.exists(v => v == 32767 || v == -32768),
          s"gain=$gain must exercise the clamp arm")
      // odd-chunk SPI alignment through the float path
      val pcm = wav.drop(44)
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT,
        8000f, bits, ch, bits / 8 * ch, 8000f, false)
      class OddAis(cap: Int) extends AudioInputStream(
          new java.io.ByteArrayInputStream(Array.empty[Byte]), fmt,
          nFrames) {
        private var pos = 0
        override def read(b: Array[Byte], off: Int, len: Int): Int =
          if (pos >= pcm.length) -1
          else {
            val m = math.min(math.min(len, cap), pcm.length - pos)
            System.arraycopy(pcm, pos, b, off, m); pos += m; m
          }
      }
      for (cap <- Seq(1, 3, 7, 4097))
        assert(Multimodal.pcmDigest(new OddAis(cap)) ==
          (nFrames.toLong, expect.map(_.toLong).sum,
            expect.map(math.abs).max), s"gain=$gain ch=$ch cap=$cap")
      // resample composes: float stream -> canonical view -> PCM16 WAV
      val res = Multimodal.resampleWavBytes(wav, 4)
      val dec = expect.grouped(4)
        .map(g => (g.map(_.toLong).sum / g.length).toShort).toSeq
      val rmeta = Multimodal.decodeWavBytes(res)
      assert(rmeta.ok && rmeta.sampleRate == 2000 && rmeta.bits == 16 &&
        rmeta.nFrames == dec.length &&
        rmeta.sampleSum == dec.map(_.toLong).sum, s"gain=$gain ch=$ch")
    }
    // WAVE_FORMAT_EXTENSIBLE (fmt tag 0xFFFE + IEEE-float subformat
    // GUID) — what real float-WAV exporters write — decodes through
    // the same SPI boundary to the same canonical digest
    locally {
      val plain = Multimodal.syntheticWavEx(8000, 50, 7L, 32, 1,
        floatPcm = true)
      val pm = Multimodal.decodeWavBytes(plain)
      val data = plain.drop(44)
      val ext = java.nio.ByteBuffer.allocate(68 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      ext.put("RIFF".getBytes("US-ASCII")).putInt(60 + data.length)
        .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
        .putInt(40).putShort(0xFFFE.toShort).putShort(1)
        .putInt(8000).putInt(8000 * 4).putShort(4).putShort(32)
        .putShort(22).putShort(32).putInt(4)
        .putInt(3).putShort(0).putShort(0x10) // IEEE-float subtype GUID
        .put(Array[Byte](0x80.toByte, 0, 0, 0xAA.toByte, 0, 0x38,
          0x9B.toByte, 0x71))
        .put("data".getBytes("US-ASCII")).putInt(data.length)
        .put(data)
      val em = Multimodal.decodeWavBytes(ext.array())
      assert(em.ok && em.nFrames == pm.nFrames &&
        em.sampleSum == pm.sampleSum && em.peak == pm.peak,
        "extensible-header float WAV must digest like the plain header")
    }
    // non-finite samples are TOTAL, not throws: NaN -> 0, +Inf -> 32767,
    // -Inf -> -32768 (the clamp convention, applied before any mean)
    val base = Multimodal.syntheticWavEx(8000, 4, 9L, 32, 1,
      floatPcm = true)
    val bb = java.nio.ByteBuffer.wrap(base)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putFloat(44, Float.NaN)
    bb.putFloat(48, Float.PositiveInfinity)
    bb.putFloat(52, Float.NegativeInfinity)
    val m = Multimodal.decodeWavBytes(base)
    val last = raw16(9L, 3)
    assert(m.ok && m.nFrames == 4 &&
      m.sampleSum == 0L + 32767L - 32768L + last &&
      m.peak == math.max(32768, math.abs(last)))
  }

  test("mp4: both physical encodings of the same logical metadata " +
    "parse identically; poison blobs come back as typed in-row errors") {
    for (ts <- Seq(600, 3000); dur <- Seq(0L, 33299L); n <- Seq(0, 3);
         brand <- Seq("isom", "qt  ")) {
      val v0 = Multimodal.decodeMp4Bytes(
        Multimodal.syntheticMp4(brand, ts, dur, n, 0))
      val v1 = Multimodal.decodeMp4Bytes(
        Multimodal.syntheticMp4(brand, ts, dur, n, 1))
      assert(v0 == v1, s"$brand ts=$ts dur=$dur n=$n: $v0 vs $v1")
      assert(v0.ok && v0.brand == brand && v0.timescale == ts &&
        v0.duration == dur && v0.nTraks == n && v0.nTopBoxes == 3)
      // trak/mdia/hdlr handler types: odd track ids are vide
      assert(v0.nVide == (n + 1) / 2 && v0.nSoun == n / 2,
        s"n=$n vide=${v0.nVide} soun=${v0.nSoun}")
    }
    // v0 and v1 must be DIFFERENT bytes (else the variant gate is void)
    assert(!java.util.Arrays.equals(
      Multimodal.syntheticMp4("isom", 600, 5L, 1, 0),
      Multimodal.syntheticMp4("isom", 600, 5L, 1, 1)))
    // typed poison classes, exception-free
    val full = Multimodal.syntheticMp4("mp42", 600, 7L, 2, 0)
    assert(Multimodal.decodeMp4Bytes(null).error == "empty blob")
    assert(Multimodal.decodeMp4Bytes(Array.empty).error == "empty blob")
    assert(Multimodal.decodeMp4Bytes(full.take(20)).error == "truncated box")
    assert(Multimodal.decodeMp4Bytes(full.drop(24)).error == "not mp4")
    val badSize = full.clone() // first box claims size 4 < 8-byte header
    badSize(0) = 0; badSize(1) = 0; badSize(2) = 0; badSize(3) = 4
    assert(Multimodal.decodeMp4Bytes(badSize).error == "bad box size")
  }

  test("imageHash: real-codec aHash equals an arithmetic reference on " +
    "gray AND rgb fixtures; tweak stays within Hamming 3; bad blobs " +
    "flag as typed errors") {
    def refHash(w: Int, h: Int, px: (Int, Int) => Int): Long = {
      val sums = new Array[Long](64); val counts = new Array[Long](64)
      for (y <- 0 until h; x <- 0 until w) {
        val c = (y * 8 / h) * 8 + (x * 8 / w)
        sums(c) += px(x, y); counts(c) += 1
      }
      val cells = (0 until 64).map(i => sums(i) / counts(i))
      val mean = cells.sum / 64
      (0 until 64).foldLeft(0L)((acc, i) =>
        if (cells(i) > mean) acc | (1L << i) else acc)
    }
    val Right((w, h, hg)) =
      Multimodal.aHashBytes(Multimodal.syntheticGrayPng(30, 26, 7L)): @unchecked
    assert((w, h) == (30, 26))
    assert(hg == refHash(30, 26, (x, y) =>
      (((x * 3 + y * 5 + 7) * (1 + 7 % 13) + 7) % 256).toInt))
    // 3-band path: the RGB synthetic field through (r + 2g + b) >> 2
    val Right((_, _, hc)) =
      Multimodal.aHashBytes(Multimodal.syntheticPng(16, 12, 3L)): @unchecked
    assert(hc == refHash(16, 12, { (x, y) =>
      val rgb = (x * 2654435 + y * 40503 + 3L * 7919).toInt & 0xFFFFFF
      (((rgb >> 16) & 0xFF) + 2 * ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) >> 2
    }))
    // the planted perturbation is a NEAR-dup: within quarter-blocking
    // recall distance of the original
    val Right((_, _, ht)) = Multimodal.aHashBytes(
      Multimodal.syntheticGrayPng(30, 26, 7L, tweakMod = 31)): @unchecked
    assert(java.lang.Long.bitCount(hg ^ ht) <= 3)
    assert(Multimodal.aHashBytes(Array.empty[Byte]) == Left("empty blob"))
    assert(Multimodal.aHashBytes(Multimodal.syntheticGrayPng(7, 20, 1L)) ==
      Left("image smaller than 8x8"))
    assert(Multimodal.aHashBytes(Array.fill[Byte](64)(33)) ==
      Left("unrecognized image format"))
    // dHash: the gradient reference — 9x8 grid, bit per horizontal
    // brighter-than — on gray AND rgb; and the fused one-decode
    // imageHashesBytes must agree bit-for-bit with both single-hash
    // functions
    def refDHash(w: Int, h: Int, px: (Int, Int) => Int): Long = {
      val sums = new Array[Long](72); val counts = new Array[Long](72)
      for (y <- 0 until h; x <- 0 until w) {
        val c = (y * 8 / h) * 9 + (x * 9 / w)
        sums(c) += px(x, y); counts(c) += 1
      }
      var acc = 0L
      for (cy <- 0 until 8; cx <- 0 until 8)
        if (sums(cy * 9 + cx) / counts(cy * 9 + cx) >
            sums(cy * 9 + cx + 1) / counts(cy * 9 + cx + 1))
          acc |= (1L << (cy * 8 + cx))
      acc
    }
    val gray = Multimodal.syntheticGrayPng(30, 26, 7L)
    val Right((_, _, dg)) = Multimodal.dHashBytes(gray): @unchecked
    assert(dg == refDHash(30, 26, (x, y) =>
      (((x * 3 + y * 5 + 7) * (1 + 7 % 13) + 7) % 256).toInt))
    val Right((_, _, ag2, dg2, _)) =
      Multimodal.imageHashesBytes(gray): @unchecked
    assert(ag2 == hg && dg2 == dg, "fused pass must equal both references")
    val rgb = Multimodal.syntheticPng(16, 12, 3L)
    val Right((_, _, dc)) = Multimodal.dHashBytes(rgb): @unchecked
    val Right((_, _, ac2, dc2, _)) = Multimodal.imageHashesBytes(rgb): @unchecked
    assert(ac2 == hc && dc2 == dc)
    // 8px-wide image: aHash fine, dHash grid impossible → fused pass
    // reports dhash 0, single-hash form a typed error
    val narrow = Multimodal.syntheticGrayPng(8, 20, 2L)
    assert(Multimodal.dHashBytes(narrow) == Left("image smaller than 9x8"))
    val Right((_, _, _, dn, _)) = Multimodal.imageHashesBytes(narrow): @unchecked
    assert(dn == 0L)
  }

  test("pHash: fused pass equals the standalone DCT hash, the hash " +
    "matches a from-scratch integer reference, and small images " +
    "degrade exactly like dHash") {
    // from-scratch reference: independent cell/DCT/median arithmetic
    // (full double sum, not the separable factorization the kernel
    // uses — integer addition commutes, so they must agree exactly)
    def refPHash(w: Int, h: Int, px: (Int, Int) => Int): Long = {
      val sums = new Array[Long](1024); val counts = new Array[Long](1024)
      for (y <- 0 until h; x <- 0 until w) {
        val c = (y * 32 / h) * 32 + (x * 32 / w)
        sums(c) += px(x, y); counts(c) += 1
      }
      val g = (0 until 1024).map(i => sums(i) / counts(i))
      def q(k: Int) = Multimodal.DctQ(k & 127)
      val coef = for (v <- 0 until 8; u <- 0 until 8) yield
        (for (y <- 0 until 32; x <- 0 until 32) yield
          g(y * 32 + x) * q((2 * x + 1) * u % 128) *
            q((2 * y + 1) * v % 128)).sum
      val med = coef.drop(1).sorted.apply(31)
      coef.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
        if (c > med) acc | (1L << i) else acc
      }
    }
    for ((w, h, seed) <- Seq((44, 39, 7L), (32, 32, 3L), (58, 44, 11L))) {
      val gray = Multimodal.syntheticGrayPng(w, h, seed)
      val Right((pw, ph2, p1)) = Multimodal.pHashBytes(gray): @unchecked
      assert((pw, ph2) == (w, h))
      val Right((_, _, _, _, p2)) =
        Multimodal.imageHashesBytes(gray): @unchecked
      assert(p1 == p2, s"fused != standalone at ${w}x$h seed=$seed")
      assert(p1 == refPHash(w, h, (x, y) =>
        (((x * 3 + y * 5 + 7) * (1 + seed % 13) + seed) % 256).toInt),
        s"kernel != reference at ${w}x$h seed=$seed")
      // the DCT signature survives the planted near-dup tweak
      val Right((_, _, pt)) = Multimodal.pHashBytes(
        Multimodal.syntheticGrayPng(w, h, seed, tweakMod = 31)): @unchecked
      assert(java.lang.Long.bitCount(p1 ^ pt) <= 6, s"tweak drifted pHash")
    }
    // rgb band rule shared with aHash
    val rgb = Multimodal.syntheticPng(40, 36, 5L)
    val Right((_, _, pr)) = Multimodal.pHashBytes(rgb): @unchecked
    val Right((_, _, _, _, pr2)) = Multimodal.imageHashesBytes(rgb): @unchecked
    assert(pr == pr2)
    // sub-32x32: standalone is a typed error, fused carries phash 0
    val small = Multimodal.syntheticGrayPng(30, 26, 7L)
    assert(Multimodal.pHashBytes(small) == Left("image smaller than 32x32"))
    val Right((_, _, _, _, ps)) = Multimodal.imageHashesBytes(small): @unchecked
    assert(ps == 0L)
    assert(Multimodal.pHashBytes(Array.empty[Byte]) == Left("empty blob"))
  }

  test("mp4 sample tables: both encodings yield identical extents, " +
    "digests match the synthesis arithmetic, malformed layouts are " +
    "typed errors") {
    for (n <- Seq(0, 1, 3); variant <- Seq(0, 1); co64 <- Seq(false, true)) {
      val blob = Multimodal.syntheticMp4("isom", 600, 42L, n, variant,
        withSamples = true, useCo64 = co64)
      val Right((samples, tracks)) =
        Multimodal.mp4SampleTable(blob): @unchecked
      assert(samples.length == n * Multimodal.SamplesPerTrack,
        s"n=$n variant=$variant")
      // per-track manifest: hdlr handler, stsd codec, aggregates
      assert(tracks.length == n)
      tracks.foreach { case (t, hdl, cdc, ns, sb, dur, nsync, _) =>
        assert(hdl == (if (t % 2 == 1) "vide" else "soun"), s"track $t hdlr")
        assert(cdc == Multimodal.trackCodec(t), s"track $t codec")
        assert(ns == Multimodal.SamplesPerTrack)
        assert(sb == (0 until ns).map(Multimodal.sampleSize(t, _)).sum)
        assert(dur == (0 until ns).map(Multimodal.sampleDur(t, _)).sum)
        assert(nsync == (0 until ns).count(Multimodal.sampleIsSync(t, _)))
      }
      samples.foreach { case (t, j, o, sz, dts, pts, dur, sync) =>
        assert(sz == Multimodal.sampleSize(t, j))
        // stts run-length expansion: dur from the run covering j, dts
        // is the running duration sum
        assert(dur == Multimodal.sampleDur(t, j), s"track $t sample $j dur")
        assert(dts == (0 until j).map(Multimodal.sampleDur(t, _)).sum,
          s"track $t sample $j dts")
        // no ctts/elst in this fixture → presentation == decode time
        assert(pts == dts, s"track $t sample $j pts")
        // stss expansion — including track 3, which OMITS the box and
        // must come back all-sync per the ISO absent-box rule
        assert(sync == Multimodal.sampleIsSync(t, j),
          s"track $t sample $j sync")
        (0 until sz).foreach { b =>
          assert((blob((o + b).toInt) & 0xFF) == Multimodal.sampleByte(t, j, b),
            s"track $t sample $j byte $b variant=$variant")
        }
      }
      // extents identical across the two physical encodings modulo the
      // (documented) offset shift: sizes and order match exactly
      if (variant == 1) {
        val Right((v0, _)) = Multimodal.mp4SampleTable(Multimodal
          .syntheticMp4("isom", 600, 42L, n, 0,
            withSamples = true)): @unchecked
        assert(v0.map(s => (s._1, s._2, s._4)) ==
          samples.map(s => (s._1, s._2, s._4)))
      }
    }
    // sampleless mp4s yield zero samples, not errors — and their traks
    // still appear in the manifest as metadata-only (hdlr, null codec)
    assert(Multimodal.mp4SampleTable(
      Multimodal.syntheticMp4("isom", 600, 1L, 2, 0)) ==
      Right((Seq.empty,
        Seq((1, "vide", null, 0, 0L, 0L, 0, 0),
          (2, "soun", null, 0, 0L, 0L, 0, 0)))))
    // track 1 is the odd multi-chunk case: stsc expansion must place
    // its third sample at the SECOND chunk's offset, not back-to-back
    val blob = Multimodal.syntheticMp4("isom", 600, 1L, 1, 0,
      withSamples = true)
    val Right((t1, _)) = Multimodal.mp4SampleTable(blob): @unchecked
    assert(t1.length == 3)
    assert(t1(1)._3 + t1(1)._4 != t1(2)._3,
      "sample 2 must start a new chunk, not follow sample 1 contiguously")
    // an stsc whose totals disagree with stsz is a typed error, not a
    // guess: bump the first run's samples_per_chunk from 2 to 3
    val stscAt = {
      val idx = (0 until blob.length - 4).find(i =>
        blob(i) == 's' && blob(i + 1) == 't' && blob(i + 2) == 's' &&
          blob(i + 3) == 'c').get
      idx + 4 + 4 + 4 + 4 + 3 // type, ver/flags, count, first_chunk, spc low byte
    }
    val bad = blob.clone(); bad(stscAt) = 3
    assert(Multimodal.mp4SampleTable(bad) == Left("bad sample table"))
    // an stss sync number out of range (or non-increasing) is a typed
    // error: track 1's stss entries are [1, 3]; set the first to 5 > 3
    val stssAt = {
      val idx = (0 until blob.length - 4).find(i =>
        blob(i) == 's' && blob(i + 1) == 't' && blob(i + 2) == 's' &&
          blob(i + 3) == 's').get
      idx + 4 + 4 + 4 + 3 // type, ver/flags, count, first entry low byte
    }
    val badSync = blob.clone(); badSync(stssAt) = 5
    assert(Multimodal.mp4SampleTable(badSync) == Left("bad sample table"))
    // totality: every truncation of a sampled file is Left or Right,
    // never a throw, and a sample can never read past the blob
    (0 until blob.length).foreach { cut =>
      Multimodal.mp4SampleTable(blob.take(cut)) match {
        case Left(_) => ()
        case Right((ss, _)) => ss.foreach { case (_, _, o, sz, _, _, _, _) =>
          assert(o + sz <= cut, s"cut=$cut overran")
        }
      }
    }
  }

  test("mp4 sample payloads: caller bytes (real PNGs) land at the stbl " +
    "extents byte-exactly, sync filtering keeps keyframes only, frames " +
    "decode through the image codec") {
    def pay(t: Int, j: Int): Array[Byte] =
      Multimodal.syntheticGrayPng(16 + j * 8, 16, t * 100L + j)
    for (variant <- Seq(0, 1)) {
      val blob = Multimodal.syntheticMp4("isom", 600, 7L, 2, variant,
        withSamples = true, samplePayload = pay)
      val Right((samples, _)) = Multimodal.mp4SampleTable(blob): @unchecked
      assert(samples.length == 2 * Multimodal.SamplesPerTrack)
      samples.foreach { case (t, j, o, sz, _, _, _, sync) =>
        val expect = pay(t, j)
        assert(sz == expect.length, s"track $t sample $j size")
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(blob, o.toInt, o.toInt + sz), expect),
          s"track $t sample $j bytes variant=$variant")
        assert(sync == Multimodal.sampleIsSync(t, j))
        // every frame is a real decodable image at the declared geometry
        val Right((w, h, _)) = Multimodal.aHashBytes(expect): @unchecked
        assert(w == 16 + j * 8 && h == 16)
      }
    }
    // DataFrame path: syncOnly keeps exactly the stss keyframes, and
    // the emitted frame column IS the payload
    val s = spark; import s.implicits._
    val df = Seq((1L, Multimodal.syntheticMp4("isom", 600, 7L, 2, 0,
      withSamples = true, samplePayload = pay))).toDF("id", "blob")
    val rows = Multimodal.extractMp4SampleBytes(df, "blob", syncOnly = true)
      .select("track_id", "sample_idx", "frame").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getAs[Array[Byte]](2)))
    assert(rows.map(_._1).toSet ==
      (1 to 2).flatMap(t => (0 until 3).filter(Multimodal.sampleIsSync(t, _))
        .map(j => (t, j))).toSet)
    rows.foreach { case ((t, j), bytes) =>
      assert(java.util.Arrays.equals(bytes, pay(t, j)), s"($t,$j)")
    }
  }

  test("mp4 presentation time: ctts + elst shift pts off dts per the " +
    "fixture arithmetic across both versions and both offset widths") {
    for (variant <- Seq(0, 1); co64 <- Seq(false, true)) {
      val blob = Multimodal.syntheticMp4("isom", 600, 500L, 3, variant,
        withSamples = true, useCo64 = co64, withCtts = true)
      val Right((samples, _)) = Multimodal.mp4SampleTable(blob): @unchecked
      assert(samples.length == 3 * Multimodal.SamplesPerTrack)
      samples.foreach { case (t, j, o, sz, dts, pts, _, _) =>
        assert(dts == j.toLong * Multimodal.sampleDur(t, 0))
        assert(pts == Multimodal.ptsOf(t, j),
          s"track $t sample $j pts variant=$variant co64=$co64")
        // extents still land on the right bytes with ctts/elst/co64 in
        // the box stream (their sizes shift every stco/co64 offset)
        (0 until sz).foreach { b =>
          assert((blob((o + b).toInt) & 0xFF) ==
            Multimodal.sampleByte(t, j, b), s"t=$t j=$j b=$b")
        }
      }
      // the point of the fixture: decode order 0,1,2 PRESENTS as 0,2,1
      (1 to 3).foreach { t =>
        val byPts = samples.filter(_._1 == t).sortBy(_._6).map(_._2)
        assert(byPts == Seq(0, 2, 1), s"track $t presentation order")
      }
      // totality with every feature on: truncations are Left or
      // in-bounds Right, never a throw
      (0 until blob.length).foreach { cut =>
        Multimodal.mp4SampleTable(blob.take(cut)) match {
          case Left(_) => ()
          case Right((ss, _)) =>
            ss.foreach { case (_, _, o, sz, _, _, _, _) =>
              assert(o + sz <= cut, s"cut=$cut overran")
            }
        }
      }
    }
  }

  test("mp4 poison-blob hardening: truncated/empty mvhd v1 and stsz " +
    "allocation bombs are typed errors, never throws or OOM") {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bo)
      o.writeInt(8 + payload.length); o.writeBytes(typ); o.write(payload)
      o.flush(); bo.toByteArray
    }
    val ftyp = box("ftyp",
      "isom   isomisom".getBytes("US-ASCII"))
    // mvhd v1 truncated to 28 payload bytes AT END OF BLOB: the
    // duration long at payload offset 24 needs 32 — the pre-fix parser
    // read past the blob and threw
    val mvhd28 = new Array[Byte](28); mvhd28(0) = 1
    val m1 = Multimodal.decodeMp4Bytes(ftyp ++ box("moov", box("mvhd", mvhd28)))
    assert(!m1.ok && m1.error == "truncated box")
    // empty mvhd payload at end of blob: even the version byte is out
    // of bounds
    val m0 = Multimodal.decodeMp4Bytes(
      ftyp ++ box("moov", box("mvhd", Array.empty[Byte])))
    assert(!m0.ok && m0.error == "truncated box")
    // v0 still needs only 20 payload bytes
    val mvhd20 = new Array[Byte](20)
    assert(Multimodal.decodeMp4Bytes(
      ftyp ++ box("moov", box("mvhd", mvhd20))).ok)
    // stsz allocation bomb: a tiny blob declaring uniform-size samples
    // with a ~2^30 count must be rejected BEFORE allocating, not after
    // a multi-GB Array.fill
    val blob = Multimodal.syntheticMp4("isom", 600, 42L, 1, 0,
      withSamples = true)
    val at = (0 until blob.length - 4).find(i =>
      blob(i) == 's' && blob(i + 1) == 't' && blob(i + 2) == 's' &&
        blob(i + 3) == 'z').get
    val bomb = blob.clone()
    bomb(at + 8) = 0x40   // uniform 0 -> 0x40000000
    bomb(at + 12) = 0x40  // count 3 -> 0x40000003
    assert(Multimodal.mp4SampleTable(bomb) == Left("bad sample table"))
  }

  test("fragmented MP4 (moof/tfhd/trun): all three container modes " +
    "yield IDENTICAL samples (modulo offsets), bytes land exactly, " +
    "every truncation is total") {
    for (variant <- Seq(0, 1); withCtts <- Seq(false, true);
         nTraks <- Seq(1, 2, 3)) {
      def make(mode: Int) = Multimodal.syntheticMp4("isom", 600, 500L,
        nTraks, variant, withSamples = true, withCtts = withCtts,
        fragmented = mode)
      // logical view: everything except the file offset, PLUS the
      // actual payload bytes at the declared extent
      def view(blob: Array[Byte]) = Multimodal.mp4SampleTable(blob) match {
        case Left(e) => fail(s"variant=$variant ctts=$withCtts: $e")
        case Right((ss, tracks)) =>
          // sortBy (track, idx): classic emits track-major, fragmented
          // fragment-major — row order is not part of the contract
          (ss.map { case (t, j, o, sz, dts, pts, dur, sync) =>
            (t, j, sz, dts, pts, dur, sync,
              java.util.Arrays.copyOfRange(blob, o.toInt, o.toInt + sz)
                .toSeq)
          }.sortBy(r => (r._1, r._2)), tracks)
      }
      val (classic, classicTrk) = view(make(0))
      assert(classic.length == nTraks * Multimodal.SamplesPerTrack)
      for (mode <- Seq(1, 2)) {
        val (frag, fragTrk) = view(make(mode))
        assert(frag == classic,
          s"mode=$mode variant=$variant ctts=$withCtts traks=$nTraks")
        assert(fragTrk == classicTrk,
          s"manifest mode=$mode variant=$variant traks=$nTraks")
      }
      // truncation totality over fragment boxes: every cut is Left or
      // an in-bounds Right, never a throw
      val blob = make(if (nTraks == 3) 1 else 2)
      (0 until blob.length).foreach { cut =>
        Multimodal.mp4SampleTable(blob.take(cut)) match {
          case Left(_) => ()
          case Right((ss, _)) =>
            ss.foreach { case (_, _, o, sz, _, _, _, _) =>
              assert(o + sz <= cut, s"cut=$cut overran")
            }
        }
      }
    }
    // poison: a moof before any moov, and a traf naming an unknown
    // track, are typed errors
    val good = Multimodal.syntheticMp4("isom", 600, 500L, 1, 0,
      withSamples = true, fragmented = 1)
    val moofAt = (0 until good.length - 4).find(i =>
      good(i) == 'm' && good(i + 1) == 'o' && good(i + 2) == 'o' &&
        good(i + 3) == 'f').get - 4
    val moovAt = (0 until good.length - 4).find(i =>
      good(i) == 'm' && good(i + 1) == 'o' && good(i + 2) == 'o' &&
        good(i + 3) == 'v').get - 4
    val ftypEnd = moovAt
    val early = good.take(ftypEnd) ++ good.drop(moofAt)
    assert(Multimodal.mp4SampleTable(early) == Left("moof before moov"))
    // tfhd names track 9: payload starts 8 bytes in (ver/flags, id)
    val tfhdAt = (0 until good.length - 4).find(i =>
      good(i) == 't' && good(i + 1) == 'f' && good(i + 2) == 'h' &&
        good(i + 3) == 'd').get
    val badTrack = good.clone()
    badTrack(tfhdAt + 11) = 9
    assert(Multimodal.mp4SampleTable(badTrack) ==
      Left("fragment for unknown track"))
  }

  test("n_edits surfaces timeline complexity: 2-entry elst manifests " +
    "as 2, the muxer-standard single edit as 1, no edts as 0") {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bo)
      o.writeInt(8 + payload.length); o.writeBytes(typ); o.write(payload)
      o.flush(); bo.toByteArray
    }
    def be32(vs: Int*): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bo)
      vs.foreach(o.writeInt); o.flush(); bo.toByteArray
    }
    // elst v0, TWO entries: an initial EMPTY edit (media_time -1) then
    // a normal one — the multi-segment timeline the pts arithmetic
    // deliberately reduces to the first non-empty edit; n_edits = 2 is
    // the quarantine-routing signal
    val elst = be32(0, 2, /*e1*/ 100, -1, 0x00010000,
      /*e2*/ 400, 55, 0x00010000)
    val hdlr = be32(0, 0, 0x76696465 /*vide*/, 0, 0, 0) ++ Array[Byte](0)
    val tkhd = be32(7, 0, 0, /*track_ID*/ 4, 0, 0, 0, 0)
    val mvhd = be32(0, 0, 0, 600, 0)
    val moov = box("moov", box("mvhd", mvhd) ++
      box("trak", box("tkhd", tkhd) ++ box("edts", box("elst", elst)) ++
        box("mdia", box("hdlr", hdlr))))
    val ftyp = box("ftyp", "isom   isomisom".getBytes("US-ASCII"))
    val Right((ss, trk)) =
      Multimodal.mp4SampleTable(ftyp ++ moov): @unchecked
    assert(ss.isEmpty)
    assert(trk == Seq((4, "vide", null, 0, 0L, 0L, 0, 2)))
    // the writer's withCtts fixture carries the standard 1-edit elst
    val one = Multimodal.syntheticMp4("isom", 600, 500L, 1, 0,
      withSamples = true, withCtts = true)
    val Right((_, t1)) = Multimodal.mp4SampleTable(one): @unchecked
    assert(t1.map(_._8) == Seq(1))
    // no edts at all -> 0
    val none = Multimodal.syntheticMp4("isom", 600, 500L, 2, 0,
      withSamples = true)
    val Right((_, t2)) = Multimodal.mp4SampleTable(none): @unchecked
    assert(t2.map(_._8) == Seq(0, 0))
  }

  test("initial empty edit delays presentation: pts shifts by the " +
    "movie->media-converted segment_duration, per ISO 14496-12 8.6.6") {
    for (variant <- Seq(0, 1); nTraks <- Seq(1, 3);
         frag <- Seq(0, 1)) {
      val blob = Multimodal.syntheticMp4("isom", 600, 500L, nTraks,
        variant, withSamples = true, withCtts = true,
        fragmented = frag, withEmptyEdit = true)
      val Right((samples, trk)) =
        Multimodal.mp4SampleTable(blob): @unchecked
      assert(samples.length == nTraks * Multimodal.SamplesPerTrack)
      samples.foreach { case (t, j, _, _, dts, pts, _, _) =>
        assert(dts == (0 until j).map(Multimodal.sampleDur(t, _)).sum,
          s"t=$t j=$j dts variant=$variant frag=$frag")
        // mdhd media ts = 2 x movie ts -> delay doubles in media ticks
        assert(pts == Multimodal.ptsOf(t, j) +
          2 * Multimodal.emptyEditDurOf(t),
          s"t=$t j=$j pts variant=$variant frag=$frag")
      }
      assert(trk.map(_._8) == Seq.fill(nTraks)(2)) // n_edits = 2
      // control: no empty edit -> the original pts
      val ctrl = Multimodal.syntheticMp4("isom", 600, 500L, nTraks,
        variant, withSamples = true, withCtts = true, fragmented = frag)
      val Right((cs, _)) = Multimodal.mp4SampleTable(ctrl): @unchecked
      cs.foreach { case (t, j, _, _, _, pts, _, _) =>
        assert(pts == Multimodal.ptsOf(t, j))
      }
    }
  }

  test("ctts v0 offset >= 2^31 is dropped with a DISTINCT diagnosable " +
    "reason, not a generic bad-table error") {
    val blob = Multimodal.syntheticMp4("isom", 600, 500L, 1, 0,
      withSamples = true, withCtts = true) // variant 0 -> ctts version 0
    val at = (0 until blob.length - 4).find(i =>
      blob(i) == 'c' && blob(i + 1) == 't' && blob(i + 2) == 't' &&
        blob(i + 3) == 's').get
    // payload: ver/flags at+4, count at+8, (cnt, off) pairs from at+12;
    // flip the first offset's sign bit -> unsigned value >= 2^31
    val poison = blob.clone()
    poison(at + 16) = (poison(at + 16) | 0x80).toByte
    assert(Multimodal.mp4SampleTable(poison) ==
      Left("ctts v0 offset overflow"))
    assert(Multimodal.mp4SampleTable(blob).isRight) // control
  }

  test("pcmLayout caps the untrusted channel count: a 1M-channel " +
    "header can never size a frame buffer") {
    import javax.sound.sampled.AudioFormat
    def fmt(ch: Int) = new AudioFormat(
      AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, ch, 2 * ch, 8000f, false)
    assert(Multimodal.pcmLayout(fmt(1 << 20)) == null)
    assert(Multimodal.pcmLayout(fmt(4097)) == null)
    val ok = Multimodal.pcmLayout(fmt(4096))
    assert(ok != null && ok.channels == 4096 && ok.bytesPerSample == 2)
  }

  test("mp4 parser is total: random bytes and random truncations of a " +
    "valid file never throw") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      val m = Multimodal.decodeMp4Bytes(b) // must not throw
      assert(m.ok || m.error != null, s"run $i")
    }
    val full = Multimodal.syntheticMp4("isom", 1200, 999L, 3, 1)
    // the file ends in a size==0 to-EOF mdat (8-byte header + 8 bytes
    // payload): cutting INSIDE that payload still yields a structurally
    // valid file (the mdat just covers fewer bytes — that's what the
    // to-EOF form means); cutting inside its header, or anywhere
    // before it, must flag
    val mdatOff = full.length - 16
    (0 until full.length).foreach { cut =>
      val m = Multimodal.decodeMp4Bytes(full.take(cut))
      if (cut == mdatOff) // clean box boundary: a file with no mdat
        assert(m.ok && m.nTopBoxes == 2, s"cut=$cut")
      else if (cut < mdatOff + 8) assert(!m.ok, s"cut=$cut")
      else assert(m.ok && m.timescale == 1200 && m.duration == 999L &&
        m.nTraks == 3 && m.nTopBoxes == 3, s"cut=$cut")
    }
    assert(Multimodal.decodeMp4Bytes(full).ok)
  }
}
