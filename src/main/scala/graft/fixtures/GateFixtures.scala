package graft.fixtures

import graft.ext.{DocDedup, Mp3, Multimodal, Similarity, TextAnalysis, WebArchive}

/** Gate-corpus fixture generators, extracted from SparkEntry (round-12
  * verdict ask #7) so the driver-contract file holds query definitions
  * only. Each def is the body of one gate's fixture UDF - a
  * deterministic blob (or text) derived from the document id; the gate
  * comments in SparkEntry document the construction, and the DuckDB
  * oracles in OracleSql predict the downstream results arithmetically.
  */
object GateFixtures {

  import graft.SparkEntry.cdcGateBytes

  def q192_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val members = (0 until (1 + id % 3).toInt).map { m =>
          val size = (200 + (id * 11 + m * 17) % 300).toInt
          val content = new Array[Byte](size)
          java.util.Arrays.fill(content, ((id + m * 7) % 251).toByte)
          graft.ext.Gzip.buildGzipMember(content,
            fname = if ((id + m) % 2 == 0) f"doc${id}%05d_m$m%d.txt" else null,
            comment = if ((id + m) % 5 == 0) f"c$id%d" else null,
            extra = if ((id + m) % 4 == 0)
              new Array[Byte]((6 + id % 10).toInt) else null,
            mtime = id * 1000 + m, os = ((id % 3) * 7).toInt,
            isText = id % 2 == 0, withHcrc = (id + m) % 3 == 0)
        }
        val full = members.reduce(_ ++ _)
        if (id % 37 == 0)
          full(full.length - 1) = (full(full.length - 1) ^ 0x5A).toByte
        full
      }
  }

  def q193_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val full = graft.ext.Gzip.buildGzipMember(
          graft.ext.TarShard.syntheticTar(id),
          fname = if (id % 2 == 0) f"shard${id}%05d.tar" else null,
          mtime = id, os = 3, withHcrc = id % 3 == 0)
        if (id % 37 == 0)
          full(full.length - 1) = (full(full.length - 1) ^ 0x5A).toByte
        full
      }
  }

  def q194_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val withCk = id % 2 == 0 || id % 37 == 0
        val frames = (0 until (1 + id % 2).toInt).map { f =>
          val s0 = (150 + (id * 7 + f * 13) % 200).toInt
          val v0 = ((id + f) % 251).toInt
          val raw = new Array[Byte](s0)
          java.util.Arrays.fill(raw, v0.toByte)
          val l1 = (50 + (id * 11 + f) % 100).toInt
          val v1 = ((id * 3 + f * 5) % 251).toInt
          val rle = graft.ext.Lz4.buildLz4Block(Seq(
            graft.ext.Lz4.Lit(Array(v1.toByte)),
            graft.ext.Lz4.MatchRef(1, l1 - 1)))
          val content = raw ++ Array.fill(l1)(v1.toByte)
          graft.ext.Lz4.buildLz4Frame(
            Seq((true, raw), (false, rle)), content,
            withContentChecksum = withCk,
            withContentSize = id % 3 == 0,
            withBlockChecksum = id % 5 == 0,
            blockIndep = id % 4 != 0)
        }
        val sk =
          if (id % 6 == 0) {
            val p = new Array[Byte]((10 + id % 40).toInt)
            java.util.Arrays.fill(p, (id % 251).toByte)
            Seq(graft.ext.Lz4.buildLz4Skippable(p, (id % 16).toInt))
          } else Nil
        val full = (frames ++ sk).reduce(_ ++ _)
        if (id % 37 == 0)
          full(full.length - 1) = (full(full.length - 1) ^ 0x33).toByte
        full
      }
  }

  def q195_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val acls = (id % 8).toInt
        val content = cdcGateBytes(61000 + acls, 600 + acls * 37)
        val sp = (50 + (id * 13) % 400).toInt
        val blocks =
          if (id % 3 == 0) Seq((true, content))
          else Seq(
            (id % 2 == 0, if (id % 2 == 0) content.take(sp)
              else graft.ext.Lz4.buildLz4Block(
                Seq(graft.ext.Lz4.Lit(content.take(sp))))),
            (false, graft.ext.Lz4.buildLz4Block(
              Seq(graft.ext.Lz4.Lit(content.drop(sp))))))
        val frame = graft.ext.Lz4.buildLz4Frame(blocks, content,
          withContentChecksum = id % 2 == 0,
          withContentSize = id % 3 == 1,
          withBlockChecksum = id % 5 == 0)
        if (id % 5 == 0)
          frame ++ graft.ext.Lz4.buildLz4Skippable(
            new Array[Byte]((10 + id % 30).toInt), (id % 16).toInt)
        else frame
      }
  }

  def q196_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val sync = Array.tabulate(16)(i => ((id * 29 + i * 17) % 251).toByte)
        val blocks = (0 until (1 + id % 4).toInt).map { b =>
          val size = (100 + (id * 7 + b * 13) % 200).toInt
          val p = new Array[Byte](size)
          java.util.Arrays.fill(p, ((id + b * 11) % 251).toByte)
          ((1 + (id + b) % 5), p)
        }
        val codec = (id % 3) match {
          case 0 => "null"; case 1 => "deflate"; case _ => "snappy"
        }
        val full = graft.ext.AvroOcf.buildAvro("\"bytes\"", codec,
          sync, blocks)
        if (id % 37 == 0)
          full(full.length - 1) = (full(full.length - 1) ^ 0x01).toByte
        full
      }
  }

  def q197_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val major = if (id % 2 == 0) 3 else 4
        def enc(k: Int): Int =
          if (major == 3) ((id + k) % 2).toInt else ((id + k) % 4).toInt
        val frames = scala.collection.mutable.ArrayBuffer
          .empty[(String, Array[Byte])]
        // id%6==5 docs get a 0xFF-bearing title and ride the
        // UNSYNCHRONIZED coding (v2.3 §5 FF-00 stuffing) below
        val title = f"title $id%d" + (if (id % 6 == 5) "ÿ" else "")
        frames += (("TIT2", graft.ext.Mp3.id3TextData(title, enc(0))))
        frames += (("TPE1",
          graft.ext.Mp3.id3TextData(f"artist ${id % 13}%d", enc(1))))
        if (id % 3 == 0)
          frames += (("TALB",
            graft.ext.Mp3.id3TextData(f"album ${id % 7}%d", enc(2))))
        if (id % 4 == 0) {
          val p = new Array[Byte]((5 + id % 20).toInt)
          java.util.Arrays.fill(p, ((id % 100) + 1).toByte)
          frames += (("PRIV", p))
        }
        frames += (("TRCK",
          graft.ext.Mp3.id3TextData(f"${id % 20}%d", enc(4))))
        val pad = if (id % 37 == 0) 9 else ((id % 4) * 7).toInt
        val built = graft.ext.Mp3.buildId3v2Tag(major, frames.toSeq,
          pad = pad, withExtHeader = id % 5 == 0)
        val full =
          if (id % 6 == 5) graft.ext.Mp3.unsynchronizeTag(built)
          else built
        if (id % 37 == 0)
          full(full.length - 1) = 0x22
        full
      }
  }

  def q198_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val nG = (1 + id % 3).toInt
        val rows = (0 until nG).map(g => 10 + (id * 3 + g * 7) % 90)
        val bts = (0 until nG).map(g => 1000 + (id * 13 + g * 29) % 5000)
        val cols = (0 until (2 + id % 4).toInt).map(c => f"col$c%d")
        val full = graft.ext.ParquetMeta.buildParquetBlob(
          (1 + id % 2).toInt, cols, rows, bts,
          f"writer ${id % 5}%d", bodyLen = (20 + id % 50).toInt)
        if (id % 37 == 0)
          full(full.length - 1) = (full(full.length - 1) ^ 0x10).toByte
        full
      }
  }

  def q199_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val tar = graft.ext.TarShard.syntheticTar(id)
        (id % 3).toInt match {
          case 0 => graft.ext.Gzip.buildGzipMember(tar,
            fname = f"s$id%05d.tar", withHcrc = id % 2 == 0)
          case 1 =>
            val sp = (512 + (id * 31) % 1024).toInt
            graft.ext.Lz4.buildLz4Frame(
              Seq((true, tar.take(sp)), (true, tar.drop(sp))), tar,
              withContentChecksum = true, withContentSize = id % 2 == 0)
          case _ => graft.ext.Zstd.buildZstdFrame(
            Seq((false, tar)), withChecksum = id % 2 == 0,
            ((id + 1) % 4).toInt, singleSegment = false)
        }
      }
  }

  def q200_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val n = (4 + id % 4)
        val tensors = Seq(
          ("emb", "F32", Seq(n, 8L), ((id % 251)).toInt),
          ("ids", "I64", Seq(n), ((id * 3) % 251).toInt)) ++
          (if (id % 2 == 0)
            Seq(("mask", "U8", Seq(n), ((id * 7) % 251).toInt))
          else Nil)
        val full = graft.ext.SafeTensors.buildSafeTensors(tensors,
          metadata = if (id % 3 == 0) Seq("format" -> "pt") else Nil)
        if (id % 37 == 0) full ++ Array[Byte](0) else full
      }
  }

  def q201_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val descr = (id % 4).toInt match {
          case 0 => "|u1"; case 1 => "<i2"; case 2 => "<i4"; case _ => "<i8"
        }
        val n = 2 + id % 3
        val m = 3 + id % 2
        val vals = (0L until n * m).map(k => (id * 3 + k * 7) % 101)
        val full = graft.ext.Npy.buildNpy(descr, Seq(n, m), vals,
          fortran = id % 5 == 0, version = if (id % 6 < 3) 1 else 2)
        if (id % 37 == 0) full ++ Array[Byte](1) else full
      }
  }

  def q202_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val n = (2 + id % 4).toInt
        val m = (3 + id % 3).toInt
        val emb = graft.ext.Npy.buildNpy("<i4", Seq(n.toLong),
          (0 until n).map(k => (id + k * 3) % 97))
        val ids = graft.ext.Npy.buildNpy("<i8", Seq(m.toLong),
          (0 until m).map(k => (id * 5 + k) % 89))
        val full = graft.ext.ZipArchive.buildZip(Seq(
          ("emb.npy", if (id % 2 == 0) 0 else 8, emb),
          ("ids.npy", if (id % 2 == 0) 8 else 0, ids)))
        if (id % 37 == 0) {
          // flip a byte inside the FIRST entry's payload region
          full(40) = (full(40) ^ 0x10).toByte
        }
        full
      }
  }

  def q204_mkSt(id: Long) = {
      val acls = (id % 8).toInt
      val data = cdcGateBytes(62000 + acls, 500 + acls * 37)
      graft.ext.SafeTensors.buildSafeTensorsRaw(
        Seq((f"t$acls%d", "U8", Seq(data.length.toLong), data)))
  }

  def q204_mkNpy2(id: Long) = {
      val acls = (id % 8).toInt
      val data = cdcGateBytes(62000 + acls, 500 + acls * 37)
      graft.ext.Npy.buildNpy("|u1", Seq(data.length.toLong),
        data.toSeq.map(b => (b & 0xFF).toLong))
  }

  def q205_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val codec = (id % 4).toInt match {
          case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
        }
        val nG = (1 + id % 3).toInt
        val rows = (0 until nG).map(g => 100 + (id * 7 + g * 13) % 400)
        val full = graft.ext.Orc.buildOrc(codec, (2 + id % 3).toInt,
          rows, contentLength = 5000 + id * 3,
          bodyLen = (10 + id % 40).toInt,
          chunkEvery = if (id % 5 == 0) 48 else 1 << 14)
        if (id % 37 == 0)
          full(full.length - 2) = (full(full.length - 2) ^ 0x01).toByte
        full
      }
  }

  def q206_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else if (id >= 150) // r13: arrow joins the triage (ids 150-199)
        graft.ext.ArrowIpc.buildArrowFile((3 + id % 5).toInt, 2, id)
      else {
        val nG = (1 + id % 3).toInt
        val rows = (0 until nG).map(g => 50 + (id * 11 + g * 7) % 300)
        (id % 3).toInt match {
          case 0 => graft.ext.ParquetMeta.buildParquetBlob(1,
            (0 until (2 + id % 3).toInt).map(c => f"c$c%d"),
            rows, rows.map(_ * 100), f"w${id % 5}%d",
            bodyLen = (10 + id % 30).toInt)
          case 1 => graft.ext.Orc.buildOrc(
            if (id % 2 == 0) 1 else 2, (2 + id % 3).toInt, rows,
            contentLength = 400 + id, bodyLen = (10 + id % 30).toInt)
          case _ =>
            val sync = Array.tabulate(16)(i =>
              ((id * 29 + i * 17) % 251).toByte)
            graft.ext.AvroOcf.buildAvro("\"bytes\"",
              if (id % 2 == 0) "deflate" else "snappy", sync,
              rows.zipWithIndex.map { case (r, g) =>
                val p = new Array[Byte]((40 + (id + g * 13) % 100).toInt)
                java.util.Arrays.fill(p, ((id + g) % 251).toByte)
                (r, p)
              })
        }
      }
  }

  def q207_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val acls = (id % 8)
        graft.ext.Multimodal.syntheticGrayImage(
          30 + (acls % 5).toInt * 7, 26 + (acls % 3).toInt * 9, acls,
          if (id % 2 == 0) "png" else "bmp")
      }
  }

  def q208_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val hasAudio = id % 2 == 0
        val streams = Seq(("vids", 1L, 24 + id % 10, 10 + id % 20)) ++
          (if (hasAudio) Seq(("auds", 1L, 8000 * (1 + id % 3),
            100 + id % 50)) else Nil)
        val nvc = (2 + id % 3).toInt
        val movi = (0 until nvc).map { c =>
          val p = new Array[Byte]((20 + (id * 7 + c * 13) % 100).toInt)
          java.util.Arrays.fill(p, ((id + c) % 251).toByte)
          (0, "dc", p)
        } ++ (if (hasAudio) (0 until 2).map { c =>
          val p = new Array[Byte]((30 + (id * 11 + c * 17) % 80).toInt)
          java.util.Arrays.fill(p, ((id * 3 + c) % 251).toByte)
          (1, "wb", p)
        } else Nil)
        val full = graft.ext.Avi.buildAvi(
          160 + (id % 16) * 8, 120 + (id % 9) * 8,
          nvc.toLong, 33333 + id, streams, movi,
          withJunk = id % 3 == 0, recGroup = id % 5 == 0)
        if (id % 37 == 0) full(56) = 9 // lie in avih dwStreams
        full
      }
  }

  def q209_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val nv = (2 + id % 3).toInt
        val tags = Seq((18, 0L,
          Array.fill((20 + id % 30).toInt)(((id * 3) % 251).toByte))) ++
          (0 until nv).map { k =>
            (9, 20000000L * (id % 2) + k * 40L,
              Array.fill((40 + (id * 7 + k * 13) % 200).toInt)(
                ((id + k) % 251).toByte))
          } ++
          (if (id % 2 == 0) (0 until 2).map { k =>
            (8, k * 23L,
              Array.fill((25 + (id * 11 + k * 5) % 90).toInt)(
                ((id * 5 + k) % 251).toByte))
          } else Nil)
        val full = graft.ext.Flv.buildFlv(tags)
        if (id % 37 == 0)
          full(full.length - 1) = (full(full.length - 1) ^ 0x01).toByte
        full
      }
  }

  def q210_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val acls = (id % 8)
        val frames = (0 until 2).map(f =>
          Multimodal.syntheticGrayPng(
            30 + (acls % 4).toInt * 5, 24 + (acls % 3).toInt * 6,
            acls * 100 + f))
        if (id % 2 == 0)
          graft.ext.Avi.buildAvi(64, 48, 2, 33333,
            Seq(("vids", 1L, 25L, 2L)),
            frames.zipWithIndex.map { case (p, i) => (0, "dc", p) })
        else
          graft.ext.Flv.buildFlv(
            frames.zipWithIndex.map { case (p, i) => (9, i * 40L, p) })
      }
  }

  def q211_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val entries = (0 until (2 + id % 3).toInt).map { k =>
          val size = (20 + (id * 11 + k * 7) % 300).toInt
          val payload = new Array[Byte](size)
          java.util.Arrays.fill(payload, ((id + k * 13) % 251).toByte)
          (f"e$id%04d_$k%02d.dat",
            if ((id + k) % 2 == 0) 0 else 8, payload)
        }
        val full = graft.ext.ZipArchive.buildZip(entries,
          forceZip64 = id % 2 == 1)
        if (id % 37 == 0) {
          if (id % 2 == 1) {
            val at = (0 until full.length - 4).indexWhere(i =>
              full(i) == 'P' && full(i + 1) == 'K' &&
                full(i + 2) == 6 && full(i + 3) == 6)
            full(at + 3) = 9
          } else full(45) = (full(45) ^ 0x08).toByte
        }
        full
      }
  }

  def q212_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val pk = new graft.ext.MsgPack.Packer
        val nr = (2 + id % 3).toInt
        (0 until nr).foreach { r =>
          val score = id % 2 == 0
          val opt = (id + r) % 3 == 0
          pk.mapHeader(5 + (if (score) 1 else 0) + (if (opt) 1 else 0))
          pk.str("id").int(id * 1000 + r)
          pk.str("neg").int(-(1 + (id + r * 7) % 200))
          pk.str("text").str("t" * (10 + (id * 3 + r) % 40).toInt)
          val m = (1 + (id + r) % 4).toInt
          pk.str("tags").arrHeader(m)
          (0 until m).foreach(t => pk.int((id + t * 11) % 100))
          pk.str("flag").bool((id + r) % 2 == 0)
          if (score) pk.str("score").float64(0.5)
          if (opt) { pk.str("opt"); pk.nil() }
        }
        val body = pk.bytes
        if (id % 37 == 0) body ++ Array[Byte](0xC1.toByte) else body
      }
  }

  def q213_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val w = new graft.ext.Cbor.Writer
        val nr = (2 + id % 3).toInt
        (0 until nr).foreach { r =>
          val ts = id % 4 == 0
          val opt = (id + r) % 3 == 0
          w.mapHeader(5 + (if (ts) 1 else 0) + (if (opt) 1 else 0))
          w.text("id").int(id * 1000 + r)
          w.text("neg").int(-(1 + (id + r * 7) % 200))
          val l = (10 + (id * 3 + r) % 40).toInt
          w.text("text")
          if ((id + r) % 5 == 0)
            w.textIndef(Seq("t" * (l / 2), "t" * (l - l / 2)))
          else w.text("t" * l)
          val m = (1 + (id + r) % 4).toInt
          w.text("tags").arrHeader(m)
          (0 until m).foreach(t => w.int((id + t * 11) % 100))
          w.text("flag").bool((id + r) % 2 == 0)
          if (ts) { w.text("ts").tag(1L); w.int(1600000000L + id + r) }
          if (opt) { w.text("opt"); w.nullV() }
        }
        val body = w.bytes
        if (id % 37 == 0) body ++ Array[Byte](0xFF.toByte) else body
      }
  }

  def q214_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val recs = (0 until (2 + id % 3).toInt).map { r =>
          val pk = new graft.ext.MsgPack.Packer
          pk.mapHeader(3)
          pk.str("id").int(id * 100 + r)
          pk.str("text").str("x" * (5 + (id + r * 3) % 20).toInt)
          pk.str("flag").bool((id + r) % 2 == 0)
          pk.bytes
        }
        val full = graft.ext.TfRecord.buildTfRecord(recs)
        if (id % 37 == 0) full(14) = (full(14) ^ 0x20).toByte
        full
      }
  }

  def q216_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val docs = (0 until (2 + id % 3).toInt).map { r =>
          val d = new graft.ext.Bson.DocBuilder
          d.int32("id", (id * 100 + r).toInt)
          d.int64("big", id * 1000000 + r)
          d.string("name", "u" * (5 + (id + r * 3) % 20).toInt)
          d.boolV("ok", (id + r) % 2 == 0)
          val m = (1 + (id + r) % 4).toInt
          val arr = new graft.ext.Bson.DocBuilder
          (0 until m).foreach(t =>
            arr.int32(t.toString, ((id + t * 7) % 50).toInt))
          d.array("tags", arr)
          if (id % 2 == 0) d.datetime("ts", id * 10 + r)
          if ((id + r) % 3 == 0) d.nullV("opt")
          d.bytes
        }
        val full = docs.reduce(_ ++ _)
        if (id % 37 == 0)
          full(full.length - 1) = 0x77
        full
      }
  }

  def q217_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val wav = Multimodal.syntheticWavEx(8000,
          (300 + (id % 5) * 100).toInt, id, bits = 16, channels = 1)
        if (id % 2 == 0) wav
        else {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(wav))
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(in,
            javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
          out.toByteArray
        }
      }
  }

  def q220_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val acls = (id % 8)
        graft.ext.Multimodal.syntheticGrayImage(
          30 + (acls % 4).toInt * 6, 24 + (acls % 3).toInt * 7, acls,
          (id % 3).toInt match {
            case 0 => "png"; case 1 => "bmp"; case _ => "tiff"
          })
      }
  }

  def q221_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val acls = id % 6
        val n = (150 + acls * 50).toInt
        (id % 3).toInt match {
          case 0 => Multimodal.syntheticWavEx(8000, n, acls,
            bits = 16, channels = 1)
          case 1 =>
            val wav = Multimodal.syntheticWavEx(8000, n, acls,
              bits = 16, channels = 1)
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(wav))
            val out = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(in,
              javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
            out.toByteArray
          case _ => Multimodal.syntheticAu(8000, n, acls, ulaw = false)
        }
      }
  }

  def q222_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val nh = new Array[Byte]((20 + (id * 7) % 100).toInt)
        java.util.Arrays.fill(nh, ((id * 3) % 251).toByte)
        val full = graft.ext.SevenZip.buildSevenZip(
          (30 + id % 200).toInt, nh)
        if (id % 37 == 0)
          full(full.length - 1) = (full(full.length - 1) ^ 0x11).toByte
        full
      }
  }

  def q223_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val blocks = (0 until (1 + id % 3).toInt).map { g =>
          val up = 50 + (id * 7 + g * 11) % 200
          (up, up * 3 + id % 17)
        }
        val ct = (id % 3).toInt match {
          case 0 => 0; case 1 => 1; case _ => 4
        }
        val full = graft.ext.Xz.buildXz(ct, blocks, (id % 251).toInt)
        if (id % 37 == 0)
          full(full.length - 1) = (full(full.length - 1) ^ 0x04).toByte
        full
      }
  }

  def q224_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val gaps = (0 until (1 + id % 3).toInt).map(j =>
          (7 + (id * 5 + j * 13) % 40).toInt)
        val full = graft.ext.Bzip2.buildBzip2((1 + id % 9).toInt, gaps)
        if (id % 37 == 0)
          full(full.length - 7) = (full(full.length - 7) ^ 0xFF).toByte
        full
      }
  }

  def q225_mk(id: Long) = {
      (id % 12).toInt match {
        case 0 => graft.ext.Lz4.buildLz4Frame(
          Seq((true, Array[Byte](1, 2, 3))), Array[Byte](1, 2, 3))
        case 1 => graft.ext.ParquetMeta.buildParquetBlob(1, Seq("a"),
          Seq(3L), Seq(30L), "w", bodyLen = 8)
        case 2 => graft.ext.Orc.buildOrc(0, 1, Seq(5L), 10L, bodyLen = 4)
        case 3 => graft.ext.Npy.buildNpy("<i4", Seq(2L), Seq(1L, 2L))
        case 4 => graft.ext.SafeTensors.buildSafeTensors(
          Seq(("t", "U8", Seq(3L), 1)))
        case 5 => graft.ext.Flv.buildFlv(
          Seq((9, 0L, Array[Byte](1, 2, 3))))
        case 6 => Multimodal.syntheticAu(8000, 20, id, ulaw = true)
        case 7 => graft.ext.Multimodal.syntheticGrayImage(
          8, 8, id, "tiff")
        case 8 => graft.ext.SevenZip.buildSevenZip(10,
          Array[Byte](1, 2, 3, 4))
        case 9 => graft.ext.Xz.buildXz(1, Seq((40L, 99L)), 3)
        case 10 => graft.ext.Bzip2.buildBzip2(5, Seq(7, 12))
        case _ => graft.ext.ArrowIpc.buildArrowFile(2, 2, id)
      }
  }

  def q226_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val nG = (1 + id % 3).toInt
        val rows = (0 until nG).map(g => 10 + (id * 3 + g * 7) % 90)
        val cols = (0 until (2 + id % 2).toInt).map(c => f"c$c%d")
        val full = graft.ext.ParquetMeta.buildParquetBlobStats(
          1, cols, rows, f"w${id % 5}%d", bodyLen = (10 + id % 30).toInt,
          stats = (g, c) => (
            10 + (id * 3 + g * 7) % 90,
            (id + g + c) % 5,
            id * 10 + g * 100 + c,
            id * 10 + g * 100 + c + 500 + (id + g) % 50))
        if (id % 37 == 0)
          full(full.length - 1) = (full(full.length - 1) ^ 0x10).toByte
        full
      }
  }

  def q154_warc(id: Long) = {
      val full = WebArchive.syntheticWarc(id)
      if (id % 47 == 0) Array.empty[Byte]
      else if (id % 43 == 0) full.dropRight(3)
      else full
  }

  def q155_mp3(id: Long) = {
      val full = Mp3.syntheticMp3(id)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.dropRight(3)
      else full
  }

  def q157_webm(id: Long) = {
      val full = graft.ext.Matroska.syntheticWebm(id)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.dropRight(3)
      else full
  }

  def q164_webm(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else graft.ext.Matroska.syntheticWebmLaced(id, (id % 4).toInt)
  }

  def q165_webm(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else graft.ext.Matroska.syntheticWebmGrouped(id, id % 2 == 1)
  }

  def q166_ogg(id: Long) = {
      val full = graft.ext.Ogg.syntheticOgg(id)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.dropRight(3)
      else full
  }

  def q169_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val full = graft.ext.TarShard.syntheticTar(id)
        if (id % 37 == 0) full(0) = (full(0) ^ 0x01).toByte
        full
      }
  }

  def q173_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val nch = 1 + (id % 3).toInt
        val bps = if (id % 2 == 0) 16 else 8
        val rate = 8000L * (1 + id % 5)
        val srCode = if (id % 2 == 0) 0 else 14
        val nf = (2 + id % 3).toInt
        val frames = (0 until nf).map { f =>
          if (f % 2 == 0)
            graft.ext.Flac.buildFlacFrame(f, 256, rate, srCode, nch, bps,
              constant = Some(Array.tabulate(nch)(c =>
                (id * 7 + f * 13 + c * 31) % 200 - 100)),
              verbatim = None)
          else
            graft.ext.Flac.buildFlacFrame(f, 256, rate, srCode, nch, bps,
              constant = None,
              verbatim = Some(Array.tabulate(nch, 256)((c, sx) =>
                (id + f * 3 + c * 5 + sx * 11) % 200 - 100)))
        }
        val full = graft.ext.Flac.buildFlac(rate, nch, bps,
          nf * 256L, frames)
        if (id % 37 == 0) full(50) = (full(50) ^ 0x10).toByte
        full
      }
  }

  def q191_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else (id % 3).toInt match {
        case 0 => graft.ext.TarShard.syntheticTar(id)
        case 1 => graft.ext.ZipArchive.buildZip(
          (0 until (2 + id % 3).toInt).map { k =>
            val size = (20 + (id * 11 + k * 7) % 300).toInt
            val p = new Array[Byte](size)
            java.util.Arrays.fill(p, ((id + k * 13) % 251).toByte)
            (f"e$id%04d_$k%02d.dat", if ((id + k) % 2 == 0) 0 else 8, p)
          })
        case _ => graft.ext.TfRecord.buildTfRecord(
          (0 until (2 + id % 4).toInt).map { k =>
            val size = (15 + (id * 9 + k * 17) % 400).toInt
            val p = new Array[Byte](size)
            java.util.Arrays.fill(p, ((id + k * 29) % 251).toByte)
            p
          })
      }
  }

  def q190_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else (id % 16).toInt match {
        case 0 => graft.ext.TarShard.syntheticTar(id)
        case 1 => graft.ext.ZipArchive.buildZip(
          Seq((f"e$id%04d.dat", 0, Array[Byte](1, 2, 3))))
        case 2 => graft.ext.Flac.buildFlac(8000L, 1, 16, 256L, Seq(
          graft.ext.Flac.buildFlacFrame(0, 256, 8000L, 4, 1, 16,
            constant = Some(Array(id % 100)), verbatim = None)))
        case 3 => graft.ext.Ogg.syntheticOgg(id)
        case 4 => graft.ext.Matroska.syntheticWebm(id)
        case 5 => graft.ext.Multimodal.syntheticWav(8000, 50, id)
        case 6 => graft.ext.Multimodal.syntheticPng(8, 8, id)
        case 7 => graft.ext.Multimodal.solidJpeg(8, 8, (40 + id % 100).toInt)
        case 8 => graft.ext.Multimodal.syntheticGif(8, 8, 2, id)
        case 9 => graft.ext.WebP.syntheticWebP((id % 4).toInt, 32, 32,
          10, (id % 251).toByte)
        case 10 => graft.ext.Zstd.buildZstdFrame(
          Seq((false, Array.fill[Byte](40)((id % 251).toByte))),
          withChecksum = true, 2, singleSegment = false)
        case 11 => graft.ext.AvroOcf.buildAvro("\"bytes\"", "null",
          Array.tabulate(16)(i => ((id + i) % 251).toByte),
          Seq((1L, Array[Byte](4, 5))))
        case 12 =>
          val o = new java.io.ByteArrayOutputStream()
          val g = new java.util.zip.GZIPOutputStream(o)
          g.write(f"doc $id%d".getBytes("UTF-8")); g.close()
          o.toByteArray
        case 13 => graft.ext.Mp3.syntheticMp3(id)
        case 14 => graft.ext.WebArchive.buildWarcArchive(Seq(
          graft.ext.WebArchive.buildWarcRecord("response",
            f"<urn:uuid:$id%d>", "http://x/", "2024-01-01T00:00:00Z",
            "text/plain", f"doc $id%d".getBytes("UTF-8"), null)),
          memberGzip = false)
        case _ => graft.ext.TfRecord.buildTfRecord(
          Seq(Array.fill[Byte]((5 + id % 20).toInt)((id % 251).toByte)))
      }
  }

  def q188_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val entries = scala.collection.mutable.ArrayBuffer
          .empty[(String, Int, Array[Byte])]
        entries += ((f"shard${id % 5}/", 0, Array.empty[Byte]))
        (0 until (2 + id % 3).toInt).foreach { j =>
          val exts = Seq(("txt", 0)) ++
            (if ((id + j) % 2 == 0) Seq(("jpg", 1)) else Nil) ++
            (if ((id + j) % 3 == 0) Seq(("json", 2)) else Nil)
          exts.foreach { case (ext, e) =>
            val size = (10 + (13 * id + 7 * j + 3 * e) % 200).toInt
            val p = new Array[Byte](size)
            java.util.Arrays.fill(p, ((id + 31 * j + 17 * e) % 251).toByte)
            entries += ((f"shard${id % 5}/w${id}%05d_$j%02d.$ext",
              if ((id + j + e) % 2 == 0) 0 else 8, p))
          }
        }
        val full = graft.ext.ZipArchive.buildZip(entries.toSeq)
        if (id % 37 == 0)
          full(full.length - 30) = (full(full.length - 30) ^ 0x01).toByte
        full
      }
  }

  def q189_mk(id: Long) = {
      if (id % 41 == 0) ""
      else {
        val acls = (id % 8).toInt
        val cues = (0 until (2 + acls % 3)).map { c =>
          val start = id * 137 + c * 90017 // doc-specific shift
          (start, start + 1000 + c * 13,
            f"line $c%d of class $acls%d")
        }
        if (id % 2 == 0) graft.ext.Subtitles.buildSrt(cues)
        else graft.ext.Subtitles.buildVtt(cues)
      }
  }

  def q187_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val w = (8 + id % 40).toInt
        val h = (6 + id % 30).toInt
        val full =
          if (id % 2 == 0) graft.ext.Multimodal.syntheticGrayPng(w, h, id)
          else graft.ext.Multimodal.syntheticPng(w, h, id)
        if (id % 37 == 0) full(20) = (full(20) ^ 0x01).toByte
        full
      }
  }

  def q186_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val full = graft.ext.WebP.syntheticWebP((id % 4).toInt,
          (16 + (id * 7) % 2000).toInt, (9 + (id * 11) % 1500).toInt,
          (id % 40).toInt, (id % 251).toByte)
        if (id % 37 == 0) full(8) = (full(8) ^ 0x01).toByte
        full
      }
  }

  def q185_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val acls = (id % 8).toInt
        val content = cdcGateBytes(60000 + acls, 600 + acls * 37)
        val sp = (50 + (id * 13) % 400).toInt
        val blocks =
          if (id % 3 == 0) Seq((false, content))
          else Seq((false, content.take(sp)), (false, content.drop(sp)))
        val frame = graft.ext.Zstd.buildZstdFrame(blocks,
          withChecksum = id % 2 == 0, ((id + 1) % 4).toInt,
          singleSegment = false)
        if (id % 5 == 0)
          frame ++ graft.ext.Zstd.buildSkippable(
            new Array[Byte]((10 + id % 30).toInt), (id % 16).toInt)
        else frame
      }
  }

  def q184_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val withCk = id % 2 == 0 || id % 37 == 0
        val frames = (0 until (1 + id % 3).toInt).map { f =>
          val raw = new Array[Byte]((300 + (id * 7 + f * 11) % 200).toInt)
          java.util.Arrays.fill(raw, ((id + f) % 251).toByte)
          val blocks =
            if ((id + f) % 2 == 0) {
              val rle = new Array[Byte]((100 + (id * 3 + f) % 150).toInt)
              java.util.Arrays.fill(rle, ((id + f * 13) % 251).toByte)
              Seq((false, raw), (true, rle))
            } else Seq((false, raw))
          graft.ext.Zstd.buildZstdFrame(blocks, withCk,
            ((id + f) % 4).toInt, singleSegment = false)
        }
        val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        parts += frames.head
        if (id % 5 == 0) {
          val sp = new Array[Byte]((20 + id % 50).toInt)
          java.util.Arrays.fill(sp, (id % 251).toByte)
          parts += graft.ext.Zstd.buildSkippable(sp, (id % 16).toInt)
        }
        frames.tail.foreach(parts += _)
        val full = parts.reduce(_ ++ _)
        if (id % 37 == 0)
          full(full.length - 6) = (full(full.length - 6) ^ 0x10).toByte
        full
      }
  }

  def q183_mk(id: Long) = {
      if (id % 41 == 0) ""
      else {
        val cues = (0 until (2 + id % 3).toInt).map { c =>
          val start = id * 977 + c * 90017
          val end = start + 500 + (id + c * 7) % 2000
          if (id % 37 == 0 && c == 0) (end, start, f"cue $c of doc $id")
          else (start, end, f"cue $c of doc $id")
        }
        if (id % 2 == 0) graft.ext.Subtitles.buildSrt(cues)
        else graft.ext.Subtitles.buildVtt(cues,
          withIds = id % 4 == 1, withSettings = id % 4 == 1)
      }
  }

  def q182_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val msgs = (0 until (2 + id % 3).toInt).map { k =>
          val b = new graft.ext.ProtoWire.MsgBuilder()
          val v1 = 100 + (id * 7 + k * 3) % 1000
          (0 until (1 + (id + k) % 2).toInt).foreach(_ => b.addVarint(1, v1))
          b.addBytes(2,
            new Array[Byte]((5 + (id + k * 11) % 50).toInt))
          b.addFixed32(3, (id * 13 + k) % 100000)
          if ((id + k) % 3 == 0) b.addFixed64(4, id * 1000 + k)
          b.bytes
        }
        val full = graft.ext.TfRecord.buildTfRecord(msgs)
        if (id % 37 == 0) full(13) = (full(13) ^ 0x04).toByte
        full
      }
  }

  def q181_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val base = graft.ext.Multimodal.solidJpeg(16, 12,
          (40 + id % 100).toInt)
        val full =
          if (id % 3 == 0) base
          else graft.ext.Exif.withExif(base, graft.ext.Exif.exifApp1(
            le = id % 2 == 0, orientation = (1 + id % 8).toInt,
            width = 100 + id % 900, height = 80 + id % 700,
            extraTags = (id % 4).toInt))
        if (id % 37 == 0) full(4) = 0x7F
        full
      }
  }

  def q180_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val sync = Array.tabulate(16)(i => ((id * 31 + i * 13) % 251).toByte)
        val blocks = (0 until (1 + id % 3).toInt).map { b =>
          val size = (30 + (id * 13 + b * 11) % 300).toInt
          val p = new Array[Byte](size)
          java.util.Arrays.fill(p, ((id + b * 19) % 251).toByte)
          ((5 + (id * 3 + b * 7) % 50), p)
        }
        val full = graft.ext.AvroOcf.buildAvro("\"bytes\"",
          if (id % 2 == 0) "null" else "deflate", sync, blocks)
        if (id % 37 == 0)
          full(full.length - 1) = (full(full.length - 1) ^ 0x01).toByte
        full
      }
  }

  def q179_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val payloads = (0 until (2 + id % 4).toInt).map { k =>
          val size = (15 + (id * 9 + k * 17) % 400).toInt
          val p = new Array[Byte](size)
          java.util.Arrays.fill(p, ((id + k * 29) % 251).toByte)
          p
        }
        val full = graft.ext.TfRecord.buildTfRecord(payloads)
        if (id % 37 == 0) full(13) = (full(13) ^ 0x02).toByte
        full
      }
  }

  def q178_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val members = (0 until 3).flatMap { j =>
          val cls = (id + j) % 6
          Seq(
            (f"s$id%04d_$j%02d.png", '0',
              graft.ext.Multimodal.syntheticPng(24, 16, cls)),
            (f"s$id%04d_$j%02d.txt", '0',
              f"caption $cls%d".getBytes("UTF-8")))
        }
        val full = graft.ext.TarShard.buildTar(members)
        if (id % 37 == 0) full(0) = (full(0) ^ 0x01).toByte
        full
      }
  }

  def q177_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val entries = (0 until (2 + id % 3).toInt).map { k =>
          val size = (20 + (id * 11 + k * 7) % 300).toInt
          val payload = new Array[Byte](size)
          java.util.Arrays.fill(payload, ((id + k * 13) % 251).toByte)
          (f"e$id%04d_$k%02d.dat",
            if ((id + k) % 2 == 0) 0 else 8, payload)
        }
        val full = graft.ext.ZipArchive.buildZip(entries)
        if (id % 37 == 0) full(45) = (full(45) ^ 0x08).toByte
        full
      }
  }

  def q175_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val cls = (id / 2) % 6
        val samples = Array.tabulate(512)(sx =>
          (((cls * 7 + sx * 11) % 400) - 200).toInt)
        if (id % 2 == 0) {
          val dataLen = samples.length * 2
          val b = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          b.put("RIFF".getBytes("US-ASCII")); b.putInt(36 + dataLen)
          b.put("WAVE".getBytes("US-ASCII"))
          b.put("fmt ".getBytes("US-ASCII")); b.putInt(16)
          b.putShort(1); b.putShort(1)
          b.putInt(16000); b.putInt(32000); b.putShort(2); b.putShort(16)
          b.put("data".getBytes("US-ASCII")); b.putInt(dataLen)
          samples.foreach(v => b.putShort(v.toShort))
          b.array()
        } else {
          val frames = (0 until 2).map { f =>
            graft.ext.Flac.buildFlacFrame(f, 256, 16000L, 5, 1, 16,
              constant = None,
              verbatim = Some(Array(Array.tabulate(256)(sx =>
                samples(f * 256 + sx).toLong))))
          }
          graft.ext.Flac.buildFlac(16000L, 1, 16, 512L, frames)
        }
      }
  }

  def q174_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val acls = (id % 8).toInt
        val nf = 2 + acls % 3
        val frames = (0 until nf).map { f =>
          graft.ext.Flac.buildFlacFrame(f, 256, 48000L, 10, 1, 16,
            constant = Some(Array((acls * 37 + f * 11) % 500 - 250L)),
            verbatim = None)
        }
        graft.ext.Flac.buildFlac(48000L, 1, 16, nf * 256L, frames,
          padding = 16 + (id % 97).toInt)
      }
  }

  def q171_mk(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        import graft.ext.Ogg._
        val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        val op = opusHeadPacket(1 + (id % 2).toInt, (100 + id % 300).toInt,
          48000L - (id % 5) * 4000L)
        parts += buildOggPage(0x02, 0L, id * 3 + 1, 0L,
          lacesFor(op.length), op)
        parts += buildOggPage(0x04, 960L, id * 3 + 1, 1L, lacesFor(20),
          Array.fill(20)((id % 251).toByte))
        if (id % 3 == 0) {
          val vo = vorbisIdPacket(2 + (id % 4).toInt,
            44100L - (id % 3) * 100L)
          parts += buildOggPage(0x02, 0L, id * 3 + 2, 0L,
            lacesFor(vo.length), vo)
          parts += buildOggPage(0x04, 512L, id * 3 + 2, 1L, lacesFor(10),
            Array.fill(10)(7.toByte))
        }
        if (id % 5 == 0) {
          val junk = Array.tabulate(24)(i => ((id + i) % 251).toByte)
          parts += buildOggPage(0x02, 0L, id * 3 + 3, 0L,
            lacesFor(junk.length), junk)
          parts += buildOggPage(0x04, 64L, id * 3 + 3, 1L, lacesFor(5),
            Array.fill(5)(3.toByte))
        }
        parts.reduce(_ ++ _)
      }
  }

  def q167_ogg(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val acls = (id % 8).toInt
        val npk = 4 + acls % 4
        val pk = (0 until npk).map { j =>
          val size = 30 + ((acls * 7 + j * 13) % 500)
          val b = new Array[Byte](size)
          java.util.Arrays.fill(b, ((acls + j * 37) % 251).toByte)
          b
        }
        val groups =
          if (id % 2 == 0) pk.map(Seq(_)) else pk.grouped(2).toSeq
        val pages = groups.zipWithIndex.map { case (g, p) =>
          val laces = g.flatMap(f => graft.ext.Ogg.lacesFor(f.length))
          val payload = g.flatten.toArray
          val flags = (if (p == 0) 0x02 else 0) |
            (if (p == groups.length - 1) 0x04 else 0)
          graft.ext.Ogg.buildOggPage(flags, (p + 1) * 777L + id % 13,
            id, p.toLong, laces, payload)
        }
        pages.reduce(_ ++ _)
      }
  }

  def q158_mp4(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val vcls = ((id / 2) % 6).toInt
        Multimodal.syntheticMp4("isom", 600, 600L + vcls, 1,
          (id % 2).toInt, withSamples = true,
          samplePayload = (_, j) => Multimodal.syntheticGrayPng(
            16 + (vcls % 3) * 8, 16, vcls * 1000L + j * 7))
      }
  }

  def q158_webm2(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val vcls = ((id / 2) % 6).toInt
        graft.ext.Matroska.syntheticWebmMedia(
          (0 until 3).map(j => Multimodal.syntheticGrayPng(
            16 + (vcls % 3) * 8, 16, vcls * 1000L + j * 7)),
          "V_PNG", unknownSize = (id / 2) % 2 == 0)
      }
  }

  def q159_mp3(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val acls = (id % 8).toInt
        val core = Mp3.syntheticMp3(acls)
        val head = 15 + acls // syntheticMp3(acls)'s ID3v2 extent
        val tail = if (acls % 4 == 0) 128 else 0
        val frames = core.slice(head, core.length - tail)
        val id3v1 =
          if (id % 3 == 0) {
            val t = new Array[Byte](128)
            t(0) = 'T'; t(1) = 'A'; t(2) = 'G'
            t(3) = (id % 100).toByte // per-doc title byte
            t
          } else Array.empty[Byte]
        Mp3.buildId3v2(3 + (id % 60).toInt) ++ frames ++ id3v1
      }
  }

  def q160_warc(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val n = 3 + (id % 5).toInt
        val date = "2026-01-02T03:04:05Z"
        val iso = java.nio.charset.StandardCharsets.ISO_8859_1
        val records = (0 until n).map { j =>
          val rid = s"<urn:uuid:$id-$j>"
          if (j == 0)
            WebArchive.buildWarcRecord("warcinfo", rid, null, date,
              "application/warc-fields",
              s"software: graft $id".getBytes(iso))
          else {
            val uri = s"http://ex.com/$id/$j"
            if (j % 2 == 1)
              WebArchive.buildWarcRecord("request", rid, uri, date,
                "application/http; msgtype=request",
                (s"GET /$id/$j HTTP/1.1\r\nHost: ex.com\r\n\r\n")
                  .getBytes(iso))
            else {
              val c = ((id * 3 + j) % 20).toInt
              val body = (0 until (5 + c % 7))
                .map(t => s"w${c}t$t").mkString(" ")
              val status = Seq(200, 301, 404, 503)(((id * 7 + j) % 4).toInt)
              WebArchive.buildWarcRecord("response", rid, uri, date,
                "application/http; msgtype=response",
                WebArchive.buildHttpResponse(status, "X", "text/plain",
                  body.getBytes(iso)))
            }
          }
        }
        WebArchive.buildWarcArchive(records, memberGzip = id % 2 == 1)
      }
  }

  def q162_warc(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else {
        val iso = java.nio.charset.StandardCharsets.ISO_8859_1
        val date = "2026-01-02T03:04:05Z"
        val blen = 5 + ((id * 7) % 40).toInt
        val ch = ('a' + (id % 26).toInt).toChar
        val tid = id - id % 5
        val records = Seq(
          WebArchive.buildWarcRecord("warcinfo", s"<urn:uuid:$id-0>",
            null, date, "application/warc-fields",
            s"software: graft $id".getBytes(iso)),
          WebArchive.buildWarcRecord("response", s"<urn:uuid:$id-1>",
            s"http://ex.com/$id", date,
            "application/http; msgtype=response",
            WebArchive.buildHttpResponse(200, "OK", "text/plain",
              (ch.toString * blen).getBytes(iso))),
          WebArchive.buildWarcRecord("revisit", s"<urn:uuid:$id-2>",
            s"http://ex.com/$id", date, "message/http",
            Array.empty[Byte], refersTo = s"<urn:uuid:$tid-1>"))
        WebArchive.buildWarcArchive(records, memberGzip = id % 2 == 1)
      }
  }

  def q120_mp4(id: Long) = {
      val brand = ((id % 3).toInt: @unchecked) match {
        case 0 => "isom"; case 1 => "mp42"; case 2 => "qt  "
      }
      val ts = 600 * (1 + (id % 5).toInt)
      val dur = ts.toLong * (1 + id % 11) + id
      val full = Multimodal.syntheticMp4(brand, ts, dur,
        1 + (id % 3).toInt, (id % 2).toInt)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.take(20)
      else full
  }

  def q124_mp4(id: Long) = {
      val brand = ((id % 3).toInt: @unchecked) match {
        case 0 => "isom"; case 1 => "mp42"; case 2 => "qt  "
      }
      val ts = 600 * (1 + (id % 5).toInt)
      val full = Multimodal.syntheticMp4(brand, ts,
        ts.toLong * (1 + id % 11) + id, 1 + (id % 3).toInt,
        (id % 2).toInt, withSamples = true)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.take(20)
      else full
  }

  def q126_mp4(id: Long) = {
      val brand = ((id % 3).toInt: @unchecked) match {
        case 0 => "isom"; case 1 => "mp42"; case 2 => "qt  "
      }
      val ts = 600 * (1 + (id % 5).toInt)
      val full = Multimodal.syntheticMp4(brand, ts,
        ts.toLong * (1 + id % 11) + id, 1 + (id % 3).toInt,
        (id % 2).toInt, withSamples = true)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.take(20)
      else full
  }

  def q127_mp4(id: Long) = {
      val brand = ((id % 3).toInt: @unchecked) match {
        case 0 => "isom"; case 1 => "mp42"; case 2 => "qt  "
      }
      val ts = 600 * (1 + (id % 5).toInt)
      val full = Multimodal.syntheticMp4(brand, ts,
        ts.toLong * (1 + id % 11) + id, 1 + (id % 3).toInt,
        (id % 2).toInt, withSamples = true)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.take(20)
      else full
  }

  def q130_png(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else Multimodal.syntheticGrayPng(
        30 + (id % 5).toInt * 7, 26 + (id % 3).toInt * 9, id)
  }

  def q131_png(id: Long) = {
      val base = id % 200000
      val w = 30 + (base % 5).toInt * 7
      val h = 26 + (base % 3).toInt * 9
      Multimodal.syntheticGrayPng(w, h, base,
        tweakMod = if (id >= 200000) 31 else 0)
  }

  def q132_mp4(id: Long) = {
      val brand = ((id % 3).toInt: @unchecked) match {
        case 0 => "isom"; case 1 => "mp42"; case 2 => "qt  "
      }
      val ts = 600 * (1 + (id % 5).toInt)
      val full = Multimodal.syntheticMp4(brand, ts,
        ts.toLong * (1 + id % 11) + id, 1 + (id % 3).toInt,
        (id % 2).toInt, withSamples = true)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.take(20)
      else full
  }

  def q133_png(id: Long) = {
      val base = if (id >= 50) id - 50 else id
      Multimodal.syntheticGrayPng(
        30 + (base % 5).toInt * 7, 26 + (base % 3).toInt * 9, base,
        tweakMod = if (id >= 50) 31 else 0)
  }

  def q134_png(id: Long) = {
      val base = id % 200000
      Multimodal.syntheticGrayPng(
        30 + (base % 5).toInt * 7, 26 + (base % 3).toInt * 9, base,
        tweakMod = if (id >= 200000) 31 else 0)
  }

  def q136_png(id: Long) = {
      val base = if (id >= 200000) id - 200000 else id % 24
      Multimodal.syntheticGrayPng(
        30 + (base % 5).toInt * 7, 26 + (base % 3).toInt * 9, base,
        tweakMod = if (id >= 200000) 31 else 0)
  }

  def q137_png(id: Long) = {
      val base = id % 1000000
      Multimodal.syntheticGrayPng(
        30 + (base % 5).toInt * 7, 26 + (base % 3).toInt * 9, base,
        tweakMod = if (id >= 1000000) 31 else 0)
  }

  def q138_png(id: Long) = {
      val base = id % 24
      if (id % 41 == 0) Array.empty[Byte]
      else Multimodal.syntheticGrayPng(
        30 + (base % 5).toInt * 7, 26 + (base % 3).toInt * 9, base)
  }

  def q140_png(id: Long) = {
      if (id % 41 == 0) Array.empty[Byte]
      else Multimodal.syntheticGrayPng(
        30 + (id % 5).toInt * 7, 26 + (id % 3).toInt * 9, id)
  }

  def q141_mp4(id: Long) = {
      val brand = ((id % 3).toInt: @unchecked) match {
        case 0 => "isom"; case 1 => "mp42"; case 2 => "qt  "
      }
      val ts = 600 * (1 + (id % 5).toInt)
      val full = Multimodal.syntheticMp4(brand, ts,
        ts.toLong * (1 + id % 11) + id, 1 + (id % 3).toInt,
        (id % 2).toInt, withSamples = true, useCo64 = id % 4 >= 2)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.take(20)
      else full
  }

  def q142_mp4(id: Long) = {
      val brand = ((id % 3).toInt: @unchecked) match {
        case 0 => "isom"; case 1 => "mp42"; case 2 => "qt  "
      }
      val ts = 600 * (1 + (id % 5).toInt)
      val full = Multimodal.syntheticMp4(brand, ts,
        ts.toLong * (1 + id % 11) + id, 1 + (id % 3).toInt,
        (id % 2).toInt, withSamples = true, useCo64 = id % 4 >= 2,
        withCtts = true)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.take(20)
      else full
  }

  def q151_mp4(id: Long) = {
      val brand = ((id % 3).toInt: @unchecked) match {
        case 0 => "isom"; case 1 => "mp42"; case 2 => "qt  "
      }
      val ts = 600 * (1 + (id % 5).toInt)
      val full = Multimodal.syntheticMp4(brand, ts,
        ts.toLong * (1 + id % 11) + id, 1 + (id % 3).toInt,
        (id % 2).toInt, withSamples = true, withCtts = true,
        fragmented = (id % 3).toInt, withEmptyEdit = true)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.take(20)
      else full
  }

  def q146_mp4(id: Long) = {
      val brand = ((id % 3).toInt: @unchecked) match {
        case 0 => "isom"; case 1 => "mp42"; case 2 => "qt  "
      }
      val full = Multimodal.syntheticMp4(brand, 600, 600L + id % 7,
        1 + ((id / 3) % 3).toInt, (id % 2).toInt, withSamples = true,
        useCo64 = id % 4 >= 2, withCtts = true,
        fragmented = (id % 3).toInt)
      if (id % 41 == 0) Array.empty[Byte]
      else if (id % 37 == 0) full.take(20)
      else full
  }

  def q148_png(id: Long) = {
      val base = id % 200000
      Multimodal.syntheticGrayPng(
        34 + (base % 4).toInt * 6, 33 + (base % 3).toInt * 9, base,
        tweakMod = if (id >= 200000) 3 else 0)
  }
}
