package graft.ext

import graft.SparkFunSuite

class MatroskaSpec extends SparkFunSuite {
  import Matroska._

  test("syntheticWebm: known-size and unknown-size containers yield identical samples") {
    (0L until 24L).foreach { id =>
      val Right((scaleK, known)) =
        webmSampleTable(syntheticWebm(id, forceUnknown = 0)): @unchecked
      val Right((scaleU, unknown)) =
        webmSampleTable(syntheticWebm(id, forceUnknown = 1)): @unchecked
      assert(scaleK == scaleU)
      assert(known == unknown, s"id=$id")
      assert(known.nonEmpty)
      // fixture arithmetic spot checks
      val nt = 1 + ((id / 3) % 3).toInt
      val nclu = 2 + (id % 3).toInt
      assert(known.length == nt * nclu)
      known.foreach { sm =>
        val d = sm.trackId.toInt
        val c = sm.sampleIdx
        assert(sm.trackType == (if (d % 2 == 1) 1 else 2))
        assert(sm.codecId == (if (d % 2 == 1) s"V_TEST$d" else s"A_TEST$d"))
        assert(sm.tsTicks == c * 1000L + (id % 7) * 10 + 10 * d + c)
        assert(sm.isKey == ((d + c) % 2 == 0))
        val size = 8 + ((d * 7 + c * 5 + id) % 9).toInt
        assert(sm.size == size)
        assert(sm.payloadSum == size.toLong * ((d * 31 + c * 17 + id) % 251))
      }
    }
  }

  test("negative relative block timestamps decode as signed int16") {
    val ebml = elem(IdEbml, Array[Byte]())
    val tracksEl = elem(IdTracks, elem(IdTrackEntry,
      elem(IdTrackNumber, uintPayload(1L)) ++
      elem(IdTrackType, uintPayload(1L)) ++
      elem(IdCodecId, "V_T".getBytes("ISO-8859-1"))))
    val clu = elem(IdCluster,
      elem(IdTimestamp, uintPayload(5000L)) ++
      buildSimpleBlock(1L, -300, key = true, Array[Byte](1, 2, 3)))
    val doc = ebml ++ elem(IdSegment, tracksEl ++ clu)
    val Right((_, ss)) = webmSampleTable(doc): @unchecked
    assert(ss.length == 1 && ss.head.tsTicks == 4700L)
    assert(ss.head.payloadSum == 6L && ss.head.size == 3)
  }

  test("truncation totality: every prefix yields a typed result, never throws") {
    Seq(6L, 7L).foreach { id => // one known-size, one unknown-size
      val full = syntheticWebm(id)
      (0 to full.length).foreach { k =>
        webmSampleTable(full.take(k)) match {
          case Left(_) => ()
          case Right((_, ss)) =>
            // unknown-size modes accept element-boundary prefixes
            assert(ss.length <= (1 + ((id / 3) % 3).toInt) * (2 + (id % 3).toInt))
        }
      }
    }
  }

  test("malformed blobs: distinct typed reasons") {
    val ebml = elem(IdEbml, Array[Byte]())
    def seg(body: Array[Byte]) = ebml ++ elem(IdSegment, body)
    val track1 = elem(IdTracks, elem(IdTrackEntry,
      elem(IdTrackNumber, uintPayload(1L)) ++
      elem(IdTrackType, uintPayload(1L))))
    assert(webmSampleTable(null) == Left("empty blob"))
    assert(webmSampleTable(Array.empty[Byte]) == Left("empty blob"))
    assert(webmSampleTable("RIFF....".getBytes("ISO-8859-1"))
      == Left("not an EBML stream"))
    assert(webmSampleTable(ebml) == Left("truncated element id"))
    assert(webmSampleTable(ebml ++ elem(IdInfo, Array[Byte]()))
      == Left("no segment"))
    // a segment with no Tracks element
    assert(webmSampleTable(seg(Array[Byte]())) == Left("no tracks"))
    // unknown-size on a non-Segment/Cluster element is rejected
    assert(webmSampleTable(seg(elemUnknown(IdTracks, track1)))
      == Left("unknown-size element"))
    // laced block whose EBML size VINT overruns the block
    val lacedBad = {
      val head = vintSize(1L) ++ Array[Byte](0, 0, 0x06.toByte, 9, 9)
      seg(track1 ++ elem(IdCluster,
        elem(IdTimestamp, uintPayload(0L)) ++ elem(IdSimpleBlock, head)))
    }
    assert(webmSampleTable(lacedBad) == Left("truncated vint"))
    // fixed lacing whose payload does not divide by the frame count
    val fixedBad = {
      val head = vintSize(1L) ++ Array[Byte](0, 0, 0x04.toByte,
        2, 1, 2, 3, 4) // 3 frames, 4 payload bytes
      seg(track1 ++ elem(IdCluster,
        elem(IdTimestamp, uintPayload(0L)) ++ elem(IdSimpleBlock, head)))
    }
    assert(webmSampleTable(fixedBad) == Left("bad fixed lacing"))
    // Xiph sizes claiming more than the block holds
    val xiphBad = {
      val head = vintSize(1L) ++ Array[Byte](0, 0, 0x02.toByte,
        1, 60, 1, 2) // 2 frames, first size 60 > remaining
      seg(track1 ++ elem(IdCluster,
        elem(IdTimestamp, uintPayload(0L)) ++ elem(IdSimpleBlock, head)))
    }
    assert(webmSampleTable(xiphBad) == Left("bad lace sizes"))
    // block referencing a track the Tracks element never declared
    val orphan = seg(track1 ++ elem(IdCluster,
      buildSimpleBlock(2L, 0, key = false, Array[Byte](1))))
    assert(webmSampleTable(orphan) == Left("block for unknown track"))
    // a TrackEntry without a TrackNumber
    assert(webmSampleTable(seg(
      elem(IdTracks, elem(IdTrackEntry, elem(IdTrackType, uintPayload(1L))))))
      == Left("track without number"))
    // element size overrunning the segment
    val overrun = ebml ++ elem(IdSegment,
      idBytes(IdTracks) ++ vintSize(1000L))
    assert(webmSampleTable(overrun) == Left("truncated element"))
  }

  test("lacing: all four carriage modes yield identical samples; varying sizes through Xiph and EBML") {
    // gate-shape: equal-size frames, every mode
    (0L until 12L).foreach { id =>
      val base = webmSampleTable(syntheticWebmLaced(id, 0))
      assert(base.isRight, s"id=$id mode=0")
      (1 to 3).foreach { mode =>
        assert(webmSampleTable(syntheticWebmLaced(id, mode)) == base,
          s"id=$id mode=$mode")
      }
      val Right((_, ss)) = base: @unchecked
      assert(ss.length == (2 + (id % 3).toInt) * 3)
      ss.foreach { sm =>
        val c = sm.sampleIdx / 3; val f = sm.sampleIdx % 3
        assert(sm.size == 8 + ((id + c) % 9).toInt)
        assert(sm.tsTicks == c * 1000L + (id % 7) * 10 + 5)
        assert(sm.isKey == (c % 2 == 0))
        assert(sm.payloadSum ==
          sm.size.toLong * ((id + c * 17 + f * 31) % 251))
      }
    }
    // varying frame sizes (legal for Xiph and EBML, incl. >255-byte
    // Xiph runs and negative EBML deltas)
    val frames = Seq(300, 7, 120, 45).map(n =>
      Array.tabulate[Byte](n)(i => (i % 97).toByte))
    val ebml = elem(IdEbml, Array[Byte]())
    val tracksEl = elem(IdTracks, elem(IdTrackEntry,
      elem(IdTrackNumber, uintPayload(1L)) ++
      elem(IdTrackType, uintPayload(2L))))
    Seq(1, 3).foreach { mode =>
      val doc = ebml ++ elem(IdSegment, tracksEl ++ elem(IdCluster,
        elem(IdTimestamp, uintPayload(0L)) ++
        buildSimpleBlockLaced(1L, 0, key = true, frames, mode)))
      val Right((_, ss)) = webmSampleTable(doc): @unchecked
      assert(ss.map(_.size) == Seq(300, 7, 120, 45), s"mode=$mode")
      assert(ss.map(_.sampleIdx) == Seq(0, 1, 2, 3))
      ss.zip(frames).foreach { case (sm, f) =>
        assert(sm.payloadSum == f.map(_ & 0xFF).map(_.toLong).sum)
      }
    }
  }

  test("BlockGroup carriage: samples identical to SimpleBlocks; keyness from ReferenceBlock absence") {
    (0L until 12L).foreach { id =>
      val simple = webmSampleTable(syntheticWebmGrouped(id, useGroups = false))
      val grouped = webmSampleTable(syntheticWebmGrouped(id, useGroups = true))
      assert(simple.isRight && simple == grouped, s"id=$id")
      val Right((_, ss)) = simple: @unchecked
      ss.foreach { sm =>
        val c = sm.sampleIdx / 3; val f = sm.sampleIdx % 3
        assert(sm.isKey == ((c + f) % 2 == 0))
      }
    }
    // a BlockGroup with no Block child is malformed
    val ebml = elem(IdEbml, Array[Byte]())
    val track1 = elem(IdTracks, elem(IdTrackEntry,
      elem(IdTrackNumber, uintPayload(1L)) ++
      elem(IdTrackType, uintPayload(1L))))
    val noBlock = ebml ++ elem(IdSegment, track1 ++ elem(IdCluster,
      elem(IdTimestamp, uintPayload(0L)) ++
      elem(IdBlockGroup, elem(IdReferenceBlock, Array(0xFF.toByte)))))
    assert(webmSampleTable(noBlock) == Left("block group without block"))
  }

  test("extractWebmSampleBytes: frame bytes round-trip caller payloads; digest form agrees") {
    val s = spark; import s.implicits._
    val frames = (0 until 5).map(j => Array.tabulate[Byte](7 + j)(i =>
      ((j * 31 + i) & 0xFF).toByte))
    val doc = syntheticWebmMedia(frames, "V_PNG", unknownSize = true)
    val df = Seq((1L, doc)).toDF("id", "blob")
    val rows = extractWebmSampleBytes(df, "blob")
      .orderBy("sample_idx").collect()
    assert(rows.length == 5 && rows.forall(_.getAs[Boolean]("is_key")))
    rows.zipWithIndex.foreach { case (r, j) =>
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]]("frame"), frames(j)), s"frame $j")
    }
    // byte form and digest form describe the same samples
    val sums = extractWebmSamples(df, "blob").orderBy("sample_idx")
      .collect().map(r =>
        (r.getAs[Int]("sample_idx"), r.getAs[Int]("sample_size"),
          r.getAs[Long]("payload_sum")))
    assert(sums.toSeq == frames.zipWithIndex.map { case (f, j) =>
      (j, f.length, f.map(_ & 0xFF).map(_.toLong).sum) })
  }

  test("extractWebmSamples/webmErrors: poison -> zero rows + typed error") {
    val s = spark; import s.implicits._
    val good = syntheticWebm(4) // known-size, 2 tracks, 3 clusters
    val df = Seq(
      (1L, good),
      (2L, good.dropRight(2)),
      (3L, Array.empty[Byte])
    ).toDF("id", "blob")
    val rows = extractWebmSamples(df, "blob").collect()
    assert(rows.forall(_.getAs[Long]("id") == 1L) && rows.length == 6)
    assert(rows.forall(_.getAs[Long]("ts_scale") == 2000000L)) // 4%5==4
    val errs = webmErrors(df, "blob").orderBy("id").collect()
    assert(errs.map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("ok"))).toSeq
      == Seq((1L, true), (2L, false), (3L, false)))
    assert(errs(0).getAs[Int]("n_samples") == 6)
    assert(errs(2).getAs[String]("error") == "empty blob")
  }
}
