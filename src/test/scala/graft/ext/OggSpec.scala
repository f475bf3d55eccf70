package graft.ext

import graft.SparkFunSuite

class OggSpec extends SparkFunSuite {
  import Ogg._

  test("syntheticOgg: packet table matches the fixture arithmetic; spanning reassembly exact") {
    var spanning = 0
    // 40..55: id*7 pushes (id*7 + j*13) % 500 past 300 regularly, so
    // the cross-page path is exercised; 0..15 stays under it
    ((0L until 8L) ++ (40L until 56L)).foreach { id =>
      val Right(ps) = oggPacketTable(syntheticOgg(id)): @unchecked
      assert(ps.length == 4 + (id % 4).toInt)
      var cumPages = 0
      ps.zipWithIndex.foreach { case (pk, j) =>
        val size = 30 + ((id * 7 + j * 13) % 500).toInt
        val fill = ((id + j * 37) % 251).toInt
        cumPages += (if (size > 300) 2 else 1)
        assert(pk.serial == id && pk.packetIdx == j)
        assert(pk.size == size)
        assert(pk.payloadSum == size.toLong * fill)
        assert(pk.spansPages == (size > 300))
        assert(pk.granule == cumPages * 1000L + id % 7)
        if (pk.spansPages) spanning += 1
      }
    }
    assert(spanning > 10) // the cross-page path is exercised broadly
  }

  test("CRC: one flipped payload bit is a typed reject") {
    val full = syntheticOgg(3)
    val bad = full.clone()
    bad(full.length - 1) = (bad(full.length - 1) ^ 0x01).toByte
    assert(oggPacketTable(bad) == Left("page crc mismatch"))
    // and a flipped header bit too (serial byte)
    val bad2 = full.clone()
    bad2(14) = (bad2(14) ^ 0x40).toByte
    assert(oggPacketTable(bad2) == Left("page crc mismatch"))
  }

  test("truncation totality: every prefix yields a typed result, never throws") {
    val full = syntheticOgg(5)
    var lefts = 0
    (0 to full.length).foreach { k =>
      oggPacketTable(full.take(k)) match {
        case Left(_) => lefts += 1
        case Right(ps) => assert(ps.nonEmpty) // page-boundary prefixes
      }
    }
    assert(lefts > full.length / 2)
  }

  test("continuation discipline and lacing terminators") {
    // a lone continuation page with no open packet
    val orphan = buildOggPage(0x01, 0L, 9L, 0L, Seq(10),
      new Array[Byte](10))
    assert(oggPacketTable(orphan) == Left("orphan continuation"))
    // a page leaves a packet open; the next page does not continue it
    val p0 = buildOggPage(0x02, 0L, 9L, 0L, Seq(255),
      new Array[Byte](255))
    val p1 = buildOggPage(0x04, 0L, 9L, 1L, Seq(10),
      new Array[Byte](10))
    assert(oggPacketTable(p0 ++ p1) == Left("missing continuation"))
    // a stream ending with an open packet
    assert(oggPacketTable(p0) == Left("unterminated packet"))
    // a packet of exactly 255 bytes needs its explicit 0 lace
    val exact = buildOggPage(0x06, 0L, 9L, 0L, Seq(255, 0),
      new Array[Byte](255))
    val Right(one) = oggPacketTable(exact): @unchecked
    assert(one.length == 1 && one.head.size == 255 && !one.head.spansPages)
    // ...and a 255 lace with EOS-but-no-terminator stays open
    assert(oggPacketTable(buildOggPage(0x06, 0L, 9L, 0L, Seq(255),
      new Array[Byte](255))) == Left("unterminated packet"))
    // garbage prefix
    assert(oggPacketTable("not an ogg stream at all....".getBytes("ISO-8859-1"))
      == Left("bad capture pattern"))
    assert(oggPacketTable(Array.empty[Byte]) == Left("empty blob"))
  }

  test("extractOggPackets/oggErrors: poison -> zero rows + typed error") {
    val s = spark; import s.implicits._
    val good = syntheticOgg(6) // 6 packets
    val df = Seq(
      (1L, good),
      (2L, good.dropRight(1)),
      (3L, Array.empty[Byte])
    ).toDF("id", "blob")
    val rows = extractOggPackets(df, "blob").collect()
    assert(rows.forall(_.getAs[Long]("id") == 1L) && rows.length == 6)
    val errs = oggErrors(df, "blob").orderBy("id").collect()
    assert(errs.map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("ok"))).toSeq
      == Seq((1L, true), (2L, false), (3L, false)))
    assert(errs(0).getAs[Int]("n_packets") == 6)
    assert(errs(2).getAs[String]("error") == "empty blob")
  }

  test("codec id: OpusHead/Vorbis fields round-trip; unknown surfaces with nulls") {
    val op = opusHeadPacket(channels = 2, preSkip = 312, rate = 48000L)
    val vo = vorbisIdPacket(channels = 6, rate = 44100L)
    val junk = Array.tabulate(24)(i => (i * 7 % 251).toByte)
    val blob =
      buildOggPage(0x02, 0L, 11L, 0L, lacesFor(op.length), op) ++
      buildOggPage(0x02, 0L, 22L, 0L, lacesFor(vo.length), vo) ++
      buildOggPage(0x02, 0L, 33L, 0L, lacesFor(junk.length), junk) ++
      buildOggPage(0x04, 1L, 11L, 1L, lacesFor(3), Array[Byte](1, 2, 3)) ++
      buildOggPage(0x04, 1L, 22L, 1L, lacesFor(3), Array[Byte](1, 2, 3)) ++
      buildOggPage(0x04, 1L, 33L, 1L, lacesFor(3), Array[Byte](1, 2, 3))
    val Right(cs) = oggStreamCodecs(blob): @unchecked
    assert(cs.sortBy(_.serial) == Seq(
      OggCodec(11L, "opus", Some(2), Some(48000L), Some(312)),
      OggCodec(22L, "vorbis", Some(6), Some(44100L), None),
      OggCodec(33L, "unknown", None, None, None)))
  }

  test("codec id typed rejects: spanning id header, duplicate bos, crc poison") {
    // an id header that does NOT terminate on its BOS page (open 255 run)
    val spanning = buildOggPage(0x02, 0L, 5L, 0L, Seq(255),
      new Array[Byte](255))
    assert(oggStreamCodecs(spanning) == Left("id header spans pages"))
    val op = opusHeadPacket(1, 0, 48000L)
    val bos = buildOggPage(0x02, 0L, 7L, 0L, lacesFor(op.length), op)
    assert(oggStreamCodecs(bos ++ bos) == Left("duplicate bos"))
    val flipped = bos.clone()
    flipped(flipped.length - 1) = (flipped.last ^ 1).toByte
    assert(oggStreamCodecs(flipped) == Left("crc mismatch"))
    assert(oggStreamCodecs(Array.empty[Byte]) == Left("empty blob"))
    // truncation totality
    (0 to bos.length).foreach(k => oggStreamCodecs(bos.take(k)))
  }
}
