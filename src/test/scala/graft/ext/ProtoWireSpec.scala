package graft.ext

import graft.SparkFunSuite

class ProtoWireSpec extends SparkFunSuite {

  test("round-trip: all four wire types, repeated fields, appearance order") {
    val msg = new ProtoWire.MsgBuilder()
      .addVarint(1, 300)
      .addBytes(2, Array[Byte](1, 2, 3, 4, 5))
      .addVarint(1, 700)          // repeated
      .addFixed32(3, 0xDEADL)
      .addFixed64(4, 0x1122334455L)
      .addBytes(2, Array[Byte](9))
      .bytes
    val Right(fs) = ProtoWire.protoFieldTable(msg): @unchecked
    assert(fs == Seq(
      ProtoWire.ProtoField(1, 0, 2, 1000L),
      ProtoWire.ProtoField(2, 2, 2, 6L), // total LENGTH, content opaque
      ProtoWire.ProtoField(3, 5, 1, 0xDEADL),
      ProtoWire.ProtoField(4, 1, 1, 0x1122334455L)))
    assert(ProtoWire.protoFieldTable(Array.empty[Byte]) == Right(Seq()))
  }

  test("typed rejects: groups, reserved types, truncations, bad lengths") {
    def raw(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
    // field 1, wire type 3 (SGROUP)
    assert(ProtoWire.protoFieldTable(raw(0x0B)) ==
      Left("deprecated group wire type"))
    // field 1, wire type 6 (reserved)
    assert(ProtoWire.protoFieldTable(raw(0x0E)) == Left("reserved wire type"))
    // field 0 is invalid
    assert(ProtoWire.protoFieldTable(raw(0x00, 0x01)) ==
      Left("bad field number"))
    // length-delimited running past the message
    assert(ProtoWire.protoFieldTable(raw(0x0A, 0x7F, 1, 2)) ==
      Left("length out of bounds"))
    // truncated fixed32 / fixed64 / varint
    assert(ProtoWire.protoFieldTable(raw(0x0D, 1, 2)) ==
      Left("truncated fixed32"))
    assert(ProtoWire.protoFieldTable(raw(0x09, 1, 2, 3)) ==
      Left("truncated fixed64"))
    assert(ProtoWire.protoFieldTable(raw(0x08, 0x80)) ==
      Left("bad varint value"))
    // an 11-byte varint key
    assert(ProtoWire.protoFieldTable(Array.fill[Byte](11)(0x80.toByte)) ==
      Left("bad field key"))
    // truncation totality over a real message
    val msg = new ProtoWire.MsgBuilder().addVarint(1, 12345)
      .addBytes(2, Array.fill[Byte](40)(3)).addFixed64(9, -1L).bytes
    (0 to msg.length).foreach(k => ProtoWire.protoFieldTable(msg.take(k)))
  }

  test("composition: TFRecord payloads flow into the field walk byte-faithfully") {
    val s = spark
    import s.implicits._
    val msgs = (0 until 3).map { k =>
      new ProtoWire.MsgBuilder()
        .addVarint(1, 100L + k)
        .addBytes(2, Array.fill[Byte](10 + k)(5))
        .bytes
    }
    val shard = TfRecord.buildTfRecord(msgs)
    val df = Seq((1L, shard)).toDF("doc_id", "blob")
    val rows = ProtoWire.protoFields(
        TfRecord.extractTfRecordPayloads(df, "blob"), "payload")
      .orderBy("rec_idx", "field_no")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      (0, 1, 0, 1L, 100L), (0, 2, 2, 1L, 10L),
      (1, 1, 0, 1L, 101L), (1, 2, 2, 1L, 11L),
      (2, 1, 0, 1L, 102L), (2, 2, 2, 1L, 12L)))
  }
}
