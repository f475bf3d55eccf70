package graft

import graft.api.{DedupOptions, Deduplicator}
import graft.sources.ChunkSource
import java.nio.file.{Files, Paths}

/** The splittable single-huge-file scan path (SURVEY §2.1 S1 scale note;
  * reference analog: lazy stream at lib/deduplicator/files.ex:45-56).
  */
class HugeFileSpec extends SparkFunSuite {

  test("chunksOfHugeFile: multi-task scan equals the whole-file splitter, tail preserved") {
    val dir = tempDir("huge-eq")
    // 1 MiB + 37-byte tail: exercises the dropped-trailing-record fix
    val data = Fixtures.highEntropy(1024 * 1024 + 37, seed = 11)
    val path = Fixtures.writeTemp(dir, "blob.bin", data)
    val viaRecords = ChunkSource.chunksOfHugeFile(spark, s"file:$path",
      data.length.toLong, 4096)
      .orderBy("pos").collect()
    val expected = ChunkSource.split(data, 4096)
    assert(viaRecords.length == expected.length)
    viaRecords.zip(expected).foreach { case (row, exp) =>
      assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("chunk"), exp))
    }
    // reassembly invariant: concat == original
    val concat = viaRecords.flatMap(_.getAs[Array[Byte]]("chunk"))
    assert(java.util.Arrays.equals(concat, data))
  }

  test("single >256MB file: huge path engages, splits into many tasks, round-trips") {
    val dir = tempDir("huge-rt")
    // 260 MiB + odd tail; mostly-duplicate blocks so the encoded output
    // (and this test's disk/time cost) stays small
    val block = Fixtures.highEntropy(1 << 20, seed = 5)
    val out = Paths.get(dir, "big.bin")
    val ch = Files.newOutputStream(out)
    try {
      (0 until 260).foreach(_ => ch.write(block))
      ch.write(Array.fill(12345)(7.toByte))
    } finally ch.close()
    val len = Files.size(out)
    assert(len > ChunkSource.HugeFileThreshold)

    val df = ChunkSource.chunks(spark, out.toString, 1 << 16)
    assert(df.rdd.getNumPartitions > 1,
      s"huge file must split into >1 task, got ${df.rdd.getNumPartitions}")
    assert(df.count() == (len + (1 << 16) - 1) / (1 << 16))

    val engine = new Deduplicator(spark, s"$dir/work")
    val res = engine.deduplicateFile(out.toString,
      DedupOptions(chunkBytes = 1 << 16))
    assert(res.pointers > res.chunks / 2, s"expected heavy dedup, got $res")
    val rec = s"$dir/recovered.bin"
    engine.recoverFile(res.outputName, rec)
    assert(Files.size(Paths.get(rec)) == len)
    // byte equality, streamed (don't hold two 260MB arrays via assert diff)
    val a = Files.newInputStream(out); val b = Files.newInputStream(Paths.get(rec))
    try {
      val ba = new Array[Byte](1 << 20); val bb = new Array[Byte](1 << 20)
      var same = true
      var na = a.readNBytes(ba, 0, ba.length)
      var nb = b.readNBytes(bb, 0, bb.length)
      while (same && na > 0) {
        same = na == nb && java.util.Arrays.equals(ba, 0, na, bb, 0, nb)
        na = a.readNBytes(ba, 0, ba.length)
        nb = b.readNBytes(bb, 0, bb.length)
      }
      assert(same && na <= 0 && nb <= 0, "recovered bytes differ")
    } finally { a.close(); b.close() }
  }
}
