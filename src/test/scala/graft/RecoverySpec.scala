package graft

import graft.api.{DedupOptions, Deduplicator}
import graft.operators.Recovery
import java.nio.file.{Files, Paths}

class RecoverySpec extends SparkFunSuite {

  test(":not_chunk — a pointer to a non-raw record fails loudly in one pass") {
    val s = spark; import s.implicits._
    // run 1's encoded stream: pos 0 raw, pos 1 pointer to line 0 (fine),
    // pos 2 pointer to line 1 — which is itself a pointer → :not_chunk
    val enc = Seq(
      (0L, false, "abcd".getBytes: Array[Byte], Option.empty[Long], Option.empty[Long]),
      (1L, true, null.asInstanceOf[Array[Byte]], Some(0L), Option.empty[Long]),
      (2L, true, null.asInstanceOf[Array[Byte]], Some(1L), Option.empty[Long])
    ).toDF("pos", "is_pointer", "chunk", "ref_line", "cat_file_id")
    val resolved = Recovery.resolve(enc, thisFileId = 1L, encodedFor = _ => enc)
    val e = intercept[Exception] { resolved.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("not_chunk")),
      s"expected :not_chunk in error chain, got: ${messages(e)}")
  }

  test("empty input file round-trips to an empty output") {
    val dir = tempDir("rt-empty")
    val input = Fixtures.writeTemp(dir, "empty.bin", Array.emptyByteArray)
    val engine = new Deduplicator(spark, s"$dir/work")
    val res = engine.deduplicateFile(input, DedupOptions(chunkBytes = 64))
    assert(res.chunks == 0 && res.pointers == 0)
    val out = s"$dir/recovered"
    engine.recoverFile(res.outputName, out)
    assert(Files.size(Paths.get(out)) == 0)
  }

  test("single-chunk file (shorter than chunk size) round-trips") {
    val dir = tempDir("rt-tiny")
    val data = "tiny".getBytes
    val input = Fixtures.writeTemp(dir, "tiny.bin", data)
    val engine = new Deduplicator(spark, s"$dir/work")
    val res = engine.deduplicateFile(input, DedupOptions(chunkBytes = 64))
    assert(res.chunks == 1)
    val out = s"$dir/recovered"
    engine.recoverFile(res.outputName, out)
    assert(java.util.Arrays.equals(Files.readAllBytes(Paths.get(out)), data))
  }
}
