package graft

import graft.sources.{BinFormat, ChunkSource}
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.apache.spark.sql.functions.col

/** Chunker invariants — mirrors reference test/deduplicator_test.exs:25-47:
  * every chunk ≤ n bytes; concatenation reproduces the input exactly.
  */
class ChunkSourceSpec extends SparkFunSuite {

  test("split invariants hold for arbitrary inputs (ScalaCheck)") {
    val gen = for {
      n <- Gen.choose(1, 257)
      len <- Gen.choose(0, 4096)
      bytes <- Gen.containerOfN[Array, Byte](len, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (n, bytes)
    val prop = Prop.forAll(gen) { case (n, bytes) =>
      val chunks = ChunkSource.split(bytes, n)
      chunks.forall(_.length <= n) &&
        chunks.dropRight(1).forall(_.length == n) &&
        java.util.Arrays.equals(chunks.toArray.flatten, bytes)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("chunks() yields ordered (pos, chunk) rows that reassemble the file") {
    val dir = tempDir("chunksrc")
    val data = Fixtures.naturalText()
    val path = Fixtures.writeTemp(dir, "text.txt", data)
    val df = ChunkSource.chunks(spark, path, 8)
    val rows = df.orderBy("pos").collect()
    assert(rows.map(_.getAs[Long]("pos")).toSeq == rows.indices.map(_.toLong))
    val reassembled = rows.flatMap(_.getAs[Array[Byte]]("chunk"))
    assert(java.util.Arrays.equals(reassembled, data))
    assert(rows.forall(_.getAs[Array[Byte]]("chunk").length <= 8))
  }

  test("many-files chunking runs through the ChunkExplode Generator " +
    "(no UDF, no intermediate array) and matches split() exactly") {
    val dir = tempDir("chunkgen")
    val rnd = new scala.util.Random(11)
    val files = (0 until 3).map { i =>
      val data = Array.fill(100 + 13 * i)(rnd.nextInt(256).toByte)
      (Fixtures.writeTemp(dir, s"f$i.bin", data), data)
    }
    val df = ChunkSource.chunksOfFiles(spark, files.map(_._1), 16)
    // plan shape: a Generate node driving ChunkExplode, and NO
    // ScalaUDF anywhere — the generator replaced the udf+posexplode
    val plan = df.queryExecution.optimizedPlan
    val nodes = plan.collect { case p => p }
    assert(nodes.exists(_.expressions.exists(_.exists(
      _.isInstanceOf[graft.sources.ChunkExplode]))),
      s"expected ChunkExplode in the plan:\n$plan")
    assert(!nodes.exists(_.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF]))),
      s"UDF survived in the plan:\n$plan")
    // row-level parity with the pure splitter, per file
    files.foreach { case (path, data) =>
      val got = df.where(col("file").endsWith(
          new java.io.File(path).getName))
        .orderBy("pos").collect()
        .map(_.getAs[Array[Byte]]("chunk"))
      val want = ChunkSource.split(data, 16)
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) =>
        assert(java.util.Arrays.equals(g, w)) }
    }
    // empty file yields zero rows (split() parity)
    val empty = Fixtures.writeTemp(dir, "empty.bin", Array.emptyByteArray)
    assert(ChunkSource.chunksOfFiles(spark, Seq(empty), 16).isEmpty)
  }

  test("tagged .bin stream encode/parse round-trips for arbitrary record mixes (ScalaCheck)") {
    val recGen = for {
      isPtr <- Gen.oneOf(true, false)
      line <- Gen.choose(0L, 9999L)
      chunk <- Gen.nonEmptyContainerOf[Array, Byte](
        Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (isPtr, chunk.take(8), line)
    val prop = Prop.forAll(Gen.nonEmptyListOf(recGen)) { recs =>
      // a trailing short RAW record is legal (last chunk of a file);
      // mid-stream short records are not — pad all but the last raw rec
      val normalized = recs.zipWithIndex.map {
        case ((false, c, l), i) if i < recs.size - 1 =>
          (false, c.padTo(8, 0.toByte), l)
        case (r, _) => r
      }
      val bytes = normalized.flatMap { case (p, c, l) =>
        BinFormat.encodeRecord(p, c, l)
      }.toArray
      val parsed = BinFormat.parse(bytes, 8)
      parsed.size == normalized.size &&
        parsed.zip(normalized).forall { case ((pos, isPtr, chunk, ref), (p, c, l)) =>
          isPtr == p &&
            (if (p) ref.contains(l)
             else java.util.Arrays.equals(chunk, c))
        }
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("pointer lines beyond the 4-digit cap fail loudly") {
    intercept[IllegalArgumentException] {
      BinFormat.encodeRecord(isPointer = true, Array.emptyByteArray, 10000L)
    }
  }

  test("tagged .bin record encode/parse round-trips") {
    val raw = BinFormat.encodeRecord(isPointer = false, "abcdefgh".getBytes, 0L)
    val ptr = BinFormat.encodeRecord(isPointer = true, Array.emptyByteArray, 42L)
    assert(new String(raw) == "0abcdefgh")
    assert(new String(ptr) == "10042")
    val parsed = BinFormat.parse(raw ++ ptr ++ raw, 8)
    assert(parsed.map(t => (t._1, t._2, t._4)) ==
      Seq((0L, false, None), (1L, true, Some(42L)), (2L, false, None)))
    assert(new String(parsed(0)._3) == "abcdefgh")
  }
}
