package graft.ext

import graft.SparkFunSuite

class ArrowIpcSpec extends SparkFunSuite {

  test("interop: apache arrow-java writer output walks correctly") {
    val b = ArrowIpc.buildArrowFile(rows = 7, batchRows = 3, seed = 42)
    val Right(m) = ArrowIpc.parseArrow(b): @unchecked
    assert(m.fields.map(f => (f.name, f.tpe, f.nullable)) ==
      Seq(("id", "int", false), ("txt", "utf8", true)))
    assert(m.nBatches == 3 && m.nRows == 7L && m.nDicts == 0)
    assert(m.bodyBytes > 0)
    // three-field variant
    val b2 = ArrowIpc.buildArrowFile(rows = 4, batchRows = 4, seed = 1,
      withScore = true)
    val Right(m2) = ArrowIpc.parseArrow(b2): @unchecked
    assert(m2.fields.map(_.name) == Seq("id", "txt", "score"))
    assert(m2.fields.map(_.tpe) == Seq("int", "utf8", "floatingpoint"))
    assert(m2.nBatches == 1 && m2.nRows == 4L)
  }

  test("empty file (zero batches) still yields schema") {
    val b = ArrowIpc.buildArrowFile(rows = 0, batchRows = 5, seed = 9)
    val Right(m) = ArrowIpc.parseArrow(b): @unchecked
    assert(m.nBatches == 0 && m.nRows == 0L && m.fields.length == 2)
  }

  test("typed rejects, never a crash") {
    assert(ArrowIpc.parseArrow(null) == Left("too short"))
    assert(ArrowIpc.parseArrow(Array.fill[Byte](40)(7)) ==
      Left("bad head magic"))
    val good = ArrowIpc.buildArrowFile(rows = 6, batchRows = 2, seed = 3)
    // chopping the tail magic
    assert(ArrowIpc.parseArrow(good.dropRight(3)).isLeft)
    // truncation totality: typed reject or termination, never a throw
    (0 until good.length by 5).foreach(k => ArrowIpc.parseArrow(good.take(k)))
    // bit flips terminate with a typed result
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val m = good.clone()
      m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      ArrowIpc.parseArrow(m)
    }
    // forged footer length
    val forged = good.clone()
    val n = forged.length
    forged(n - 10) = -1; forged(n - 9) = -1
    forged(n - 8) = -1; forged(n - 7) = 0x7F
    assert(ArrowIpc.parseArrow(forged).isLeft)
  }

  test("DataFrame layer: meta + fields + error channel") {
    import spark.implicits._
    val good = ArrowIpc.buildArrowFile(rows = 5, batchRows = 2, seed = 8)
    val bad = "ARROW1 but not really a file".getBytes
    val df = Seq((1L, good), (2L, bad)).toDF("doc_id", "blob")
    val meta = ArrowIpc.extractArrowMeta(df, "blob").collect()
    assert(meta.length == 1 &&
      meta(0).getAs[Long]("n_rows") == 5L &&
      meta(0).getAs[Int]("n_batches") == 3)
    val fields = ArrowIpc.extractArrowFields(df, "blob")
      .orderBy("field_idx").collect()
    assert(fields.map(_.getAs[String]("name")).toSeq == Seq("id", "txt"))
    assert(ArrowIpc.arrowErrors(df, "blob").collect().length == 1)
  }

  test("sniffer routes arrow") {
    val good = ArrowIpc.buildArrowFile(rows = 2, batchRows = 2, seed = 5)
    assert(FormatSniffer.sniff(good) == "arrow")
  }
}
