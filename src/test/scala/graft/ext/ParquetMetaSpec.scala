package graft.ext

import graft.SparkFunSuite

class ParquetMetaSpec extends SparkFunSuite {

  test("synthetic footer round-trip") {
    val blob = ParquetMeta.buildParquetBlob(1, Seq("a", "b", "c"),
      Seq(100L, 250L), Seq(4096L, 8192L), "graft test writer", bodyLen = 64)
    val Right(m) = ParquetMeta.parquetFooterTable(blob): @unchecked
    assert(m.version == 1 && m.numRows == 350L)
    assert(m.nRowGroups == 2 && m.nColumns == 3)
    assert(m.totalBytes == 12288L)
    assert(m.createdBy == "graft test writer")
    // >14 columns exercises the long-form list header
    val wide = ParquetMeta.buildParquetBlob(2, (0 until 20).map(i => s"c$i"),
      Seq(7L), Seq(10L), "w", bodyLen = 0)
    val Right(mw) = ParquetMeta.parquetFooterTable(wide): @unchecked
    assert(mw.nColumns == 20 && mw.numRows == 7L)
  }

  test("interop: a footer Spark itself wrote walks cleanly") {
    import spark.implicits._
    val dir = tempDir("pqmeta")
    val df = (0 until 1234).map(i => (i.toLong, s"v$i", i * 0.5))
      .toDF("id", "s", "x")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/t")
    val part = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    val Right(m) = ParquetMeta.parquetFooterTable(bytes): @unchecked
    assert(m.numRows == 1234L)
    assert(m.nColumns == 3)
    assert(m.nRowGroups >= 1)
    assert(m.createdBy != null && m.createdBy.contains("parquet"))
    assert(m.totalBytes > 0L)
  }

  test("column statistics: synthetic round-trip + Spark-written interop") {
    val blob = ParquetMeta.buildParquetBlobStats(1, Seq("a", "b"),
      Seq(10L, 20L), "w", bodyLen = 8,
      stats = (g, c) => (10L + g, g + c.toLong, g * 100L + c,
        g * 100L + c + 50L))
    val Right(st) = ParquetMeta.parquetColumnStats(blob): @unchecked
    assert(st.length == 4)
    assert(st.map(_.column) == Seq("a", "b", "a", "b"))
    assert(st.map(_.rgIdx) == Seq(0, 0, 1, 1))
    assert(st(3).numValues == 11L && st(3).nullCount == 2L)
    assert(st(3).minV.contains(101L) && st(3).maxV.contains(151L))
    // the general footer walk still reads the richer footer
    val Right(m) = ParquetMeta.parquetFooterTable(blob): @unchecked
    assert(m.numRows == 30L && m.nColumns == 2)
    // interop: Spark's own statistics for a LongType column
    import spark.implicits._
    val dir = tempDir("pqstats")
    (0 until 777).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/t")
    val part = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    val Right(real) = ParquetMeta.parquetColumnStats(bytes): @unchecked
    val idStat = real.find(_.column == "id").get
    assert(idStat.numValues == 777L)
    assert(idStat.nullCount == 0L)
    assert(idStat.minV.contains(0L) && idStat.maxV.contains(776L))
  }

  test("typed rejects: magics, footer length, row-count consistency") {
    val good = ParquetMeta.buildParquetBlob(1, Seq("a"), Seq(10L),
      Seq(100L), "w", bodyLen = 16)
    def mut(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    assert(ParquetMeta.parquetFooterTable(Array.empty[Byte]) ==
      Left("too short"))
    assert(ParquetMeta.parquetFooterTable(mut(0, 'X')) ==
      Left("bad head magic"))
    assert(ParquetMeta.parquetFooterTable(mut(good.length - 1, 'X')) ==
      Left("bad tail magic"))
    // footer length lies (too large)
    val fl = good.clone()
    fl(good.length - 5) = 0x7F
    assert(ParquetMeta.parquetFooterTable(fl) ==
      Left("footer length out of bounds"))
    // footer length short by one → walk runs past its window
    val sh = good.clone()
    sh(good.length - 8) = (sh(good.length - 8) - 1).toByte
    assert(ParquetMeta.parquetFooterTable(sh).isLeft)
    // declared num_rows disagreeing with the row-group sum
    val lie = ParquetMeta.buildParquetBlob(1, Seq("a"), Seq(10L, 20L),
      Seq(1L, 2L), "w", bodyLen = 0)
    // find the i64 num_rows field (header 0x16 = delta 1 from field 2,
    // type i64; zigzag(30) = 0x3C) and bump its value varint
    val idx = (0 until lie.length - 1)
      .find(i => lie(i) == 0x16 && lie(i + 1) == 0x3C).get + 1
    val lied = lie.clone(); lied(idx) = 0x3E
    val r = ParquetMeta.parquetFooterTable(lied)
    assert(r == Left("row count mismatch"), s"got $r")
    // truncation totality: never throws
    (0 until good.length).foreach(k =>
      ParquetMeta.parquetFooterTable(good.take(k)))
  }

  test("extract + errors over a DataFrame") {
    import spark.implicits._
    val a = ParquetMeta.buildParquetBlob(1, Seq("x", "y"), Seq(5L),
      Seq(50L), "wa", bodyLen = 8)
    val bad = a.clone(); bad(3) = 'X'
    val df = Seq((1L, a), (2L, bad)).toDF("id", "blob")
    val rows = ParquetMeta.extractParquetMeta(df, "blob").collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("num_rows") == 5L)
    val errs = ParquetMeta.parquetErrors(df, "blob").collect()
    assert(errs.length == 1 &&
      errs(0).getAs[String]("error") == "bad head magic")
  }
}
