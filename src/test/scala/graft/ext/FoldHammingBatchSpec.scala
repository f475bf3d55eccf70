package graft.ext

import graft.SparkFunSuite

/** foldHammingBatch must reproduce the unfused semantics exactly: its
  * matches equal probeHammingIndex ∪ hammingPairs, and its index state
  * equals build + append.
  */
class FoldHammingBatchSpec extends SparkFunSuite {
  test("fold matches = unfused cross ∪ within on a perturbed batch") {
    val s = spark; import s.implicits._
    def sig(id: Long, base: Long, flip: Int): (Long, Long) =
      (id, base ^ (if (flip < 0) 0L else 1L << flip))
    val base = 0x5A5A1234ABCD9876L
    val b0 = Seq(sig(1, base, -1), sig(2, base ^ 0xF0F0L, -1))
      .toDF("id", "sh")
    // 101 = 2 bits from doc 1; 102 = identical to 101 (within pair);
    // 103 = far from everything
    val b1 = Seq(sig(101, base, 0), sig(102, base, 0),
      (103L, 0x1111222233334444L)).toDF("id", "sh")
    val dir = tempDir("foldham")
    DocDedup.foldHammingBatch(b0, "id", "sh", s"$dir/index", s"$dir/m0",
      maxDist = 2, qBuckets = 8)
    DocDedup.foldHammingBatch(b1, "id", "sh", s"$dir/index", s"$dir/m1",
      maxDist = 2, qBuckets = 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows(spark.read.parquet(s"$dir/m0")) ==
      rows(DocDedup.hammingPairs(b0, "id", "sh", 2)))
    val refDir = tempDir("foldham-ref")
    DocDedup.buildHammingIndex(b0, "id", "sh", s"$refDir/index",
      qBuckets = 8)
    val wantCross = rows(DocDedup.probeHammingIndex(b1, "id", "sh",
      s"$refDir/index", 2))
    val wantWithin = rows(DocDedup.hammingPairs(b1, "id", "sh", 2))
    assert(wantCross.nonEmpty && wantWithin.nonEmpty)
    assert(rows(spark.read.parquet(s"$dir/m1")) == wantCross ++ wantWithin)
    DocDedup.appendToHammingIndex(b1, "id", "sh", s"$refDir/index")
    val gotIdx = spark.read.parquet(s"$dir/index")
      .collect().map(_.toString).sorted.toSeq
    val refIdx = spark.read.parquet(s"$refDir/index")
      .collect().map(_.toString).sorted.toSeq
    assert(gotIdx == refIdx)
  }
}
