package graft.ext

import graft.SparkFunSuite

/** foldWinnowBatch must reproduce the unfused semantics exactly: its
  * matches equal probeWinnowIndex ∪ verifiedPairs, and its index state
  * equals build + append.
  */
class FoldWinnowBatchSpec extends SparkFunSuite {
  test("fold matches = unfused cross ∪ within on a twin batch") {
    val s = spark; import s.implicits._
    def doc(seed: Int): String =
      s"unique lead $seed " + "the shared long run of text that " +
        "winnowing fingerprints reliably " + s"tail $seed"
    val b0 = Seq((1L, doc(1)), (2L, doc(2))).toDF("id", "text")
    val b1 = Seq((101L, doc(11)), (102L, doc(12))).toDF("id", "text")
    val dir = tempDir("foldwin")
    Winnow.foldWinnowBatch(b0, "id", "text", s"$dir/index", s"$dir/m0",
      k = 8, w = 4, fpBuckets = 8)
    Winnow.foldWinnowBatch(b1, "id", "text", s"$dir/index", s"$dir/m1",
      k = 8, w = 4, fpBuckets = 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "n_matches").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(spark.read.parquet(s"$dir/m0")) ==
      rows(Winnow.verifiedPairs(b0, "id", "text", k = 8, w = 4)))
    val refDir = tempDir("foldwin-ref")
    Winnow.buildWinnowIndex(b0, "id", "text", s"$refDir/index",
      k = 8, w = 4, fpBuckets = 8)
    val wantCross = rows(Winnow.probeWinnowIndex(b1, "id", "text",
      s"$refDir/index"))
    val wantWithin = rows(Winnow.verifiedPairs(b1, "id", "text",
      k = 8, w = 4))
    assert(wantCross.nonEmpty && wantWithin.nonEmpty) // twins planted
    assert(rows(spark.read.parquet(s"$dir/m1")) == wantCross ++ wantWithin)
    Winnow.appendToWinnowIndex(b1, "id", "text", s"$refDir/index")
    val gotIdx = spark.read.parquet(s"$dir/index")
      .collect().map(_.toString).sorted.toSeq
    val refIdx = spark.read.parquet(s"$refDir/index")
      .collect().map(_.toString).sorted.toSeq
    assert(gotIdx == refIdx)
  }
}
