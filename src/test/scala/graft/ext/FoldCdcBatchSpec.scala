package graft.ext

import graft.SparkFunSuite

/** foldCdcBatch must reproduce the unfused semantics exactly: its
  * matches equal probeCdcIndex ∪ sharedChunkPairs on the same data.
  */
class FoldCdcBatchSpec extends SparkFunSuite {
  test("fold matches = unfused cross ∪ within on a twin batch") {
    val s = spark; import s.implicits._
    def blob(seed: Int): Array[Byte] = {
      val shared = Array.tabulate(6000)(j => ((j * 31 + 7) % 251).toByte)
      val own = Array.tabulate(3000)(j => ((j * 17 + seed) % 251).toByte)
      shared ++ own
    }
    // batch 0 builds the index; batch 1 has cross-batch twins AND a
    // within-batch pair (101 vs 102 share the prefix)
    val b0 = Seq((1L, blob(1)), (2L, blob(2))).toDF("id", "blob")
    val b1 = Seq((101L, blob(11)), (102L, blob(12))).toDF("id", "blob")
    val dir = tempDir("foldcdc")
    Cdc.foldCdcBatch(b0, "id", "blob", s"$dir/index", s"$dir/m0",
      minSize = 256, avgBits = 9, maxSize = 4096, hashBuckets = 8)
    Cdc.foldCdcBatch(b1, "id", "blob", s"$dir/index", s"$dir/m1",
      minSize = 256, avgBits = 9, maxSize = 4096, hashBuckets = 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch 0: within pairs only (no index yet)
    assert(rows(spark.read.parquet(s"$dir/m0")) ==
      rows(Cdc.sharedChunkPairs(b0, "id", "blob", 256, 9, 4096)))
    // batch 1 against the unfused reference: rebuild an index from b0
    val refDir = tempDir("foldcdc-ref")
    Cdc.buildCdcIndex(b0, "id", "blob", s"$refDir/index", 256, 9, 4096, 8)
    val wantCross = rows(Cdc.probeCdcIndex(b1, "id", "blob",
      s"$refDir/index"))
    val wantWithin = rows(Cdc.sharedChunkPairs(b1, "id", "blob",
      256, 9, 4096))
    assert(wantCross.nonEmpty && wantWithin.nonEmpty) // twins planted
    assert(rows(spark.read.parquet(s"$dir/m1")) == wantCross ++ wantWithin)
    // and the fold's index state equals the unfused build+append
    Cdc.appendToCdcIndex(b1, "id", "blob", s"$refDir/index")
    val gotIdx = spark.read.parquet(s"$dir/index")
      .collect().map(_.toString).sorted.toSeq
    val refIdx = spark.read.parquet(s"$refDir/index")
      .collect().map(_.toString).sorted.toSeq
    assert(gotIdx == refIdx)
  }
}
