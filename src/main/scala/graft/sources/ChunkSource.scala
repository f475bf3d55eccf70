package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-size binary chunk scan (SURVEY §2.1 S1).
  *
  * The reference lazily streams a file and splits it into `n`-byte chunks,
  * preserving order, last chunk possibly short
  * (reference: lib/deduplicator/files.ex:45-56, binary_utils.ex:14-24).
  *
  * Spark-first shape: `binaryFile` scan → chunk-split function →
  * `posexplode` → one row per chunk with an explicit `pos` column (Spark
  * has no implicit row order, so position is a first-class column).
  *
  * Scale notes (100 TB): `binaryFile` parallelizes across *files* (one
  * task per file, 2 GB/file ceiling). For corpora of many files that is
  * exactly right. For a single huge file, the scale path is
  * `sc.binaryRecords(path, n)` (fixed-length records split across tasks)
  * or a Hadoop `FixedLengthInputFormat`; both yield the same
  * `(file, pos, chunk)` shape. The downstream plan is identical either way.
  */
object ChunkSource {

  /** Split one blob into n-byte chunks. Pure function, also used by tests.
    * Invariants (mirrors reference test/deduplicator_test.exs:25-47):
    * every chunk has size ≤ n; concat(chunks) == input.
    */
  def split(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
    require(n > 0, s"chunk size must be positive, got $n")
    if (content.isEmpty) Seq.empty
    else content.grouped(n).toSeq
  }

  /** Scan `path` (a file or glob) → DataFrame(file: string, pos: long,
    * chunk: binary), `pos` being the 0-based chunk index within its file —
    * the reference's `line` counter (deduplicator.ex:35-37,97).
    */
  def chunks(spark: SparkSession, path: String, chunkBytes: Int): DataFrame = {
    val splitUdf = udf((content: Array[Byte]) => split(content, chunkBytes))
    spark.read
      .format("binaryFile")
      .load(path)
      .select(col("path").as("file"), splitUdf(col("content")).as("parts"))
      .select(col("file"), posexplode(col("parts")))
      .select(col("file"), col("pos").cast("long").as("pos"), col("col").as("chunk"))
  }
}
