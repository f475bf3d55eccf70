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

  /** Files at/above this size take the splittable [[chunksOfHugeFile]]
    * path; below it, whole-file-per-task is both fine and cheaper to set
    * up. 256 MB keeps every task's materialized chunk array far below
    * the 2 GB array ceiling.
    */
  val HugeFileThreshold: Long = 256L * 1024 * 1024

  /** Scan `path` (a file or glob) → DataFrame(file: string, pos: long,
    * chunk: binary), `pos` being the 0-based chunk index within its file —
    * the reference's `line` counter (deduplicator.ex:35-37,97).
    *
    * A single file ≥ [[HugeFileThreshold]] is routed to the splittable
    * fixed-record scan — one task per split, no 2 GB ceiling, no
    * one-task-per-file skew.
    */
  def chunks(spark: SparkSession, path: String, chunkBytes: Int): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    if (matches.size == 1 && matches.head.isFile
        && matches.head.getLen >= HugeFileThreshold)
      chunksOfHugeFile(spark, matches.head.getPath.toString,
        matches.head.getLen, chunkBytes)
    else {
      val splitUdf = udf((content: Array[Byte]) => split(content, chunkBytes))
      spark.read
        .format("binaryFile")
        .load(path)
        .select(col("path").as("file"), splitUdf(col("content")).as("parts"))
        .select(col("file"), posexplode(col("parts")))
        .select(col("file"), col("pos").cast("long").as("pos"), col("col").as("chunk"))
    }
  }

  /** Splittable scan of ONE huge file: `sc.binaryRecords` (fixed-length
    * records, split across tasks — the lazy-stream analog of reference
    * files.ex:45-56 at cluster scale) + zipWithIndex for `pos`. Spark's
    * FixedLengthBinaryInputFormat silently DROPS a trailing partial
    * record, so the short tail chunk (len % n ≠ 0) is read directly via
    * the FS API and appended as the last row.
    */
  def chunksOfHugeFile(spark: SparkSession, path: String, len: Long,
                       chunkBytes: Int): DataFrame = {
    require(chunkBytes > 0, s"chunk size must be positive, got $chunkBytes")
    import spark.implicits._
    val nFull = len / chunkBytes
    val tailLen = (len % chunkBytes).toInt
    val full = spark.sparkContext.binaryRecords(path, chunkBytes)
      .zipWithIndex()
      .map { case (chunk, idx) => (path, idx, chunk) }
    val tail =
      if (tailLen == 0) spark.sparkContext.emptyRDD[(String, Long, Array[Byte])]
      else {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val in = fs.open(p)
        val buf = new Array[Byte](tailLen)
        try { in.seek(len - tailLen); in.readFully(buf) } finally in.close()
        spark.sparkContext.parallelize(Seq((path, nFull, buf)), 1)
      }
    (full ++ tail).toDF("file", "pos", "chunk")
  }
}
