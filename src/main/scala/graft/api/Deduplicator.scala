package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.Hashing
import graft.operators.{Catalog, Dedup, Recovery}
import graft.sources.{BinFormat, ChunkSource, OrderedBinarySink}

/** Options of one dedup run — mirrors the reference's option surface
  * (lib/deduplicator.ex:22-27) option for option:
  *
  *   - `bytes`        → [[chunkBytes]] (reference prod default 4, test 8;
  *                      we default 64 — the 4-byte default makes per-row
  *                      overhead dominate at scale, SURVEY §7.4.5; 4 remains
  *                      fully supported for parity tests)
  *   - `hash` (and its `:hash_algorimth` typo alias, deduplicator.ex:26;
  *     unknown names fall back to the default, hash.ex:26-27)
  *                    → [[algorithm]] via Hashing.resolve
  *   - `output`       → [[outputName]] (default: generated, ≙ P5)
  *   - `compress`     → [[compress]] (zip the parity `.bin`, delete the
  *                      uncompressed original — files.ex:64-94; the Parquet
  *                      form is always zstd-compressed instead)
  *   - `chunk_amount` (flush batch size, deduplicator.ex:24) has no batch
  *     analog — a Spark run is one job; its streaming analog is the
  *     micro-batch trigger (graft.streaming).
  */
case class DedupOptions(
    chunkBytes: Int = 64,
    algorithm: String = "sha",
    outputName: Option[String] = None,
    compress: Boolean = false,
    binParity: Boolean = false)

case class DedupResult(outputName: String, fileId: Long,
    chunks: Long, pointers: Long)

/** User-facing API with the reference's entry points
  * (`deduplicate_file/2` at deduplicator.ex:22, `recovery_file/3` at
  * deduplicator.ex:149, `chunk_repetition/0` analytics), Spark-native.
  *
  * Layout under `workDir`:
  *   catalog/  — versioned files + hash_links tables ([[Catalog]])
  *   encoded/<name>.parquet — encoded runs (primary representation)
  *   encoded/<name>         — optional byte-exact `.bin` parity file
  */
class Deduplicator(spark: SparkSession, workDir: String) {

  val catalog = new Catalog(spark, s"$workDir/catalog")
  private def parquetPath(name: String) = s"$workDir/encoded/$name.parquet"
  private def binPath(name: String) = s"$workDir/encoded/$name"

  /** Dedupe one file: chunk → hash → probe → encode → commit catalog →
    * write encoded table (SURVEY §3.1's translation, 2–3 Spark jobs).
    */
  def deduplicateFile(input: String, opts: DedupOptions = DedupOptions()): DedupResult = {
    val algo = Hashing.resolve(opts.algorithm)
    val name = opts.outputName.getOrElse(generateName(input))
    val chunks = ChunkSource.chunks(spark, input, opts.chunkBytes)
      .select("pos", "chunk")
    val plan = Dedup.plan(chunks, algo, catalog.links())
    val encoded = plan.encoded.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val fid = catalog.commitRun(name, opts.chunkBytes, algo.name,
        plan.newLinks, plan.deltas)
      encoded.write.mode("overwrite").option("compression", "zstd")
        .parquet(parquetPath(name))
      if (opts.binParity) {
        BinFormat.write(encoded, binPath(name))
        if (opts.compress) { // files.ex:64-94 + deduplicator.ex:46-50
          BinFormat.zipFile(binPath(name), binPath(name) + ".zip")
          BinFormat.deleteFile(binPath(name))
        }
      }
      val total = encoded.count()
      val ptrs = encoded.where(col("is_pointer")).count()
      DedupResult(name, fid, total, ptrs)
    } finally encoded.unpersist()
  }

  /** Recover a deduplicated run to its original bytes at `outputPath`. */
  def recoverFile(encodedName: String, outputPath: String): Unit = {
    val fileRow = catalog.getFile(encodedName).collect()
    require(fileRow.nonEmpty, s"unknown encoded file: $encodedName") // files.ex:25-26
    val fid = fileRow.head.getAs[Long]("file_id")
    val names = catalog.files().select("file_id", "filename").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val enc = spark.read.parquet(parquetPath(encodedName))
    val resolved = Recovery.resolve(enc, fid,
      id => spark.read.parquet(parquetPath(names(id))))
    OrderedBinarySink.write(resolved, "pos", "chunk", outputPath)
  }

  /** Duplicate-frequency report (test/deduplicator_test.exs:323-330). */
  def chunkRepetition(): DataFrame = catalog.chunkRepetition()

  /** Output-name generation ≙ P5 (deduplicator.ex:217-224 uses
    * md5(hex(now_ms))+".bin"); ours is deterministic per (input, catalog
    * version) so re-runs are idempotent.
    */
  private def generateName(input: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$input:${catalog.currentVersion + 1}".getBytes("UTF-8"))
    h.map("%02x".format(_)).mkString + ".bin"
  }
}
