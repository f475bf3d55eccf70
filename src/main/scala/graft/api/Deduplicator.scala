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
  *
  * Failure ordering: encoded data is always written BEFORE the catalog
  * commit — a crash between the two leaves orphaned data files (harmless,
  * invisible to the catalog) rather than committed links pointing at a
  * run with no data.
  */
class Deduplicator(spark: SparkSession, workDir: String) {

  val catalog = new Catalog(spark, s"$workDir/catalog")
  private def parquetPath(name: String) = s"$workDir/encoded/$name.parquet"
  private def binPath(name: String) = s"$workDir/encoded/$name"

  /** Dedupe one file: chunk → hash → probe → encode → write encoded table
    * → commit catalog last (SURVEY §3.1's translation, 2–3 Spark jobs).
    */
  def deduplicateFile(input: String, opts: DedupOptions = DedupOptions()): DedupResult =
    deduplicateBatch(Seq(input), opts).head

  /** Dedupe a batch of files against (and into) the catalog with ONE
    * catalog commit — the streaming micro-batch path. Files are planned
    * in order, each against base-catalog ∪ earlier files' pending links,
    * so in-batch cross-file duplicates become pointers exactly as they
    * would across sequential commits; only the version bump is batched.
    */
  def deduplicateBatch(inputs: Seq[String],
                       opts: DedupOptions = DedupOptions(),
                       outputNames: Seq[String] = Nil): Seq[DedupResult] = {
    if (inputs.isEmpty) return Seq.empty
    require(outputNames.isEmpty || outputNames.size == inputs.size,
      s"outputNames (${outputNames.size}) must match inputs (${inputs.size})")
    val algo = Hashing.resolve(opts.algorithm)
    val fidBase = catalog.nextFileId
    val baseLinks = catalog.links()

    var pendingLinks: Option[DataFrame] = None
    val prepared = inputs.zipWithIndex.map { case (input, i) =>
      val status = requireSingleFile(input)
      val fid = fidBase + i
      val name =
        if (outputNames.nonEmpty) outputNames(i)
        else if (inputs.size == 1) opts.outputName.getOrElse(generateName(input))
        else opts.outputName.map(n => s"$n-$i").getOrElse(generateName(input))
      val knownLinks = pendingLinks.fold(baseLinks)(baseLinks.unionByName(_))
      // Reuse the guard's FileStatus — no second driver-side glob per file.
      val chunks = ChunkSource.chunksOfFile(spark, status, opts.chunkBytes)
        .select("pos", "chunk")
      // Cache the SHARED upstream (scan → hash → probe join → window):
      // the encoded write, the bin-parity sink, the counts, and the two
      // catalog contributions are all cheap derivations of it — caching
      // any one of them instead would re-execute the pipeline per output.
      val probed = Dedup.probe(chunks, algo, knownLinks)
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val encoded = Dedup.encode(probed)
        // Data first; the catalog commit happens once, after every file's
        // data is safely down.
        encoded.write.mode("overwrite").option("compression", "zstd")
          .parquet(parquetPath(name))
        if (opts.binParity) {
          BinFormat.write(encoded, binPath(name))
          if (opts.compress) { // files.ex:64-94 + deduplicator.ex:46-50
            BinFormat.zipFile(binPath(name), binPath(name) + ".zip",
              spark.sparkContext.hadoopConfiguration)
            BinFormat.deleteFile(binPath(name),
              spark.sparkContext.hadoopConfiguration)
          }
        }
        // Materialize the (small) catalog contribution now: it must
        // survive past this file's unpersist, and later files' plans
        // reference it.
        val newLinks = Dedup.newLinks(probed).localCheckpoint()
        val deltas = Dedup.deltas(probed).localCheckpoint()
        val Array(total, ptrs) = encoded
          .agg(count(lit(1)), sum(when(col("is_pointer"), 1L).otherwise(0L)))
          .head().toSeq.map(v => if (v == null) 0L else v.asInstanceOf[Long])
          .toArray
        val stamped = newLinks.select(col("hash"), lit(fid).as("file_id"),
          col("line"), col("refs_num").cast("long").as("refs_num"))
        val grown = pendingLinks.fold(stamped)(_ unionByName stamped)
        // Flatten the accumulating union periodically: without this a
        // 10k-file micro-batch would build an O(N)-deep union plan and
        // pay O(N²) analysis across the batch.
        pendingLinks = Some(
          if ((i + 1) % 32 == 0) grown.localCheckpoint() else grown)
        (Catalog.RunSpec(fid, name, opts.chunkBytes, algo.name, newLinks, deltas),
          DedupResult(name, fid, total, ptrs))
      } finally probed.unpersist()
    }
    catalog.commitRuns(prepared.map(_._1))
    prepared.map(_._2)
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

  /** A run's `pos` column is per-file; a glob matching several files
    * would silently collide positions (ADVICE round-3 item). Multi-file
    * corpora go through [[deduplicateBatch]] / graft.streaming instead.
    * Returns the resolved FileStatus so the scan needn't re-glob.
    */
  private def requireSingleFile(input: String): org.apache.hadoop.fs.FileStatus = {
    val p = new org.apache.hadoop.fs.Path(input)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    require(matches.size == 1 && matches.head.isFile,
      s"deduplicateFile needs exactly one file; '$input' matches " +
        s"${matches.size} path(s) — use deduplicateBatch for multi-file input")
    matches.head
  }

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
