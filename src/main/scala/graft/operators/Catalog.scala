package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Dedup catalog — the reference's two Postgres tables re-expressed as
  * versioned Parquet (SURVEY §1.1, §2.1 S4/S7/S8, §2.5 A2/A4).
  *
  *   files(file_id, filename, chunk_bytes, algorithm)
  *     — one row per deduplicated run (reference: lib/deduplicator/schemas/
  *       file.ex:5-9, migration 20221009155643_add_hash_table.exs:5-9)
  *   hash_links(hash, file_id, line, refs_num)
  *     — one row per distinct chunk ever seen; `line` = position of first
  *       occurrence, `refs_num` = total occurrences so far (schemas/
  *       hash_link.ex:5-12, migration :11-16)
  *
  * The reference leaned on Postgres for PK/unique/FK constraints and
  * row-at-a-time upserts. Spark-first shape: uniqueness by construction
  * (anti-join before append, A4 ≙ `on_conflict: :nothing`), refs_num
  * increments as a grouped delta merge (A1+A2, one job — never per-row),
  * and atomicity via versioned directories with a COMMIT marker: each run
  * writes `v_<n+1>/{files,hash_links}` in full, then drops a `COMMIT`
  * file; readers use the highest committed version. Failed writes leave
  * no marker and are invisible — idempotent re-runs (SURVEY §7.4.2).
  *
  * Scale notes (100 TB): hash_links is hash-partitioned by a 2-hex-char
  * digest prefix (256 buckets) so the dedup probe join (J1) can prune and
  * co-locate by bucket; the full-rewrite merge becomes a per-touched-bucket
  * rewrite on a real deployment (same layout, smaller rewrite set) or a
  * Delta/Iceberg MERGE where available.
  */
class Catalog(spark: SparkSession, dir: String) {
  import Catalog._

  private val fs = FileSystem.get(new java.net.URI(dir),
    spark.sparkContext.hadoopConfiguration)

  private def versionDir(v: Long) = new Path(dir, f"v_$v%06d")

  /** Highest committed version, or 0 (empty catalog). */
  def currentVersion: Long = {
    val base = new Path(dir)
    if (!fs.exists(base)) 0L
    else fs.listStatus(base).iterator
      .map(_.getPath.getName)
      .collect { case VersionRe(n) => n.toLong }
      .filter(v => fs.exists(new Path(versionDir(v), "COMMIT")))
      .foldLeft(0L)(math.max)
  }

  def files(): DataFrame = {
    val v = currentVersion
    if (v == 0) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], filesSchema)
    else spark.read.schema(filesSchema)
      .parquet(new Path(versionDir(v), "files").toString)
  }

  def links(): DataFrame = {
    val v = currentVersion
    if (v == 0) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], linksSchema)
    else spark.read
      .parquet(new Path(versionDir(v), "hash_links").toString)
      .select(linksSchema.fieldNames.map(col).toSeq: _*)
  }

  /** Catalog point reads (S4; reference files.ex:20-23, hash.ex:29-45).
    * Row-at-a-time probes exist for API parity; the dedup plan itself
    * always uses the join form (J1), never these.
    */
  def getFile(filename: String): DataFrame =
    files().where(col("filename") === filename)
  def getHashLink(hash: String): DataFrame =
    links().where(col("hash") === hash)
  def getHashLinkByLine(line: Long): DataFrame =
    links().where(col("line") === line)

  /** The reference's only pure relational query: duplicate-frequency
    * report (test/deduplicator_test.exs:323-330) —
    * `refs_num > 1`, projected, sorted descending.
    */
  def chunkRepetition(): DataFrame =
    links().where(col("refs_num") > 1)
      .select("refs_num")
      .orderBy(desc("refs_num"))

  /** Atomically commit one dedup run:
    *   - register the run in `files` (S7) under a fresh file_id
    *   - append genuinely-new hash links (A4 anti-join ≙ on_conflict-nothing)
    *   - increment refs_num of re-seen hashes by their occurrence counts
    *     (A1 grouped delta + A2 merge; reference hash.ex:81-103 did one
    *     UPDATE per distinct hash — here it is one join)
    *
    * @param newLinks  DataFrame(hash, line, refs_num) — first-occurrence
    *                  rows for hashes new to the catalog, refs_num = total
    *                  occurrences within this run
    * @param deltas    DataFrame(hash, delta) — occurrence counts for hashes
    *                  already in the catalog
    * @return the file_id assigned to this run
    */
  def commitRun(filename: String, chunkBytes: Int, algorithm: String,
                newLinks: DataFrame, deltas: DataFrame): Long = {
    val v = currentVersion
    val oldFiles = files()
    val oldLinks = links()
    val fid = oldFiles.agg(coalesce(max("file_id"), lit(0L))).head().getLong(0) + 1

    val newFiles = oldFiles.unionByName(
      spark.createDataFrame(Seq((fid, filename, chunkBytes, algorithm)))
        .toDF("file_id", "filename", "chunk_bytes", "algorithm"))

    // Defensive anti-join: uniqueness of `hash` must hold by construction
    // even if the caller's newLinks overlaps the catalog (idempotence).
    val genuinelyNew = newLinks
      .join(oldLinks.select("hash"), Seq("hash"), "left_anti")
      .select(col("hash"), lit(fid).as("file_id"), col("line"),
        col("refs_num").cast(LongType).as("refs_num"))

    val merged = oldLinks
      .join(deltas.select(col("hash"), col("delta").cast(LongType).as("delta")),
        Seq("hash"), "left")
      .withColumn("refs_num", col("refs_num") + coalesce(col("delta"), lit(0L)))
      .drop("delta")

    val nextLinks = merged.unionByName(genuinelyNew)
    writeVersion(v + 1, newFiles, nextLinks)
    fid
  }

  private def writeVersion(v: Long, filesDf: DataFrame, linksDf: DataFrame): Unit = {
    val vd = versionDir(v)
    filesDf.write.mode("overwrite").parquet(new Path(vd, "files").toString)
    linksDf
      .withColumn("bucket", substring(col("hash"), 1, 2))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(new Path(vd, "hash_links").toString)
    fs.create(new Path(vd, "COMMIT"), true).close() // atomic commit marker
  }
}

object Catalog {
  private val VersionRe = "v_(\\d+)".r

  val filesSchema: StructType = StructType(Seq(
    StructField("file_id", LongType, nullable = false),
    StructField("filename", StringType, nullable = false),
    StructField("chunk_bytes", IntegerType, nullable = false),
    StructField("algorithm", StringType, nullable = false)))

  val linksSchema: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("file_id", LongType, nullable = false),
    StructField("line", LongType, nullable = false),
    StructField("refs_num", LongType, nullable = false)))
}
