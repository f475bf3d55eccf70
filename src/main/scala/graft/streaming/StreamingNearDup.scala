package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.ext.DocDedup

/** Incremental NEAR-dup detection against a persisted MinHash index —
  * the streaming production shape of document near-dedup (SURVEY §2.8
  * applied to the ext/ near-dup family): a crawl feed arrives in
  * micro-batches, each batch is probed against the accumulated corpus's
  * [[graft.ext.DocDedup.buildMinHashIndex]]-layout index (partition-
  * pruned read of only the batch's signature buckets — NOT a re-band of
  * the whole history), then appended to the index and the corpus so
  * later batches dedup against it.
  *
  * The per-batch pipeline is the FUSED
  * [[graft.ext.DocDedup.foldMinHashBatch]] kernel — cross-index
  * matches, within-batch matches, the matches write, and the index
  * append in four Spark actions, banding and shingling the batch once
  * (the unfused probe + pairs + two writes form cost eight actions,
  * and the r13 bench attribution showed action count, not compute,
  * dominates the micro-batch floor). Two more actions per batch here:
  * the batch checkpoint and the corpus append.
  *
  * State lives entirely in external storage (index + corpus parquet),
  * not the state store — the same unbounded-key trade as
  * [[StreamingDedup]]: the corpus grows forever; per-batch cost is
  * probe (∝ batch) + append (∝ batch), never ∝ history. The flip side
  * of per-batch appends is small-file accumulation (one file set per
  * touched partition per batch); `compactEvery = Some(n)` runs
  * [[graft.ext.DocDedup.compactMinHashIndex]] after every n-th batch
  * ON the foreachBatch thread — the stream is the index's single
  * writer, so the between-batches window is exactly the maintenance
  * window the compaction contract requires. Probe results are
  * bit-identical across a compaction, so match output is unaffected
  * (IndexMaintenanceSpec + the q238 gate pin this).
  *
  * Delivery semantics: match emission is at-least-once (a replayed
  * batch re-emits its `batch_id`-tagged matches), while index/corpus
  * state is replay-SAFE: duplicate appended rows cannot change any
  * later batch's verified pairs — candidates are `distinct()`ed ids and
  * shingle relations are distinct (id, shingle) sets, so re-appended
  * rows collapse before verification. Consumers keyed on
  * (batch_id, id_a, id_b) read the matches exactly-once.
  */
object StreamingNearDup {

  /** Layout under `workDir`:
    *   index/   — (band, sb)-partitioned ids-only MinHash index
    *   corpus/  — (id, text) payload parquet, appended per batch
    *   matches/ — verified near-dup pairs, batch_id-partitioned
    */
  def start(spark: SparkSession, inputDir: String, workDir: String,
            num: Int, den: Int,
            bands: Int = 16, rows: Int = 8, sigBuckets: Int = 8,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Option[Int] = None,
            compactEvery: Option[Int] = None,
            compactMaxFiles: Option[Long] = None,
            lease: graft.ext.WriterLock.Lease =
              graft.ext.WriterLock.Lease()): MaintainedStream = {
    // cadence and/or cost trigger — see IndexMaintenance.CompactPolicy
    // (compactMaxFiles fires on the index's measured data-file count,
    // the probe-cost signal, instead of a fixed batch cadence)
    val policy = graft.ext.IndexMaintenance.CompactPolicy(
      every = compactEvery, maxDataFiles = compactMaxFiles)
    val indexPath = s"$workDir/index"
    // the index's failover SLO: every lock the stream takes on it
    // heartbeats/observes at this lease (WriterLock.setLease doc has
    // the failover-latency vs no-steal-margin tradeoff)
    graft.ext.WriterLock.setLease(indexPath, lease)
    val corpusPath = s"$workDir/corpus"
    val matchesPath = s"$workDir/matches"
    val fs = new org.apache.hadoop.fs.Path(workDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reader = spark.readStream
      .schema(StructType(Seq(StructField("id", LongType),
        StructField("text", StringType))))
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n))
    // events baseline BEFORE the query starts: an AvailableNow first
    // batch can fire before start() returns
    val baseline = graft.ext.MaintenanceEvents.countsFor(Seq(indexPath))
    val q = reader.parquet(inputDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Registry-delta cleanup: the batch checkpoint and the fold's
        // internal persists would otherwise pin storage blocks for the
        // stream's whole lifetime (the round-7 per-commit leak class).
        // Everything this batch produces is written out below, so
        // freeing all of it at batch end is safe.
        val sc = spark.sparkContext
        val beforeCp = sc.getPersistentRDDs.keySet
        try {
          // No batch checkpoint: a FILE-source micro-batch re-reads its
          // own parquet files deterministically and cheaply (narrow
          // scan), so materializing it would spend an extra action per
          // batch for nothing — the fold persists the banded projection,
          // which is the one genuinely multi-consumed intermediate.
          val b = batch
          // The fused kernel: cross-index + within-batch matches →
          // matches/batch_id=N (batch_id comes back as a partition
          // column on read; writing it into the files too would collide
          // with partition discovery), then the index append — from ONE
          // banding of the batch. First batch: builds the index with
          // the caller's (bands, rows, sigBuckets); afterwards the
          // index sidecar's pinned parameters win, so a replayed or
          // later batch can never mix banding regimes.
          // gate on COMMITTED corpus data, not directory existence: a
          // crash between the committer creating the directory and the
          // first task commit would otherwise leave every replay dying
          // on parquet schema inference over an empty dir
          val corpusHasData = {
            val p = new org.apache.hadoop.fs.Path(corpusPath)
            fs.exists(p) && fs.listStatus(p).exists { s =>
              val nm = s.getPath.getName
              !nm.startsWith("_") && !nm.startsWith(".")
            }
          }
          DocDedup.foldMinHashBatch(b,
            if (corpusHasData) spark.read.parquet(corpusPath)
            else b.where(org.apache.spark.sql.functions.lit(false)),
            "id", "text", indexPath, s"$matchesPath/batch_id=$batchId",
            num, den, bands, rows, sigBuckets)
          b.write.mode("append").parquet(corpusPath)
          graft.ext.IndexMaintenance.maybeCompact(policy, batchId,
            "streamNearDup", indexPath,
            graft.ext.IndexMaintenance.dataFileCount(spark, indexPath))(
            DocDedup.compactMinHashIndex(spark, indexPath))
        } finally {
          sc.getPersistentRDDs.filterNot(kv => beforeCp(kv._1)).values
            .foreach(_.unpersist(false))
        }
        ()
      }
      .start()
    new MaintainedStream(q, Seq(indexPath), baseline)
  }
}
