package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.ext.Winnow

/** Incremental EXACT-substring dedup against a persisted winnowing
  * index — the streaming production shape of the [[Winnow]] family,
  * completing the per-family streaming forms ([[StreamingDedup]] =
  * exact chunks, [[StreamingNearDup]] = MinHash, [[StreamingImageDedup]]
  * = image signatures): a crawl feed arrives in micro-batches, each
  * batch probes the accumulated [[Winnow.buildWinnowIndex]]-layout
  * index (partition-pruned to the batch's fingerprint buckets), emits
  * its within-batch pairs through the join form, then appends its own
  * fingerprints so later batches dedup against it.
  *
  * Unlike the MinHash stream, NO corpus payload store is needed: the
  * winnow index carries the k-gram characters, so probe verification
  * is collision-proof against the index alone — state is ONE
  * fingerprint table, cost per batch = probe (∝ batch buckets) +
  * append (∝ batch), never ∝ history.
  *
  * Delivery semantics: match emission is at-least-once
  * (batch_id-tagged, overwritten per replay); index appends are
  * replay-TOLERANT for the pairing DECISION — duplicated fingerprint
  * rows can inflate `n_matches` for pairs involving a replayed batch,
  * but cannot create a pair that shares no verified gram, and any
  * true pair stays ≥ minMatches. Consumers keyed on
  * (batch_id, id_a, id_b) read matches exactly-once.
  */
object StreamingExactDup {

  /** Layout under `workDir`:
    *   index/   — fb-partitioned winnow fingerprint index (with grams)
    *   matches/ — pair rows (id_a, id_b, n_matches), batch_id-partitioned
    */
  def start(spark: SparkSession, inputDir: String, workDir: String,
            k: Int = 8, w: Int = 16, fpBuckets: Int = 64,
            maxDocsPerFp: Int = 256, minMatches: Int = 1,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Option[Int] = None,
            compactEvery: Option[Int] = None,
            compactMaxFiles: Option[Long] = None,
            lease: graft.ext.WriterLock.Lease =
              graft.ext.WriterLock.Lease()): MaintainedStream = {
    // cadence and/or cost trigger — see IndexMaintenance.CompactPolicy
    val policy = graft.ext.IndexMaintenance.CompactPolicy(
      every = compactEvery, maxDataFiles = compactMaxFiles)
    val indexPath = s"$workDir/index"
    // the index's failover SLO: every lock the stream takes on it
    // heartbeats/observes at this lease (WriterLock.setLease doc has
    // the failover-latency vs no-steal-margin tradeoff)
    graft.ext.WriterLock.setLease(indexPath, lease)
    val matchesPath = s"$workDir/matches"
    val fs = new org.apache.hadoop.fs.Path(workDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reader = spark.readStream
      .schema(StructType(Seq(StructField("id", LongType),
        StructField("text", StringType))))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    // events baseline BEFORE the query starts: an AvailableNow first
    // batch can fire before start() returns
    val baseline = graft.ext.MaintenanceEvents.countsFor(Seq(indexPath))
    val q = reader.parquet(inputDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // registry-delta cleanup (the StreamingNearDup convention):
        // free every storage block this batch pinned once its outputs
        // are written, so a long-lived stream cannot leak blocks
        val sc = spark.sparkContext
        val beforeCp = sc.getPersistentRDDs.keySet
        try {
          // The fused kernel: cross-index + within-batch matches →
          // matches/batch_id=N, then the index append — from ONE
          // fingerprinting of the batch (the unfused probe + pairs +
          // append form fingerprinted it three times and re-joined the
          // texts to verify; the fold verifies gram-vs-gram from its
          // own cache). First batch builds the index with the caller's
          // parameters; afterwards the sidecar's pinned regime wins.
          // No batch checkpoint: file-source micro-batches re-read
          // cheaply.
          Winnow.foldWinnowBatch(batch, "id", "text", indexPath,
            s"$matchesPath/batch_id=$batchId",
            k, w, fpBuckets, maxDocsPerFp, minMatches)
          // between-batches = the single writer's maintenance window
          graft.ext.IndexMaintenance.maybeCompact(policy, batchId,
            "streamExactDup", indexPath,
            graft.ext.IndexMaintenance.dataFileCount(spark, indexPath))(
            Winnow.compactWinnowIndex(spark, indexPath))
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
