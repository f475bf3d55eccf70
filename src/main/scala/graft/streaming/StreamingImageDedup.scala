package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import graft.ext.{DocDedup, Multimodal}

/** Incremental IMAGE near-dup detection against a persisted Hamming
  * index — [[StreamingNearDup]]'s production shape for the image
  * modality: blobs arrive in micro-batches, each batch is hashed
  * through the real codec ([[graft.ext.Multimodal.imageHash]]), probed
  * against the accumulated [[graft.ext.DocDedup.buildHammingIndex]]
  * layout (partition-pruned read of only the batch's quarter buckets —
  * never a re-hash or re-join of history), then appended so later
  * batches dedup against it.
  *
  * Simpler state than the text fold: the index rows carry the FULL
  * 64-bit signature, so the exact `bit_count` verify needs no corpus
  * payload — state is the index alone. Per-batch cost is hash (∝
  * batch) + probe (∝ batch) + append (∝ batch), never ∝ history.
  *
  * Delivery semantics match [[StreamingNearDup]]: matches are
  * at-least-once (batch_id-tagged, overwritten per batch directory);
  * index state is replay-safe — duplicate appended rows collapse in
  * the probe's `distinct()` before any verdict, so a replayed batch
  * cannot change later batches' pairs.
  */
object StreamingImageDedup {

  /** Layout under `workDir`:
    *   index/   — (q, qb)-partitioned Hamming index (full hashes)
    *   matches/ — (id_a, id_b, hamming), batch_id-partitioned
    */
  def start(spark: SparkSession, inputDir: String, workDir: String,
            maxDist: Int, qBuckets: Int = 64,
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
        StructField("blob", BinaryType))))
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
        // registry-delta cleanup (the StreamingNearDup pattern): free
        // every block this batch pinned once its outputs are written
        val sc = spark.sparkContext
        val beforeCp = sc.getPersistentRDDs.keySet
        try {
          // The fused kernel: cross-index + within-batch matches →
          // matches/batch_id=N, then the index append — the batch's
          // images are DECODED ONCE into the fold's quarter cache (the
          // unfused probe + pairs + append form checkpointed the
          // signatures and still exploded them three times, and
          // hammingPairs re-joined the signature table twice to
          // verify). First batch builds the index with the caller's
          // qBuckets; afterwards the sidecar's pinned value wins.
          val sig = Multimodal.imageHash(batch, "blob")
            .where(col("img.ok"))
            .select(col("id"), col("img.ahash").as("ahash"))
          DocDedup.foldHammingBatch(sig, "id", "ahash", indexPath,
            s"$matchesPath/batch_id=$batchId", maxDist, qBuckets)
          // between-batches = the single writer's maintenance window
          graft.ext.IndexMaintenance.maybeCompact(policy, batchId,
            "streamImageDedup", indexPath,
            graft.ext.IndexMaintenance.dataFileCount(spark, indexPath))(
            DocDedup.compactHammingIndex(spark, indexPath))
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
