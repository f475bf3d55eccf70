package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import graft.ext.Cdc

/** Incremental shift-invariant BINARY dedup against a persisted CDC
  * chunk index — the streaming production shape of the [[Cdc]] family,
  * completing the per-family streaming forms ([[StreamingDedup]] =
  * exact fixed chunks, [[StreamingNearDup]] = MinHash,
  * [[StreamingImageDedup]] = image signatures, [[StreamingExactDup]] =
  * exact substrings): a blob feed arrives in micro-batches, each batch
  * probes the accumulated [[Cdc.buildCdcIndex]]-layout index
  * (partition-pruned to the batch's hash buckets), emits its
  * within-batch pairs through the join form, then appends its own
  * chunk identities so later batches dedup against it.
  *
  * Like the winnow stream, NO blob payload store is needed: the chunk
  * identity `(chash, csize, csum)` is self-verifying, so state is ONE
  * identity table — cost per batch = probe (∝ batch buckets) + append
  * (∝ batch), never ∝ history.
  *
  * Delivery semantics: match emission is at-least-once
  * (batch_id-tagged, overwritten per replay); index appends are
  * replay-tolerant for the pairing decision — duplicated identity rows
  * can inflate `n_shared` for pairs involving a replayed batch, but
  * cannot create a pair sharing no chunk content, and any true pair
  * stays ≥ minShared. Consumers keyed on (batch_id, id_a, id_b) read
  * matches exactly-once.
  */
object StreamingCdcDup {

  /** Layout under `workDir`:
    *   index/   — hb-partitioned CDC chunk-identity index
    *   matches/ — pair rows (id_a, id_b, n_shared), batch_id-partitioned
    */
  def start(spark: SparkSession, inputDir: String, workDir: String,
            minSize: Int = 2048, avgBits: Int = 13, maxSize: Int = 65536,
            hashBuckets: Int = 64, maxDocsPerChunk: Int = 256,
            minShared: Int = 1,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Option[Int] = None,
            compactEvery: Option[Int] = None): StreamingQuery = {
    require(compactEvery.forall(_ >= 1),
      s"compactEvery must be >= 1, got $compactEvery")
    val indexPath = s"$workDir/index"
    val matchesPath = s"$workDir/matches"
    val fs = new org.apache.hadoop.fs.Path(workDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reader = spark.readStream
      .schema(StructType(Seq(StructField("id", LongType),
        StructField("blob", BinaryType))))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // registry-delta cleanup (the StreamingNearDup convention)
        val sc = spark.sparkContext
        val beforeCp = sc.getPersistentRDDs.keySet
        try {
          val b = batch.localCheckpoint()
          val indexExists = fs.exists(
            new org.apache.hadoop.fs.Path(indexPath, "_graft_cdc_meta"))
          val cross =
            if (indexExists)
              Cdc.probeCdcIndex(b, "id", "blob", indexPath,
                maxDocsPerChunk, minShared)
            else
              b.select(col("id").as("id_a"), col("id").as("id_b"),
                lit(0L).as("n_shared")).where(lit(false))
          val within = Cdc.sharedChunkPairs(b, "id", "blob",
              minSize, avgBits, maxSize, maxDocsPerChunk)
            .where(col("n_shared") >= minShared)
          cross.unionByName(within)
            .write.mode("overwrite")
            .parquet(s"$matchesPath/batch_id=$batchId")
          // fold the batch into state AFTER matching: a batch never
          // probes its own rows through the index (the join form above
          // owns within-batch pairs). An existing index's sidecar wins
          // over the caller's parameters on append.
          if (indexExists)
            Cdc.appendToCdcIndex(b, "id", "blob", indexPath)
          else
            Cdc.buildCdcIndex(b, "id", "blob", indexPath,
              minSize, avgBits, maxSize, hashBuckets)
          // between-batches = the single writer's maintenance window
          graft.ext.IndexMaintenance.maybeCompact(compactEvery, batchId,
            "streamCdcDup")(Cdc.compactCdcIndex(spark, indexPath))
        } finally {
          sc.getPersistentRDDs.filterNot(kv => beforeCp(kv._1)).values
            .foreach(_.unpersist(false))
        }
        ()
      }
      .start()
  }
}
