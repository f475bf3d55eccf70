package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  * State lives entirely in external storage (index + corpus parquet),
  * not the state store — the same unbounded-key trade as
  * [[StreamingDedup]]: the corpus grows forever; per-batch cost is
  * probe (∝ batch) + append (∝ batch), never ∝ history.
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
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val indexPath = s"$workDir/index"
    val corpusPath = s"$workDir/corpus"
    val matchesPath = s"$workDir/matches"
    val fs = new org.apache.hadoop.fs.Path(workDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reader = spark.readStream
      .schema(StructType(Seq(StructField("id", LongType),
        StructField("text", StringType))))
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n))
    reader.parquet(inputDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Registry-delta cleanup: the batch checkpoint and the pair
        // operators' internal localCheckpoints would otherwise pin
        // storage blocks for the stream's whole lifetime (the round-7
        // per-commit leak class). Everything this batch produces is
        // written out below, so freeing all of it at batch end is safe.
        val sc = spark.sparkContext
        val beforeCp = sc.getPersistentRDDs.keySet
        try {
          val b = batch.localCheckpoint() // several consumers below
          val indexExists = fs.exists(
            new org.apache.hadoop.fs.Path(indexPath, "_graft_minhash_meta"))
          // An existing index's pinned (bands, rows, sigBuckets) win
          // over the caller's: appends banded with different parameters
          // would silently corrupt the bucket layout.
          val (eBands, eRows, eSigBuckets) =
            if (!indexExists) (bands, rows, sigBuckets)
            else {
              val in = fs.open(new org.apache.hadoop.fs.Path(indexPath,
                "_graft_minhash_meta"))
              val Array(bb, rr, sbk) =
                try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                  .trim.split(",").map(_.toInt)
                finally in.close()
              (bb, rr, sbk)
            }
          // 1. cross-batch matches: probe the accumulated index; plus
          //    the batch's own within-batch pairs (the join form on the
          //    small batch), so a dup arriving twice in ONE batch is
          //    not missed.
          val cross =
            if (indexExists)
              DocDedup.probeMinHashIndex(b, spark.read.parquet(corpusPath),
                "id", "text", indexPath, num, den)
            else
              b.select(col("id").as("id_a"), col("id").as("id_b"),
                lit(0L).as("common"), lit(0L).as("na"), lit(0L).as("nb"))
                .where(lit(false))
          val within = DocDedup.minHashPairs(b, "id", "text", num, den,
            eBands, eRows)
          // batch_id comes back as a partition column on read; writing
          // it into the files too would collide with partition discovery
          cross.unionByName(within)
            .write.mode("overwrite")
            .parquet(s"$matchesPath/batch_id=$batchId")
          // 2. fold the batch into state — overwrite-per-batch is
          //    replay-safe for matches (above); index/corpus appends
          //    rely on the distinct()-collapse argument in the scaladoc.
          if (indexExists)
            DocDedup.appendToMinHashIndex(b, "id", "text", indexPath)
          else
            DocDedup.buildMinHashIndex(b, "id", "text", indexPath,
              eBands, eRows, eSigBuckets)
          b.write.mode("append").parquet(corpusPath)
        } finally {
          sc.getPersistentRDDs.filterNot(kv => beforeCp(kv._1)).values
            .foreach(_.unpersist(false))
        }
        ()
      }
      .start()
  }
}
