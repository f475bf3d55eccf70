package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recovery — byte-exact reassembly of a deduplicated run (SURVEY §2.4 J3,
  * §2.6 O3, §3.2).
  *
  * The reference resolves each pointer with a per-record catalog query plus
  * a full re-stream of the target file (`Enum.fetch` at lib/deduplicator/
  * files.ex:37-43 → O(n²) recovery). Spark-first shape: the pointer side
  * and every referenced run's raw records meet in ONE equi-join, then one
  * global range sort feeds the ordered concat sink — O(n log n), fully
  * distributed.
  *
  * Cross-run pointers (SURVEY §7.4.3): a pointer's canonical chunk may live
  * in an *earlier* run's encoded file (catalog `file_id` → files →
  * filename). The encoded Parquet carries `cat_file_id` for exactly this;
  * a null means "this run".
  */
object Recovery {

  /** Reassemble the original bytes of encoded run `encodedDf`.
    *
    * @param encodedDf   (pos, is_pointer, chunk, ref_line, cat_file_id)
    * @param thisFileId  catalog file_id of this run
    * @param encodedFor  loader: file_id → that run's encoded DataFrame
    *                    (resolves through the files catalog)
    * @return (pos, chunk) with every pointer resolved, ready for the
    *         ordered sink
    */
  def resolve(encodedDf: DataFrame, thisFileId: Long,
              encodedFor: Long => DataFrame): DataFrame = {
    val enc = encodedDf.withColumn("ref_file_id",
      coalesce(col("cat_file_id"), lit(thisFileId)))
    val raws = enc.where(!col("is_pointer")).select(col("pos"), col("chunk"))
    val ptrs = enc.where(col("is_pointer"))
      .select(col("pos"), col("ref_file_id"), col("ref_line"))

    // The set of runs referenced is small (catalog `files` cardinality =
    // number of runs ever) — collect the ids, not the data.
    val refIds = ptrs.select("ref_file_id").distinct()
      .collect().map(_.getLong(0)).toSeq

    if (refIds.isEmpty) raws
    else {
      // Raw records of every referenced run, keyed (file_id, line). A
      // pointer target is always a raw record — first sight overall; a
      // pointer landing on a pointer is the reference's :not_chunk error
      // (deduplicator.ex:209-215), surfaced here as an unresolved join.
      val targets = refIds.map { fid =>
        encodedFor(fid).where(!col("is_pointer"))
          .select(lit(fid).as("ref_file_id"), col("pos").as("ref_line"),
            col("chunk").as("target_chunk"))
      }.reduce(_ unionByName _)

      // Single pass: the :not_chunk check rides inside the output
      // projection (raise_error on a null target) instead of a separate
      // validation count() that would execute the dominant join twice.
      val resolved = ptrs.join(targets, Seq("ref_file_id", "ref_line"), "left_outer")
      val checkedChunk = when(col("target_chunk").isNull,
        raise_error(concat(
          lit("pointer at pos "), col("pos"),
          lit(" resolves to no raw record (:not_chunk; reference "),
          lit("deduplicator.ex:209-215): file_id="), col("ref_file_id"),
          lit(" line="), col("ref_line"))).cast("binary"))
        .otherwise(col("target_chunk"))
      raws.unionByName(resolved.select(col("pos"), checkedChunk.as("chunk")))
    }
  }
}
