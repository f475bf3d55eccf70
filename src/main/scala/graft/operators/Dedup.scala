package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** The dedup plan — heart of the engine (SURVEY §2.4 J1/J2, §3.1).
  *
  * The reference folds chunk-by-chunk with one Postgres round-trip per
  * chunk (lib/deduplicator.ex:59-119, probe at :88) plus an in-memory
  * pending-batch scan (:89). Spark-first shape, ONE distributed plan:
  *
  *   chunks(pos, chunk)
  *     → hash projection (P1, codegen'd built-in)
  *     → LEFT OUTER join against the catalog on hash   (J1 — the probe)
  *     → window min(pos) over partitionBy(hash)        (J2 — in-run firsts)
  *     → derive (is_pointer, ref_line, ref_file marker)
  *     → groupBy(hash) for insert set + refs deltas    (A1/A4)
  *
  * Shuffle economics: the join, the window, and both groupBys all key on
  * `hash`, so after the join's exchange Catalyst reuses the same hash
  * partitioning for every downstream operator — the whole plan costs one
  * shuffle of the chunk side (plus one of the catalog side when it is too
  * big to broadcast; AQE picks broadcast automatically when it is small).
  * At 100 TB the catalog side is pre-partitioned by digest prefix
  * (Catalog.writeVersion), keeping the probe a co-located join.
  */
object Dedup {

  /** The three outputs of one dedup run, all derived from one plan:
    * @param encoded  (pos, is_pointer, chunk, ref_line, cat_file_id) —
    *                 the deduplicated stream; `chunk` is null on pointer
    *                 rows; `cat_file_id` is the catalog file containing
    *                 the referenced first occurrence (null = this run)
    * @param newLinks (hash, line, refs_num) — hashes new to the catalog
    * @param deltas   (hash, delta) — occurrence counts for known hashes
    */
  case class Plan(encoded: DataFrame, newLinks: DataFrame, deltas: DataFrame)

  /** The shared upstream of everything a run derives: hash projection
    * (P1) → catalog probe join (J1) → in-run first-occurrence stats
    * (J2). Columns: (pos, chunk, hash, cat_line, cat_file_id,
    * first_pos, occ). Callers that derive more than one output should
    * `.persist()` THIS DataFrame — the encoded stream, the insert set,
    * and the deltas are all narrow projections/filters of it, and
    * caching anything further downstream re-executes the scan + joins
    * once per derived output.
    *
    * J2 is a groupBy(min, count) + join, NOT a window over
    * partitionBy(hash): the aggregate partial-combines map-side and
    * AQE can split a skewed join partition, while a window puts every
    * row of a hot hash into one task with no mitigation — a single
    * pathologically-duplicated chunk (zero-filled files at 100 TB)
    * would serialize the whole stage. Carrying `occ` (per-hash
    * occurrence count) here also makes newLinks/deltas plain filters —
    * no second aggregation pass over the run.
    */
  def probe(chunks: DataFrame, algorithm: Hashing.Algorithm,
            catalogLinks: DataFrame): DataFrame = {
    val hashed = chunks.withColumn("hash", algorithm.digest(col("chunk")))
    // In-run first occurrence + occurrence count, one combiner-friendly
    // aggregate (deduplicator.ex:88-92's pending-batch scan, and
    // hash.ex:83-89's grouped counts, fused).
    val stats = hashed.groupBy("hash")
      .agg(min("pos").as("first_pos"), count(lit(1)).as("occ"))
    // J1 — the probe. One join replaces n point lookups (deduplicator.ex:88).
    // Both joins key on `hash`; Catalyst reuses one exchange of the
    // chunk side across them.
    hashed.join(
        catalogLinks.select(col("hash"),
          col("line").as("cat_line"), col("file_id").as("cat_file_id")),
        Seq("hash"), "left_outer")
      .join(stats, Seq("hash"))
  }

  /** The encoded stream: a chunk is a pointer iff its hash was already
    * in the catalog (any pos) or occurred earlier in this run. Pointer
    * target = the catalog first occurrence if present, else the in-run
    * first (always a raw record — first sight overall).
    */
  def encode(probed: DataFrame): DataFrame = {
    val isPtr = col("cat_line").isNotNull || col("pos") > col("first_pos")
    probed.select(
      col("pos"),
      isPtr.as("is_pointer"),
      when(isPtr, lit(null).cast("binary")).otherwise(col("chunk")).as("chunk"),
      when(isPtr, coalesce(col("cat_line"), col("first_pos")))
        .otherwise(lit(null).cast("long")).as("ref_line"),
      when(isPtr, col("cat_file_id")).otherwise(lit(null).cast("long"))
        .as("cat_file_id"))
  }

  /** A4 — insert set: first-occurrence row per catalog-miss hash, with
    * this run's total occurrence count as its initial refs_num
    * (reference inserts refs_num=1 then +1 per later hit; net identical).
    * A filter on the probed stage — the per-hash stats already ride on
    * every row, so the first row of each new hash IS the link row.
    */
  def newLinks(probed: DataFrame): DataFrame =
    probed.where(col("cat_line").isNull && col("pos") === col("first_pos"))
      .select(col("hash"), col("first_pos").as("line"),
        col("occ").as("refs_num"))

  /** A1 — grouped refs_num deltas for catalog hits (hash.ex:83-89's
    * Enum.group_by + length; the count already rides on the probed
    * rows, so the first row of each hit hash carries its delta).
    */
  def deltas(probed: DataFrame): DataFrame =
    probed.where(col("cat_line").isNotNull && col("pos") === col("first_pos"))
      .select(col("hash"), col("occ").as("delta"))

  /** Build the full plan for one run (convenience composition).
    * @param chunks       DataFrame(pos: long, chunk: binary), pos = the
    *                     reference's global `line` counter
    *                     (deduplicator.ex:35-37,97)
    * @param algorithm    digest algorithm (Hashing.resolve semantics)
    * @param catalogLinks current hash_links table
    */
  def plan(chunks: DataFrame, algorithm: Hashing.Algorithm,
           catalogLinks: DataFrame): Plan = {
    val probed = probe(chunks, algorithm, catalogLinks)
    Plan(encode(probed), newLinks(probed), deltas(probed))
  }
}
