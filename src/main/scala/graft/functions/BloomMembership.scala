package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership prefilter — the sketch that lets a dedup
  * probe SKIP the expensive catalog join for rows that are certainly
  * new (the common case in a growing corpus). Generalizes the
  * reference's whole-set probe join (SURVEY §2.4 J1: every incoming
  * hash joins the store) the way a 100 TB deployment actually runs it:
  * a compact filter over the seen-hash set answers "possibly seen?"
  * per row at scan speed; only the (small) possibly-seen slice pays
  * the shuffle join, and the filter's one-sided error makes the split
  * exact — a bloom filter has NO false negatives, so "not in filter"
  * proves "never seen".
  *
  * Built on Spark's own sketch machinery — the same
  * `BloomFilterAggregate` / `BloomFilterMightContain` expression pair
  * the optimizer injects for runtime join pruning, both codegen'd, the
  * aggregate partial/merge-combining (each partition builds a local
  * sketch; sketches OR-merge associatively). Keys are pre-hashed with
  * `xxhash64` (the expressions' LongType contract), identically on the
  * build and probe sides.
  *
  * Sizing contract: the serialized filter is `optimalNumOfBits(n,
  * fpp) / 8` bytes (~1.2 MB per million keys at fpp 1%) and is
  * broadcast to every task — right for seen-sets up to the high
  * hundreds of millions. Beyond that, shard the key domain and build
  * one filter per shard (the aggregate composes; nothing here assumes
  * a single filter).
  */
object BloomMembership {

  /** Serialized bloom filter over `key` of every row in `df` —
    * a distributed partial/merge aggregate collapsing to one
    * sketch-sized cell on the driver.
    */
  def buildBloom(df: DataFrame, key: Column, expectedItems: Long,
                 fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    VecExpressions.register(df.sparkSession)
    val bits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    df.select(call_function("graft_bloom_agg", xxhash64(key),
        lit(expectedItems), lit(bits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Probe column: true iff `key` is POSSIBLY in the set `bloom` was
    * built over (false ⇒ certainly absent). Codegen'd; the filter
    * rides into tasks as a literal, deserialized once per task.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    call_function("graft_bloom_might_contain", lit(bloom), xxhash64(key))

  /** The rows of `df` whose `key` was CERTAINLY never seen — exact by
    * the no-false-negative guarantee. The complement (possibly-seen,
    * expected `fpp` of the truly-new plus all true repeats) is what a
    * dedup pipeline sends to the exact catalog join.
    */
  def certainlyNovel(df: DataFrame, bloom: Array[Byte], key: Column): DataFrame =
    df.where(!mightContain(bloom, key))
}
