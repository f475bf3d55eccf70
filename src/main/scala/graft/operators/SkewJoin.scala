package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the classic hot-key mitigation for shuffle joins
  * (builder brief: "salting for skew"). A shuffle hash/sort-merge join
  * sends every row of a key to ONE reducer; at 100 TB a single hot key
  * (empty string, null-ish sentinel, boilerplate hash) can hold a task
  * for hours while 999 executors idle. AQE's skew-join split handles
  * the sort-merge case after the fact; explicit salting fixes the
  * partitioning itself, works for any join strategy, and composes with
  * downstream per-key aggregation.
  *
  * Mechanics: each BUILD row is replicated `factor` times with salt
  * 0..factor−1; each PROBE row computes ONE deterministic salt from a
  * caller-supplied expression (any well-distributed probe-side value —
  * a row id, a position, a secondary column). The join key becomes
  * (keys, salt): a key's probe rows now spread over `factor` reducers,
  * each meeting exactly the one build replica carrying its salt — so
  * the result is EXACTLY the plain equi-join (no duplicates, no
  * misses), which is what the q87 oracle states.
  *
  * Cost: the build side grows ×factor — use for big-probe ⋈
  * small-to-medium-build with probe-side skew, the shape where
  * broadcast is too big and plain shuffle is skew-bound.
  */
object SkewJoin {

  /** Inner equi-join of `probe` ⋈ `build` on `keys`, salted `factor`
    * ways. `probeSalt` must be deterministic per probe row (its hash
    * spreads the row across replicas); result equals
    * `probe.join(build, keys)` exactly, column order probe ++ build.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 factor: Int, probeSalt: Column): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    require(keys.nonEmpty, "salted join needs at least one key column")
    Reserved.assertNone(probe, "saltedJoin(probe)")
    Reserved.assertNone(build, "saltedJoin(build)")
    val b = build.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    val p = probe.withColumn("_graft_salt",
      pmod(xxhash64(probeSalt), lit(factor.toLong)).cast("int"))
    p.join(b, keys :+ "_graft_salt").drop("_graft_salt")
  }
}
