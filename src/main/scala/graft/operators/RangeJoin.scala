package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a nested-loop operator —
  * the second north-star join family SURVEY §2.4 calls out as absent
  * from the reference ("no theta/range/as-of/interval joins").
  *
  * A naive `points JOIN intervals ON p >= lo AND p < hi` has no
  * equality conjunct, so Spark plans BroadcastNestedLoopJoin (or a
  * cartesian product): every point compared against every interval —
  * O(|P|·|I|) and a plan that simply does not finish at 100 TB. The
  * standard fix is bucketing: quantize the value domain into
  * fixed-width buckets, replicate each interval into every bucket it
  * overlaps, tag each point with the ONE bucket it falls in, and
  * equi-join on the bucket id with the range predicate as a residual
  * filter. The join becomes a plain hash join — shuffle or broadcast,
  * Catalyst's choice — linear in |P| + Σ(interval spans)/width.
  *
  * `bucketWidth` trades replication for selectivity: each interval
  * lands in ⌈span/width⌉ + 1 buckets. Pick it near the median interval
  * span so replication is O(1) per interval.
  */
object RangeJoin {

  /** Join each point row to every interval row with
    * `lo <= point < hi` (intervals may overlap; a point then matches
    * each covering interval, exactly like the theta-join it replaces).
    *
    * @param points    big side; `pointCol` numeric
    * @param intervals small-to-medium side; `loCol`/`hiCol` numeric,
    *                  lo <= hi; column names must not collide with
    *                  `points`
    * @return points.* ++ intervals.* for each matching pair
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    Reserved.assertNone(points, "pointInInterval(points)")
    Reserved.assertNone(intervals, "pointInInterval(intervals)")
    val w = lit(bucketWidth)
    // The ⌊hi/w⌋ endpoint bucket is included even when hi is an exact
    // multiple of w (where the interval, being hi-exclusive, does not
    // reach it) — one spurious candidate bucket is cheaper than
    // float-exactness hair in the bound, and the residual filter
    // removes anything it admits.
    val bucketed = intervals.withColumn("_graft_bucket",
      explode(sequence(floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    points
      .withColumn("_graft_bucket", floor(col(pointCol) / w).cast("long"))
      .join(bucketed, Seq("_graft_bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_graft_bucket")
  }
}
