package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over keyed event streams — the temporal join
  * and segmentation surface a behavioral/event table needs (SURVEY §2.4
  * notes the reference has "no theta/range/as-of/interval joins"; these
  * are the north-star closures of that gap, expressed as single-shuffle
  * Spark plans, not per-row lookups).
  *
  * Scale design shared by both operators: ONE hash exchange on the key
  * columns followed by a per-key time sort — the same shape a 1000-
  * executor cluster wants, because per-key event counts (not total
  * volume) bound each partition's sort. Neither operator ever uses a
  * global (unpartitioned) window, a cross join, or a driver-side loop.
  * For a corpus where even a single key's history exceeds an executor
  * (pathological hot keys), the standard refinement is bucketing by
  * (key, time-range) with boundary carry-over; the operators keep the
  * simple shape and document the contract.
  */
object TemporalOps {

  /** As-of join: for each left row, attach the LATEST right row with
    * `right.tsCol <= left.tsCol` on the same key (the classic
    * trades-⋈-quotes / event-⋈-most-recent-state join; left outer — an
    * unmatched left row keeps null payload).
    *
    * Implemented Spark-first as a tagged union + running `last(…,
    * ignoreNulls)` over ONE (key, ts) window — no range predicate ever
    * reaches a join operator, so the plan is a single hash exchange +
    * sort, linear in |left| + |right|, with no BroadcastNestedLoopJoin
    * (what a naive `l.ts >= r.ts` theta-join would produce).
    *
    * Right rows must be unique per (keys, tsCol) — the state table
    * contract; dedupe first if needed (at equal (key, ts) the result
    * would otherwise depend on sort tie order).
    *
    * @param rightPayload right columns to carry (must not collide with
    *                     left column names)
    * @param toleranceUs  optional max age in microseconds: a match
    *                     older than `left.ts - tolerance` is nulled out
    *                     (the join stays left-outer)
    * @return left.* plus `<tsCol>_matched` (right event time, epoch µs,
    *         null when unmatched) and the payload columns
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPayload: Seq[String],
               toleranceUs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    Reserved.assertNone(left, "asOfJoin(left)")
    Reserved.assertNone(right, "asOfJoin(right)")
    val leftCols = left.columns.toSeq
    // Output-name collisions outside the _graft_ prefix: a left column
    // named exactly "<leftTs>_matched_us" or matching any payload name
    // would silently duplicate in the output — fail loudly instead.
    val outNames = s"${leftTs}_matched_us" +: rightPayload
    val clash = leftCols.filter(outNames.contains)
    require(clash.isEmpty,
      s"asOfJoin: left column(s) ${clash.mkString(", ")} collide with " +
        s"output columns (${leftTs}_matched_us / rightPayload); rename " +
        "them first")
    // Tagged union: right rows carry their payload in one struct column
    // (nullable on left rows); tag orders right BEFORE left at equal ts
    // so `<=` semantics hold on ties.
    val payload = struct(
      unix_micros(col(rightTs)).as("_matched_us") +:
        rightPayload.map(col): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("_graft_ts"),
        lit(0).as("_graft_tag"), payload.as("_graft_state")): _*)
    val lTagged = left.select(
      leftCols.map(col) ++ Seq(col(leftTs).as("_graft_ts"),
        lit(1).as("_graft_tag"),
        lit(null).cast(rTagged.schema("_graft_state").dataType)
          .as("_graft_state")): _*)
    val extra = leftCols.filterNot(c => keys.contains(c))
    val rAligned = rTagged.select(
      keys.map(col) ++ extra.map(c =>
        lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("_graft_ts"), col("_graft_tag"), col("_graft_state")): _*)
    val unioned = lTagged
      .select((keys ++ extra).map(col) ++
        Seq(col("_graft_ts"), col("_graft_tag"), col("_graft_state")): _*)
      .unionByName(rAligned)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_graft_ts"), col("_graft_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("_graft_state"), ignoreNulls = true).over(w)
    val matched = toleranceUs match {
      case Some(tol) => when(
        matchedRaw("_matched_us") >= unix_micros(col("_graft_ts")) - tol,
        matchedRaw)
      case None => matchedRaw
    }
    unioned
      .withColumn("_graft_m", matched)
      .where(col("_graft_tag") === 1)
      .select(leftCols.map(col) ++
        (col("_graft_m")("_matched_us").as(s"${leftTs}_matched_us") +:
          rightPayload.map(c => col("_graft_m")(c).as(c))): _*)
  }

  /** Gap-based sessionization: assign each event a per-key session
    * index that increments whenever the gap to the key's previous event
    * exceeds `gapSeconds` (the standard web-analytics session
    * definition; Structured Streaming's `session_window` is the
    * streaming twin — this is the batch form with an explicit index
    * usable as a join key).
    *
    * One (key, ts) window drives both the lag and the running
    * new-session sum — a single hash exchange + per-key sort, identical
    * cost to one as-of join. `tiebreak` columns make the order (and so
    * the session boundaries) total when timestamps collide.
    *
    * @return input plus `session_idx` (1-based per key)
    */
  def sessionize(events: DataFrame, keys: Seq[String], tsCol: String,
                 gapSeconds: Long, tiebreak: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    Reserved.assertNone(events, "sessionize")
    val order = col(tsCol) +: tiebreak.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val prevUs = lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew = when(prevUs.isNull
      .or(unix_micros(col(tsCol)) - prevUs > gapSeconds * 1000000L), 1L)
      .otherwise(0L)
    // Two window steps over the SAME (partition, order) spec — one
    // exchange + one sort feed both (a window function cannot nest
    // inside another window's aggregate in one expression).
    events.withColumn("_graft_new", isNew)
      .withColumn("session_idx",
        sum(col("_graft_new")).over(w.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .drop("_graft_new")
  }

  /** Per-session summary on top of [[sessionize]]: count, span, and
    * event-time bounds per (keys, session_idx) — a plain hash aggregate
    * reusing the sessionize exchange's partitioning where AQE allows.
    */
  def sessionSummary(events: DataFrame, keys: Seq[String], tsCol: String,
                     gapSeconds: Long, tiebreak: Seq[String]): DataFrame =
    sessionize(events, keys, tsCol, gapSeconds, tiebreak)
      .groupBy((keys.map(col) :+ col("session_idx")): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("span_us"))
}
