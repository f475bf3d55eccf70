package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.TemporalOps

/** TemporalOps contracts: as-of match selection (latest prior-or-equal,
  * per key, left outer, `<=` on ties, tolerance aging) and gap-based
  * session boundary arithmetic (strictly-greater-than-gap splits).
  */
class TemporalOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private def leftDf = Seq(
    (1L, "u1", "2024-01-01 10:00:00"),
    (2L, "u1", "2024-01-01 11:00:00"),
    (3L, "u1", "2024-01-01 09:00:00"), // before every right row
    (4L, "u2", "2024-01-01 10:30:00"), // key with no right rows
    (5L, "u3", "2024-01-01 10:00:00")) // exact-tie with a right row
    .toDF("id", "u", "ts").withColumn("ts", to_timestamp(col("ts")))

  private def rightDf = Seq(
    ("u1", "2024-01-01 09:30:00", 10.0),
    ("u1", "2024-01-01 10:30:00", 20.0),
    ("u3", "2024-01-01 10:00:00", 30.0))
    .toDF("u", "ts", "v").withColumn("ts", to_timestamp(col("ts")))

  test("asOfJoin picks the latest prior-or-equal right row per key, " +
    "left outer, <= on exact ties") {
    val out = TemporalOps
      .asOfJoin(leftDf, rightDf, Seq("u"), "ts", "ts", Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) === Some(10.0)) // 10:00 → the 09:30 state
    assert(out(2L) === Some(20.0)) // 11:00 → the 10:30 state
    assert(out(3L) === None)       // nothing at-or-before 09:00
    assert(out(4L) === None)       // key has no right rows at all
    assert(out(5L) === Some(30.0)) // equal ts matches (<= semantics)
  }

  test("asOfJoin emits the matched right event time in epoch micros") {
    val out = TemporalOps
      .asOfJoin(leftDf, rightDf, Seq("u"), "ts", "ts", Seq("v"))
      .where(col("id") === 2L).select("ts_matched_us").head()
    val expected = rightDf.where(col("v") === 20.0)
      .select(unix_micros(col("ts"))).head().getLong(0)
    assert(out.getLong(0) === expected)
  }

  test("asOfJoin tolerance nulls matches older than the window") {
    // 30 minutes tolerance: id=1 (09:30 state, 30 min old) stays — the
    // age equals the bound exactly — id=2 (10:30 state, 30 min old)
    // stays, but with a 29-minute bound both age out while the exact
    // tie (age 0) survives.
    val tol29 = TemporalOps.asOfJoin(leftDf, rightDf, Seq("u"),
      "ts", "ts", Seq("v"), toleranceUs = Some(29L * 60 * 1000000))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(tol29(1L) === None)
    assert(tol29(2L) === None)
    assert(tol29(5L) === Some(30.0))
    val tol30 = TemporalOps.asOfJoin(leftDf, rightDf, Seq("u"),
      "ts", "ts", Seq("v"), toleranceUs = Some(30L * 60 * 1000000))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(tol30(1L) === Some(10.0))
    assert(tol30(2L) === Some(20.0))
  }

  test("asOfJoin left rows and columns pass through unchanged") {
    val out = TemporalOps
      .asOfJoin(leftDf, rightDf, Seq("u"), "ts", "ts", Seq("v"))
    assert(out.count() === leftDf.count())
    assert(out.columns.take(3).toSeq === Seq("id", "u", "ts"))
    assert(out.select("id").as[Long].collect().sorted
      === Array(1L, 2L, 3L, 4L, 5L))
  }

  test("sessionize splits on gap STRICTLY greater than gapSeconds and " +
    "numbers sessions 1..n per key") {
    // u1: 0 s, +1800 s (== gap, same session), +1800.000001 s more
    // (> gap, new session); u2 independent numbering
    val ev = Seq(
      (1L, "u1", 0L),
      (2L, "u1", 1800000000L),
      (3L, "u1", 3600000001L),
      (4L, "u2", 0L))
      .toDF("id", "u", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = TemporalOps.sessionize(ev, Seq("u"), "ts", 1800L, Seq("id"))
      .select("id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1L)
    assert(out(2L) === 1L) // equal-to-gap stays in the session
    assert(out(3L) === 2L) // strictly greater starts a new one
    assert(out(4L) === 1L) // per-key numbering restarts
  }

  test("sessionize agrees with Spark's own session_window on starts " +
    "and sizes (independent implementation cross-check)") {
    val ev = spark.range(200).select(
      col("id"),
      (col("id") % 7).cast("string").as("u"),
      // irregular but deterministic inter-arrival times, some > gap
      timestamp_micros(col("id") * 400000000L +
        (col("id") % 5) * 1300000000L).as("ts"))
    // gap 1750 s: inter-arrival diffs in this data are multiples of
    // 100 s, so diff == gap cannot occur — session_window splits at
    // diff >= gap, sessionize at diff > gap, and the boundary case
    // must not be exercised for the two definitions to coincide
    val mine = TemporalOps
      .sessionSummary(ev, Seq("u"), "ts", 1750L, Seq("id"))
      .select("u", "n_events", "start_us")
    val sparks = ev
      .groupBy(col("u"), session_window(col("ts"), "1750 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("u"), col("n_events"),
        unix_micros(col("session_window.start")).as("start_us"))
    assert(mine.except(sparks).isEmpty && sparks.except(mine).isEmpty,
      "gap sessions must match session_window's grouping")
  }

  test("sessionSummary bounds and span are exact epoch-µs arithmetic") {
    val ev = Seq(
      (1L, "u1", 100L), (2L, "u1", 250L), (3L, "u1", 5000000000L))
      .toDF("id", "u", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val rows = TemporalOps
      .sessionSummary(ev, Seq("u"), "ts", 1800L, Seq("id"))
      .orderBy("session_idx")
      .select("session_idx", "n_events", "start_us", "end_us", "span_us")
      .collect()
    assert(rows.toSeq === Seq(
      Row(1L, 2L, 100L, 250L, 150L),
      Row(2L, 1L, 5000000000L, 5000000000L, 0L)))
  }
}
