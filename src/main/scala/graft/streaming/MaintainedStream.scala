package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException, StreamingQueryProgress, StreamingQueryStatus}

import graft.ext.MaintenanceEvents

/** The handle every graft stream returns (r15 verdict ask #2): a
  * [[StreamingQuery]] in every respect — existing call sites keep
  * calling `processAllAvailable`/`stop`/`awaitTermination` unchanged —
  * plus a queryable window onto the maintenance events of the
  * directories this stream owns.
  *
  * [[maintenanceStats]] returns event → count SINCE STREAM START (the
  * [[MaintenanceEvents]] registry is JVM-lifetime; the stream's
  * `start` snapshots the baseline BEFORE the query starts — snapshot
  * at handle construction would race an `AvailableNow` first batch
  * that fires before the constructor runs and silently undercount),
  * keyed by the [[MaintenanceEvents]] event names — lock
  * conflicts, stale/lease takeovers, swap heals, compaction
  * skips/fires, retention vacuums. Zero-valued events are included
  * only if they were ever recorded against these directories in this
  * JVM, so `getOrElse(event, 0L)` is the read idiom.
  */
final class MaintainedStream(val query: StreamingQuery,
                             val maintainedDirs: Seq[String],
                             baseline: Map[String, Long])
    extends StreamingQuery {

  // Any session running maintained streams is fleet-dashboard-visible
  // without extra wiring: expose the maintenance counters through the
  // Spark metrics system (idempotent, once per JVM).
  graft.ext.MaintenanceMetrics.register()

  /** Maintenance-event counts against this stream's directories since
    * the stream started.
    */
  def maintenanceStats(): Map[String, Long] = {
    val now = MaintenanceEvents.countsFor(maintainedDirs)
    (now.keySet ++ baseline.keySet).iterator
      .map(k => k -> (now.getOrElse(k, 0L) - baseline.getOrElse(k, 0L)))
      .toMap
  }

  override def name: String = query.name
  override def id: java.util.UUID = query.id
  override def runId: java.util.UUID = query.runId
  override def sparkSession: SparkSession = query.sparkSession
  override def isActive: Boolean = query.isActive
  override def exception: Option[StreamingQueryException] = query.exception
  override def status: StreamingQueryStatus = query.status
  override def recentProgress: Array[StreamingQueryProgress] =
    query.recentProgress
  override def lastProgress: StreamingQueryProgress = query.lastProgress
  override def awaitTermination(): Unit = query.awaitTermination()
  override def awaitTermination(timeoutMs: Long): Boolean =
    query.awaitTermination(timeoutMs)
  override def processAllAvailable(): Unit = query.processAllAvailable()
  override def stop(): Unit = query.stop()
  override def explain(): Unit = query.explain()
  override def explain(extended: Boolean): Unit = query.explain(extended)
}
