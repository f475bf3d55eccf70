package org.apache.spark.metrics.source

import com.codahale.metrics.MetricRegistry
import org.apache.spark.SparkEnv

/** Package-placement shim: Spark's [[Source]] trait and
  * `MetricsSystem.registerSource` are `private[spark]`, so a library
  * that wants its counters polled by the configured metrics sinks
  * (Prometheus / Graphite / JMX via `metrics.properties`) must declare
  * its source inside this package — the established pattern for
  * third-party Spark metric sources. Kept to the absolute minimum: one
  * (name, registry) holder and one registration call; all real logic
  * lives in `graft.ext.MaintenanceMetrics`.
  */
class GraftMaintenanceSource(override val sourceName: String,
                             override val metricRegistry: MetricRegistry)
  extends Source

object GraftMaintenanceSource {

  /** Register `registry` under `name` with the driver's MetricsSystem.
    * Returns false (and registers nothing) when no SparkEnv exists yet
    * — callers treat that as "retry on the next stream start".
    */
  def register(name: String, registry: MetricRegistry): Boolean = {
    val env = SparkEnv.get
    if (env == null) false
    else {
      env.metricsSystem.registerSource(new GraftMaintenanceSource(name, registry))
      true
    }
  }

  /** Whether the live SparkEnv's metrics system currently carries a
    * source named `name` — the spec-side proof registration landed in
    * the system the sinks actually poll, not just in a local flag.
    */
  def isRegisteredWithSpark(name: String): Boolean =
    Option(SparkEnv.get)
      .exists(_.metricsSystem.getSourcesByName(name).nonEmpty)
}
