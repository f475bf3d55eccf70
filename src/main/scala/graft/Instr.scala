package graft

/** Opt-in gate-stage instrumentation (round-12 verdict ask #1): the
  * index-backed gates (q51/q53/q55/q103) record per-stage wall-times
  * and index-layout gauges here, and [[Bench]] emits the samples as
  * the `gate_stages` field of BENCH_LOCAL.json — so a cost regression
  * in one of those gates is attributable to build vs probe vs layout
  * instead of showing up as one opaque total.
  *
  * Every record is a SAMPLE (appended, never overwritten): the bench
  * runs each query twice, and the two runs differ structurally for
  * cached-index gates (run 1 builds + probes, run 2 probes a warm
  * index), so both values matter. Thread-safe; zero cost when unused.
  */
object Instr {
  private val samples = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CopyOnWriteArrayList[java.lang.Double]]()

  /** Time `body`, appending the elapsed seconds under `key`. */
  def timed[T](key: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally record(key, (System.nanoTime() - t0) / 1e9)
  }

  /** Append one sample (a duration, a file count, a row count). */
  def record(key: String, v: Double): Unit =
    samples.computeIfAbsent(key,
      _ => new java.util.concurrent.CopyOnWriteArrayList[java.lang.Double]())
      .add(java.lang.Double.valueOf(v))

  /** Count of regular files under a local directory tree — the index
    * layout gauge (file explosion is a probe-cost driver: every probe
    * pays listing + a parquet footer read per file).
    */
  def fileCount(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) {
        val kids = f.listFiles()
        if (kids == null) 0L else kids.map(walk).sum
      } else 1L
    walk(new java.io.File(
      path.stripPrefix("file:").stripPrefix("//")))
  }

  /** All samples recorded so far, insertion-ordered per key. */
  def snapshot(): Seq[(String, Seq[Double])] = {
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => k -> v.asScala.toSeq.map(_.doubleValue) }
  }

  def clear(): Unit = samples.clear()
}
