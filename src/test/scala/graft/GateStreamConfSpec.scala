package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** r15 verdict ask #6: `SparkEntry.withGateStreamConf` flips session
  * confs (4 shuffle partitions, no no-data batches) around the
  * fixture-sized MemoryStream gate bodies and restores them in
  * `finally` — this spec pins that the restoration holds even when the
  * gate body DIES MID-STREAM, and that a production stream started
  * afterwards really plans with the session's own shuffle partitions
  * (asserted structurally: the state store materializes one partition
  * directory per shuffle partition).
  */
class GateStreamConfSpec extends SparkFunSuite {

  test("withGateStreamConf: session confs survive a gate body that " +
    "fails mid-stream; a production stream started afterwards gets " +
    "the session's shuffle partitions, not the gate's") {
    val s = spark
    // a session value DISTINCT from both the gate's 4 and the build
    // default, so restoration can't pass by coincidence
    val sp0 = s.conf.get("spark.sql.shuffle.partitions")
    val nd0 = s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    s.conf.set("spark.sql.shuffle.partitions", "6")
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try {
      val ex = intercept[RuntimeException](
        SparkEntry.withGateStreamConf(s) {
          assert(s.conf.get("spark.sql.shuffle.partitions") == "4")
          assert(s.conf.get(
            "spark.sql.streaming.noDataMicroBatches.enabled") == "false")
          throw new RuntimeException("gate body died mid-stream")
        })
      assert(ex.getMessage.contains("died"))
      assert(s.conf.get("spark.sql.shuffle.partitions") == "6",
        "session shuffle partitions must be restored on failure")
      assert(s.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled") == "true",
        "session no-data-batches conf must be restored on failure")

      // production stream AFTER the failed gate: its stateful operator
      // must shuffle with the SESSION's partition count — pinned by the
      // state store's on-disk layout (one dir per shuffle partition)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val mem = MemoryStream[Long]
      val cp = tempDir("gateconf-cp")
      val q = mem.toDF().toDF("k")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("gateconf_sink")
        .option("checkpointLocation", cp)
        .outputMode("complete").start()
      try {
        mem.addData(1L, 2L, 3L)
        q.processAllAvailable()
        val stateParts = new java.io.File(s"$cp/state/0")
          .listFiles().count(f => f.isDirectory &&
            f.getName.forall(_.isDigit))
        assert(stateParts == 6,
          s"expected 6 state partitions (the session conf), got " +
            s"$stateParts — the gate conf leaked into production")
      } finally {
        q.stop()
        s.catalog.dropTempView("gateconf_sink")
      }
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", sp0)
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", nd0)
    }
  }
}
