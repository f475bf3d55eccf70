package graft

/** Wall-time dissection for the q97 streaming gate: run the gate twice
  * in one warm session (the bench's min-of-2 shape) and print both
  * timings, so the gate's steady-state cost is known before it ships.
  */
object Q97Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("q97_streaming_dedup")(
        spark, "/root/testdata/sf0.01")
      val n = df.count()
      println(f"[q97probe] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
