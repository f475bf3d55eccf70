package graft
// Scratch: warm query timing + stage + GC breakdown (test scope).
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._
object QWarm {
  def gcMs: Long = java.lang.management.ManagementFactory
    .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("qwarm")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = ArrayBuffer.empty[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), ms, si.numTasks))
        }
      }
    })
    spark.read.parquet("/root/testdata/sf0.1/documents.parquet").count()
    for (q <- args; i <- 1 to 2) {
      stages.synchronized(stages.clear())
      val g0 = gcMs
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"WARMQ $q run$i $sec%.2f s gc=${(gcMs - g0) / 1000.0}%.1f s " +
        f"heapMB=${java.lang.Runtime.getRuntime.totalMemory() / 1048576} " +
        java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
          .filter(_.getName.startsWith("CodeHeap"))
          .map(pl => f"${pl.getName.replace("CodeHeap ", "")}=${pl.getUsage.getUsed / 1048576}MB")
          .mkString(" "))
      Thread.sleep(1000)
      stages.synchronized {
        stages.sortBy(-_._3).take(5).foreach { case (id, n, ms, nt) =>
          println(f"  STAGE $id%4d ${ms / 1000.0}%8.2f s tasks=$nt $n")
        }
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
