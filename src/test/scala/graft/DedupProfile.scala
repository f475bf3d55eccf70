package graft
// Scratch: stage-level profile of the 64MB/64B dedup pipeline (test scope).
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer
import graft.api.{DedupOptions, Deduplicator}
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("dprof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = ArrayBuffer.empty[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.synchronized {
          val det = si.details.linesIterator
            .filter(_.contains("graft")).take(2).mkString(" | ")
          stages += ((si.stageId, (si.name.takeWhile(_ != '\n') + " :: " + det).take(160), ms, si.numTasks))
        }
      }
    })
    val data = Bench.benchFixture(64 * 1024 * 1024)
    val dir = java.nio.file.Files.createTempDirectory("dprof")
    val input = dir.resolve("aligned.bin")
    java.nio.file.Files.write(input, data)
    for (i <- 1 to 2) {
      stages.synchronized(stages.clear())
      val engine = new Deduplicator(spark, dir.resolve(s"w$i").toString)
      val t0 = System.nanoTime()
      val res = engine.deduplicateFile(input.toString, DedupOptions(chunkBytes = 64))
      println(f"DPROF run$i total ${(System.nanoTime() - t0) / 1e9}%.2f s chunks=${res.chunks}")
      Thread.sleep(1000)
      stages.synchronized {
        stages.sortBy(-_._3).take(10).foreach { case (id, n, ms, nt) =>
          println(f"  DSTAGE $id%4d ${ms / 1000.0}%7.2f s tasks=$nt $n")
        }
      }
    }
    spark.stop()
  }
}
