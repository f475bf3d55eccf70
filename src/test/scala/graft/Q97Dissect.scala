package graft

import org.apache.spark.sql.functions._
import graft.api.{DedupOptions, Deduplicator}

/** Where does the q97 gate's time go? Compare the streaming machinery
  * against the same three deduplicateBatch calls made directly.
  */
object Q97Dissect {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .where(col("doc_id") < 200).select("doc_id", "text").collect()
    def mkFiles(base: java.nio.file.Path): Seq[String] = {
      java.nio.file.Files.createDirectories(base)
      docs.map { r =>
        val p = base.resolve(f"doc${r.getLong(0)}%05d.txt")
        java.nio.file.Files.write(p, r.getString(1).getBytes("UTF-8"))
        p.toString
      }.toSeq.sorted
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(j.jobId, (System.nanoTime(),
            Option(j.properties.getProperty("spark.job.description"))
              .orElse(Option(j.properties.getProperty("callSite.short")))
              .getOrElse("?")))
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, d) = jobs.get(j.jobId)
          println(f"[job] ${(System.nanoTime() - t0) / 1e9}%6.2f s  $d")
        }
      })
    (1 to 2).foreach { i =>
      val tmp = java.nio.file.Files.createTempDirectory("q97-dissect")
      val paths = mkFiles(tmp.resolve("in"))
      val engine = new Deduplicator(spark, tmp.resolve("work").toString,
        bucketChars = 1)
      val t0 = System.nanoTime()
      paths.grouped(70).foreach { g =>
        val tb = System.nanoTime()
        engine.deduplicateBatch(g, DedupOptions(chunkBytes = 64, algorithm = "md5"))
        println(f"[dissect] batch of ${g.size}: ${(System.nanoTime() - tb) / 1e9}%.2f s")
      }
      val n = engine.chunkRepetition().count()
      println(f"[dissect] run $i batch-API total: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rep rows)")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    }
    spark.stop()
  }
}
