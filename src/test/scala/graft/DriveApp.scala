package graft
// Scratch driver for manual end-to-end verification (test scope only).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.api.{DedupOptions, Deduplicator}
object DriveApp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("drive")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("drive").toString
    val engine = new Deduplicator(spark, s"$work/w")
    val res = engine.deduplicateFile("/root/repo/SURVEY.md",
      DedupOptions(chunkBytes = 32, binParity = true, outputName = Some("survey.enc")))
    println(s"DEDUP-RESULT: $res")
    engine.recoverFile("survey.enc", s"$work/recovered.md")
    val orig = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/root/repo/SURVEY.md"))
    val rec = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$work/recovered.md"))
    println(s"ROUNDTRIP-BYTES-EQUAL: ${java.util.Arrays.equals(orig, rec)} (${orig.length} bytes)")
    val res2 = engine.deduplicateFile("/root/repo/BASELINE.md",
      DedupOptions(chunkBytes = 4, algorithm = "blake3-not-real"))
    val algo = engine.catalog.files().where(col("file_id") === res2.fileId)
      .collect()(0).getAs[String]("algorithm")
    println(s"FALLBACK-RESULT: $res2 algo-recorded=$algo")
    engine.recoverFile(res2.outputName, s"$work/recovered-baseline.md")
    val ok2 = java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/root/repo/BASELINE.md")),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$work/recovered-baseline.md")))
    println(s"ROUNDTRIP2-BYTES-EQUAL: $ok2")
    try { engine.recoverFile("nope.bin", s"$work/x"); println("PROBE-MISSING: no error (BAD)") }
    catch { case e: IllegalArgumentException => println(s"PROBE-MISSING-OK: ${e.getMessage.take(70)}") }
    println(s"REPORT: ${engine.chunkRepetition().count()} duplicated chunk hashes")
    println(s"BIN-FILE: " + new java.io.File(s"$work/w/encoded/survey.enc").length() + " bytes vs orig " + orig.length)
    spark.stop()
  }
}
