package graft
// Scratch probe for round-7 gate queries (test scope only): runs the new
// oracle-checked queries at sf0.01 and prints row counts + samples so the
// planted-gate constructions can be validated before the driver's gate.
import org.apache.spark.sql.SparkSession

object R7Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q43_ann_recall", "q44_ann_ivf_recall", "q47_simhash_planted")
    val spark = SparkSession.builder().master("local[8]").appName("r7probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val rows = df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"== $n: ${rows.length} rows in $sec%.1f s")
      rows.take(8).foreach(r => println(s"   $r"))
      if (rows.length > 8) println(s"   ... (${rows.length - 8} more)")
    }
    spark.stop()
  }
}
