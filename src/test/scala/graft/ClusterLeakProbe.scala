package graft
import org.apache.spark.sql.SparkSession
object ClusterLeakProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("clp")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pairs = Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L),(5L,6L),(10L,11L))
      .toDF("id_a","id_b")
    val res = graft.ext.DocDedup.nearDupClusters(pairs)
    println(s"CLP rows=${res.count()}")
    println(s"CLP persistent RDDs after: ${spark.sparkContext.getPersistentRDDs.size}")
    spark.sparkContext.getPersistentRDDs.take(5).foreach { case (id, r) =>
      println(s"CLP   rdd=$id ${r.toString.take(60)}") }
    spark.stop()
  }
}
