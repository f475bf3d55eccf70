package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}
import java.io.{BufferedInputStream, BufferedOutputStream}

/** Ordered byte-reassembly sink (SURVEY §2.6 O3, §4 custom-physical #1).
  *
  * The reference writes recovered chunks strictly in input order through a
  * single file handle (lib/deduplicator.ex:159-164,173-184). Distributed
  * equivalent: range-partition by `pos` (ranges are globally ordered by
  * partition index), each task streams its range to a ranged part file via
  * the Hadoop FS API, then the driver concatenates part *streams* in index
  * order — no `collect()`, bounded memory everywhere. The final concat is
  * the irreducible single-writer step of ordered reassembly; on a real
  * cluster with an FS that supports it (HDFS `concat`), even that step is
  * a metadata operation.
  */
object OrderedBinarySink {

  /** Write `bytesCol` of `df` concatenated in ascending `posCol` order to
    * a single file at `dest`.
    */
  def write(df: DataFrame, posCol: String, bytesCol: String, dest: String): Unit = {
    val spark = df.sparkSession
    val tmpDir = dest + ".parts"
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism, 64))
    val staged = df
      .repartitionByRange(parts, col(posCol))
      .sortWithinPartitions(posCol)
      .select(bytesCol)
    // Executors must build their FS from the SESSION Hadoop conf (a bare
    // `new Configuration()` drops spark.hadoop.* and breaks on any
    // non-default FS) — ship it via the serializable wrapper.
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val confBc = spark.sparkContext.broadcast(serConf)
    staged.rdd.mapPartitionsWithIndex { (idx, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val fs = FileSystem.get(new java.net.URI(tmpDir), confBc.value.value)
        val os = new BufferedOutputStream(fs.create(new Path(tmpDir, f"part-$idx%05d"), true))
        rows.foreach { r => if (!r.isNullAt(0)) os.write(r.getAs[Array[Byte]](0)) }
        os.close()
        Iterator.single(idx)
      }
    }.collect() // collects only partition indices (tiny), not data
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(dest), conf)
    val out = new BufferedOutputStream(fs.create(new Path(dest), true))
    val buf = new Array[Byte](1 << 20)
    val tmpPath = new Path(tmpDir)
    if (fs.exists(tmpPath)) {
      fs.listStatus(tmpPath).map(_.getPath).sortBy(_.getName).foreach { pf =>
        val in = new BufferedInputStream(fs.open(pf))
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
        in.close()
      }
      fs.delete(tmpPath, true)
    }
    out.close()
  }
}
