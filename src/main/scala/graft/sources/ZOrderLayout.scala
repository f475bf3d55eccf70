package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) storage layout for TWO-dimensional data
  * skipping — the lakehouse layout trick (Delta OPTIMIZE ZORDER BY,
  * Iceberg sort orders) re-expressed as a plain partitioned-parquet
  * write plus a driver-planned pruned read.
  *
  * The problem it solves at 100 TB: partitioning by ONE column prunes
  * one predicate dimension; a query boxed in TWO dimensions (user ∈
  * [a,b] AND hour ∈ [c,d]) still scans every partition of the other
  * dimension. Interleaving the bits of both keys (z = a₀b₀a₁b₁…) makes
  * partition prefixes correspond to square-ish CELLS of the (a, b)
  * plane, so a box query touches only the partitions whose cell
  * intersects the box — O(box area / cell area) of the data instead of
  * O(one full dimension).
  *
  * Shapes, mirroring the LSH/IVF index pair in [[graft.ext.Similarity]]:
  *   - [[writeZOrdered]]: one pass — compute z, partition by its top
  *     `prefixBits` bits (bucket-clustered write: files ≈ partitions,
  *     not tasks × partitions), sort within partitions by full z for
  *     row-group locality, pin (bits, prefixBits, column names) in an
  *     underscore sidecar.
  *   - [[readBox]]: enumerate the ≤ 2^prefixBits prefixes (driver-side,
  *     trivially small), keep those whose cell intersects the box,
  *     read ONLY those partitions (pruned at file-listing time — the
  *     spec asserts the executed scan's partition count), apply the
  *     exact box filter as a residual. Result ≡ full-scan filter;
  *     q89 pins that equivalence against DuckDB on the raw table.
  *
  * Dimensions are caller-discretized to unsigned cells in [0, 2^bits):
  * the layout orders by cell, the residual filter keeps exactness for
  * values that share a cell.
  */
object ZOrderLayout {

  /** Bit-interleave two `bits`-wide non-negative cells: z's bit 2i is
    * a's bit i, bit 2i+1 is b's bit i. Pure Column arithmetic (shifts
    * and masks) — codegen'd, no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"need 1 <= bits <= 16, got $bits")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** The top-`prefixBits` bits of a `2·bits`-wide z value. */
  private def zPrefix(z: Column, bits: Int, prefixBits: Int): Column =
    shiftright(z, 2 * bits - prefixBits)

  /** Cell ranges covered by a z prefix: prefix p of depth d fixes the
    * top ⌈d/2⌉ bits of a and the top ⌊d/2⌋ bits of b (a holds the even
    * z bits, starting at bit 0 = a's bit 0 — the HIGH z bit is a's high
    * bit when d is even, b's when odd; derived generically below by
    * walking the prefix bits).
    */
  private[graft] def prefixBox(prefix: Long, bits: Int, prefixBits: Int)
      : (Long, Long, Long, Long) = {
    var aLo = 0L; var bLo = 0L; var aBits = 0; var bBits = 0
    // walk prefix bits from the z value's TOP bit (2·bits−1, a b-bit
    // when numbering z bit 2i+1 as b's bit i) downward
    var k = 0
    while (k < prefixBits) {
      val zBitIdx = 2 * bits - 1 - k // absolute z bit position
      val bit = (prefix >> (prefixBits - 1 - k)) & 1L
      if (zBitIdx % 2 == 0) { aLo = (aLo << 1) | bit; aBits += 1 }
      else { bLo = (bLo << 1) | bit; bBits += 1 }
      k += 1
    }
    val aSpan = 1L << (bits - aBits)
    val bSpan = 1L << (bits - bBits)
    (aLo * aSpan, aLo * aSpan + aSpan - 1, bLo * bSpan, bLo * bSpan + bSpan - 1)
  }

  /** Write `df` z-ordered by (`aCell`, `bCell`) (both must already be
    * integer cells in [0, 2^bits)) under `path`, partitioned by the
    * z prefix. `prefixBits` sizes the partition count (2^prefixBits
    * directories) — pick so one partition ≈ one task's worth of data.
    */
  def writeZOrdered(df: DataFrame, path: String, aCell: String,
                    bCell: String, bits: Int, prefixBits: Int): Unit = {
    require(prefixBits >= 1 && prefixBits <= 2 * bits && prefixBits <= 20,
      s"need 1 <= prefixBits <= min(2*bits, 20), got $prefixBits")
    graft.operators.Reserved.assertNone(df, "writeZOrdered")
    // Cells outside [0, 2^bits) would silently alias via bit truncation
    // (negative cells corrupt the layout and readBox can miss rows), so
    // fail loudly per-row: two codegen'd comparisons, no extra scan.
    val aL = col(aCell).cast("long"); val bL = col(bCell).cast("long")
    val lim = lit(1L << bits)
    val zRaw = zValue(aL, bL, bits)
    val z = when(aL >= 0 && aL < lim && bL >= 0 && bL < lim, zRaw)
      .otherwise(raise_error(concat(
        lit(s"writeZOrdered: cell out of [0, ${1L << bits}) for " +
          s"($aCell,$bCell): ("), aL, lit(","), bL, lit(")"))))
    df.withColumn("_graft_z", z)
      .withColumn("_graft_zp", zPrefix(col("_graft_z"), bits, prefixBits))
      .repartition(col("_graft_zp"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.mode("overwrite").partitionBy("_graft_zp").parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(path, "_graft_zorder_meta"), true)
    try out.write(s"$bits,$prefixBits,$aCell,$bCell".getBytes("UTF-8"))
    finally out.close()
  }

  /** Read only the rows with `aCell ∈ [aLo, aHi] AND bCell ∈ [bLo,
    * bHi]` from a [[writeZOrdered]] layout: driver-side enumeration of
    * the ≤ 2^prefixBits prefixes keeps those intersecting the box, the
    * scan lists only those partition directories, and the exact box
    * predicate runs as a residual filter. Result ≡ the full-scan
    * filter.
    */
  def readBox(spark: SparkSession, path: String,
              aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaIn = fs.open(
      new org.apache.hadoop.fs.Path(path, "_graft_zorder_meta"))
    val meta = try scala.io.Source.fromInputStream(metaIn).mkString
      finally metaIn.close()
    val Array(bitsS, prefixBitsS, aCell, bCell) = meta.split(",")
    val (bits, prefixBits) = (bitsS.toInt, prefixBitsS.toInt)
    val hit = (0L until (1L << prefixBits)).filter { p =>
      val (pa0, pa1, pb0, pb1) = prefixBox(p, bits, prefixBits)
      pa1 >= aLo && pa0 <= aHi && pb1 >= bLo && pb0 <= bHi
    }
    spark.read.parquet(path)
      .where(col("_graft_zp").isin(hit: _*) &&
        col(aCell) >= aLo && col(aCell) <= aHi &&
        col(bCell) >= bLo && col(bCell) <= bHi)
      .drop("_graft_zp")
  }
}
