package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Size-ladder benchmark for the flagship growth paths (r18 verdict ask
  * #3): SCALE.md's 100 TB arguments are plan-pinned — bucketed probes,
  * append ∝ batch, build ∝ corpus — but were never MEASURED against
  * growing input. This main runs each path at three input sizes
  * spanning ≥8× and writes per-rung wall times + derived throughput to
  * `BENCH_SCALE.json`, so the scale story is evidence, not prose:
  *
  *  - `dedup_w4096` + recovery: the reference pipeline's operating
  *    point at real-store chunk width, 64 MB → 1 GB (16×). Expected:
  *    MB/s flat-or-better with size (per-run Spark fixed costs
  *    amortize; nothing in the path is superlinear).
  *  - `minhash`: persisted-LSH index build / fixed-batch append /
  *    fixed-batch probe at corpus 64 MB → 1 GB (16×). Expected: build
  *    MB/s flat (one scan + banding + clustered write), append sec
  *    flat across index sizes (cost ∝ batch, never ∝ index), probe
  *    sec flat (partition-pruned to the probe's own (band, sb)
  *    buckets).
  *  - `ivf`: ANN index build / fixed-batch probe at 64 MB → 512 MB
  *    (8×), with nlist scaled ~√N per the documented production
  *    sizing. Expected: build MB/s roughly flat at fixed nlist growth
  *    (assignment is |corpus|·nlist map-side argmax); probe cost grows
  *    with the PRUNED FRACTION (nprobe/nlist of the corpus), i.e.
  *    sublinear in N — `probe_rows` is recorded per rung so the
  *    fraction is visible next to the seconds.
  *
  * All inputs are generated DISTRIBUTED (spark.range + codegen'd
  * expressions — no driver-side datasets beyond the dedup fixture's
  * byte array), deterministic, with near-dup/planted structure so the
  * probe paths do real candidate verification. A small warmup rung per
  * path eats one-time JIT before the timed rungs (the dedup pipeline's
  * first run measured 19 s vs 8 s steady in the main bench). CPU+I/O
  * calibration samples (the [[Bench]] two-track instrument) bracket
  * the run so a reader can place it in this VM's epoch envelope.
  *
  * `SPARK_GRAFT_SCALE_FRACTION` (default 1.0) scales every rung for
  * quick local iteration, e.g. 0.05 for a smoke run.
  */
object BenchScale {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val frac = sys.env.getOrElse("SPARK_GRAFT_SCALE_FRACTION", "1.0").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VecExpressions.register(spark)

    // unrecorded warmup first (the Bench protocol): the samples must
    // measure the epoch, not JIT state
    Bench.calibrate(spark); Bench.calibrateIo(spark)
    val calCpu0 = Bench.calibrate(spark)
    val calIo0 = Bench.calibrateIo(spark)

    val dedup = dedupLadder(spark, frac)
    val minhash = minhashLadder(spark, frac)
    val ivf = ivfLadder(spark, frac)

    val calCpu1 = Bench.calibrate(spark)
    val calIo1 = Bench.calibrateIo(spark)

    val line =
      f"""{"metric":"scale-ladder","unit":"sec","fraction":$frac,""" +
        f""""calibration":{"cpu_start":$calCpu0%.3f,"cpu_end":$calCpu1%.3f,"cpu_ref":0.62,"io_start":$calIo0%.3f,"io_end":$calIo1%.3f,"io_ref":0.42},""" +
        s""""dedup_w4096":$dedup,"minhash":$minhash,"ivf":$ivf}"""
    println(line)
    System.out.flush()
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_SCALE.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
    println(line)
    System.out.flush()
    Thread.sleep(250)
  }

  // ------------------------------------------------------ dedup ladder

  /** One rung: write a `mb`-MB 4096-aligned pool fixture, run the full
    * encode pipeline into a fresh store, then pointer-resolve it back.
    * Rungs share nothing (fresh work dirs) so each measures one run's
    * cost at its size, the per-run unit the main bench times at 64 MB.
    */
  private def dedupLadder(spark: SparkSession, frac: Double): String = {
    val width = 4096
    def one(mb: Int, timed: Boolean): Option[String] = try {
      val bytes = math.max(1, (mb * frac).toInt) * 1024 * 1024
      val dir = java.nio.file.Files.createTempDirectory(s"bscale-dedup-$mb")
      val input = dir.resolve("aligned.bin")
      java.nio.file.Files.write(input, Bench.benchFixture(bytes, width))
      val engine = new graft.api.Deduplicator(spark,
        dir.resolve("work").toString, bucketChars = 1)
      val t0 = System.nanoTime()
      val res = engine.deduplicateFile(input.toString,
        graft.api.DedupOptions(chunkBytes = width))
      val sec = (System.nanoTime() - t0) / 1e9
      Bench.resetSessionState(spark)
      val out = dir.resolve("rec.bin")
      val t1 = System.nanoTime()
      engine.recoverFile(res.outputName, out.toString)
      val rSec = (System.nanoTime() - t1) / 1e9
      Bench.resetSessionState(spark)
      val mbReal = bytes / 1e6
      if (!timed) None
      else Some(
        f"""{"mb":$mbReal%.1f,"sec":$sec%.3f,"mbps":${mbReal / sec}%.2f,"chunks":${res.chunks},"dedup_ratio":${res.pointers.toDouble / math.max(1, res.chunks)}%.4f,"recovery_sec":$rSec%.3f,"recovery_mbps":${mbReal / rSec}%.2f}""")
    } catch { case e: Throwable =>
      Some(s"""{"mb":$mb,"err":${jsonStr(e)}}""")
    }
    one(16, timed = false) // JIT warmup, unrecorded
    Seq(64, 256, 1024).flatMap(one(_, timed = true))
      .mkString("[", ",", "]")
  }

  // ---------------------------------------------------- minhash ladder

  /** Deterministic synthetic corpus: ~512 B of vocabulary-drawn words
    * per doc, generated codegen'd and distributed. Every 50th id pair
    * (base, base+1) shares ~90% of its words — planted near-dups so
    * probes verify real candidates at every size.
    */
  private def corpusDf(spark: SparkSession, docs: Long): DataFrame = {
    val base = spark.range(0, docs, 1, 32)
    // seed: near-dup partners band together; perturb every 18th word of
    // the partner — 4 of 72 words ⇒ ~8 of 71 bigram shingles differ ⇒
    // Jaccard ≈ 0.8, above the 7/10 verification gate (every 10th word
    // landed at ~0.67, just under it)
    base.select(col("id"),
      array_join(transform(sequence(lit(1), lit(72)),
        j => concat(lit("w"), pmod(
          hash(col("id") - when(pmod(col("id"), lit(50)) === 1, 1).otherwise(0),
            j + when(pmod(col("id"), lit(50)) === 1 && pmod(j, lit(18)) === 0,
              1000000).otherwise(0)),
          lit(5000)))), " ").as("text"))
  }

  private def minhashLadder(spark: SparkSession, frac: Double): String = {
    val bands = 16; val rows = 8; val sigBuckets = 8
    val appendDocs = math.max(100L, (5000L * frac).toLong)
    val probeDocs = math.max(100L, (2000L * frac).toLong)
    def one(docs0: Long, timed: Boolean): Option[String] = try {
      val docs = math.max(100L, (docs0 * frac).toLong)
      val dir = java.nio.file.Files.createTempDirectory(s"bscale-mh-$docs0")
      val idx = s"$dir/index"
      val corpus = corpusDf(spark, docs)
      val mb = docs * 512 / 1e6 // ~512 B/doc by construction
      val t0 = System.nanoTime()
      graft.ext.DocDedup.buildMinHashIndex(corpus, "id", "text", idx,
        bands, rows, sigBuckets)
      val buildSec = (System.nanoTime() - t0) / 1e9
      Bench.resetSessionState(spark)
      // fixed-size batch append into the N-sized index: ids disjoint
      // from the corpus (caller-owned uniqueness contract)
      val batch = corpusDf(spark, appendDocs)
        .select((col("id") + docs).as("id"), col("text"))
      val t1 = System.nanoTime()
      graft.ext.DocDedup.appendToMinHashIndex(batch, "id", "text", idx)
      val appendSec = (System.nanoTime() - t1) / 1e9
      Bench.resetSessionState(spark)
      // fixed-size probe batch (drawn from the corpus: self-pairs are
      // dropped, planted partners are the expected candidates)
      val probes = corpusDf(spark, probeDocs)
      val t2 = System.nanoTime()
      val pairs = graft.ext.DocDedup.probeMinHashIndex(probes, corpus,
        "id", "text", idx, 7, 10).count()
      val probeSec = (System.nanoTime() - t2) / 1e9
      Bench.resetSessionState(spark)
      if (!timed) None
      else Some(
        f"""{"docs":$docs,"mb":$mb%.1f,"build_sec":$buildSec%.3f,"build_mbps":${mb / buildSec}%.2f,"append_docs":$appendDocs,"append_sec":$appendSec%.3f,"probe_docs":$probeDocs,"probe_sec":$probeSec%.3f,"probe_pairs":$pairs}""")
    } catch { case e: Throwable =>
      Some(s"""{"docs":$docs0,"err":${jsonStr(e)}}""")
    }
    one(20000L, timed = false) // JIT warmup, unrecorded
    Seq(128000L, 512000L, 2048000L).flatMap(one(_, timed = true))
      .mkString("[", ",", "]")
  }

  // -------------------------------------------------------- ivf ladder

  /** Deterministic dim-64 float vectors, distributed; every 40th id
    * pair is near-identical (partner = base + tiny perturbation) so
    * top-k has planted structure.
    */
  private def vectorsDf(spark: SparkSession, n: Long): DataFrame =
    spark.range(0, n, 1, 32).select(col("id"),
      transform(sequence(lit(0), lit(63)),
        j => (pmod(hash(col("id") -
            when(pmod(col("id"), lit(40)) === 1, 1).otherwise(0), j),
          lit(1000)).cast("double") / 1000.0 - 0.5 +
          when(pmod(col("id"), lit(40)) === 1, 0.001).otherwise(0.0))
          .cast("float")).as("vec"))

  private def ivfLadder(spark: SparkSession, frac: Double): String = {
    val probeQueries = 1000L; val k = 10; val nprobe = 10
    def one(n0: Long, nlist0: Int, timed: Boolean): Option[String] = try {
      val n = math.max(1000L, (n0 * frac).toLong)
      val nlist = math.max(4, (nlist0 * math.sqrt(frac)).toInt)
      val dir = java.nio.file.Files.createTempDirectory(s"bscale-ivf-$n0")
      val idx = s"$dir/index"
      val mb = n * 64 * 4 / 1e6
      val t0 = System.nanoTime()
      graft.ext.Similarity.buildIvfIndex(vectorsDf(spark, n), "id", "vec",
        idx, nlist)
      val buildSec = (System.nanoTime() - t0) / 1e9
      Bench.resetSessionState(spark)
      val queries = vectorsDf(spark, math.max(50L, (probeQueries * frac).toLong))
      val t1 = System.nanoTime()
      val rows = graft.ext.Similarity.probeIvfIndex(queries, "id", "vec",
        idx, k, nprobe).count()
      val probeSec = (System.nanoTime() - t1) / 1e9
      Bench.resetSessionState(spark)
      // the pruned fraction the probe actually paid: nprobe/nlist of N
      val scanned = n.toDouble * nprobe / nlist
      if (!timed) None
      else Some(
        f"""{"vectors":$n,"mb":$mb%.1f,"nlist":$nlist,"build_sec":$buildSec%.3f,"build_mbps":${mb / buildSec}%.2f,"probe_queries":${math.max(50L, (probeQueries * frac).toLong)},"nprobe":$nprobe,"probe_sec":$probeSec%.3f,"probe_rows":$rows,"scanned_vectors":${scanned.toLong},"scanned_per_sec":${scanned / probeSec}%.0f}""")
    } catch { case e: Throwable =>
      Some(s"""{"vectors":$n0,"err":${jsonStr(e)}}""")
    }
    one(50000L, 128, timed = false) // JIT warmup, unrecorded
    // nlist ~ √N (the documented production sizing), so the probe's
    // pruned fraction shrinks as the corpus grows
    Seq((250000L, 500), (1000000L, 1000), (2000000L, 1414))
      .flatMap { case (n, nl) => one(n, nl, timed = true) }
      .mkString("[", ",", "]")
  }

  private def jsonStr(e: Throwable): String = {
    val s = String.valueOf(e.getMessage).take(300)
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
  }
}
