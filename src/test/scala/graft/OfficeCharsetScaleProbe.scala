package graft

import org.apache.spark.sql.functions._

/** Scratch probe (main, not a test): slope evidence for the round-14
  * format additions (r14 verdict ask #5) — XLSX cell extraction, PPTX
  * text extraction, and charset sniff + transcode — each over a 4×
  * blob-count doubling ladder. All three are narrow per-partition
  * maps (PlanSpec pins no-Exchange), so the claim under measurement
  * is cost ∝ bytes: blobs/s and MB/s should hold ~flat as the corpus
  * doubles, i.e. wall-time slope ≈ the data slope. At 100 TB these
  * walks are the document-ingest scan cost — a super-linear slope
  * here means a parser with quadratic substring behavior, which is
  * exactly what a probe catches and a 500-doc gate cannot.
  *
  * Run: sbt "Test/runMain graft.OfficeCharsetScaleProbe"
  */
object OfficeCharsetScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // min-of-2 per measurement: this VM's host-steal stall epochs can
    // inflate a single run 10-30x (same protocol as Bench and
    // MaintenanceScaleProbe); the second run also absorbs JIT warmup,
    // which otherwise masquerades as a super-linear first step.
    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s1 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      f
      val s2 = (System.nanoTime() - t1) / 1e9
      val sec = math.min(s1, s2)
      println(f"[probe] $label%-52s $sec%8.2f s (runs $s1%.2f/$s2%.2f)")
      (r, sec)
    }
    def mb(df: org.apache.spark.sql.DataFrame): Double =
      df.select(sum(length(col("blob")))).collect()(0).getLong(0) / 1e6

    // XLSX: 2 sheets x 20 rows x 6 cells, text/number mixed — the
    // shared-string and inline-string read paths both exercised by
    // the builder's alternation.
    val mkXlsx = udf((id: Long) => graft.ext.Xlsx.buildXlsx(
      (0 until 2).map(sh => s"s$sh" -> (0 until 20).map(r =>
        (0 until 6).map[graft.ext.Xlsx.CellValue](c =>
          if ((r + c) % 3 == 0) graft.ext.Xlsx.Num(s"${id + r * 6 + c}")
          else graft.ext.Xlsx.Text(
            s"cell $id/$sh/$r/$c " + ("words " * 3)))))))
    for (n <- Seq(5000L, 10000L, 20000L)) {
      val xlsx = spark.range(n)
        .select(col("id").as("doc_id"), mkXlsx(col("id")).as("blob"))
        .localCheckpoint()
      val xmb = mb(xlsx)
      val (rows, sec) = time(f"xlsx cell extraction, $n docs ($xmb%.0f MB)") {
        graft.ext.Xlsx.extractXlsxCells(xlsx, "blob").count()
      }
      println(f"[probe] xlsx n=$n%6d: $rows cells, ${n / sec}%.0f blobs/s, " +
        f"${xmb / sec}%.0f MB/s")
    }

    // PPTX: 6 slides x 5 paragraphs with embedded newlines (runs split
    // mid-text by the builder).
    val mkPptx = udf((id: Long) => graft.ext.Pptx.buildPptx(
      (0 until 6).map(sl => (0 until 5).map(p =>
        s"slide $sl para $p of deck $id\n" + ("talking points here " * 3)))))
    for (n <- Seq(5000L, 10000L, 20000L)) {
      val pptx = spark.range(n)
        .select(col("id").as("doc_id"), mkPptx(col("id")).as("blob"))
        .localCheckpoint()
      val pmb = mb(pptx)
      val (rows, sec) = time(f"pptx text extraction, $n docs ($pmb%.0f MB)") {
        graft.ext.Pptx.extractPptxText(pptx, "blob").count()
      }
      println(f"[probe] pptx n=$n%6d: $rows paras, ${n / sec}%.0f blobs/s, " +
        f"${pmb / sec}%.0f MB/s")
    }

    // Charset: the q239 seven-encoding rotation, ~1 KB bodies so the
    // sniffer's density scans see realistic lengths.
    val mkRaw = udf((id: Long) => {
      val planted = (0 until 400).map(k =>
        (0x430 + ((id + k) % 30)).toChar).mkString + " " + id
      (id % 7) match {
        case 0 => (s"plain ascii document $id " + ("filler " * 60))
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        case 1 => planted.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        case 2 => Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
          planted.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        case 3 => Array[Byte](0xFF.toByte, 0xFE.toByte) ++
          planted.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
        case 4 => Array[Byte](0xFE.toByte, 0xFF.toByte) ++
          planted.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
        case 5 => planted.getBytes("windows-1251")
        case _ => ((0 until 200).map(k =>
          (0x3042 + ((id + k) % 20)).toChar).mkString + " " + id)
          .getBytes("Shift_JIS")
      }
    })
    for (n <- Seq(50000L, 100000L, 200000L)) {
      val raw = spark.range(n)
        .select(col("id").as("doc_id"), mkRaw(col("id")).as("blob"))
        .localCheckpoint()
      val cmb = mb(raw)
      val (rows, sec) = time(
        f"charset sniff+transcode, $n blobs ($cmb%.0f MB)") {
        graft.ext.Charset.transcodeToUtf8(raw, "blob")
          .where(col("text").isNotNull).count()
      }
      println(f"[probe] charset n=$n%7d: $rows decoded, " +
        f"${n / sec}%.0f blobs/s, ${cmb / sec}%.0f MB/s")
    }
    spark.stop()
  }
}
