package graft

import org.apache.spark.sql.functions._

/** Scratch probe (main, not a test): wall-clock throughput of the
  * round-13 document/columnar walks — PDF text extraction (xref walk
  * + FlateDecode + operator scan), DOCX extraction (CRC-verified zip
  * + WordprocessingML walk), and the Arrow IPC footer walk — each
  * over synthetic blobs on local[32]. All three are narrow
  * per-partition maps; the numbers to watch are blobs/s and MB/s,
  * since at 100 TB these walks ARE the document-ingest scan cost.
  * The arrow probe additionally separates the metadata-only claim:
  * its MB/s should scale with FILE size while wall-time stays flat,
  * because the walk reads footer + batch headers, never buffer
  * bodies.
  *
  * Run: sbt "Test/runMain graft.DocFormatScaleProbe"
  */
object DocFormatScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-52s $sec%8.2f s")
      (r, sec)
    }
    val nBlobs = 20000L

    // PDF: 5 pages x 8 lines of ~60 chars, Flate-compressed content,
    // alternating coding routes — a realistic small-document mix.
    val mkPdf = udf((id: Long) => {
      val pages = (0 until 5).map(p => (0 until 8).map(l =>
        s"document $id page $p line $l " + ("lorem ipsum " * 4)))
      (id % 4) match {
        case 0 => graft.ext.Pdf.buildPdf(pages, flate = true)
        case 1 => graft.ext.Pdf.buildPdf(pages, flate = true, useTJ = true)
        case 2 => graft.ext.Pdf.buildPdf(pages, flate = true,
          xrefStream = true)
        case _ => graft.ext.Pdf.buildPdf(pages, flate = true, objStm = true)
      }
    })
    val pdf = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkPdf(col("id")).as("blob"))
      .localCheckpoint()
    val pdfMb = pdf.select(sum(length(col("blob")))).collect()(0)
      .getLong(0) / 1e6
    val (pdfRows, pdfSec) = time(f"pdf text extraction, 20k docs ($pdfMb%.0f MB)") {
      graft.ext.Pdf.extractPdfText(pdf, "blob").count()
    }
    println(f"[probe] pdf: $pdfRows pages, ${nBlobs / pdfSec}%.0f blobs/s, " +
      f"${pdfMb / pdfSec}%.0f MB/s")

    // DOCX: 10 paragraphs of ~80 chars with tabs — deflated OPC.
    val mkDocx = udf((id: Long) => graft.ext.Docx.buildDocx(
      (0 until 10).map(p =>
        s"doc $id paragraph $p\t" + ("sample words here " * 4))))
    val docx = spark.range(nBlobs)
      .select(col("id").as("doc_id"), mkDocx(col("id")).as("blob"))
      .localCheckpoint()
    val docxMb = docx.select(sum(length(col("blob")))).collect()(0)
      .getLong(0) / 1e6
    val (docxRows, docxSec) = time(f"docx extraction, 20k docs ($docxMb%.0f MB)") {
      graft.ext.Docx.extractDocxText(docx, "blob").count()
    }
    println(f"[probe] docx: $docxRows paras, ${nBlobs / docxSec}%.0f blobs/s, " +
      f"${docxMb / docxSec}%.0f MB/s")

    // Arrow: 2k files x 5k rows in 10 batches — the metadata-only
    // walk should cost ~per-batch, not ~per-byte.
    val nArrow = 2000L
    val mkArrow = udf((id: Long) =>
      graft.ext.ArrowIpc.buildArrowFile(5000, 500, id, withScore = true))
    val arrow = spark.range(nArrow)
      .select(col("id").as("doc_id"), mkArrow(col("id")).as("blob"))
      .localCheckpoint()
    val arrowMb = arrow.select(sum(length(col("blob")))).collect()(0)
      .getLong(0) / 1e6
    val (arrowRows, arrowSec) = time(
      f"arrow footer walk, 2k files ($arrowMb%.0f MB)") {
      graft.ext.ArrowIpc.extractArrowMeta(arrow, "blob")
        .agg(sum("n_rows")).collect()(0).getLong(0)
    }
    println(f"[probe] arrow: $arrowRows rows indexed, " +
      f"${nArrow / arrowSec}%.0f files/s, ${arrowMb / arrowSec}%.0f MB/s " +
      "(metadata-only: bodies never touched)")

    spark.stop()
  }
}
