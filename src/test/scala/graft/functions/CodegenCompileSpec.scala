package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Every native kernel must actually COMPILE under janino — not just
  * appear inside a WholeStageCodegen span. `plan.contains("*(")` pins
  * the INTENT; Spark's compile-failure fallback silently reruns the
  * whole tree interpreted, which is exactly how the
  * `Module.MODULE$`-style doGenCode of NfcNormalize/NormalizeUrl
  * shipped broken for a round (janino cannot resolve nested Scala
  * objects through the mirror class — round-9 bench log). This spec
  * disables both fallbacks so a kernel whose generated Java does not
  * compile FAILS here instead of quietly degrading.
  */
class CodegenCompileSpec extends SparkFunSuite {

  test("all native kernels compile under CODEGEN_ONLY (no silent " +
    "interpreted fallback)") {
    val s = spark; import s.implicits._
    VecExpressions.register(s)
    val prevFallback = s.conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = s.conf.getOption("spark.sql.codegen.factoryMode")
    s.conf.set("spark.sql.codegen.fallback", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "café unicode path"), // NFC non-ASCII branch
        (3L, "")).toDF("id", "text")
      val kernels: Seq[(String, org.apache.spark.sql.Column)] = Seq(
        "nfc" -> graft.ext.TextAnalysis.nfc(col("text")),
        "normalizeUrl" -> graft.ext.TextAnalysis.normalizeUrl(
          concat(lit("HTTP://Host:80/x?b=1&utm_source=z#f"), col("id"))),
        "byteStats" -> graft.ext.TextAnalysis.byteStats(col("text")),
        "wordBigrams" -> graft.ext.TextAnalysis.wordBigrams(col("text")),
        "charChunks" -> graft.ext.TextAnalysis.charChunks(col("text"), 8),
        "charNgrams" -> graft.ext.TextAnalysis.charNgrams(col("text"), 3),
        "windowHashes" -> call_function("graft_window_hashes",
          col("text"), lit(4)),
        "gopherSignals" -> call_function("graft_gopher_signals",
          col("text")),
        "minhashBandSigs" -> call_function("graft_minhash_band_sigs",
          graft.ext.TextAnalysis.wordBigrams(col("text")),
          lit(4), lit(2)))
      for ((name, k) <- kernels) {
        val rows = docs.select(col("id"), k.as("out")).collect()
        assert(rows.length == 3, s"$name under CODEGEN_ONLY")
      }
      // vector kernels need array<float> input
      val vecs = Seq((1L, Array(1f, 2f, 3f), Array(0.5f, 0.5f, 0.5f)))
        .toDF("id", "a", "b")
      val vkernels = Seq(
        "vecDot" -> call_function("graft_vec_dot", col("a"), col("b")),
        "vecLshSig" -> call_function("graft_vec_lsh_sig", col("a"),
          lit(4), lit(0)),
        "minhashSig" -> call_function("graft_minhash_sig",
          split(lit("a b c d"), " "), lit(8)))
      for ((name, k) <- vkernels) {
        assert(vecs.select(k.as("out")).collect().length == 1,
          s"$name under CODEGEN_ONLY")
      }
    } finally {
      def restore(key: String, v: Option[String]): Unit =
        v.fold(s.conf.unset(key))(s.conf.set(key, _))
      restore("spark.sql.codegen.fallback", prevFallback)
      restore("spark.sql.codegen.factoryMode", prevFactory)
    }
  }
}
