package graft

import org.apache.spark.sql.functions._

/** Physical-plan audits: the queries must not just be correct — they must
  * produce the plan you'd want at scale (builder brief: pushdown, pruning,
  * broadcast). Asserted on the real sf0.001 testdata.
  */
class PlanSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("driver smoke: entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("filter and projection reach the parquet scan (pushdown + pruning)") {
    val df = SparkEntry.queries("q02_filter_sort_part")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(p_size,40"),
      s"p_size > 40 must be pushed to the scan:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail("no ReadSchema in plan"))
    assert(readSchema.contains("p_partkey") && !readSchema.contains("p_name"),
      s"scan must prune to the 3 selected columns: $readSchema")
  }

  test("join chain broadcasts the small dimension sides (AQE)") {
    val df = SparkEntry.queries("q03_join_agg_segment")(spark, sf)
    df.collect() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dim joins at this scale must be broadcast, got:\n$plan")
  }

  test("group-aggregates are partial (map-side combine before the shuffle)") {
    val df = SparkEntry.queries("q01_agg_lineitem")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // partial_sum/partial_count markers = two-phase hash aggregation
    assert(plan.contains("partial_sum") || plan.contains("partial"),
      s"aggregation must be map-side partial:\n$plan")
  }

  test("text projections stay in whole-stage codegen") {
    val df = SparkEntry.queries("q10_text_stats")(spark, sf)
    df.collect() // AQE prints codegen stage markers only in the final plan
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes = operators fused into a whole-stage-codegen stage
    assert(plan.contains("*("),
      s"scan-speed projections must be codegen'd:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Eval UDF"),
      "no interpreted UDFs in the text-analysis path")
  }

  test("text shingle/chunk producers are native expressions inside " +
    "whole-stage codegen — no interpreted HOF fallback") {
    graft.functions.VecExpressions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for ((name, c) <- Seq(
        "wordBigrams" -> graft.ext.TextAnalysis.wordBigrams(col("text")),
        "charChunks" -> graft.ext.TextAnalysis.charChunks(col("text"), 64),
        "charNgrams" -> graft.ext.TextAnalysis.charNgrams(col("text"), 3),
        "windowHashes" -> call_function("graft_window_hashes",
          col("text"), lit(8)))) {
      val df = docs.select(col("doc_id"), c.as("x"))
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      // the native expression is in the plan...
      assert(s.toLowerCase.contains(name.toLowerCase) ||
        s.contains("graft_"), s"$name: native expression missing:\n$s")
      // ...and the projection stage is whole-stage-codegen'd ("*(n)"),
      // which an ArrayTransform/ZipWith formulation can never be
      assert(s.linesIterator.exists(l =>
        l.contains("*(") && l.contains("Project")),
        s"$name: projection fell out of whole-stage codegen:\n$s")
      assert(!s.contains("ArrayTransform") && !s.contains("ZipWith"),
        s"$name: interpreted HOF leaked back into the plan:\n$s")
      df.collect() // and it executes
    }
  }

  test("MinHash banding is a native projection — no wide min-aggregate, " +
    "degenerate-parallelism scan is spread") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sig = docs.select(
      call_function("graft_minhash_band_sigs",
        graft.ext.TextAnalysis.wordBigrams(col("text")), lit(16), lit(8)))
    val plan = sig.queryExecution.executedPlan.toString
    assert(plan.contains("minhashbandsigs") || plan.contains("MinHashBandSigs")
      || plan.contains("graft_minhash_band_sigs"),
      s"banding must be the native expression:\n$plan")
    assert(!plan.contains("partial_min"),
      "the 128-wide min-aggregate formulation must be gone")
    // The CPU-dense BANDING projection is what needs cluster spread on a
    // degenerate one-file scan; the cheap shingle explode must NOT pay a
    // round-robin pre-shuffle of its own (r19 optimization): its distinct
    // already redistributes through a hash exchange, so a spread there
    // only inflated every downstream stage's task count.
    val bandPlan = graft.ext.DocDedup.bandedSignatures(
        docs, "doc_id", "text", 16, 8, 8)
      .queryExecution.executedPlan.toString
    assert(bandPlan.contains("Exchange RoundRobinPartitioning") ||
      bandPlan.contains("REPARTITION"),
      s"a one-partition scan must be spread before the banding:\n$bandPlan")
    val shPlan = graft.ext.DocDedup.shingles(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!shPlan.contains("Exchange RoundRobinPartitioning"),
      s"the shingle explode must not pay its own pre-shuffle (the " +
        s"distinct's hash exchange is its redistribution):\n$shPlan")
    assert(shPlan.contains("Exchange hashpartitioning"),
      s"shingles must still deduplicate through a hash exchange:\n$shPlan")
  }

  test("ANN scoring tail is a two-level top-k: partial group-limit " +
    "below the query_id exchange, for every tier") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.where(col("vec_id") < 3)
    // The full scored set must never cross the query_id shuffle or flow
    // into the one-partition-per-query WindowExec: InferWindowGroupLimit
    // plans the rank<=k filter as WindowGroupLimit(Partial) on the map
    // side, pruning each partition to <= k rows per query pre-shuffle.
    def assertTwoLevel(df: org.apache.spark.sql.DataFrame, tier: String): Unit = {
      df.collect() // AQE: inspect the final plan
      val lines = df.queryExecution.executedPlan.toString.linesIterator.toSeq
      val exch = lines.indexWhere(_.contains("Exchange hashpartitioning(query_id"))
      val partial = lines.indexWhere(l =>
        l.contains("WindowGroupLimit") && l.contains("Partial"))
      assert(exch >= 0, s"$tier: no query_id exchange found:\n${lines.mkString("\n")}")
      assert(partial > exch, // plan prints top-down: below = later line
        s"$tier: map-side WindowGroupLimit(Partial) must sit below the " +
          s"query_id exchange (got exchange@$exch, partial@$partial):\n${lines.mkString("\n")}")
    }
    assertTwoLevel(graft.ext.Similarity.bruteForceTopK(
      emb, q, "vec_id", "embedding", 5), "brute-force")
    assertTwoLevel(graft.ext.Similarity.lshTopK(
      emb, q, "vec_id", "embedding", 5), "lsh-scoreCandidates")
  }

  test("capPerSource plans as a two-level group limit, not a full " +
    "per-source sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ext.CorpusPrep.capPerSource(docs, col("doc_id"),
      col("source"), 5, "s")
    df.collect() // finalize AQE
    val lines = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.linesIterator.toSeq
    val exch = lines.indexWhere(_.contains("Exchange hashpartitioning(source"))
    val partial = lines.indexWhere(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial"))
    assert(exch >= 0 && partial > exch,
      "map-side WindowGroupLimit(Partial) must sit below the source " +
        s"exchange (exchange@$exch, partial@$partial):\n${lines.mkString("\n")}")
  }

  test("exact-Jaccard tier 2 filters inside a broadcast join; verify is " +
    "the codegen'd popcount, not a Scala UDF") {
    val df = SparkEntry.queries("q15_dedup_ngram_jaccard")(spark, sf)
    // q15 returns a localCheckpoint of the executed plan; audit the
    // operator's pre-checkpoint shape instead.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    graft.functions.VecExpressions.register(spark)
    // non-foldable inputs: literal arrays constant-fold at optimize
    // time (itself proof the expression is Catalyst-native)
    val probe = docs.select(col("doc_id"),
      call_function("graft_bitmap_and_count",
        array(col("doc_id")), array(col("doc_id"))).as("c"))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("bitmapandcount") || plan.contains("BitmapAndCount")
      || plan.contains("graft_bitmap_and_count"),
      s"verify kernel must be the native popcount expression:\n$plan")
    assert(df.count() >= 0) // and the full operator still executes
  }

  test("corpus split/mix/redact are shuffle-free projections (scan speed)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val split = docs.select(col("doc_id"),
      graft.ext.CorpusPrep.splitAssign(col("doc_id"), "g",
        Seq("train" -> 0.9, "test" -> 0.1)))
    val mix = graft.ext.CorpusPrep.weightedMix(docs, col("doc_id"),
      col("source"), Map("src0" -> 0.5), "m")
    val red = docs.select(col("doc_id"),
      graft.ext.TextAnalysis.redact(col("text")))
    for ((name, df) <- Seq("splitAssign" -> split, "weightedMix" -> mix,
      "redact" -> red)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$name must not shuffle (pure projection/filter):\n$plan")
      assert(plan.contains("*("), s"$name must stay in codegen:\n$plan")
    }
  }

  test("web-prep stages are shuffle-free projections: normalizeUrl, " +
    "c4LineFilter, gopherFilter run at scan speed") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val norm = docs.select(col("doc_id"),
      graft.ext.TextAnalysis.normalizeUrl(
        concat(lit("http://Host/p"), col("doc_id"))))
    val c4 = graft.ext.TextAnalysis.c4LineFilter(
      docs.select(col("doc_id"), col("text")), "doc_id", "text")
    val gopher = graft.ext.TextAnalysis.gopherFilter(
      docs.select(col("doc_id"), col("text")), "doc_id", "text")
    for ((name, df) <- Seq("normalizeUrl" -> norm, "c4LineFilter" -> c4,
      "gopherFilter" -> gopher)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$name must not shuffle (pure projection/filter):\n$plan")
    }
    // the URL kernel specifically stays inside whole-stage codegen
    assert(norm.queryExecution.executedPlan.toString.contains("*("),
      "normalizeUrl must stay in codegen")
  }

  test("inverted index: partial aggregates both levels, posting lists " +
    "sorted per-group (no global window, no all-pairs)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val inv = docs.select(col("doc_id"),
        explode(array_distinct(graft.ext.TextAnalysis.tokens(col("text"))))
          .as("tok"))
      .groupBy("tok")
      .agg(sort_array(collect_set(col("doc_id"))).as("postings"),
        countDistinct(col("doc_id")).as("df"))
    val plan = inv.queryExecution.executedPlan.toString
    assert(plan.contains("partial"),
      s"inverted index must partial-aggregate map-side:\n$plan")
    assert(!plan.contains("Window"),
      s"posting-list ordering must not use a window:\n$plan")
  }

  test("packSequences: the per-row window is bucket-partitioned; only " +
    "the bucket-offset relation sees a single-partition window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ext.CorpusPrep.packSequences(docs, "doc_id",
      graft.ext.TextAnalysis.tokenCount(col("text")), 512, 100)
    df.collect() // finalize AQE
    // audit the final plan only — AQE's printout appends the pre-AQE
    // "Initial Plan" section, which would double-count markers
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the row-level running sum must be hash-partitioned by bucket …
    assert(plan.contains("hashpartitioning(b#") ||
      plan.contains("hashpartitioning(b,"),
      s"row-level window must partition by bucket:\n$plan")
    // … and the offsets side must come back as a broadcast, not a
    // row-level sort-merge join
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast back:\n$plan")
    // exactly one SinglePartition exchange (the tiny bucket-totals
    // window) — a second one would mean the row stream got globalized
    val singles = "SinglePartition".r.findAllIn(plan).size
    assert(singles <= 1,
      s"row stream must never collapse to one partition ($singles):\n$plan")
  }

  test("repetitionStats is a two-level hash aggregate with map-side " +
    "partials — no window, no single-partition collapse") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ext.CorpusPrep.repetitionStats(docs, "doc_id", "text")
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // both levels must be hash aggregates with a partial_ pass (a doc
    // with a billion copies of one bigram reaches the shuffle as one
    // row per partition)…
    assert(plan.contains("HashAggregate") && plan.contains("partial_"),
      s"repetitionStats must partial-aggregate map-side:\n$plan")
    // …and nothing may run as a global window / single partition
    assert(!plan.contains("SinglePartition") && !plan.contains("Window"),
      s"repetitionStats must never globalize the row stream:\n$plan")
  }

  test("duplicateWindows: aggregates partial, never all-pairs, never " +
    "single-partition") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ext.CorpusPrep
      .duplicateWindows(docs, "doc_id", "text", 8)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("HashAggregate") && plan.contains("partial_"),
      s"duplicateWindows must partial-aggregate map-side:\n$plan")
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"duplicateWindows must never go all-pairs:\n$plan")
    assert(!plan.contains("SinglePartition") && !plan.contains("Window"),
      s"duplicateWindows must never globalize the row stream:\n$plan")
  }

  test("vocabulary top-k runs as TakeOrderedAndProject (per-partition " +
    "heaps), never a global sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ext.TextAnalysis.vocabulary(docs, "doc_id", "text", 50)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded heap, not a full sort:\n$plan")
    assert(plan.contains("partial_"),
      s"vocabulary counts must partial-aggregate map-side:\n$plan")
  }

  test("tfIdf: partial aggregates, broadcast scalar N, no window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ext.TextAnalysis.tfIdf(docs, "doc_id", "text")
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("partial_"),
      s"tf/df counts must partial-aggregate map-side:\n$plan")
    // the corpus-size scalar enters as a broadcast of ONE row — the
    // only nested-loop allowed in this plan
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"scalar N must broadcast, not shuffle:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      s"tfIdf must never window or go all-pairs:\n$plan")
  }

  test("sourceOverlap: partial distinct, hash-keyed join, no all-pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ext.CorpusPrep.sourceOverlap(docs, "source", "text", 64)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("partial_") || plan.contains("HashAggregate"),
      s"distinct (source, hash) must partial-aggregate map-side:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"the self-join must stay hash-keyed, never all-pairs:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("SinglePartition"),
      s"sourceOverlap must never globalize the row stream:\n$plan")
  }

  test("paragraphDedup: partial aggregates, no window, no " +
    "single-partition collapse") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ext.DocDedup.paragraphDedup(docs, "doc_id", "text")
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // keeper selection must be a partial-combining aggregate (a
    // paragraph repeated a billion times reaches the shuffle as one
    // row per partition), never a partitionBy(hash) window
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"paragraphDedup keeper must be an aggregate:\n$plan")
    assert(plan.contains("partial_"),
      s"paragraphDedup must partial-aggregate map-side:\n$plan")
    assert(!plan.contains("SinglePartition") && !plan.contains("Window"),
      s"paragraphDedup must never globalize the row stream:\n$plan")
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"paragraphDedup must never go all-pairs:\n$plan")
  }

  test("asOfJoin and sessionize: one hash exchange by key, no nested " +
    "loop, no single-partition collapse") {
    for (q <- Seq("q75_asof_join", "q76_sessionize")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // finalize AQE
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the window must partition by the key — never "No Partition
      // Defined" (which collapses every event to one task)
      assert(plan.contains("hashpartitioning(user_id"),
        s"$q window must hash-partition by user_id:\n$plan")
      assert(!plan.contains("SinglePartition"),
        s"$q must never globalize the event stream:\n$plan")
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"$q must not plan a nested loop (the theta formulation " +
          s"would):\n$plan")
    }
  }

  test("interval join runs as a hash join on the bucket id — the theta " +
    "formulation Spark would otherwise BNLJ") {
    val df = SparkEntry.queries("q77_interval_join")(spark, sf)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"q77 must stay an equi-join on the bucket id:\n$plan")
    assert(plan.contains("HashJoin"),
      s"q77 expected a (broadcast) hash join:\n$plan")
  }

  test("quality quartiles: the ntile window is source-partitioned, " +
    "never global") {
    val df = SparkEntry.queries("q91_quality_quartiles")(spark, sf)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("hashpartitioning(source"),
      s"q91's window must hash-partition by source:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"q91 must never collapse the doc stream to one partition:\n$plan")
  }

  test("shuffleOrder: in-bucket window is hash-partitioned, offsets " +
    "broadcast back, row stream never single-partition") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id")
    val df = graft.ext.CorpusPrep.shuffleOrder(docs, col("doc_id"), "p")
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("hashpartitioning(_graft_b"),
      s"in-bucket ranks must hash-partition by the digest bucket:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast back:\n$plan")
    // ≤1 SinglePartition: the 256-row offsets window only (the
    // packSequences idiom)
    val singles = "SinglePartition".r.findAllIn(plan).size
    assert(singles <= 1,
      s"row stream must never collapse to one partition ($singles):\n$plan")
  }

  test("bigramLmScore: partial count aggregates, word-keyed hash joins, " +
    "broadcast scalar V, no window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ext.TextAnalysis.bigramLmScore(docs, "doc_id", "text")
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("partial_"),
      s"LM counts must partial-aggregate map-side:\n$plan")
    // the vocabulary-size scalar enters as a broadcast of ONE row —
    // the only nested-loop allowed (the tfIdf idiom)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"scalar V must broadcast, not shuffle:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      s"LM scoring must never window or go all-pairs:\n$plan")
  }

  test("prefixBlockVerify: candidates come from ONE equi-join on the " +
    "prefix key — never a nested loop over the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ext.DocDedup.prefixBlockVerify(docs, "doc_id", "text",
      32, 2)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin") ||
      plan.contains("ShuffledHashJoin"),
      s"blocking must be a keyed join on the prefix:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("NestedLoop"),
      s"candidate generation must never go all-pairs:\n$plan")
    assert(!plan.contains("Window"), s"no window in the verify:\n$plan")
  }

  test("hammingPairs: quarter blocking is a keyed join; the Levenshtein" +
    "-free verify never globalizes the stream") {
    val sig = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), xxhash64(col("text")).as("h"))
    val df = graft.ext.DocDedup.hammingPairs(sig, "doc_id", "h", 3)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("NestedLoop"),
      s"quarter blocking must never go all-pairs:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"no single-partition collapse:\n$plan")
  }

  test("document/columnar extractors (PDF, DOCX, Arrow) are shuffle-free " +
    "narrow maps: blob in, rows out, no Exchange") {
    import spark.implicits._
    val pdf = Seq((1L, graft.ext.Pdf.buildPdf(Seq(Seq("a b c")))))
      .toDF("doc_id", "blob")
    val docx = Seq((1L, graft.ext.Docx.buildDocx(Seq("a b c"))))
      .toDF("doc_id", "blob")
    val arrow = Seq((1L, graft.ext.ArrowIpc.buildArrowFile(3, 2, 1L)))
      .toDF("doc_id", "blob")
    val xlsx = Seq((1L, graft.ext.Xlsx.buildXlsx(
      Seq(("s", Seq(Seq(graft.ext.Xlsx.Text("a"), graft.ext.Xlsx.Num("1"))))))))
      .toDF("doc_id", "blob")
    val pptx = Seq((1L, graft.ext.Pptx.buildPptx(Seq(Seq("a b c")))))
      .toDF("doc_id", "blob")
    val raw = Seq((1L, "plain text".getBytes)).toDF("doc_id", "blob")
    Seq(
      graft.ext.Pdf.extractPdfText(pdf, "blob"),
      graft.ext.Docx.extractDocxText(docx, "blob"),
      graft.ext.ArrowIpc.extractArrowMeta(arrow, "blob"),
      graft.ext.ArrowIpc.extractArrowFields(arrow, "blob"),
      graft.ext.Xlsx.extractXlsxCells(xlsx, "blob"),
      graft.ext.Pptx.extractPptxText(pptx, "blob"),
      graft.ext.Charset.transcodeToUtf8(raw, "blob")
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"extractor must be a narrow per-partition map:\n$plan")
    }
  }
}
