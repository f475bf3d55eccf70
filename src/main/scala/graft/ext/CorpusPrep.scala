package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators — the dataset-assembly half of
  * an LLM data pipeline (SURVEY §7.1 `ext/`, beyond the reference's
  * scope like TextAnalysis/DocDedup): deterministic train/val/test
  * splitting, weighted source mixing, benchmark decontamination, and
  * sequence packing.
  *
  * Design rules shared by everything here:
  *   - **Deterministic by content, not by RNG.** Every sampling decision
  *     is a pure function of (key, seed) via md5, so re-running the
  *     pipeline — on any cluster, at any partitioning, after any retry —
  *     reproduces the same corpus bit-for-bit. (Spark's `sample()` is
  *     seed-deterministic only per partition layout; a repartition
  *     changes the sample. That is unacceptable for a corpus a model
  *     was trained on.)
  *   - **Oracle-portable.** The hash unit is a hex substring of md5,
  *     which DuckDB computes identically (`('0x' || substr(md5(k), p,
  *     4))::INT`), so every operator has an exact cross-engine
  *     correctness gate — no "approximately 80%" assertions.
  *   - **Narrow plans.** Split/mix are pure per-row projections (scan
  *     speed at 100 TB, no shuffle); decontamination shuffles only the
  *     contaminated doc ids; packing is a two-level distributed prefix
  *     sum whose only sequential piece is over buckets, not rows.
  */
object CorpusPrep {

  /** Uniform 16-bit hash unit in [0, 65536): 4 hex chars of
    * md5(key || ":" || seed), starting at 1-based hex position `pos`.
    * Different `pos` values give independent-enough units (md5 output
    * bytes are independent), so split and mix decisions on the same key
    * do not correlate. DuckDB-exact:
    * `('0x' || substr(md5(key || ':seed'), pos, 4))::INT`.
    */
  def hashUnit16(key: Column, seed: String, pos: Int = 1): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + seed))
      .cast("binary")), pos, 4), 16, 10).cast("int")

  /** The 16-bit threshold for a keep-fraction `w` — shared by the Spark
    * side and the SQL-oracle side so both compare against the same
    * integer literal. `w >= 1.0` maps to 65536 (keeps every unit).
    */
  def threshold16(w: Double): Int = {
    require(w >= 0.0, s"weight must be >= 0, got $w")
    math.min(math.floor(w * 65536.0).toLong, 65536L).toInt
  }

  /** Deterministic dataset split: assign each key a label from
    * `fractions` (ordered `(label, fraction)`, fractions summing to 1;
    * the last label absorbs rounding remainder). The assignment is a
    * pure projection — at 100 TB this is a free column on the scan, and
    * because it depends only on (key, seed) a doc keeps its split
    * forever: growing the corpus never migrates old docs across the
    * train/test boundary (the property that makes held-out sets valid).
    */
  def splitAssign(key: Column, seed: String,
      fractions: Seq[(String, Double)]): Column = {
    require(fractions.size >= 2, "need at least two split labels")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val u = hashUnit16(key, seed)
    val cuts = splitCuts(fractions)
    fractions.init.zip(cuts).foldRight(lit(fractions.last._1): Column) {
      case (((label, _), cut), acc) => when(u < cut, label).otherwise(acc)
    }
  }

  /** Cumulative 16-bit cut points for `fractions` (one per non-last
    * label) — exposed so oracle SQL can embed the same literals.
    */
  def splitCuts(fractions: Seq[(String, Double)]): Seq[Int] =
    fractions.init
      .scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(threshold16)

  /** Weighted source mixing: keep a row iff its hash unit falls under
    * its source's weight threshold. `weights` maps source → keep
    * fraction (>= 1 keeps all); sources absent from the map are DROPPED
    * (a mixing recipe is an allowlist — silently passing an unlisted
    * source through would un-curate the corpus).
    *
    * Hash-threshold sampling is *nested*: the rows kept at w=0.25 are a
    * subset of those kept at w=0.5 (same unit, lower cut), so tuning a
    * source's weight down never introduces unseen docs — ablation runs
    * stay comparable. Pure projection + filter; no shuffle.
    */
  def weightedMix(df: DataFrame, key: Column, source: Column,
      weights: Map[String, Double], seed: String): DataFrame = {
    val thr = weights.toSeq.sortBy(_._1)
      .foldRight(lit(0): Column) { case ((s, w), acc) =>
        when(source === s, threshold16(w)).otherwise(acc)
      }
    df.where(hashUnit16(key, seed, pos = 5) < thr)
  }

  /** Benchmark decontamination: flag every doc whose normalized text
    * shares at least one `n`-character gram with a benchmark snippet —
    * the standard guard against test-set leakage into training data
    * (GPT-3 appendix C / PaLM-style n-gram overlap, re-expressed
    * relationally). Returns `docs` plus an integer `contaminated`
    * column (1 = overlaps a snippet).
    *
    * `snippets` must have a `snippet` string column; every snippet must
    * be exactly `n` chars of *normalized* text ([[TextAnalysis
    * .normalize]]), so "shares an n-gram" is exactly "normalized text
    * contains the snippet" — which is what the DuckDB oracle checks
    * with `contains()`.
    *
    * Scale shape: the benchmark suite is small by nature → broadcast;
    * doc n-grams are a generator at scan (never a shuffled relation);
    * the left-semi broadcast join reduces map-side, so the only shuffle
    * is the distinct over *contaminated* doc ids — a vanishing fraction
    * of the corpus. Memory: the per-row gram array is O(n·len) chars
    * transient; if profiling ever shows it, the native-kernel treatment
    * (a CharNgramHashes emitting packed longs, joined on hashed
    * snippets) drops it to O(8·len) — same plan, smaller rows.
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      snippets: DataFrame, n: Int): DataFrame = {
    val hit = docs
      .select(col(idCol), explode(
        TextAnalysis.charNgrams(col(textCol), n)).as("g"))
      .join(broadcast(snippets.select(col("snippet").as("g")).distinct()),
        Seq("g"), "left_semi")
      .select(idCol).distinct()
      .withColumn("contaminated", lit(1))
    docs.join(hit, Seq(idCol), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(0)))
  }

  /** Sequence packing: lay all docs end-to-end in `id` order as one
    * token stream and slice it into fixed `windowTokens` training
    * windows — the GPT-style pretraining pack. Returns one row per doc:
    * `(id, tok, first_window, last_window)`, where the doc's tokens
    * occupy stream positions `[start, start+tok)` and windows
    * `floor(start/W) .. floor((start+tok-1)/W)`.
    *
    * The naive formulation — `sum(tok) OVER (ORDER BY id)` with no
    * PARTITION BY — is a SINGLE TASK over the whole corpus (Spark puts
    * an unpartitioned window in one partition): instant death at scale.
    * This is the standard two-level distributed prefix sum instead:
    *   1. bucket ids into ranges of `bucketSize`;
    *   2. within-bucket running sums (hash-partitioned window — fully
    *      parallel);
    *   3. bucket totals (one tiny agg: |ids|/bucketSize rows) get THEIR
    *      prefix sum — the only sequential window, over buckets not
    *      rows — and are broadcast back.
    * At 10^12 docs / bucketSize 10^6, level 2 is a 10^6-row window —
    * still driver-trivial; nest a third level if ever needed.
    */
  def packSequences(df: DataFrame, idCol: String, tokCol: Column,
      windowTokens: Int, bucketSize: Long = 1 << 20): DataFrame = {
    require(windowTokens > 0 && bucketSize > 0)
    // integer `div`, not `/`+floor: `/` promotes to double, which stops
    // being exact past 2^53 stream positions — a bound a 100 TB token
    // stream actually approaches.
    streamStarts(df, idCol, tokCol, bucketSize)
      .select(col(idCol), col("tok"),
        expr(s"start div ${windowTokens}L").as("first_window"),
        expr(s"(start + tok - 1) div ${windowTokens}L").as("last_window"))
  }

  /** The two-level distributed prefix sum under [[packSequences]] and
    * [[packWindowSlices]]: each doc's absolute start position in the
    * id-ordered token stream, as `(idCol, tok, start)`.
    */
  private def streamStarts(df: DataFrame, idCol: String, tokCol: Column,
      bucketSize: Long): DataFrame = {
    val local = df
      .select(col(idCol), tokCol.cast("long").as("tok"),
        floor(col(idCol) / bucketSize).as("b"))
      .withColumn("local_before",
        coalesce(sum("tok").over(Window.partitionBy("b").orderBy(idCol)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offsets = local.groupBy("b").agg(sum("tok").as("bt"))
      .withColumn("off",
        coalesce(sum("bt").over(Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("b", "off")
    local.join(broadcast(offsets), Seq("b"))
      .withColumn("start", col("off") + col("local_before"))
      .select(col(idCol), col("tok"), col("start"))
  }

  /** The per-(doc, window) slice table [[packSequences]] implies — the
    * attention-boundary input a trainer actually consumes: for every
    * training window a document overlaps, one row
    * `(idCol, win, off_in_doc, off_in_window, n_toks)` saying the
    * doc contributes its tokens `[off_in_doc, off_in_doc + n_toks)` at
    * window-local positions `[off_in_window, off_in_window + n_toks)`.
    * Within a window, slices at ascending `off_in_window` reconstruct
    * it exactly; document boundaries (where attention masks reset) are
    * the slice boundaries.
    *
    * All arithmetic is exact bigint (same `div` discipline as
    * [[packSequences]]); the explode factor per doc is its window
    * count ⌈tok/W⌉ + 1 at most, so output size ∝ corpus tokens / W +
    * corpus docs — never quadratic. Zero-token docs contribute no
    * slice.
    */
  def packWindowSlices(df: DataFrame, idCol: String, tokCol: Column,
      windowTokens: Int, bucketSize: Long = 1 << 20): DataFrame = {
    require(windowTokens > 0 && bucketSize > 0)
    val w = windowTokens.toLong
    streamStarts(df, idCol, tokCol, bucketSize)
      .where(col("tok") > 0)
      .withColumn("win", explode(sequence(
        expr(s"start div ${w}L"),
        expr(s"(start + tok - 1) div ${w}L"))))
      .withColumn("lo",
        greatest(col("start"), col("win") * w))
      .withColumn("hi",
        least(col("start") + col("tok"), (col("win") + 1L) * w))
      .select(col(idCol), col("win"),
        (col("lo") - col("start")).as("off_in_doc"),
        (col("lo") - col("win") * w).as("off_in_window"),
        (col("hi") - col("lo")).as("n_toks"))
  }

  /** Intra-document repetition signals — the Gopher-style repetition
    * filters (Rae et al. 2021, appendix A1.1: "fraction of duplicate
    * n-grams" / "fraction of characters in the most common n-gram")
    * over word bigrams. Emits per document the bigram multiset's total
    * count, distinct count, and most-frequent-bigram count; the
    * filters derive directly (duplicate fraction =
    * (n_bigrams − n_distinct) / n_bigrams, top fraction =
    * top_count / n_bigrams) and callers should threshold with integer
    * cross-multiplication so the decision stays float-free and
    * cross-engine exact.
    *
    * Shape: explode bigrams → two-level hash aggregate. The per
    * (doc, bigram) level partial-aggregates map-side, so a document
    * with a billion copies of one bigram arrives at the shuffle as one
    * row per partition — explode + aggregate handles documents of any
    * length where a per-row array pass would need the whole multiset
    * in memory, and a per-element HOF count would be interpreted
    * O(distinct²) (the round-8 finding). Documents with fewer than two
    * tokens have no bigrams and emit no row.
    */
  /** md5 of every w-token sliding window, as one array column — the
    * native codegen'd kernel
    * [[graft.functions.TextExpressions.WindowHashes]] (each window
    * digests a byte RANGE of the input; see its scaladoc for the
    * span argument and the bit-parity Column formulation it
    * replaces). md5 — not xxhash64 — keeps the hash engine-portable
    * (DuckDB computes the identical digest), which is what makes
    * [[duplicateWindows]] exactly oracle-checkable.
    */
  private def windowHashes(text: Column, w: Int): Column =
    call_function("graft_window_hashes", text, lit(w))

  /** Cross-document duplicate-window detection — the detection phase
    * of exact substring deduplication (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": repeated w-token
    * spans shared across documents, the boilerplate/licence-block
    * signal document-level dedup cannot see). Per document: the total
    * window count and how many of its windows also occur in at least
    * one OTHER document.
    *
    * Shape: explode window hashes → one groupBy over (16-byte hash,
    * partial-aggregated count-distinct of doc ids) for the duplicate
    * set → semi-join windows against it (co-partitioned on the hash,
    * exchange reused) → per-doc counts. Never all-pairs; total cost
    * ∝ corpus window count. Documents with fewer than `w` tokens have
    * no windows and emit no row.
    */
  def duplicateWindows(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    require(w >= 2, s"window width must be >= 2, got $w")
    graft.functions.VecExpressions.register(df.sparkSession)
    val win = df.select(col(idCol).as("doc_id"),
      explode(windowHashes(col(textCol), w)).as("wh"))
    val dup = win.groupBy("wh")
      .agg(countDistinct("doc_id").as("nd"))
      .where(col("nd") > 1).select("wh")
    val perDoc = win.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
    val dupPerDoc = win.join(dup, Seq("wh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_windows"))
    perDoc.join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
  }

  /** Deterministic per-source cap: keep exactly the `k` lowest-hash
    * documents of each source (ties broken by key) — the downsampling
    * half of corpus rebalancing, where [[weightedMix]] is the
    * fractional half. Content-determined like everything here: a doc's
    * keep/drop decision depends only on (key, seed) and which
    * competitors exist, never on partitioning — `df.limit(k)` per
    * group or `sample()` can't promise either. With ≥ k docs per
    * source the output is EXACTLY k·|sources| rows.
    *
    * Scale shape: the rank ≤ k filter over a per-source window is
    * planned by InferWindowGroupLimit as a map-side
    * WindowGroupLimit(Partial) — each partition forwards at most k
    * rows per source to the shuffle, the same two-level top-k the ANN
    * scoring tail uses, so a source with a billion docs never
    * concentrates them into one task's sort.
    */
  def capPerSource(df: DataFrame, key: Column, srcCol: Column, k: Int,
      seed: String): DataFrame = {
    require(k >= 1, s"cap must be >= 1, got $k")
    // hash position 9: decorrelated from splitAssign (1) and
    // weightedMix (5) decisions on the same key
    val w = Window.partitionBy(srcCol).orderBy(hashUnit16(key, seed, 9), key)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k).drop("__rk")
  }

  /** The removal half of exact substring deduplication (Lee et al.
    * 2022): delete every token covered by a duplicated w-token window
    * from every document EXCEPT the canonical (min-id) owner of that
    * window, and reassemble the cleaned text. Cross-document only —
    * the canonical owner keeps all its occurrences (within-doc repeats
    * are [[repetitionStats]]' concern). Returns every input row as
    * (doc_id, clean_text, n_removed); a fully-covered document comes
    * back with empty text, not a dropped row.
    *
    * Shape: window hashes (native kernel) → duplicated hashes +
    * min-id owner (one partial-aggregated groupBy) → covered token
    * indices (explode factor w, deduplicated) → anti-join against the
    * exploded token stream → per-doc ordered reassembly via
    * array_sort(collect_list(struct(pos, tok))) — an O(n log n)
    * per-document sort, NOT a global window, so the row stream never
    * collapses to one partition. Everything is bounded by corpus
    * token count × w; no all-pairs stage exists.
    */
  def stripDuplicateWindows(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    require(w >= 2, s"window width must be >= 2, got $w")
    graft.functions.VecExpressions.register(df.sparkSession)
    val win = df.select(col(idCol).as("doc_id"),
      posexplode(windowHashes(col(textCol), w)).as(Seq("wpos", "wh")))
    val own = win.groupBy("wh")
      .agg(countDistinct("doc_id").as("nd"), min("doc_id").as("keeper"))
      .where(col("nd") > 1).select("wh", "keeper")
    val cut = win.join(own, "wh").where(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"),
        explode(sequence(col("wpos"), col("wpos") + (w - 1))).as("ti"))
      .distinct()
    val toks = df.select(col(idCol).as("doc_id"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("ti", "tok")))
    val kept = toks.join(cut, Seq("doc_id", "ti"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("ti"), col("tok")))),
          s => s.getField("tok")), " ").as("kept_text"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_text"), lit("")).as("clean_text"),
        (col("n_tok") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  def repetitionStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    graft.functions.VecExpressions.register(df.sparkSession)
    df.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.wordBigrams(col(textCol))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_count"))
  }

  /** Cross-source contamination matrix: for every source pair with
    * src_a ≤ src_b, the number of DISTINCT chunk hashes both sources
    * contain — the "how much of A also appears in B" audit a corpus
    * build runs before committing to mixing weights. The diagonal
    * (s, s) carries each source's own distinct-chunk total, so
    * shared / diagonal yields containment ratios with no second
    * pass. Shape: distinct (source, hash) — map-side partial — then
    * a hash-keyed self-join whose per-hash fan-out is bounded by the
    * source count squared (never by corpus size; there are dozens of
    * sources, not millions), then a pair-keyed count over at most
    * |sources|² groups. Every corpus-sized shuffle keys on the chunk
    * hash — uniform by construction, no skew path.
    */
  /** Corpus version diff: classify every doc id across two corpus
    * snapshots as added / removed / changed / unchanged, comparing
    * CONTENT (md5 of text), not timestamps — the audit an incremental
    * refresh runs to bound re-training cost and to verify an ingest
    * did what it claimed. One full-outer equi-join on the id with
    * per-side content hashes computed in the scan projection; no
    * corpus-sized state besides the join itself, and the join keys on
    * the doc id — unique by construction, no skew path.
    */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def hashed(df: DataFrame, h: String) =
      df.select(col(idCol).as("doc_id"), md5(col(textCol)).as(h))
    hashed(oldDf, "old_hash")
      .join(hashed(newDf, "new_hash"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Deterministic global training order: a total permutation rank by
    * salted content hash — the "shuffle the corpus once before
    * training" pass. Same determinism contract as [[splitAssign]]: the
    * rank is a pure function of (key, seed), so any cluster, any
    * partitioning, any retry reproduces the same order (Spark's
    * `orderBy(rand(seed))` is partitioning-dependent and therefore
    * unacceptable for an order a model's data loader must replay).
    *
    * Shape: NOT a global `row_number()` window (which collapses the
    * corpus to one partition). The digest's first byte buckets rows
    * into 256 groups whose numeric order equals the digest's
    * lexicographic order, so global rank = (broadcast per-bucket
    * offset) + (per-bucket row_number) — the packSequences two-level
    * idiom; the only unpartitioned window runs over 256 bucket-count
    * rows. At 100 TB the equivalent is a range-partitioned sort by
    * the digest; this formulation additionally hands every row its
    * exact ordinal, which the data loader wants for resumable epochs.
    *
    * The digest is salted with ":shuffle" so the order decorrelates
    * from the [[splitAssign]] / [[weightedMix]] units on the same key
    * and seed (otherwise rank order would group split labels
    * together — the digest PREFIX is exactly splitAssign's unit).
    *
    * @return input plus `rank` (0-based dense global ordinal)
    */
  def shuffleOrder(df: DataFrame, key: Column, seed: String): DataFrame = {
    graft.operators.Reserved.assertNone(df, "shuffleOrder")
    val h = md5(concat(key.cast("string"), lit(":" + seed + ":shuffle"))
      .cast("binary"))
    val withB = df.withColumn("_graft_h", h)
      .withColumn("_graft_b",
        conv(substring(col("_graft_h"), 1, 2), 16, 10).cast("int"))
    val inBucket = row_number().over(
      Window.partitionBy("_graft_b").orderBy(col("_graft_h"), key))
    val offsets = withB.groupBy("_graft_b").agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(sum("n").over(Window.orderBy("_graft_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_graft_b", "off")
    withB.join(broadcast(offsets), Seq("_graft_b"))
      .withColumn("rank", col("off") + inBucket.cast("long") - 1L)
      .drop("_graft_h", "_graft_b")
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
    * denoising-pretraining target builder: deterministic mask-start
    * positions (16-bit md5 unit per (doc, pos) < threshold16(rate)),
    * each start covering `spanLen` tokens; overlapping spans merge
    * into maximal runs; run k is replaced by `<extra_id_{k}>` in the
    * input and emits `<extra_id_{k}> tokens…` in the target. Pure
    * function of (id, pos, seed) — reproducible across runs,
    * partitionings, and engines (every piece of the arithmetic is
    * integer-exact, so the DuckDB restatement is identical).
    *
    * Shape: posexplode → three window functions PARTITIONED BY
    * DOCUMENT (coverage spread over `spanLen−1` preceding rows, run
    * starts via lag, run numbering via running sum) → one groupBy
    * reassembly through array_sort(collect_list(struct(pos, piece))).
    * Per-doc windows are bounded by document length — no global
    * window, no skew beyond a single document's tokens, the same
    * scale posture as [[stripDuplicateWindows]]'s reassembly. The
    * mask decision could not be a `transform` lambda over the token
    * array: it would reference enclosing-scope expressions and re-run
    * them per element (the NOTES_r08 interpreted-HOF trap) — the
    * window formulation stays codegen'd.
    */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      maskRate: Double, spanLen: Int, seed: String): DataFrame = {
    require(spanLen >= 1 && maskRate >= 0.0 && maskRate <= 1.0,
      s"bad span spec rate=$maskRate len=$spanLen")
    graft.operators.Reserved.assertNone(df, "spanCorrupt")
    val tau = threshold16(maskRate)
    val toks = df.select(col(idCol).as("_graft_id"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    val u = conv(substring(md5(concat(col("_graft_id").cast("string"),
      lit("_"), col("pos").cast("string"), lit(":" + seed + ":span"))
      .cast("binary")), 1, 4), 16, 10).cast("int")
    val w = Window.partitionBy("_graft_id").orderBy("pos")
    val marked = toks.withColumn("_graft_st", (u < tau).cast("int"))
      .withColumn("_graft_cov",
        max("_graft_st").over(w.rowsBetween(-(spanLen - 1), 0)))
      .withColumn("_graft_rs", (col("_graft_cov") === 1 &&
        coalesce(lag("_graft_cov", 1).over(w), lit(0)) === 0).cast("int"))
      .withColumn("_graft_span",
        sum("_graft_rs").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val sentinel = concat(lit("<extra_id_"),
      (col("_graft_span") - 1).cast("string"), lit(">"))
    val pieces = marked
      .withColumn("_graft_in",
        when(col("_graft_cov") === 0, col("tok"))
          .when(col("_graft_rs") === 1, sentinel))
      .withColumn("_graft_tg",
        when(col("_graft_cov") === 1 && col("_graft_rs") === 1,
          concat(sentinel, lit(" "), col("tok")))
          .when(col("_graft_cov") === 1, col("tok")))
    def joined(c: String) = array_join(transform(
      array_sort(collect_list(when(col(c).isNotNull,
        struct(col("pos"), col(c).as("p"))))),
      s => s.getField("p")), " ")
    pieces.groupBy("_graft_id")
      .agg(joined("_graft_in").as("input_text"),
        joined("_graft_tg").as("target_text"),
        max("_graft_span").as("n_spans"))
      .select(col("_graft_id").as(idCol),
        col("input_text"), col("target_text"), col("n_spans"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022): for a
    * deterministic `rate16`/65536 fraction of documents, split the
    * token stream at two md5-derived cut points and emit the PSM
    * rearrangement `<PRE> prefix <SUF> suffix <MID> middle`;
    * untransformed docs pass through. All decisions are integer
    * arithmetic on 16-bit hash units — reproducible and
    * engine-exact. One narrow projection; array slices, no explode.
    */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
      rate16: Int, seed: String): DataFrame = {
    require(rate16 >= 0 && rate16 <= 65536, s"rate16 out of range: $rate16")
    graft.operators.Reserved.assertNone(df, "fimTransform")
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks)
    val c1 = pmod(hashUnit16(col(idCol), seed + ":fim1"), n + 1)
    val c2 = pmod(hashUnit16(col(idCol), seed + ":fim2"), n + 1)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val fim = hashUnit16(col(idCol), seed + ":fim") < rate16
    val psm = concat(lit("<PRE> "), array_join(slice(toks, lit(1), lo), " "),
      lit(" <SUF> "), array_join(slice(toks, hi + 1, n - hi), " "),
      lit(" <MID> "), array_join(slice(toks, lo + 1, hi - lo), " "))
    df.select(col(idCol), fim.as("fim"),
      when(fim, psm).otherwise(col(textCol)).as("out_text"))
  }

  /** Length-bucketed deterministic batching — the trainer-feed step
    * after packing-free fine-tuning pipelines: group documents of
    * similar length into fixed-size batches (so per-batch padding to
    * the batch max wastes little), shuffled WITHIN a length bucket so
    * batch composition is still pseudo-random. Emits every input row
    * plus `(batch, pos)`.
    *
    * Order is the deterministic total order (length bucket asc,
    * content hash, key) — a pure function of (key, len, seed) and the
    * competing rows, never of partitioning (the [[shuffleOrder]]
    * property, needed for reproducible training runs). Rank uses the
    * same two-level scheme as [[shuffleOrder]], with one refinement:
    * length buckets are DATA-skewed (a corpus where most docs share a
    * length puts them in one bucket), so the in-bucket window
    * partitions on (length bucket × 256 hash sub-buckets) — the
    * sub-bucket is the hash's own hex prefix, so (lb, sb, h) ordering
    * equals (lb, h) ordering and the DuckDB restatement is one global
    * `row_number() OVER (ORDER BY len div w, md5, key)`. The only
    * sequential window runs over the (lb, sb) count relation.
    */
  def lengthBatches(df: DataFrame, key: Column, lenCol: Column,
      batchSize: Int, bucketWidth: Int, seed: String): DataFrame = {
    require(batchSize >= 1 && bucketWidth >= 1,
      s"batchSize/bucketWidth must be positive, got $batchSize/$bucketWidth")
    graft.operators.Reserved.assertNone(df, "lengthBatches")
    val h = md5(concat(key.cast("string"), lit(":" + seed + ":lenbatch"))
      .cast("binary"))
    // floor of a double divide is exact integer division while
    // len < 2^53 — document lengths are
    val withB = df.withColumn("_graft_h", h)
      .withColumn("_graft_lb",
        floor(lenCol.cast("long") / lit(bucketWidth)).cast("long"))
      .withColumn("_graft_sb",
        conv(substring(col("_graft_h"), 1, 2), 16, 10).cast("int"))
    val inPart = row_number().over(
      Window.partitionBy("_graft_lb", "_graft_sb")
        .orderBy(col("_graft_h"), key))
    val offsets = withB.groupBy("_graft_lb", "_graft_sb")
      .agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(sum("n").over(Window.orderBy("_graft_lb", "_graft_sb")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_graft_lb", "_graft_sb", "off")
    withB.join(broadcast(offsets), Seq("_graft_lb", "_graft_sb"))
      .withColumn("_graft_rank", col("off") + inPart.cast("long") - 1L)
      .withColumn("batch", expr(s"_graft_rank div ${batchSize}L"))
      .withColumn("pos", pmod(col("_graft_rank"), lit(batchSize.toLong))
        .cast("int"))
      .drop("_graft_h", "_graft_lb", "_graft_sb", "_graft_rank")
  }

  /** Temperature-balanced source sampling at α = 0.5: keep each doc of
    * source s with probability √(n_min / n_s) — the standard
    * "temperature" reweighting that upsamples small sources toward
    * uniform (α = 1 keeps natural proportions, α = 0 is uniform; 0.5
    * is the common middle used for multilingual corpora). The smallest
    * source keeps everything; a source 100× larger keeps 10%.
    *
    * α is FIXED at 0.5 on purpose: `sqrt` is the one power IEEE 754
    * requires to be correctly rounded (general `pow` is
    * implementation-defined in the last ulp), and the bigint→double
    * cast, the division, and the ×2^16 scaling are all exact or
    * correctly rounded too — so the keep threshold
    * ⌊√(n_min/n_s)·65536⌋ is bit-identical in ANY engine and the
    * sample is exactly oracle-checkable, the same property
    * [[threshold16]] gives [[weightedMix]]'s static weights. A free-α
    * variant would trade that for a ±1-unit cross-engine wobble on
    * threshold boundaries.
    *
    * Decision unit is [[hashUnit16]] at hex position 13 —
    * decorrelated from split (1), mix (5), and cap (9) decisions on
    * the same key. Per-source counts ride a broadcast join; the keep
    * decision is a pure per-row projection, so the whole operator is
    * one small aggregate + one scan at any corpus size.
    */
  def temperatureSample(df: DataFrame, key: Column, srcCol: Column,
      seed: String): DataFrame = {
    graft.operators.Reserved.assertNone(df, "temperatureSample")
    val counts = df.groupBy(srcCol.as("_graft_src"))
      .agg(count(lit(1)).as("_graft_n"))
    val nMin = counts.agg(min("_graft_n").as("_graft_nmin"))
    val thresholds = counts.crossJoin(broadcast(nMin))
      .withColumn("_graft_thr",
        floor(sqrt(col("_graft_nmin").cast("double") /
          col("_graft_n").cast("double")) * 65536.0).cast("int"))
      .select("_graft_src", "_graft_thr")
    df.join(broadcast(thresholds), srcCol === col("_graft_src"))
      .where(hashUnit16(key, seed, 13) < col("_graft_thr"))
      .drop("_graft_src", "_graft_thr")
  }

  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String,
      width: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val ch = df.select(col(srcCol).as("source"),
        explode(TextAnalysis.charChunks(col(textCol), width)).as("chunk"))
      .select(col("source"), md5(col("chunk").cast("binary")).as("hash"))
      .distinct()
    ch.select(col("source").as("src_a"), col("hash"))
      .join(ch.select(col("source").as("src_b"), col("hash")), Seq("hash"))
      .where(col("src_a") <= col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"))
  }
}
