package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-level deduplication for LLM training-data pipelines — the
  * north-star generalization of the reference's file-chunk dedup
  * (SURVEY §7.1 `ext/`): the reference dedups *chunks within files*
  * (lib/deduplicator.ex:22-57); these operators dedup *documents within
  * datasets*, exact and near.
  *
  * Scale design (100 TB):
  *   - exact dedup: one hash-keyed window/groupBy — a single shuffle on
  *     the digest; identical shape to the engine's J2.
  *   - near-dup: NEVER all-pairs. MinHash banding turns O(n²) similarity
  *     into groupBy(band-signature) — candidates only where a band
  *     collides; verification joins shingle sets of candidates only.
  *     All arithmetic is integer/long (xxhash64 permutations), and the
  *     candidate threshold is an exact rational (no float epsilons), so
  *     results are deterministic and oracle-checkable.
  */
object DocDedup {

  // ---------------------------------------------------------------- exact

  /** First-wins exact dedup: keep the lowest-`idCol` row per distinct
    * `textCol` value — the dataset analog of the engine's in-run
    * first-occurrence logic (Dedup.scala J2). groupBy(min) + semi-join
    * rather than a row_number window: the aggregate partial-combines
    * and the semi-join keys on the UNIQUE id column, so a text
    * duplicated a billion times cannot serialize one task the way a
    * partitionBy(digest) window would.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = df
      .select(col(idCol).as("__gid"), md5(col(textCol).cast("binary")).as("__h"))
      .groupBy("__h").agg(min("__gid").as("__keep"))
      .select("__keep")
    df.join(keepers, col(idCol) === col("__keep"), "left_semi")
  }

  /** Duplicate-frequency report over documents — `chunk_repetition`
    * (reference test/deduplicator_test.exs:323-330) lifted to datasets:
    * groups with >1 copy, most-duplicated first.
    */
  def exactDupReport(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("refs_num"), min(idCol).as("first_id"))
      .where(col("refs_num") > 1)
      .orderBy(desc("refs_num"), col("text_hash"))

  // ------------------------------------------------------- shingle common

  /** Distinct word-bigram shingles, one row per (id, shingle). The
    * inverted-index form all near-dup ops share.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(TextAnalysis.wordBigrams(col(textCol))).as("shingle"))
      .distinct()

  /** Exact n-gram Jaccard pairs via inverted index: join docs sharing a
    * shingle, count common shingles, filter with *integer* arithmetic:
    * J ≥ num/den  ⟺  den·common ≥ num·(na+nb−common).
    *
    * All-pairs-on-shared-shingle is O(Σ freq²) in the worst case. A
    * prefix-filtered variant (AllPairs/PPJoin: candidates only from the
    * `n − ceil(t·n) + 1` rarest shingles per doc) was implemented and
    * MEASURED SLOWER here (91 s vs 20 s at sf0.1): the synthetic corpus
    * draws from a tiny vocabulary, so there is no rare-shingle tail for
    * the prefix to exploit and its extra shuffles are pure overhead.
    * On natural corpora (Zipfian shingles) prefix filtering is the
    * right upgrade; at 100 TB the default scale path is
    * [[minHashPairs]] (banded LSH), which verifies candidates with this
    * same exact predicate.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        num: Int, den: Int): DataFrame = {
    // Persisted: the shingle set feeds four plan branches (both sides
    // of the self-join + both per-doc count joins).
    val sh = shingles(df, idCol, textCol).persist()
    try {
      jaccardVerify(sh,
        sh.toDF("id_a", "shingle").join(sh.toDF("id_b", "shingle"), "shingle")
          .where(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("common")),
        num, den)
        // Materialize while `sh` is still cached: the unpersist in
        // `finally` runs before the caller's action otherwise.
        .localCheckpoint()
    } finally { sh.unpersist() }
  }

  /** Filter candidate pairs (id_a, id_b, common) by exact Jaccard ≥
    * num/den using per-doc shingle counts. Integer-exact.
    */
  private def jaccardVerify(sh: DataFrame, cand: DataFrame,
                            num: Int, den: Int): DataFrame = {
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n"))
    cand
      .join(counts.toDF("id_a", "na"), "id_a")
      .join(counts.toDF("id_b", "nb"), "id_b")
      .where(lit(den) * col("common") >=
        lit(num) * (col("na") + col("nb") - col("common")))
      .select("id_a", "id_b", "common", "na", "nb")
      .orderBy("id_a", "id_b")
  }

  // ------------------------------------------------------------- MinHash

  /** MinHash signature matrix: for each doc, `numHashes` minima of
    * seeded xxhash64 permutations of its shingle set. Pure built-ins:
    * one explode + one groupBy(id) with `numHashes` min-aggregates —
    * a single shuffle, map-side partial aggregation, all in codegen.
    * h_i(s) = xxhash64(i, s) — xxhash64 is a keyed 64-bit hash, so the
    * seed column acts as the permutation index (standard construction,
    * same as Spark MLlib's MinHashLSH but without Vector boxing).
    */
  def minHashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"mh_$i"))
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** Banded-LSH near-dup pairs with exact verification:
    * shingles → minhash(bands·rows) → groupBy(band, band-signature) →
    * candidate pairs where any band collides → exact Jaccard ≥ num/den
    * on candidates only.
    *
    * Band math: P(candidate | J) = 1 − (1 − J^rows)^bands. Defaults
    * (16 bands × 8 rows = 128 hashes) put the S-curve threshold at
    * (1/16)^(1/8) ≈ 0.71: J=0.9 → detected w.p. ~0.9996; J=0.3 →
    * ~0.1% false-candidate rate, discarded by verification. At 100 TB
    * the only shuffles are the signature groupBy and the band groupBy —
    * both keyed, both partial-aggregated; no all-pairs stage exists.
    */
  def minHashPairs(df: DataFrame, idCol: String, textCol: String,
                   num: Int, den: Int,
                   bands: Int = 16, rows: Int = 8): DataFrame = {
    val sh = shingles(df, idCol, textCol).persist()
    // Band signature = one hash over the band's `rows` minima, emitted
    // for all bands from ONE pass over the signature matrix
    // (posexplode of an array, pos ≙ band index). Two measured
    // alternatives are slower: a per-band union replicates the whole
    // minhash aggregation into each self-join side (32 executions,
    // 19 s vs 4 s on 500 docs), and an explode-the-permutation-index
    // narrow aggregation shuffles |shingles|×128 rows (62 s vs 22 s at
    // sf0.1) — the 128-wide aggregate's one-time codegen cost is the
    // cheaper trade.
    val sig = minHashSignatures(sh, bands * rows)
    val bandSigs = (0 until bands).map { b =>
      xxhash64((0 until rows).map(r => col(s"mh_${b * rows + r}")): _*)
    }
    val banded = sig.select(col("id"),
      posexplode(array(bandSigs: _*)).as(Seq("band", "bsig"))).persist()
    try {
      val cand = banded.toDF("id_a", "band", "bsig")
        .join(banded.toDF("id_b", "band", "bsig"), Seq("band", "bsig"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      val common = sh.toDF("id_a", "shingle")
        .join(cand, "id_a")
        .join(sh.toDF("id_b", "shingle"), Seq("id_b", "shingle"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
      // Eagerly materialize (output is tiny: verified pairs only) while
      // the caches are still alive — the unpersist below runs before
      // any caller action would.
      jaccardVerify(sh, common, num, den).localCheckpoint()
    } finally { banded.unpersist(); sh.unpersist() }
  }

  // ------------------------------------------------------------- SimHash

  /** 64-bit SimHash over token hashes: bit i of the signature is the
    * sign of Σ_tokens (±1 depending on bit i of xxhash64(token)).
    * Shape: explode tokens → 64 conditional sums per doc (one shuffle,
    * partial-aggregated) → assemble the long. Near-dups then group by
    * rotated prefixes or join on small Hamming distance.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b_$i"))
    val sums = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(i =>
      when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    sums.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup candidates with Hamming distance ≤ maxDist,
    * blocked on 16-bit signature quarters (any pair within distance 3
    * must agree on ≥1 of 4 quarters — pigeonhole), then exact Hamming
    * via bit_count(xor). No all-pairs: groupBy(quarter value) only.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "quarter blocking guarantees recall only to distance 3")
    val sig = simHash(df, idCol, textCol).persist()
    try {
      // One pass emits all four quarters (pos ≙ quarter index) — same
      // single-scan shape as minHashPairs' banding.
      val blocked = sig.select(col("id"),
        posexplode(array((0 until 4).map(q =>
          shiftright(col("simhash"), q * 16).bitwiseAND(0xFFFFL)): _*))
          .as(Seq("q", "qv")))
      val cand = blocked.toDF("id_a", "q", "qv")
        .join(blocked.toDF("id_b", "q", "qv"), Seq("q", "qv"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      cand
        .join(sig.toDF("id_a", "sh_a"), "id_a")
        .join(sig.toDF("id_b", "sh_b"), "id_b")
        .withColumn("hamming",
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
        .where(col("hamming") <= maxDist)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
        .localCheckpoint() // materialize while `sig` is still cached
    } finally { sig.unpersist() }
  }
}
