package graft.ext

import graft.SparkFunSuite

class WinnowSpec extends SparkFunSuite {

  /** O(n·w) reference: per window, rightmost minimum; suppress
    * consecutive re-selections — the paper's definition, verbatim.
    */
  private def bruteWinnow(hashes: Array[Long], w: Int): Seq[(Int, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var last = -1
    (0 to hashes.length - w).foreach { s =>
      var best = s
      (s until s + w).foreach { i => if (hashes(i) <= hashes(best)) best = i }
      if (best != last) { last = best; out += ((best, hashes(best))) }
    }
    out.toSeq
  }

  /** Recompute the production k-gram hashes through the public API:
    * selecting with w=1 keeps every position (every window is one
    * hash), recovering the full hash array.
    */
  private def gramHashes(text: String, k: Int): Array[Long] =
    Winnow.selectFingerprints(text, k, 1).map(_._2)

  test("deque selection matches the brute-force paper definition") {
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val n = 30 + rnd.nextInt(200)
      val text = Array.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString
      val k = 2 + rnd.nextInt(4)
      val w = 1 + rnd.nextInt(12)
      val got = Winnow.selectFingerprints(text, k, w).toSeq
      val want = bruteWinnow(gramHashes(text, k), w)
      assert(got == want, s"n=$n k=$k w=$w")
    }
  }

  test("selection density: every window covered, gaps <= w") {
    val text = Array.fill(2000)(('a' + util.Random.nextInt(26)).toChar).mkString
    val fps = Winnow.selectFingerprints(text, 8, 16)
    assert(fps.nonEmpty)
    val pos = fps.map(_._1)
    assert(pos.sameElements(pos.sorted.distinct)) // strictly increasing
    pos.sliding(2).foreach {
      case Array(a, b) => assert(b - a <= 16)
      case _ =>
    }
    // density ~ 2/(w+1): loose two-sided bound
    assert(fps.length > text.length / 20 && fps.length < text.length / 3)
    // short texts yield nothing (below one full window of grams)
    assert(Winnow.selectFingerprints("tiny", 8, 16).isEmpty)
    assert(Winnow.selectFingerprints(null, 8, 16).isEmpty)
  }

  test("winnowing guarantee: any shared run >= w+k-1 pairs; disjoint texts never pair") {
    val s = spark; import s.implicits._
    val shared = "GUARANTEED-SHARED-RUN-0123456789-XYZ" // 36 >= 23
    def filler(seed: Int, n: Int) = {
      val r = new scala.util.Random(seed)
      Array.fill(n)(('a' + r.nextInt(26)).toChar).mkString
    }
    val docs = Seq(
      (1L, filler(1, 300) + shared + filler(2, 100)),
      (2L, filler(3, 87) + shared + filler(4, 250)), // different offset
      (3L, filler(5, 400)),
      (4L, filler(6, 400))
    ).toDF("id", "body")
    val pairs = Winnow.verifiedPairs(docs, "id", "body", k = 8, w = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("hot-fingerprint cap: all-doc boilerplate excluded, class pairs survive") {
    val s = spark; import s.implicits._
    val boiler = "EVERY-DOC-CARRIES-THIS-COOKIE-BANNER-TEXT"
    val classBlock = "CLASS-BLOCK-SHARED-BY-THREE-DOCS-ONLY"
    val docs = (0 until 12).map { i =>
      val own = {
        val r = new scala.util.Random(100 + i)
        Array.fill(200)(('a' + r.nextInt(26)).toChar).mkString
      }
      (i.toLong, boiler + own + (if (i < 3) classBlock else ""))
    }.toDF("id", "body")
    // cap below the corpus size: the boilerplate's interior
    // fingerprints appear in all 12 docs and are excluded. Windows
    // straddling the boilerplate/own-text boundary can still select a
    // boilerplate gram in a sub-cap doc SUBSET (legitimate >= k-char
    // shared content), so the assertion is one-sided: class pairs
    // survive, and the cap collapses the pair count far below the
    // uncapped all-pairs explosion.
    val pairs = Winnow.verifiedPairs(docs, "id", "body",
        k = 8, w = 16, maxDocsPerFp = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    assert(Set((0L, 1L), (0L, 2L), (1L, 2L)).subsetOf(pairs))
    assert(pairs.size < 30)
    // the cut is visible on the quarantine channel
    val hot = Winnow.hotFingerprints(docs, "id", "body", 8, 16, 8).collect()
    assert(hot.nonEmpty && hot.forall(_.getAs[Long]("n_docs") > 8))
    // without the cap the boilerplate pairs everything (the winnowing
    // guarantee applied to the 41-char shared run)
    val uncapped = Winnow.verifiedPairs(docs, "id", "body",
        k = 8, w = 16, maxDocsPerFp = 1000000)
      .count()
    assert(uncapped == 66) // C(12,2)
  }

  test("persisted index: build+append ≡ single build; probe matches the join form; empty cases total") {
    val s = spark; import s.implicits._
    val shared = "INDEXED-SHARED-RUN-ABCDEFGHIJKLMNOP" // 35 >= 23
    def filler(seed: Int, n: Int) = {
      val r = new scala.util.Random(seed)
      Array.fill(n)(('a' + r.nextInt(26)).toChar).mkString
    }
    val corpus = (0 until 10).map { i =>
      (i.toLong, filler(i, 150) +
        (if (i % 2 == 0) shared else "") + filler(100 + i, 150))
    }.toDF("id", "body")
    val probes = Seq(
      (100L, filler(900, 80) + shared + filler(901, 40)),
      (101L, filler(902, 200)) // nothing shared
    ).toDF("id", "body")

    val one = tempDir("winnow-one")
    Winnow.buildWinnowIndex(corpus, "id", "body", s"$one/idx")
    val split = tempDir("winnow-split")
    Winnow.buildWinnowIndex(corpus.where($"id" < 5), "id", "body",
      s"$split/idx")
    Winnow.appendToWinnowIndex(corpus.where($"id" >= 5), "id", "body",
      s"$split/idx")

    def probePairs(path: String) =
      Winnow.probeWinnowIndex(probes, "id", "body", path)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
        .toSet
    val a = probePairs(s"$one/idx")
    val b = probePairs(s"$split/idx")
    assert(a == b) // append lands in the same scheme
    assert(a == Set((100L, 0L), (100L, 2L), (100L, 4L),
      (100L, 6L), (100L, 8L)))
    // probe hot cap: with the cap below the shared run's doc count,
    // the run's interior fingerprints are excluded in the PROBE path
    val capped = Winnow.probeWinnowIndex(probes, "id", "body",
      s"$one/idx", maxDocsPerFp = 2)
    assert(capped.count() < 5)
    // a probe batch with no fingerprints (too-short texts) is empty
    val tiny = Seq((7L, "tiny")).toDF("id", "body")
    assert(Winnow.probeWinnowIndex(tiny, "id", "body", s"$one/idx")
      .count() == 0)
    // an index built over fingerprint-less texts probes to empty
    val bare = tempDir("winnow-bare")
    Winnow.buildWinnowIndex(tiny, "id", "body", s"$bare/idx")
    assert(Winnow.probeWinnowIndex(probes, "id", "body", s"$bare/idx")
      .count() == 0)
  }
}
