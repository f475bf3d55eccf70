package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkFunSuite

/** CorpusPrep operator contracts: determinism, exact parity with
  * brute-force formulations, and the sampling-theory properties
  * (nestedness, content-stability) the scaladocs promise.
  */
class CorpusPrepSpec extends SparkFunSuite {
  import spark.implicits._

  private def keys(n: Int) = (0L until n.toLong).toDF("id")

  test("splitAssign is deterministic and roughly proportional") {
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = keys(4000)
      .select(col("id"), CorpusPrep.splitAssign(col("id"), "s1", fr).as("sp"))
    val counts = assigned.groupBy("sp").count().as[(String, Long)]
      .collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    // 16-bit uniform: binomial sd for p=0.1 over 4000 keys is ~19; a
    // ±10% relative band is > 2 sd for every label.
    assert(math.abs(counts("train") - 3200) < 320)
    assert(math.abs(counts("val") - 400) < 100)
    assert(math.abs(counts("test") - 400) < 100)
    // bit-for-bit rerun determinism
    val again = keys(4000)
      .select(col("id"), CorpusPrep.splitAssign(col("id"), "s1", fr).as("sp"))
    assert(assigned.except(again).isEmpty && again.except(assigned).isEmpty)
  }

  test("splitAssign is content-stable: a key's label ignores corpus size") {
    val fr = Seq("a" -> 0.5, "b" -> 0.5)
    val small = keys(100)
      .select(col("id"), CorpusPrep.splitAssign(col("id"), "s2", fr).as("sp"))
    val large = keys(10000)
      .select(col("id"), CorpusPrep.splitAssign(col("id"), "s2", fr).as("sp"))
    assert(small.join(large, Seq("id"))
      .where(small("sp") =!= large("sp")).isEmpty)
  }

  test("weightedMix keeps all at w>=1, none at w=0, and nests by weight") {
    val df = keys(2000).withColumn("src",
      concat(lit("s"), col("id") % 2))
    def kept(w0: Double, w1: Double): Set[Long] =
      CorpusPrep.weightedMix(df, col("id"), col("src"),
        Map("s0" -> w0, "s1" -> w1), "m1")
        .select("id").as[Long].collect().toSet
    assert(kept(1.0, 0.0) === (0L until 2000L by 2).toSet)
    val half = kept(0.5, 0.5)
    val quarter = kept(0.25, 0.25)
    assert(quarter.subsetOf(half), "hash-threshold samples must nest")
    assert(math.abs(half.size - 1000) < 150)
    assert(math.abs(quarter.size - 500) < 120)
    // unlisted sources are dropped (allowlist semantics)
    assert(CorpusPrep.weightedMix(df, col("id"), col("src"),
      Map("s0" -> 1.0), "m1").where(col("src") === "s1").isEmpty)
  }

  test("split and mix hash units are independent (different md5 span)") {
    // If both read the same 4 hex chars, w=0.8 mix would keep exactly
    // the train split of an 80/20 split; with pos 1 vs pos 5 the
    // overlap is ~64% of the 80% — check it is strictly between.
    val fr = Seq("train" -> 0.8, "rest" -> 0.2)
    val df = keys(4000).withColumn("src", lit("s"))
    val train = df.select(col("id"),
        CorpusPrep.splitAssign(col("id"), "x", fr).as("sp"))
      .where(col("sp") === "train").select("id").as[Long].collect().toSet
    val mixed = CorpusPrep.weightedMix(df, col("id"), col("src"),
      Map("s" -> 0.8), "x").select("id").as[Long].collect().toSet
    val overlap = (train & mixed).size.toDouble
    assert(overlap < 0.95 * math.min(train.size, mixed.size),
      "mix must not replay the split decision")
    assert(overlap > 0.4 * math.min(train.size, mixed.size))
  }

  test("decontaminate flags exactly the docs sharing a full n-gram") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "THE  QUICK   Brown fox jumps over the lazy dog tonight"), // = 0 normalized
      (2L, "completely unrelated content with no overlap whatsoever"),
      (3L, "prefix text then quick brown fox jumps over then suffix"),
      (4L, "short doc")).toDF("doc_id", "text")
    // snippet = 26 normalized chars from doc 0
    val snippets = Seq("quick brown fox jumps over").toDF("snippet")
    val out = CorpusPrep.decontaminate(docs, "doc_id", "text", snippets, 26)
      .select("doc_id", "contaminated").as[(Long, Int)].collect().toMap
    assert(out === Map(0L -> 1, 1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0))
  }

  test("decontaminate snippet join broadcasts (no shuffle of doc grams)") {
    val docs = (0L until 50L).map(i => (i, s"doc number $i body " * 5))
      .toDF("doc_id", "text")
    val snippets = Seq("doc number 7 body").toDF("snippet")
    val plan = CorpusPrep.decontaminate(docs, "doc_id", "text", snippets, 17)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"),
      s"snippet join must broadcast, got:\n$plan")
  }

  test("packSequences matches the single-window brute force") {
    val rnd = new scala.util.Random(7)
    // sparse, shuffled-ish ids so bucket boundaries and empty buckets
    // are exercised; token counts 1..40
    val rows = (0 until 500).map(i =>
      (i.toLong * 13 % 1000 * 7, rnd.nextInt(40) + 1))
      .distinct.map { case (id, tok) => (id, tok) }
    val df = rows.toDF("id", "tok")
    val got = CorpusPrep.packSequences(df, "id", col("tok"),
        windowTokens = 64, bucketSize = 32)
      .select("id", "tok", "first_window", "last_window")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // brute force on the driver
    var start = 0L
    val want = rows.sortBy(_._1).map { case (id, tok) =>
      val r = (id, tok.toLong, start / 64, (start + tok - 1) / 64)
      start += tok
      r
    }
    assert(got.toSeq === want)
  }

  test("packSequences is invariant to bucketSize") {
    val df = (0L until 300L).map(i => (i * 3, (i % 17 + 1).toInt))
      .toDF("id", "tok")
    def run(b: Long) =
      CorpusPrep.packSequences(df, "id", col("tok"), 128, b)
        .select("id", "first_window", "last_window")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(7) === run(1 << 20))
  }

  test("packSequences windows tile the stream with no token gaps") {
    val df = (0L until 200L).map(i => (i, (i % 29 + 1).toInt))
      .toDF("id", "tok")
    val out = CorpusPrep.packSequences(df, "id", col("tok"), 100, 64)
    val total = df.agg(sum("tok")).as[Long].head()
    // the last doc's last_window must be the stream's last window
    val lastWin = out.agg(max("last_window")).as[Long].head()
    assert(lastWin === (total - 1) / 100)
    // consecutive docs: next.first_window ∈ {prev.last_window, +1 range}
    val seq = out.orderBy("id")
      .select("first_window", "last_window").as[(Long, Long)].collect()
    seq.sliding(2).foreach { case Array((_, aLast), (bFirst, _)) =>
      assert(bFirst === aLast || bFirst === aLast + 1 ||
        (bFirst >= aLast && bFirst <= aLast + 1))
    case _ => ()
    }
  }

  test("window hashes: native kernel matches the HOF md5 formulation " +
    "on edge shapes") {
    graft.functions.VecExpressions.register(spark)
    val cases = Seq(
      "a b c d",           // count = tokens − w + 1
      "a  b c",            // consecutive spaces → empty tokens kept
      " lead", "trail ",   // leading/trailing empties
      "   ",               // all spaces (4 empty tokens)
      "one", "",           // fewer than w tokens → empty array
      "байт данные спарк два", // multibyte spans survive the byte scan
      "a b c")             // exactly w tokens → one window
    for (w <- Seq(2, 3)) {
      // the let-binding HOF reference: bind t once, md5 each joined slice
      val ref = flatten(transform(array(split(col("text"), " ")), t =>
        transform(sequence(lit(1), size(t) - (w - 1)),
          i => md5(concat_ws(" ", slice(t, i, lit(w))).cast("binary")))))
      val refGuarded = when(size(split(col("text"), " ")) >= w, ref)
        .otherwise(array().cast("array<string>"))
      val both = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select(col("id"),
          call_function("graft_window_hashes", col("text"), lit(w)).as("n"),
          refGuarded.as("r"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"case '${cases(r.getLong(0).toInt)}' w=$w")
      }
    }
    // null text → null result
    val n = Seq((0L, Option.empty[String])).toDF("id", "text")
      .select(call_function("graft_window_hashes", col("text"), lit(2)))
      .head()
    assert(n.isNullAt(0))
  }

  test("duplicateWindows finds cross-doc spans, ignores within-doc ones") {
    val docs = Seq(
      (1L, "p q r s t u v w x"),   // shares window p..w (8 toks) with doc 2
      (2L, "z p q r s t u v w"),   // → both have 2 windows, 1 duplicated
      (3L, "a b c d e f g h a b c d e f g h"), // within-doc repeat only:
                                   // windows distinct-doc count stays 1
      (4L, "too short")            // < 8 tokens → no row
    ).toDF("doc_id", "text")
    val out = CorpusPrep.duplicateWindows(docs, "doc_id", "text", 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 9L, 0L)))
  }

  test("capPerSource keeps exactly k per source, partition-independent") {
    val docs = (0L until 300L).map(i => (i, s"src${i % 3}"))
      .toDF("id", "src")
    val capped = CorpusPrep.capPerSource(docs, col("id"), col("src"),
      7, "s")
    val counts = capped.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(counts === Map("src0" -> 7L, "src1" -> 7L, "src2" -> 7L))
    // the SAME ids survive regardless of input partitioning
    val again = CorpusPrep.capPerSource(docs.repartition(13), col("id"),
      col("src"), 7, "s")
    assert(capped.except(again).isEmpty && again.except(capped).isEmpty)
    // a source with fewer than k docs keeps everything
    val tiny = Seq((1L, "a"), (2L, "a")).toDF("id", "src")
    assert(CorpusPrep.capPerSource(tiny, col("id"), col("src"), 7, "s")
      .count() === 2L)
  }

  test("stripDuplicateWindows cuts only non-canonical covered spans") {
    val docs = Seq(
      (1L, "p q r s t u v w x"),  // canonical owner of the shared span
      (2L, "z p q r s t u v w"),  // cuts ti 1..8 → keeps "z"
      (3L, "a b c d e f g h a b c d e f g h"), // within-doc repeat: kept
      (4L, "too short")           // no windows → untouched
    ).toDF("doc_id", "text")
    val out = CorpusPrep.stripDuplicateWindows(docs, "doc_id", "text", 8)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, "p q r s t u v w x", 0L),
      (2L, "z", 8L),
      (3L, "a b c d e f g h a b c d e f g h", 0L),
      (4L, "too short", 0L)))
  }

  test("repetitionStats counts the bigram multiset exactly") {
    val docs = Seq(
      (1L, "a b a b a"),        // bigrams: a b, b a, a b, b a → 4 total, 2 distinct, top 2
      (2L, "x y z"),            // x y, y z → 2 total, 2 distinct, top 1
      (3L, "w w w w"),          // w w ×3 → 3 total, 1 distinct, top 3
      (4L, "solo"),             // no bigrams → no row
      (5L, "")                  // no bigrams → no row
    ).toDF("doc_id", "text")
    val out = CorpusPrep.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 4L, 2L, 2L), (2L, 2L, 2L, 1L), (3L, 3L, 1L, 3L)))
  }

  test("sourceOverlap: distinct shared chunks per pair, diagonal = totals") {
    // width 4 → chunks: "aaaa","bbbb","cccc","dddd"; repeats within a
    // source must NOT inflate counts (distinct per (source, hash))
    val docs = Seq(
      ("A", "aaaabbbb"), ("A", "aaaacccc"), // A: {aaaa, bbbb, cccc}
      ("B", "bbbbcccc"),                    // B: {bbbb, cccc}
      ("C", "dddd"), ("C", "dddd")          // C: {dddd}, repeated doc
    ).toDF("source", "text")
    val out = CorpusPrep.sourceOverlap(docs, "source", "text", 4)
      .as[(String, String, Long)].collect().sortBy(p => (p._1, p._2))
    // pairs with zero overlap (A-C, B-C) must be ABSENT, not zero rows
    assert(out.toSeq === Seq(
      ("A", "A", 3L), ("A", "B", 2L), ("B", "B", 2L), ("C", "C", 1L)))
  }

  test("corpusDiff classifies by content, ids absent from both emit no row") {
    val old = Seq((1L, "same"), (2L, "before"), (3L, "gone"))
      .toDF("doc_id", "text")
    val neu = Seq((1L, "same"), (2L, "after"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val out = CorpusPrep.corpusDiff(old, neu, "doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
  }

  test("packWindowSlices tiles every doc and fills every window " +
    "except the last exactly") {
    val docs = (0L until 100L).map(i => (i, (i % 7 + 1) * 3))
      .toDF("id", "tok")
    val w = 16
    val slices = CorpusPrep.packWindowSlices(docs, "id", col("tok"),
      w, bucketSize = 10)
    val rows = slices.collect().map(r => (r.getAs[Long]("id"),
      r.getAs[Long]("win"), r.getAs[Long]("off_in_doc"),
      r.getAs[Long]("off_in_window"), r.getAs[Long]("n_toks")))
    // per-doc: slices cover [0, tok) contiguously
    val byDoc = rows.groupBy(_._1)
    docs.collect().foreach { d =>
      val (id, tok) = (d.getAs[Long]("id"), d.getAs[Long]("tok"))
      val ss = byDoc(id).sortBy(_._3)
      assert(ss.map(_._5).sum === tok, s"doc $id token sum")
      assert(ss.head._3 === 0L, s"doc $id must start at offset 0")
      ss.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._5 === b._3, s"doc $id gap")
        case _ =>
      }
    }
    // per-window: contiguous window offsets from 0; every window but
    // the last holds exactly w tokens
    val byWin = rows.groupBy(_._2)
    val lastWin = byWin.keys.max
    byWin.foreach { case (win, ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.head._4 === 0L, s"window $win starts at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 + a._5 === b._4, s"window $win gap")
        case _ =>
      }
      if (win != lastWin)
        assert(sorted.map(_._5).sum === w.toLong, s"window $win fill")
    }
    // global: slice tokens sum to the corpus token count
    assert(rows.map(_._5).sum === docs.agg(sum("tok")).head().getLong(0))
  }

  test("shuffleOrder equals one global row_number over the salted " +
    "hash, is a dense 0..n-1 permutation, and is partition-independent") {
    import org.apache.spark.sql.expressions.Window
    val n = 3000
    val ks = keys(n)
    val fast = CorpusPrep.shuffleOrder(ks, col("id"), "t1")
    // the single-window reference formulation (fine at test scale)
    val h = md5(concat(col("id").cast("string"), lit(":t1:shuffle"))
      .cast("binary"))
    val slow = ks.withColumn("ref",
      row_number().over(Window.orderBy(h, col("id"))).cast("long") - 1L)
    assert(fast.join(slow, "id").where(col("rank") =!= col("ref"))
      .count() === 0L)
    val Seq(mn, mx, nd) = fast
      .agg(min("rank"), max("rank"), count_distinct(col("rank")))
      .head().toSeq.map(_.asInstanceOf[Long])
    assert((mn, mx, nd) === (0L, n - 1L, n.toLong))
    // physical layout must not change the order
    val repart = CorpusPrep.shuffleOrder(ks.repartition(7), col("id"), "t1")
    assert(fast.join(repart.withColumnRenamed("rank", "r2"), "id")
      .where(col("rank") =!= col("r2")).count() === 0L)
  }

  test("spanCorrupt: splicing each target span back at its sentinel " +
    "reconstructs the original text; spans are merged maximal runs") {
    val s = spark; import s.implicits._
    val docs = spark.range(50).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(i =>
        concat(lit(s"w$i"), col("id") % 7)): _*).as("text"))
    val out = CorpusPrep.spanCorrupt(docs, "doc_id", "text",
        maskRate = 0.3, spanLen = 3, seed = "t9")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("input_text"), r.getAs[String]("target_text"),
        r.getAs[Long]("n_spans")))
    assert(out.length == 50)
    assert(out.exists(_._4 >= 2), "rate 0.3 over 40 tokens must mask")
    val orig = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    out.foreach { case (id, in, tg, nSpans) =>
      // parse target into span -> tokens
      val spans = scala.collection.mutable.Map.empty[Int, List[String]]
      var cur = -1
      tg.split(" ").filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) {
          cur = t.stripPrefix("<extra_id_").stripSuffix(">").toInt
          spans(cur) = Nil
        } else spans(cur) = spans(cur) :+ t
      }
      assert(spans.size == nSpans, s"doc $id sentinel count")
      // sentinels appear in ascending order exactly once in the input
      val rebuilt = in.split(" ").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_"))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Seq(t)
      }.mkString(" ")
      assert(rebuilt == orig(id), s"doc $id reconstruction")
      // merged runs: a span's tokens never appear split by a sentinel
      assert(!in.matches(".*<extra_id_\\d+> <extra_id_\\d+>.*"),
        s"doc $id adjacent sentinels — runs were not merged")
    }
  }

  test("fimTransform: PSM parts reassemble to the original token " +
    "stream; rate 0 is identity; transformed fraction tracks rate") {
    val s = spark; import s.implicits._
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(i =>
        concat(lit(s"t$i"), col("id") % 5)): _*).as("text"))
    val orig = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val out = CorpusPrep.fimTransform(docs, "doc_id", "text",
      rate16 = 32768, seed = "t9").collect()
    var nFim = 0
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val t = r.getAs[String]("out_text")
      if (r.getAs[Boolean]("fim")) {
        nFim += 1
        // <PRE> p <SUF> s <MID> m  →  original = p m s
        val pat = "(?s)^<PRE> (.*) <SUF> (.*) <MID> (.*)$".r
        t match {
          case pat(p, sfx, m) =>
            val rebuilt = Seq(p, m, sfx).filter(_.nonEmpty).mkString(" ")
            assert(rebuilt == orig(id), s"doc $id splice-back")
          case _ => fail(s"doc $id not in PSM shape: $t")
        }
      } else assert(t == orig(id), s"doc $id must pass through")
    }
    assert(nFim > 60 && nFim < 140,
      s"rate 32768/65536 should transform ~half, got $nFim/200")
    // rate 0: identity for every doc
    assert(CorpusPrep.fimTransform(docs, "doc_id", "text", 0, "t9")
      .where(col("fim")).count() === 0L)
  }

  test("lengthBatches: equals one global row_number over (len bucket, " +
    "hash, key); batches are length-sorted buckets; partition-independent") {
    import org.apache.spark.sql.expressions.Window
    val s = spark; import s.implicits._
    val n = 2000
    // skewed lengths on purpose: half the docs share one length
    val docs = spark.range(n).select(col("id"),
      when(col("id") % 2 === 0, lit(100L))
        .otherwise((col("id") % 37) * 20L).as("len"))
    val a = CorpusPrep.lengthBatches(docs, col("id"), col("len"),
      batchSize = 16, bucketWidth = 32, seed = "t9")
    // reference: single global window (fine at test scale)
    val h = md5(concat(col("id").cast("string"), lit(":t9:lenbatch"))
      .cast("binary"))
    val ref = docs.withColumn("rk",
        row_number().over(Window.orderBy(
          floor(col("len") / 32).cast("long"), h, col("id")))
          .cast("long") - 1L)
      .select(col("id"), (col("rk") / 16).cast("long").as("rb"),
        (col("rk") % 16).cast("int").as("rp"))
    assert(a.join(ref, "id")
      .where(col("batch") =!= col("rb") || col("pos") =!= col("rp"))
      .count() === 0L)
    // every full batch holds 16 docs; batch ids are dense
    val sizes = a.groupBy("batch").count()
    assert(sizes.where(col("count") =!= 16L).count() <= 1L,
      "only the last batch may be partial")
    assert(sizes.count() === ((n + 15) / 16).toLong)
    // physical layout must not change assignments
    val repart = CorpusPrep.lengthBatches(docs.repartition(7), col("id"),
      col("len"), 16, 32, "t9")
    assert(a.join(repart.select(col("id"), col("batch").as("b2"),
        col("pos").as("p2")), "id")
      .where(col("batch") =!= col("b2") || col("pos") =!= col("p2"))
      .count() === 0L)
  }

  test("temperatureSample keeps ALL of the smallest source, downsamples " +
    "large ones toward sqrt proportions, and nests in the input") {
    val docs = (0 until 100).map(i => (i.toLong, "small")) ++
      (100 until 1700).map(i => (i.toLong, "big"))
    val df = docs.toDF("id", "src")
    val kept = CorpusPrep.temperatureSample(df, col("id"), col("src"), "s")
    val counts = kept.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    // smallest source: threshold is exactly 65536 → every row kept
    assert(counts("small") === 100L)
    // big source: keep prob = sqrt(100/1600) = 0.25 exactly; 16-bit
    // binomial sd over 1600 rows is ~17, allow 5 sd
    assert(math.abs(counts("big") - 400L) <= 87L,
      s"big kept ${counts("big")}, expected ~400")
    // sample nests: kept ⊆ input, and rerun is bit-identical
    assert(kept.join(df, Seq("id"), "left_anti").count() === 0L)
    val again = CorpusPrep.temperatureSample(df, col("id"), col("src"), "s")
    assert(kept.except(again).isEmpty && again.except(kept).isEmpty)
  }
}
