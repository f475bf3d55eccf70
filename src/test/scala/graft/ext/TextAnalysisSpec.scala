package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkFunSuite {

  private lazy val docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "the quick brown fox"),
      (2L, "The  Quick   Brown Fox"), // same after normalize
      (3L, "el perro que corre es rapido de verdad"),
      (4L, "one"),
      (5L, "")
    ).toDF("doc_id", "text")
  }

  test("tokens / tokenCount match single-space split semantics") {
    val r = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // split on single spaces KEEPS empty tokens ("a  b" -> [a, "", b])
    assert(r == Map(1L -> 4, 2L -> 7, 3L -> 8, 4L -> 1, 5L -> 1))
  }

  test("normalize collapses case and whitespace; fingerprint equates 1 and 2") {
    val fp = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp(1L).matches("[0-9a-f]{32}"))
  }

  test("charChunks reassemble to the original; last chunk short") {
    val r = docs.where(col("doc_id") === 1)
      .select(TextAnalysis.charChunks(col("text"), 5).as("c"))
      .head().getSeq[String](0)
    assert(r.mkString == "the quick brown fox")
    assert(r.forall(_.length <= 5) && r.last.length == 4)
    // empty text must yield no chunks, not an Illegal-sequence error
    val empty = docs.where(col("doc_id") === 5)
      .select(TextAnalysis.charChunks(col("text"), 5).as("c"))
      .head().getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("wordBigrams: n-1 shingles; none for <2-token docs") {
    val r = docs.select(col("doc_id"),
      TextAnalysis.wordBigrams(col("text")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(r(1L) == Seq("the quick", "quick brown", "brown fox"))
    assert(r(4L).isEmpty && r(5L).isEmpty) // no out-of-bounds bigrams
  }

  test("charChunks: native kernel matches code-point grouped reference, " +
    "multibyte included") {
    val s = spark; import s.implicits._
    def ref(text: String, n: Int): Seq[String] =
      if (text.isEmpty) Seq.empty
      else text.grouped(n).toSeq // BPM-only inputs: grouped == code points
    val cases = Seq("hello world", "ab", "a", "", "байт данные спарк",
      "exactly8!", "x" * 130)
    for (n <- Seq(1, 3, 8, 64)) {
      val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select(col("id"), TextAnalysis.charChunks(col("text"), n).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      cases.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == ref(t, n), s"case '$t' n=$n")
        assert(got(i.toLong).mkString == t, s"lossless concat '$t' n=$n")
      }
    }
    val nul = Seq((0L, Option.empty[String])).toDF("id", "text")
      .select(TextAnalysis.charChunks(col("text"), 4)).head()
    assert(nul.isNullAt(0))
  }

  test("charNgrams: sliding char windows over normalized text") {
    val s = spark; import s.implicits._
    val d = Seq((1L, "AB cd"), (2L, "a"), (3L, "")).toDF("id", "text")
    val r = d.select(col("id"), TextAnalysis.charNgrams(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(r(1L) == Seq("ab ", "b c", " cd")) // normalized: lowercase
    assert(r(2L) == Seq("a")) // shorter than n: one truncated gram
    assert(r(3L) == Seq(""))  // empty normalizes to "" -> single empty gram
  }

  test("wordBigrams: native kernel matches split/sliding reference on edge shapes") {
    val s = spark; import s.implicits._
    // Reference semantics: split(" ", -1) keeps empty tokens (incl.
    // trailing), bigram = adjacent pair joined by one space.
    def ref(text: String): Seq[String] =
      text.split(" ", -1).toSeq.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
    val cases = Seq(
      "a b c",
      "a  b",          // consecutive spaces -> empty middle token
      " leading",      // leading space -> empty first token
      "trailing ",     // trailing space -> empty last token kept
      " ",             // one space, two empty tokens -> one " " bigram
      "   ",           // all spaces
      "single",
      "",
      "байт данные спарк", // multibyte UTF-8 spans survive the byte scan
      "tab\tis not a delimiter",
      "a b c d e f g h")
    val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.wordBigrams(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t), s"case '$t'")
    }
    // null text -> null result (not a crash, not an empty array)
    val n = Seq((0L, Option.empty[String])).toDF("id", "text")
      .select(TextAnalysis.wordBigrams(col("text"))).head()
    assert(n.isNullAt(0))
  }

  test("langId picks the marker-dominant language, und when none") {
    val r = docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r(1L) == "en")
    assert(r(3L) == "es")
    assert(r(4L) == "und" && r(5L) == "und")
  }

  test("rollingHash is order-sensitive, stable, and total on empty docs") {
    val s = spark; import s.implicits._
    val d = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"),
      (3L, "alpha beta gamma"), (4L, "")).toDF("id", "text")
    val r = d.select(col("id"), TextAnalysis.rollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r(1L) == r(3L)) // deterministic
    assert(r(1L) != r(2L)) // order matters
  }

  test("patternCount and stopwordCount") {
    val s = spark; import s.implicits._
    val d = Seq(Tuple1("a, b! c? d. e")).toDF("text")
    assert(d.select(TextAnalysis.patternCount(col("text"), "[.,!?]"))
      .head().getInt(0) == 4)
    assert(d.select(TextAnalysis.stopwordCount(col("text"), Seq("a", "e", "zz")))
      .head().getInt(0) == 1) // "a," and "d." are not bare tokens; only "e"
  }

  test("bpeTokens: GPT-2-style splits incl. contractions, lossless concat") {
    val s = spark; import s.implicits._
    val d = Seq(Tuple1("it's a test-case, 42 tokens!")).toDF("text")
    val toks = d.select(TextAnalysis.bpeTokens(col("text"))).head().getSeq[String](0)
    assert(toks == Seq("it", "'s", " a", " test", "-", "case", ",", " 42",
      " tokens", "!"))
    assert(toks.mkString == "it's a test-case, 42 tokens!") // lossless
    // total on degenerate docs
    val e = Seq(Tuple1("")).toDF("text")
    assert(e.select(TextAnalysis.bpeTokenCount(col("text"))).head().getInt(0) == 0)
  }

  test("qualityScore stays in [0,1]") {
    val r = docs.select(TextAnalysis.qualityScore(col("text"))).collect()
    assert(r.forall(x => x.getDouble(0) >= 0.0 && x.getDouble(0) <= 1.0))
  }

  test("redact masks URL/email/number spans in containment order") {
    val s = spark; import s.implicits._
    def red(t: String): String =
      Seq(Tuple1(t)).toDF("text")
        .select(TextAnalysis.redact(col("text"))).head().getString(0)
    // a URL embedding digits and an @ must become ONE <URL> token, not
    // leak an <EMAIL>/<NUM> out of its span
    assert(red("see http://u:p@ex.org/12345678x ok") === "see <URL> ok")
    assert(red("mail bob.smith+1@ex.co.uk now") === "mail <EMAIL> now")
    // digit runs inside an email's local part stay inside the mask
    assert(red("a 12345678@ex.org b") === "a <EMAIL> b")
    assert(red("id 123456789") === "id <NUM>")
    assert(red("short 123456 stays") === "short 123456 stays") // < 7 digits
    assert(red("clean text") === "clean text")
  }

  test("vocabulary: counts exact, doc frequency distinct, ties by token") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b a"), (2L, "b c"), (3L, "c b")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.vocabulary(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // b: 3 occ / 3 docs; a and c tie at 2 occ, "a" wins the tie; a has
    // 2 occurrences in ONE doc → n_docs must be distinct-counted
    assert(top.toSeq == Seq(("b", 3L, 3L), ("a", 2L, 1L)))
  }

  test("tfIdf: raw-count tf, distinct-doc df, ln(N/df) weighting") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "a a b"), (2L, "b c"), (3L, "b")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.tfIdf(corpus, "doc_id", "text")
      .orderBy("doc_id", "tok")
      .collect().map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // N=3; df: a→1, b→3, c→1. Engine log implementations may differ in
    // the last ulp, so scores compare with tolerance (the cross-engine
    // gate rounds to 6 decimals for the same reason).
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(rows((1L, "a"))._1 == 2L && rows((1L, "a"))._2 == 1L &&
      close(rows((1L, "a"))._3, 2.0 * math.log(3.0)))
    assert(rows((1L, "b")) == (1L, 3L, 0.0)) // ln(N/N) exactly 0
    assert(close(rows((2L, "c"))._3, math.log(3.0)))
    assert(rows((3L, "b"))._3 == 0.0) // corpus-universal token scores 0
    assert(rows.size == 5) // one row per distinct (doc, token)
  }

  test("byteStats: hand-checked entropy, degenerate and empty inputs, " +
    "binary input, codegen") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "aabb"),   // two symbols, equal: H = 1 bit
      (2L, "aaaa"),   // degenerate: H = 0
      (3L, ""),       // empty
      (4L, "abcd"))   // four distinct: H = 2 bits
      .toDF("id", "t")
    val out = df.select(col("id"), TextAnalysis.byteStats(col("t")).as("b"))
      .select(col("id"), col("b.n_bytes"), col("b.n_distinct"),
        col("b.top_count"), col("b.entropy"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) === ((4L, 2L, 2L, 1.0)))
    assert(out(2L) === ((4L, 1L, 4L, 0.0)))
    assert(out(3L) === ((0L, 0L, 0L, 0.0)))
    assert(out(4L) === ((4L, 4L, 1L, 2.0)))
    // binary input takes the same kernel
    val bin = Seq((1L, Array[Byte](0, 0, 1, 1))).toDF("id", "blob")
      .select(TextAnalysis.byteStats(col("blob")).as("b"))
      .select(col("b.entropy")).head().getDouble(0)
    assert(bin === 1.0)
    // whole-stage codegen holds through the native kernel
    val src = spark.range(100).select(
      concat(lit("x"), col("id") % 7).as("t"))
    val plan = src.select(TextAnalysis.byteStats(col("t")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("),
      s"byteStats must stay inside whole-stage codegen:\n$plan")
  }

  test("normalizeUrl: case/port/slash/fragment/tracking/param-order " +
    "variants collapse; non-URLs pass through; codegen holds") {
    val s = spark; import s.implicits._
    val variants = Seq(
      "http://Example.COM/page",
      "HTTP://example.com:80/page",
      "http://example.com/page/",
      "http://example.com/page#sec",
      "http://example.com/page?utm_source=tw&utm_campaign=x&fbclid=z",
      "  http://example.com/page  ")
    val out = variants.toDF("u")
      .select(TextAnalysis.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSet
    assert(out === Set("http://example.com/page"), out.toString)
    // param sort collapses order permutations, keeps non-tracking params
    val q = Seq("http://h/p?b=2&a=1", "http://h/p?a=1&utm_medium=m&b=2")
      .toDF("u").select(TextAnalysis.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSet
    assert(q === Set("http://h/p?a=1&b=2"))
    val edge = Seq(
      ("https://Host:443", "https://host/"),       // empty path → /
      ("https://host:8443/x", "https://host:8443/x"), // non-default port
      ("http://h/p?utm_source=a", "http://h/p"),   // all params dropped
      ("http://h/p?utm=a", "http://h/p?utm=a"),    // utm alone ≠ utm_*
      ("not a url at all", "not a url at all"),    // pass-through
      ("relative/path?x=1", "relative/path?x=1"),  // no scheme
      ("1ttp://bad-scheme/x", "1ttp://bad-scheme/x")) // bad scheme head
    edge.foreach { case (in, want) =>
      val got = Seq(in).toDF("u")
        .select(TextAnalysis.normalizeUrl(col("u")).as("n"))
        .head().getString(0)
      assert(got === want, s"normalizeUrl($in)")
    }
    val plan = spark.range(10)
      .select(TextAnalysis.normalizeUrl(concat(lit("http://h/"), col("id"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("),
      s"normalizeUrl must stay inside whole-stage codegen:\n$plan")
  }

  test("c4LineFilter: keeps punctuated >=minWords lines, drops " +
    "javascript boilerplate and short docs") {
    val s = spark; import s.implicits._
    val page1 = Seq(
      "This is a good sentence.",        // kept
      "short one.",                      // 2 words → dropped
      "Please enable JavaScript today!", // boilerplate → dropped
      "no terminal punctuation here",    // dropped
      "Another perfectly good line?").mkString("\n") // kept
    val page2 = "Only one good line survives here.\nand nothing else"
    val df = Seq((1L, page1), (2L, page2)).toDF("doc_id", "text")
    val out = TextAnalysis.c4LineFilter(df, "doc_id", "text",
      minWords = 4, minLines = 2).collect()
    assert(out.length == 1 && out.head.getAs[Long]("doc_id") == 1L,
      "doc 2 has <2 surviving lines and must drop")
    assert(out.head.getAs[String]("clean_text") ===
      "This is a good sentence.\nAnother perfectly good line?")
    assert(out.head.getAs[Long]("n_lines") == 5L &&
      out.head.getAs[Long]("n_kept") == 2L)
  }

  test("stripHtml: block content vanishes, tags strip, entities " +
    "decode once, whitespace collapses") {
    val s = spark; import s.implicits._
    val page = """<html><head><STYLE media="all">h1{x:1}</STYLE></head>
      |<body><script>
      |var secret = "leak";
      |</script ><p>Hello &amp; <b>world</b>!</p>
      |<!-- note --><div>5 &lt; 6 &amp;amp; &quot;q&#39;s&quot;</div>
      |</body></html>""".stripMargin
    val out = Seq((1L, page)).toDF("id", "h")
      .select(TextAnalysis.stripHtml(col("h"))).head().getString(0)
    // tags become SPACES (joining "foo<br>bar" would fuse words), so
    // "world</b>!" reads "world !"
    assert(out == "Hello & world ! 5 < 6 &amp; \"q's\"", repr(out))
    assert(!out.contains("secret") && !out.contains("x:1"),
      "script/style CONTENT must vanish, not just the tags")
    // plain text with no markup passes through modulo whitespace
    val plain = Seq((1L, "already   clean\ttext")).toDF("id", "h")
      .select(TextAnalysis.stripHtml(col("h"))).head().getString(0)
    assert(plain == "already clean text")
  }

  private def repr(s: String) = s.replace("\n", "\\n")

  test("compressionRatio: repetition compresses, hex junk does not, " +
    "empty text reports 1.0, raw byte counts exact") {
    val s = spark; import s.implicits._
    val boiler = "spark table row " * 64
    val junk = (0 until 16).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"7:j$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).mkString
    val df = Seq((1L, boiler), (2L, junk), (3L, "")).toDF("id", "text")
    val out = TextAnalysis.compressionRatio(df, "id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("raw_bytes"), r.getAs[Long]("deflated_bytes"),
          r.getAs[Double]("ratio"))).toMap
    assert(out(1L)._1 == 1024L && out(2L)._1 == 512L)
    assert(out(1L)._3 < 0.05, s"boilerplate must crush: ${out(1L)}")
    assert(out(2L)._3 > 0.4, s"hex junk must not: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 1.0)))
    // deterministic: same input, same deflated size on re-run
    val again = TextAnalysis.compressionRatio(df, "id", "text")
      .collect().map(r => r.getAs[Long]("deflated_bytes")).sorted
    assert(again.toSeq ==
      out.values.map(_._2).toSeq.sorted)
  }

  test("learnBpe matches a driver-side reference on a randomized " +
    "histogram; bpeSegment round-trips the training fuse") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde"
    val words = (0 until 30).map { _ =>
      ((2 + rnd.nextInt(6)) to 0 by -1)
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct.map(w => (w, 1L + rnd.nextInt(9).toLong))
    // driver-side reference: same algorithm, plain Scala
    def refLearn(ws: Seq[(String, Long)], k: Int): Seq[(String, String, Long)] = {
      var seqs = ws.map { case (w, c) => (w.split("").toSeq, c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var done = false
      while (!done && out.length < k) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        seqs.foreach { case (sq, c) =>
          sq.sliding(2).filter(_.length == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((a, b), c) = counts.toSeq
            .sortBy { case ((l, r), n) => (-n, l, r) }.head
          out += ((a, b, c))
          seqs = seqs.map { case (sq, cnt) =>
            val o = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < sq.length) {
              if (i + 1 < sq.length && sq(i) == a && sq(i + 1) == b) {
                o += a + b; i += 2
              } else { o += sq(i); i += 1 }
            }
            (o.toSeq, cnt)
          }
        }
      }
      out.toSeq
    }
    val df = words.toDF("word", "cnt")
    val got = TextAnalysis.learnBpe(df, "word", "cnt", 10)
    assert(got == refLearn(words, 10), s"learned $got")
    // segmentation concatenates back to the word, and segments are
    // exactly the learned-merge fuse of the reference
    val segs = TextAnalysis.bpeSegment(df, "word",
        got.map(m => (m._1, m._2)))
      .select("word", "segments").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { case (w, _) =>
      assert(segs(w).mkString("") == w, s"$w concat round-trip")
    }
  }

  test("byte-level learnBpe matches a driver-side reference on a " +
    "randomized MULTIBYTE histogram") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = Seq("a", "b", "é", "ß", "日", "😀")
    val words = (0 until 25).map { _ =>
      (0 to (1 + rnd.nextInt(4)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct.map(w => (w, 1L + rnd.nextInt(9).toLong))
    def refLearn(ws: Seq[(String, Long)], k: Int): Seq[(String, String, Long)] = {
      var seqs = ws.map { case (w, c) => (TextAnalysis.byteSymbols(w), c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var done = false
      while (!done && out.length < k) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        seqs.foreach { case (sq, c) =>
          sq.sliding(2).filter(_.length == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((a, b), c) = counts.toSeq
            .sortBy { case ((l, r), n) => (-n, l, r) }.head
          out += ((a, b, c))
          seqs = seqs.map { case (sq, cnt) =>
            val o = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < sq.length) {
              if (i + 1 < sq.length && sq(i) == a && sq(i + 1) == b) {
                o += a + b; i += 2
              } else { o += sq(i); i += 1 }
            }
            (o.toSeq, cnt)
          }
        }
      }
      out.toSeq
    }
    val df = words.toDF("word", "cnt")
    val got = TextAnalysis.learnBpe(df, "word", "cnt", 12, byteLevel = true)
    assert(got == refLearn(words, 12), s"learned $got")
    val segs = TextAnalysis.bpeSegment(df, "word",
        got.map(m => (m._1, m._2)), byteLevel = true)
      .select("word", "segments").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { case (w, _) =>
      assert(TextAnalysis.symbolsToString(segs(w).mkString("")) == w,
        s"$w byte round-trip")
    }
  }

  test("bpeEncodeIds: total on any unicode input, ids decode back to " +
    "the original word through the vocab") {
    val s = spark; import s.implicits._
    val words = Seq(("éé", 4L), ("és", 3L), ("se", 2L), ("te", 2L))
      .toDF("word", "cnt")
    val merges = TextAnalysis.learnBpe(words, "word", "cnt", 5,
      byteLevel = true).map(m => (m._1, m._2))
    val vocab = TextAnalysis.bpeVocab(merges)
    assert(vocab.length == 256 + merges.length)
    assert(vocab.map(_._1) == (0 until 256 + merges.length))
    // ids 0-255 are exactly the byte alphabet's images
    (0 until 256).foreach(b =>
      assert(vocab(b)._2 == String.valueOf(TextAnalysis.byteToUnicode(b))))
    val tokenOf = vocab.toMap
    // eval set includes words the histogram never saw, incl. CJK/emoji
    val eval = Seq("éé", "set", "éa", "日本語", "😀", "mixed é 日 x")
      .toDF("word")
    val got = TextAnalysis.bpeEncodeIds(eval, "word", merges)
      .select("word", "ids", "n_tokens").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    got.foreach { case (w, ids, n) =>
      val idSeq = ids.split(",").map(_.toInt).toSeq
      assert(idSeq.length == n, w)
      val decoded = TextAnalysis.symbolsToString(
        idSeq.map(tokenOf).mkString(""))
      assert(decoded == w, s"decode($ids) = '$decoded' != '$w'")
    }
  }

  test("byte-level BPE: GPT-2 table is a bijection that round-trips " +
    "arbitrary unicode, and byte vs char level DIVERGE on a multibyte " +
    "corpus") {
    val s = spark; import s.implicits._
    // bijection: 256 distinct symbols, inverse is exact
    assert(TextAnalysis.byteToUnicode.distinct.length == 256)
    // round-trip: symbols → string for latin-1, CJK, emoji, controls
    for (w <- Seq("hello", "café", "straße", "日本語", "😀🎉", "a\tb c",
        " spaced ", "­")) {
      val sym = TextAnalysis.byteSymbols(w)
      assert(TextAnalysis.symbolsToString(sym.mkString("")) == w, w)
      // every symbol is exactly one char (one byte's image)
      assert(sym.forall(_.length == 1), w)
      assert(sym.length == w.getBytes("UTF-8").length, w)
    }
    // divergence: on the q121 histogram the FIRST merge differs —
    // byte level fuses é's intra-character byte pair (count 11),
    // invisible to char level (whose first merge is (é,é) at 4)
    val words = Seq(("éé", 4L), ("és", 3L), ("se", 2L), ("te", 2L))
      .toDF("word", "cnt")
    val byteM = TextAnalysis.learnBpe(words, "word", "cnt", 5,
      byteLevel = true)
    val charM = TextAnalysis.learnBpe(words, "word", "cnt", 5)
    assert(byteM.head == ("Ã", "©", 11L), s"byte: $byteM")
    assert(charM.head == ("é", "é", 4L), s"char: $charM")
    assert(byteM.map(m => (m._1, m._2)) != charM.map(m => (m._1, m._2)))
    // byte-level segments decode back to the original words
    val segs = TextAnalysis.bpeSegment(words, "word",
        byteM.map(m => (m._1, m._2)), byteLevel = true)
      .select("word", "segments").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    segs.foreach { case (w, sym) =>
      assert(TextAnalysis.symbolsToString(sym.mkString("")) == w, w)
    }
  }

  test("GopherSignals kernel matches the Column-HOF formulation " +
    "bit-for-bit on adversarial token shapes") {
    val s = spark; import s.implicits._
    graft.functions.VecExpressions.register(s)
    val texts = Seq(
      "the cat and dog", "", " ", "  ", "a", "the", "thee the.",
      "x#y ### a...b .... ..", "... ... ...", "#",
      "123 456 a1 é中 the", "to of and that have with be the",
      "word# wi.th trailing ", " leading", "do.. ..ts .a.b.c...")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val kernel = df.select(col("id"),
        call_function("graft_gopher_signals", col("t")).as("g"))
      .select(col("id"), col("g.n_words"), col("g.n_sym"),
        col("g.n_alpha"), col("g.n_stop"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val toks = split(col("t"), " ")
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val ref = df.select(col("id"),
        size(toks).cast("long"),
        size(regexp_extract_all(col("t"), lit("#|\\.\\.\\."), lit(0)))
          .cast("long"),
        size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("long"),
        size(filter(toks, x => x.isin(stops.map(v => v: Any): _*)))
          .cast("long"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    texts.indices.foreach { i =>
      assert(kernel(i.toLong) == ref(i.toLong),
        s"'${texts(i)}': kernel=${kernel(i.toLong)} ref=${ref(i.toLong)}")
    }
  }

  test("gopherFilter: hand-checked signals and rule verdicts") {
    val s = spark; import s.implicits._
    // 4 words, lengths 3+3+3+3 = 12 chars + 3 separators = 15;
    // 2 stopwords; all alphabetic; no symbols
    val good = "the cat and dog"
    // symbol-heavy: '...' twice + '#' once over 4 words → ratio 0.75
    val sym = "a#b ... c... d"
    // numeric words: 1 of 4 has an alphabetic char
    val num = "123 456 789 a12"
    val df = Seq((1L, good), (2L, sym), (3L, num)).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFilter(df, "doc_id", "text",
        minWords = 2, minStopwords = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val g = out(1L)
    assert(g.getAs[Long]("n_words") == 4L)
    assert(g.getAs[Double]("mean_word_len") == 3.0)
    assert(g.getAs[Long]("n_stop") == 2L)
    assert(g.getAs[Double]("alpha_frac") == 1.0)
    assert(g.getAs[Boolean]("keep"))
    assert(out(2L).getAs[Double]("symbol_ratio") == 0.75 &&
      !out(2L).getAs[Boolean]("sym_ok"))
    assert(out(3L).getAs[Double]("alpha_frac") == 0.25 &&
      !out(3L).getAs[Boolean]("alpha_ok") &&
      !out(3L).getAs[Boolean]("keep"))
  }

  test("nfc composes decomposed sequences, is idempotent, and leaves " +
    "ASCII untouched (fast path returns the same value)") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "café"),        // composed
      (2L, "café"),       // decomposed — must compose to row 1
      (3L, "plain ascii"),      // fast path
      (4L, "ṩ"),           // s + dot below + dot above, composed
      (5L, "ṩ")     // same, fully decomposed
    ).toDF("id", "t")
    val out = df.select(col("id"), TextAnalysis.nfc(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === out(2L))
    assert(out(1L) === "café")
    assert(out(3L) === "plain ascii")
    assert(out(4L) === out(5L))
    // idempotent: nfc(nfc(x)) == nfc(x)
    val twice = df.select(TextAnalysis.nfc(TextAnalysis.nfc(col("t")))
      .as("n")).collect().map(_.getString(0))
    val once = df.select(TextAnalysis.nfc(col("t")).as("n"))
      .collect().map(_.getString(0))
    assert(twice.toSeq === once.toSeq)
  }
}
