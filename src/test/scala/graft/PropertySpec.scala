package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.operators.{SkewJoin, TemporalOps}
import graft.sources.ZOrderLayout

/** Property-based contracts for the round-8 operators: randomized
  * inputs against independent reference formulations. Driver-side
  * generators feed small DataFrames; each property runs a real Spark
  * job, so the suite keeps case counts modest (the per-case cost is a
  * local job, not a pure function call).
  */
class PropertySpec extends SparkFunSuite {
  import spark.implicits._

  private def check(prop: Prop, cases: Int = 8): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: z-value bit interleave round-trips through prefixBox " +
    "at every depth") {
    val gen = for {
      bits <- Gen.choose(2, 8)
      a <- Gen.choose(0L, (1L << bits) - 1)
      b <- Gen.choose(0L, (1L << bits) - 1)
      d <- Gen.choose(1, 2 * bits)
    } yield (bits, a, b, d)
    check(Prop.forAll(gen) { case (bits, a, b, d) =>
      // compute z driver-side with the same arithmetic the Column does
      var z = 0L
      for (i <- 0 until bits)
        z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      val prefix = z >> (2 * bits - d)
      val (a0, a1, b0, b1) = ZOrderLayout.prefixBox(prefix, bits, d)
      a >= a0 && a <= a1 && b >= b0 && b <= b1
    }, cases = 200) // pure arithmetic — no Spark job, can afford many
  }

  test("property: saltedJoin equals the plain join on random data") {
    val gen = for {
      nProbe <- Gen.choose(1, 300)
      nKeys <- Gen.choose(1, 8)
      factor <- Gen.choose(1, 9)
      dupBuild <- Gen.oneOf(1, 2) // build rows per key
    } yield (nProbe, nKeys, factor, dupBuild)
    check(Prop.forAll(gen) { case (nProbe, nKeys, factor, dupBuild) =>
      val probe = (0 until nProbe)
        .map(i => (i.toLong, s"k${i % nKeys}")).toDF("id", "k")
      val build = (0 until nKeys).flatMap(k =>
        (0 until dupBuild).map(j => (s"k$k", k * 100L + j)))
        .toDF("k", "v")
      val salted = SkewJoin.saltedJoin(probe, build, Seq("k"), factor,
        col("id")).select("id", "v")
      val plain = probe.join(build, Seq("k")).select("id", "v")
      salted.except(plain).isEmpty && plain.except(salted).isEmpty &&
        salted.count() == plain.count()
    })
  }

  test("property: asOfJoin matches a driver-side reference on random " +
    "event streams") {
    val gen = for {
      nLeft <- Gen.choose(1, 60)
      nRight <- Gen.choose(0, 60)
      nKeys <- Gen.choose(1, 4)
      seed <- Gen.choose(0, 1000000)
    } yield (nLeft, nRight, nKeys, seed)
    check(Prop.forAll(gen) { case (nLeft, nRight, nKeys, seed) =>
      val rnd = new scala.util.Random(seed)
      // distinct right (key, ts) pairs — the operator's contract
      val right = rnd.shuffle((0 until 200).toList).take(nRight)
        .map(t => (s"u${rnd.nextInt(nKeys)}", t.toLong * 1000000L,
          rnd.nextInt(100)))
      val left = (0 until nLeft).map(i =>
        (i.toLong, s"u${rnd.nextInt(nKeys)}",
          rnd.nextInt(220).toLong * 1000000L - 10000000L))
      val lDf = left.toDF("id", "u", "us")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val rDf = right.toDF("u", "us", "v")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .select("u", "ts", "v")
      val got = TemporalOps.asOfJoin(lDf, rDf, Seq("u"), "ts", "ts",
          Seq("v"))
        .select("id", "v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val expect = left.map { case (id, u, us) =>
        val cand = right.filter(r => r._1 == u && r._2 <= us)
        id -> (if (cand.isEmpty) None
               else Some(cand.maxBy(_._2)._3))
      }.toMap
      got.size == left.size &&
        left.forall { case (id, _, _) =>
          got(id).map(_.asInstanceOf[Int]) == expect(id) }
    })
  }

  test("property: sessionize boundary arithmetic matches a driver-side " +
    "fold") {
    val gen = for {
      n <- Gen.choose(1, 80)
      gapS <- Gen.choose(1L, 50L)
      seed <- Gen.choose(0, 1000000)
    } yield (n, gapS, seed)
    check(Prop.forAll(gen) { case (n, gapS, seed) =>
      val rnd = new scala.util.Random(seed)
      val evs = (0 until n).map(i =>
        (i.toLong, s"u${rnd.nextInt(3)}",
          rnd.nextInt(500).toLong * 1000000L))
      val df = evs.toDF("id", "u", "us")
        .withColumn("ts", timestamp_micros(col("us")))
      val got = TemporalOps.sessionize(df, Seq("u"), "ts", gapS, Seq("id"))
        .select("id", "session_idx").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = evs.groupBy(_._2).flatMap { case (_, g) =>
        val sorted = g.sortBy(e => (e._3, e._1))
        var idx = 0L
        var prev = Long.MinValue
        sorted.map { case (id, _, us) =>
          if (prev == Long.MinValue || us - prev > gapS * 1000000L)
            idx += 1
          prev = us
          id -> idx
        }
      }
      evs.forall { case (id, _, _) => got(id) == expect(id) }
    })
  }

  test("property: NormalizeUrl is total, idempotent, and collapse-" +
    "invariant on randomized URL-ish strings (pure kernel, no job)") {
    import graft.functions.TextExpressions.NormalizeUrl.canon
    val seg = Gen.oneOf("a", "B", "x1", "p%20q", "", "index.html")
    val gen = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "ftp", "h ttp", "1x")
      host <- Gen.oneOf("Example.COM", "host", "a.b.c", "host:80",
        "host:443", "host:8080", "")
      segs <- Gen.listOfN(3, seg)
      q <- Gen.oneOf("", "?a=1&b=2", "?b=2&a=1", "?utm_source=x",
        "?utm_source=x&a=1", "?", "?&&a=1")
      frag <- Gen.oneOf("", "#f", "#a?b")
      ws <- Gen.oneOf("", " ", "  ")
    } yield s"$ws$scheme://$host/${segs.mkString("/")}$q$frag$ws"
    check(Prop.forAll(gen) { u =>
      val n1 = canon(u)
      val n2 = canon(n1)
      // total + idempotent always; the scrub guarantees (no tracking
      // params, no fragment) apply only when a valid scheme engaged
      // normalization — an invalid-scheme input is a deliberate
      // pass-through. Path bytes (including spaces) are preserved by
      // design; the kernel does not re-encode.
      val engaged =
        u.trim.matches("^[A-Za-z][A-Za-z0-9+.-]*://[^\\s]*$")
      n2 == n1 && (!engaged ||
        (!n1.contains("utm_") && !n1.contains("#") &&
          !n1.contains(" ")))
    }, cases = 500)
    // param-order permutations of the same URL collapse to one form
    check(Prop.forAll(Gen.listOfN(3, Gen.oneOf("a=1", "b=2", "c=3"))) {
      ps =>
        val base = "http://h/p?"
        canon(base + ps.mkString("&")) ==
          canon(base + ps.sorted.mkString("&"))
    }, cases = 100)
  }

  test("property: c4LineFilter is idempotent — refiltering kept text " +
    "keeps everything") {
    val line = for {
      n <- Gen.choose(1, 7)
      ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "x",
        "javascript", "JavaScript!"))
      end <- Gen.oneOf("", ".", "!", "?", " ")
    } yield ws.mkString(" ") + end
    val gen = Gen.listOfN(6, line).map(_.mkString("\n"))
    check(Prop.forAll(Gen.listOfN(4, gen)) { pages =>
      val df = pages.zipWithIndex
        .map { case (p, i) => (i.toLong, p) }.toDF("doc_id", "text")
      val once = graft.ext.TextAnalysis
        .c4LineFilter(df, "doc_id", "text", minWords = 3, minLines = 1)
        .select(col("doc_id"), col("clean_text").as("text"))
      val twice = graft.ext.TextAnalysis
        .c4LineFilter(once, "doc_id", "text", minWords = 3, minLines = 1)
      val a = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val b = twice.collect()
        .map(r => r.getLong(0) -> r.getAs[String]("clean_text")).toMap
      a == b
    }, cases = 6)
  }
}
