package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class DocDedupSpec extends SparkFunSuite {

  // 1 ≡ 2 exactly; 3 is a near-dup of both (one word differs → bigram
  // Jaccard 7/9 ≈ 0.78); 4 is unrelated; 5/6 are degenerate docs.
  private lazy val docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "completely different content about spark engines and shuffles"),
      (5L, "one"),
      (6L, "")
    ).toDF("doc_id", "text")
  }

  test("exactDedup keeps the lowest id per duplicate text") {
    val kept = DocDedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 3L, 4L, 5L, 6L)))
  }

  test("exactDupReport: one duplicate group, first_id = 1, refs_num = 2") {
    val rep = DocDedup.exactDupReport(docs, "doc_id", "text").collect()
    assert(rep.length == 1)
    assert(rep.head.getAs[Long]("refs_num") == 2)
    assert(rep.head.getAs[Long]("first_id") == 1)
  }

  test("ngramJaccardPairs at J>=0.7: exactly the planted trio") {
    val pairs = DocDedup.ngramJaccardPairs(docs, "doc_id", "text", 7, 10)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("common")))
    assert(pairs.toSeq == Seq((1L, 2L, 8L), (1L, 3L, 7L), (2L, 3L, 7L)))
  }

  test("ngramJaccardPairs at J=1: only the exact pair") {
    val pairs = DocDedup.ngramJaccardPairs(docs, "doc_id", "text", 1, 1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("minHashPairs recovers the planted near-dups (banded LSH + verify)") {
    val pairs = DocDedup.minHashPairs(docs, "doc_id", "text", 7, 10)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    // identical docs always collide in every band
    assert(pairs.contains((1L, 2L)))
    // the candidate set is a subset of exact-Jaccard pairs (verification
    // is the same integer predicate)
    assert(pairs.toSet.subsetOf(Set((1L, 2L), (1L, 3L), (2L, 3L))))
  }

  test("simHashPairs: identical docs at Hamming 0; disjoint docs absent") {
    val pairs = DocDedup.simHashPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minHash signatures: identical docs share all minima") {
    val sh = DocDedup.shingles(docs.where(col("doc_id") <= 2), "doc_id", "text")
    val sig = DocDedup.minHashSignatures(sh, 16).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sig(1L) == sig(2L))
  }
}
