package graft.ext

import graft.SparkFunSuite

class BsonSpec extends SparkFunSuite {

  private def stats(b: Array[Byte]): Map[String, (Long, Long)] = {
    val Right(s) = Bson.bsonTable(b): @unchecked
    s.map(f => f.family -> ((f.n, f.valSum))).toMap
  }

  test("every element type, nesting, key mass") {
    val inner = new Bson.DocBuilder
    inner.int32("0", 7).int32("1", 8)
    val nested = new Bson.DocBuilder
    nested.string("s", "deep")
    val d = new Bson.DocBuilder
    d.int32("a", 100).int64("b", 5000000000L)
      .string("name", "hello")
      .boolV("t", v = true).boolV("f", v = false)
      .nullV("z").double("pi", 3.5).datetime("when", 1234L)
      .objectId("oid", 9).binary("bin", Array[Byte](1, 2, 3))
      .array("arr", inner).doc("sub", nested)
    val m = stats(d.bytes)
    assert(m("int") == ((4L, 100L + 5000000000L + 7 + 8)))
    assert(m("string") == ((2L, 5L + 4)))
    assert(m("bool") == ((2L, 1L)))
    assert(m("null")._1 == 1L)
    assert(m("double")._1 == 1L)
    assert(m("datetime") == ((1L, 1234L)))
    assert(m("objectid")._1 == 1L)
    assert(m("binary") == ((1L, 3L)))
    assert(m("array") == ((1L, 2L)))
    // top doc (12 elems) + nested 'sub' doc (1 elem)
    assert(m("doc") == ((2L, 13L)))
    // keys: top a,b,name,t,f,z,pi,when,oid,bin,arr,sub = 12 names;
    // array keys 0,1; nested key s
    assert(m("key")._1 == 15L)
  }

  test("typed rejects: declared length is load-bearing") {
    val d = new Bson.DocBuilder
    d.int32("a", 1).string("s", "xy")
    val good = d.bytes
    assert(Bson.bsonTable(Array.empty[Byte]) == Left("empty blob"))
    // inflate the declared doc length
    val big = good.clone(); big(0) = (big(0) + 4).toByte
    assert(Bson.bsonTable(big).isLeft)
    // shrink it: the walk overruns the declared end
    val small = good.clone(); small(0) = (small(0) - 2).toByte
    assert(Bson.bsonTable(small) == Left("document overruns its length"))
    // bad bool byte
    val b = new Bson.DocBuilder
    b.boolV("x", v = true)
    val bb = b.bytes
    bb(bb.length - 2) = 7 // the bool value byte
    assert(Bson.bsonTable(bb) == Left("bad bool byte"))
    // unknown element type
    val u = good.clone(); u(4) = 0x7E
    assert(Bson.bsonTable(u) == Left("unknown element type"))
    // string missing its terminator
    val s = new Bson.DocBuilder
    s.string("s", "abc")
    val sb = s.bytes
    sb(sb.length - 2) = 1 // clobber the string NUL
    assert(Bson.bsonTable(sb) == Left("string missing terminator"))
    // truncation totality
    (0 until good.length).foreach(k => Bson.bsonTable(good.take(k)))
    // concatenated documents
    val two = good ++ good
    val Right(st) = Bson.bsonTable(two): @unchecked
    assert(st.find(_.family == "doc").get.n == 2L)
  }

  test("extract + errors over a DataFrame") {
    import spark.implicits._
    val d = new Bson.DocBuilder
    d.int32("k", 7)
    val good = d.bytes
    val bad = good.clone(); bad(good.length - 1) = 0x55
    val df = Seq((1L, good), (2L, bad)).toDF("id", "blob")
    val rows = Bson.extractBsonStats(df, "blob")
      .orderBy("id", "family").collect()
    assert(rows.map(_.getAs[String]("family")).toSeq ==
      Seq("doc", "int", "key"))
    val errs = Bson.bsonErrors(df, "blob").collect()
    assert(errs.length == 1)
  }
}
