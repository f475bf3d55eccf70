package graft

import org.apache.spark.sql.functions._
import graft.sources.JsonlCorpus

class JsonlCorpusSpec extends SparkFunSuite {

  test("round-trip preserves values incl. JSON-escaped strings; " +
    "corrupt lines land in the error column, not the job") {
    val s = spark; import s.implicits._
    val dir = tempDir("jsonl")
    val nasty = Seq(
      (1L, "plain text"),
      (2L, "quotes \" and \\ backslash"),
      (3L, "tabs\tnewlines\nand unicode é中"),
      (4L, ""),
      (5L, null.asInstanceOf[String]))
    val src = nasty.toDF("id", "text")
    JsonlCorpus.write(src, s"$dir/docs")
    val back = JsonlCorpus.readClean(s, s"$dir/docs", src.schema)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(back.size == 5)
    nasty.foreach { case (id, t) =>
      assert(back(id) == t, s"row $id round-trip")
    }
    // plant a corrupt line among the good ones
    val f = new java.io.File(s"$dir/poison/part-00000.json")
    f.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(f, "UTF-8")
    try {
      w.println("""{"id": 10, "text": "ok"}""")
      w.println("""{"id": 11, "text": "truncated""")
      w.println("""not json at all""")
    } finally w.close()
    // NOTE: Spark refuses a query whose referenced columns are ONLY the
    // corrupt-record column (SPARK-21610) — touch the data columns too
    val rd = JsonlCorpus.read(s, s"$dir/poison", src.schema).collect()
    assert(rd.count(!_.isNullAt(2)) == 2,
      "both malformed lines must flag in-row")
    val clean = JsonlCorpus.readClean(s, s"$dir/poison", src.schema)
      .collect()
    assert(clean.length == 1 && clean.head.getLong(0) == 10L)
    // explicit-schema contract: the corrupt column name must be free
    intercept[IllegalArgumentException] {
      JsonlCorpus.read(s, s"$dir/poison", src.schema
        .add(JsonlCorpus.corruptCol, "string"))
    }
  }
}
