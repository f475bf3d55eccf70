package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkFunSuite {

  private lazy val blobs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "a plausible media blob ####".getBytes("UTF-8")),
      (2L, Array.empty[Byte]),
      (3L, "another blob with other bytes".getBytes("UTF-8"))
    ).toDF("id", "blob")
  }

  test("decodeMeta: deterministic metadata; poison blob flagged in-row, job survives") {
    val out = Multimodal.decodeMeta(blobs, "blob")
      .select(col("id"), col("media.*")).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Boolean]("ok"), r.getAs[String]("error"))).toMap
    assert(out(1L)._3 && out(3L)._3)
    assert(out(1L)._1 >= 64 && out(1L)._2 >= 64)
    assert(!out(2L)._3 && out(2L)._4 == "empty blob") // error channel, no crash
    // deterministic: decoding again yields identical metadata
    val again = Multimodal.decodeMeta(blobs, "blob")
      .select(col("id"), col("media.*")).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Boolean]("ok"), r.getAs[String]("error"))).toMap
    assert(out == again)
  }

  test("extractFeatures: fixed-width array<float>, deterministic, ANN-ready") {
    val f = Multimodal.extractFeatures(blobs, "blob", 8)
    assert(f.schema("features").dataType.typeName == "array")
    val rows = f.select("id", "features").collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Float](1)).toMap
    assert(rows.values.forall(_.length == 8))
    assert(rows(1L) != rows(3L)) // distinct blobs → distinct features
    // features feed straight into Similarity ops
    val sim = Similarity.bruteForceTopK(
      f.select("id", "features"), f.select("id", "features").where(col("id") === 1),
      "id", "features", 1).collect()
    assert(sim.length == 1 && sim.head.getAs[Long]("query_id") == 1L)
  }

  test("resizeMedia: deterministic w*h*3 output in place; poison blob -> empty") {
    val out = Multimodal.resizeMedia(blobs, "blob", 8, 6)
      .select("id", "blob").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Array[Byte]]("blob")).toMap
    assert(out(1L).length == 8 * 6 * 3 && out(3L).length == 8 * 6 * 3)
    assert(!java.util.Arrays.equals(out(1L), out(3L))) // distinct inputs differ
    assert(out(2L).isEmpty, "undecodable blob must degrade to empty, not fail")
    // schema unchanged → composes with the rest of the pipeline
    assert(Multimodal.resizeMedia(blobs, "blob", 8, 6).schema == blobs.schema)
    val again = Multimodal.resizeMedia(blobs, "blob", 8, 6)
      .select("id", "blob").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Array[Byte]]("blob")).toMap
    assert(java.util.Arrays.equals(out(1L), again(1L)))
  }

  test("sampleFrames: stride-sampled fixed windows with frame indexes") {
    val s = spark; import s.implicits._
    val ten = Seq((1L, "0123456789".getBytes("UTF-8"))).toDF("id", "blob")
    // frameBytes=4, stride=2 → sample offsets 1 and 9 → frames "0123", "89"
    val frames = Multimodal.sampleFrames(ten, "blob", 4, 2)
      .select("id", "frame_idx", "frame").collect()
      .map(r => (r.getAs[Int]("frame_idx"),
        new String(r.getAs[Array[Byte]]("frame"), "UTF-8")))
    assert(frames.toSeq == Seq((0, "0123"), (1, "89")))
  }
}
