package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class VecExpressionsSpec extends SparkFunSuite {

  test("graft_vec_dot: exact values, SQL-callable, null semantics") {
    VecExpressions.register(spark)
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (2L, null.asInstanceOf[Array[Float]], Array(1f, 1f, 1f))
    ).toDF("id", "a", "b")
    df.createOrReplaceTempView("vecs")
    val rows = spark.sql(
      "SELECT id, graft_vec_dot(a, b) AS d FROM vecs ORDER BY id").collect()
    assert(rows(0).getDouble(1) == 32.0)
    assert(rows(1).isNullAt(1)) // null input → null, not a crash
  }

  test("graft_vec_dot: length mismatch and null elements yield NULL (HOF parity)") {
    VecExpressions.register(spark)
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Array(1f, 2f, 3f), Array(1f, 1f)),                      // ragged
      (2L, Array(1f, 2f), Array(1f, 1f))
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"),
        call_function("graft_vec_dot", col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L).isEmpty, "ragged vectors must yield NULL, not a truncated dot")
    assert(rows(2L).contains(3.0))
    // double arrays accepted too
    val dd = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    assert(dd.select(call_function("graft_vec_dot", col("a"), col("b")))
      .head().getDouble(0) == 11.0)
  }

  test("graft_vec_dot matches the interpreted HOF formulation bit-for-bit") {
    VecExpressions.register(spark)
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(3)
    val df = Seq.tabulate(50)(i => (i.toLong,
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("id", "a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val mismatches = df.select(
        call_function("graft_vec_dot", col("a"), col("b")).as("native"),
        hof.as("interp"))
      .where(col("native") =!= col("interp")).count()
    assert(mismatches == 0, "native dot must be bit-identical to the HOF fold")
  }

  test("graft_vec_lsh_sig: deterministic, in [0, 2^bits), similar vectors collide") {
    VecExpressions.register(spark)
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(9)
    val base = Array.fill(32)(rnd.nextFloat() * 2 - 1)
    val near = base.map(_ * 1.0001f)
    val df = Seq((1L, base), (2L, near), (3L, base.map(-_))).toDF("id", "v")
    val sigs = df.select(col("id"),
        call_function("graft_vec_lsh_sig", col("v"), lit(8), lit(0)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.values.forall(v => v >= 0 && v < 256))
    assert(sigs(1L) == sigs(2L), "near-identical vectors share the signature")
    assert(sigs(1L) == (~sigs(3L) & 0xFFL), "negated vector flips every plane side")
    // stable across evaluations
    val again = df.select(
        call_function("graft_vec_lsh_sig", col("v"), lit(8), lit(0)).as("sig"))
      .collect().map(_.getLong(0))
    assert(again.toSeq == Seq(sigs(1L), sigs(2L), sigs(3L)))
  }

  test("non-literal bits/table and wrong types are rejected") {
    VecExpressions.register(spark)
    val s = spark; import s.implicits._
    val df = Seq((1L, Array(1f, 2f))).toDF("id", "v")
    intercept[Exception] {
      df.select(call_function("graft_vec_lsh_sig", col("v"), col("id"), lit(0))).collect()
    }
    intercept[Exception] {
      df.select(call_function("graft_vec_dot", col("id"), col("v"))).collect()
    }
  }
}
