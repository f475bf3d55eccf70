package graft

import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins — the write-time layout that removes
  * BOTH shuffles from a repeated big⋈big equi-join, the standard
  * warehouse technique for a 100 TB fact table joined on the same key
  * every day. Spark's `bucketBy` write pins (hash(key) % n) → file, so
  * a matching-bucket join needs no Exchange at all; this spec proves
  * the claim on the executed plan and the result.
  */
class BucketedJoinSpec extends SparkFunSuite {
  import spark.implicits._

  test("matching bucketBy layouts join with ZERO exchanges and exact " +
    "results") {
    // external-table paths (warehouse.dir is a static conf; an
    // explicit path keeps the repo cwd clean)
    val wh = tempDir("bucketed-wh")
    val n = 20000
    val facts = (0 until n).map(i => (i.toLong % 997, i.toLong))
      .toDF("k", "v")
    val dims = (0 until 997).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_facts")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_dims")
    facts.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/facts").saveAsTable("graft_bucket_facts")
    dims.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/dims").saveAsTable("graft_bucket_dims")
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graft_bucket_facts")
          .join(spark.table("graft_bucket_dims"), Seq("k"))
        val got = joined.agg(count(lit(1)), sum("v")).head()
        // exact: every fact row matches exactly one dim row
        assert(got.getLong(0) === n.toLong)
        assert(got.getLong(1) ===
          facts.agg(sum("v")).head().getLong(0))
        val plan = joined.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        assert(!plan.contains("Exchange"),
          s"matching bucket layouts must join with no shuffle:\n$plan")
      } finally spark.conf
        .set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_dims")
    }
  }
}
