package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The config-time injection path (`spark.sql.extensions=
  * graft.functions.GraftExtensions`) is how a CLUSTER deployment gets
  * the native kernels — per-session `register()` calls don't exist in
  * a spark-submit job that only sets conf. Deliberately builds its OWN
  * session (the shared test session can't re-run extension injection),
  * isolated from SparkFunSuite's.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects every graft function into a " +
    "fresh session without any register() call") {
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    val prevDefault = org.apache.spark.sql.SparkSession.getDefaultSession
    // getOrCreate: a NEW SparkSession (extensions apply per session)
    // over the suite-shared SparkContext if one is alive. Must NOT
    // stop() it afterwards — that would stop the SHARED context and
    // poison every suite that runs later in the JVM (learned the hard
    // way: a full-suite cascade of INTERNAL_ERRORs).
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // SQL-path resolution, no VecExpressions.register anywhere
      val row = s.sql(
        """SELECT graft_nfc('café') AS n,
          |       graft_normalize_url('HTTP://H/x?utm_source=a&b=1') AS u,
          |       graft_vec_dot(array(1.0F, 2.0F),
          |                     array(3.0F, 4.0F)) AS d,
          |       size(graft_word_bigrams('a b c')) AS nb
          |""".stripMargin).head()
      assert(row.getAs[String]("n") == "café")
      assert(row.getAs[String]("u") == "http://h/x?b=1")
      assert(row.getAs[Double]("d") == 11.0)
      assert(row.getAs[Int]("nb") == 2)
      val fns = VecExpressions.functions.map(_._1.funcName)
      fns.foreach { f =>
        assert(s.catalog.functionExists(f), s"$f must be injected")
      }
    } finally {
      // restore the shared sessions for suites that run after this one
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
      prevDefault.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
    }
  }
}
