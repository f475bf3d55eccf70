package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared guard for operators that add `_graft_*` working columns: a
  * caller column with that prefix would silently collide (duplicate
  * names resolve ambiguously downstream), so fail loudly at the
  * operator boundary instead.
  */
object Reserved {
  def assertNone(df: DataFrame, op: String): Unit = {
    val clash = df.columns.filter(_.startsWith("_graft_"))
    require(clash.isEmpty,
      s"$op: input columns ${clash.mkString(", ")} use the reserved " +
        "_graft_ prefix; rename them before calling")
  }
}
