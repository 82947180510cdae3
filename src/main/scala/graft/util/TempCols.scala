package graft.util

import org.apache.spark.sql.DataFrame

/** Guard for operator-internal temp column names (`__rn`, `__salt`, ...).
  * Operators add-and-drop these; an input that already carries one would be
  * silently clobbered and produce wrong results, so fail fast instead.
  */
object TempCols {
  def assertFree(df: DataFrame, names: String*): Unit = {
    val clash = df.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"input already has reserved internal column(s): ${clash.mkString(", ")} — rename before calling")
  }
}
