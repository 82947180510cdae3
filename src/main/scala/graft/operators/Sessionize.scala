package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: rows of an entity are grouped into sessions,
  * with a new session starting whenever the time since the previous row
  * exceeds `gapSeconds`.
  *
  * Generalizes the reference's episode segmentation of participant activity
  * (reference: src/engagement_db_to_analysis/automated_analysis.py — per
  * episode participation). Plan shape: one hash shuffle on the entity key,
  * then two streaming window passes over each sorted partition (lag + running
  * sum) — no global sort, skew handled by AQE. A streaming twin with
  * flatMapGroupsWithState lives in graft.streaming.
  */
object Sessionize {

  /** Adds a `session_id` column (0-based per entity). `tiebreak` must make
    * (ts, tiebreak) a total order for deterministic ids.
    */
  def withSessionId(df: DataFrame, key: String, ts: Column, tiebreak: Column, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(ts.asc, tiebreak.asc)
    val prev = lag(ts, 1).over(w)
    val isNew = when(prev.isNull, 0)
      .when(unix_micros(ts) - unix_micros(prev) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    graft.util.TempCols.assertFree(df, "session_id")
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-entity session stats: number of sessions and rows. */
  def sessionCounts(df: DataFrame, key: String, ts: Column, tiebreak: Column, gapSeconds: Long): DataFrame =
    withSessionId(df, key, ts, tiebreak, gapSeconds)
      .groupBy(col(key))
      .agg(
        (max(col("session_id")) + 1).as("n_sessions"),
        count(lit(1)).as("n_events"))
}
