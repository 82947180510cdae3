package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot/version dedup: keep the latest version of each entity.
  *
  * Reference semantics: `filter_latest_message_snapshots`
  * (reference: src/common/get_messages_in_datasets.py:10) — sort message
  * snapshots by `last_updated` descending and keep the first per message_id.
  *
  * Spark-first realization: a single hash shuffle on the key plus a
  * per-partition row_number — no global sort. At 100 TB this is the minimal
  * plan: one exchange on the entity key, streaming window over sorted
  * partitions, and the resulting partitioning is reusable by downstream
  * per-key operators.
  */
object Snapshots {

  /** Keep only the newest row per `key`, ordering by `version` descending with
    * `tiebreaks` (must make the ordering total for deterministic results).
    */
  def latest(df: DataFrame, key: Seq[Column], version: Column, tiebreaks: Column*): DataFrame = {
    graft.util.TempCols.assertFree(df, "__rn")
    val w = Window.partitionBy(key: _*).orderBy((version.desc +: tiebreaks.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Apply a change feed with upserts AND tombstones onto a base snapshot —
    * the Delta/Iceberg MERGE (whenMatched update/delete, whenNotMatched
    * insert) expressed as ONE window pass: union the base with the
    * changes, keep the newest row per key under (version, tiebreaks), and
    * drop keys whose newest row is a tombstone. A later upsert after a
    * tombstone resurrects the key — exactly replay-the-log semantics, so
    * applying feeds in any batch split gives the same final state
    * (spec-pinned).
    *
    * Scale shape: one hash exchange on the key (the reused [[latest]]
    * plan, WindowGroupLimit-bounded); tombstoned rows leave the frame
    * only AFTER the window, so a delete costs nothing extra. Schemas must
    * align (unionByName); `isDelete` is evaluated on change rows, base
    * rows are never tombstones.
    */
  def cdcApply(base: DataFrame, changes: DataFrame, isDelete: Column,
               key: Seq[Column], version: Column, tiebreaks: Column*): DataFrame = {
    graft.util.TempCols.assertFree(base, "__del")
    graft.util.TempCols.assertFree(changes, "__del")
    val b = base.withColumn("__del", org.apache.spark.sql.functions.lit(false))
    val c = changes.withColumn("__del", org.apache.spark.sql.functions.coalesce(
      isDelete, org.apache.spark.sql.functions.lit(false)))
    latest(b.unionByName(c), key, version, tiebreaks: _*)
      .filter(!col("__del"))
      .drop("__del")
  }

  /** Build a type-2 slowly-changing-dimension history from a change feed:
    * per entity, collapse consecutive identical states, then emit one
    * validity interval per surviving change — valid_from = the change's
    * timestamp, valid_to = the next change's (null on the open, current
    * interval), version = 1-based change ordinal, is_current flag.
    *
    * The reference keeps every message/label snapshot and lets readers
    * re-derive "state at time T" by filtering (get_messages_in_datasets
    * .py:10 keeps latest; cache.py:36 replays history) — SCD2 is that
    * replay precomputed into the dimension shape a warehouse joins
    * against (`WHERE t >= valid_from AND (valid_to IS NULL OR t < valid_to)`).
    *
    * ONE hash shuffle on the entity key feeds all three window passes
    * (lag-compare, re-rank, lead) — same partitioning, consecutive Window
    * nodes, no re-exchange. The ordering must be total: `tiebreak` breaks
    * timestamp ties (same-instant changes keep the higher tiebreak as the
    * later state).
    */
  def scd2(df: DataFrame, key: Column, ts: Column, state: Column,
           tiebreak: Column): DataFrame = {
    graft.util.TempCols.assertFree(df, "__prev")
    val byKey = Window.partitionBy(col("entity_id")).orderBy(col("valid_from"), col("__tie"))
    df.select(key.as("entity_id"), ts.as("valid_from"), state.as("state"),
        tiebreak.as("__tie"))
      .withColumn("__prev", lag(col("state"), 1).over(byKey))
      .filter(col("__prev").isNull || col("__prev") =!= col("state"))
      .withColumn("version", row_number().over(byKey))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byKey))
      .select(col("entity_id"), col("state"), col("valid_from"), col("valid_to"),
        col("version"), col("valid_to").isNull.as("is_current"))
  }
}
