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
}
