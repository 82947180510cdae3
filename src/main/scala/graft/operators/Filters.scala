package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-filtering operators from the reference's analysis pre-processing.
  *
  * All of these are either plain column predicates (pushed down to the
  * parquet scan by Catalyst — verify via PushedFilters in .explain) or
  * semi/anti joins against a small key set (broadcastable).
  */
object Filters {

  /** Inclusive time-range filter.
    * Reference: rqa_time_range_filter (src/engagement_db_to_analysis/
    * traced_data_filters.py:14). A pure predicate: partition-prunable and
    * pushed to the scan.
    */
  def timeRange(df: DataFrame, ts: Column, startInclusive: Option[String], endInclusive: Option[String]): DataFrame = {
    val lo = startInclusive.map(s => ts >= lit(s).cast("timestamp")).getOrElse(lit(true))
    val hi = endInclusive.map(e => ts <= lit(e).cast("timestamp")).getOrElse(lit(true))
    df.filter(lo && hi)
  }

  /** Drop rows whose key appears in `denyKeys` (test participants).
    * Reference: filter_test_messages (traced_data_filters.py:70).
    * Broadcast LEFT ANTI join — the deny list is always tiny.
    */
  def excludeKeys(df: DataFrame, key: String, denyKeys: DataFrame): DataFrame =
    df.join(broadcast(denyKeys), Seq(key), "left_anti")

  /** Keep only rows whose key appears in `allowKeys` (e.g. participants who
    * sent at least one research-question answer).
    * Reference: _filter_out_demogs_only (column_view_conversion.py:160).
    */
  def semiJoinKeys(df: DataFrame, key: String, allowKeys: DataFrame): DataFrame =
    df.join(allowKeys, Seq(key), "left_semi")

  /** "Active records": keep all `live` rows, plus `stale` rows only for
    * entities that have no live row.
    * Reference: live/stale message filtering in get_messages_in_datasets
    * (src/common/get_messages_in_datasets.py:178-196).
    *
    * Plan shape: the live-participant key set is an aggregate of the same
    * scan; the anti join shuffles on the entity key once (or broadcasts when
    * the live key set is small after AQE).
    */
  def activeRecords(df: DataFrame, entityKey: String, isLive: Column, isStale: Column): DataFrame = {
    val live = df.filter(isLive)
    val liveKeys = live.select(entityKey).distinct()
    val staleOrphans = df.filter(isStale).join(liveKeys, Seq(entityKey), "left_anti")
    live.unionByName(staleOrphans)
  }
}
