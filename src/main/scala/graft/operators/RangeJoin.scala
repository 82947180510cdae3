package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grid-bucketed range (point-in-interval) join.
  *
  * A bare `ts >= start AND ts < end` join has no equality conjunct, so
  * Spark plans it as BroadcastNestedLoopJoin — a scale cliff as soon as
  * both sides are large. The fix is the standard time-grid overlay (the
  * technique behind production range-join optimizations in Spark-based
  * engines and Flink's interval join): every point lies in exactly one
  * grid cell, every interval covers a contiguous run of cells, and a
  * matching pair necessarily shares a cell. Exploding each interval to
  * its covered cells turns the inequality join into an EQUI-join on the
  * cell id plus a residual range filter — hash-partitionable, AQE-skew-
  * splittable, and never a replicated nested loop.
  *
  * Each (point, interval) pair can share at most one cell (the point's),
  * so the join emits no duplicates and needs no post-distinct.
  *
  * `bucketSeconds` trades interval explode factor against residual
  * selectivity: pick it near the typical interval length so an interval
  * covers ~2 cells and a point's cell holds few candidate intervals.
  * Intervals are treated closed-open `[start, end)`; points on `end`
  * don't match. A celebrity cell (flash-crowd hour) is a plain hot
  * equi-join key — AQE skew splitting or [[SkewJoin]] salting applies,
  * which is exactly what the nested-loop formulation can't do.
  */
object RangeJoin {

  /** The grid cell a timestamp falls in. unix_timestamp truncates to
    * seconds; truncation is monotone, so a point with ts < end can never
    * land in a later cell than end's — covering cells through
    * floor(end/b) is always sufficient (one harmless extra cell when end
    * sits exactly on a boundary). Shared by the batch operator and the
    * streaming twin so the two sides can never drift cell-incompatible.
    */
  def cellOf(ts: Column, bucketSeconds: Long): Column = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    floor(unix_timestamp(ts) / lit(bucketSeconds))
  }

  /** Exploded cells an interval [start, end) covers, with data-sanity
    * guards: a malformed row (end before start — sequence would silently
    * emit a DESCENDING cell array) or an over-long interval (one corrupt
    * '9999-12-31' end would explode millions of cells and kill the whole
    * job with an opaque array-size error) RAISES with the offending
    * bounds. NULL bounds keep SQL join semantics: a NULL predicate can
    * never match, so the row contributes no cells (explode drops it)
    * rather than crashing the job. Size `maxCellsPerInterval` to the
    * longest LEGITIMATE interval at the chosen grid: span/bucket + 2.
    */
  def coveredCells(start: Column, end: Column, bucketSeconds: Long,
                   maxCellsPerInterval: Int = 100000): Column = {
    val lo = cellOf(start, bucketSeconds)
    val hi = cellOf(end, bucketSeconds)
    val ok = end >= start && (hi - lo) < lit(maxCellsPerInterval.toLong)
    val checkedHi = when(ok.isNull, lit(null).cast("long"))
      .when(ok, hi)
      .otherwise(raise_error(concat(
        lit(s"RangeJoin: malformed or over-long interval (bucket=${bucketSeconds}s, " +
          s"cap=$maxCellsPerInterval cells): "),
        start.cast("string"), lit(" .. "), end.cast("string"))).cast("long"))
    explode(sequence(lo, checkedHi))
  }

  def pointInInterval(points: DataFrame, ts: Column,
                      intervals: DataFrame, start: Column, end: Column,
                      bucketSeconds: Long, maxCellsPerInterval: Int = 100000): DataFrame = {
    graft.util.TempCols.assertFree(points, "__cell")
    graft.util.TempCols.assertFree(intervals, "__cell")
    val p = points.withColumn("__cell", cellOf(ts, bucketSeconds))
    val iv = intervals.withColumn("__cell",
      coveredCells(start, end, bucketSeconds, maxCellsPerInterval))
    p.join(iv, Seq("__cell"))
      .filter(ts >= start && ts < end)
      .drop("__cell")
  }

  /** Hot-traffic intervals from an event stream: hours with strictly
    * above-average event counts, with consecutive hot hours merged into
    * maximal `[start_hour, end_hour)` intervals (gaps-and-islands). The
    * islands window is global-ordered but runs over ONE ROW PER HOT HOUR
    * — even a decade of data is < 100k rows, far below single-partition
    * limits; the per-event work stays fully parallel.
    */
  def hotIntervals(events: DataFrame, ts: Column): DataFrame = {
    val hours = events.groupBy(date_trunc("hour", ts).as("hour"))
      .agg(count(lit(1)).as("n"))
    val avg = hours.agg((sum(col("n")).cast("double") / count(lit(1))).as("__avg"))
    val hot = hours.crossJoin(broadcast(avg)).filter(col("n") > col("__avg"))
    // constant-by-construction partition key pmod(n,1)=0: the islands
    // window runs over one row per hot hour, so a single partition is
    // deliberate — keep WindowExec's warning for accidental global windows
    // (x*0 is simplified away and the foldable partition eliminated)
    hot
      .withColumn("__rn",
        row_number().over(Window.partitionBy(pmod(col("n"), lit(1L))).orderBy(col("hour"))))
      .withColumn("__grp", unix_timestamp(col("hour")) - col("__rn") * 3600L)
      .groupBy(col("__grp"))
      .agg(min(col("hour")).as("start_hour"),
        (max(col("hour")) + expr("INTERVAL 1 HOUR")).as("end_hour"))
      .drop("__grp")
  }

  /** Per-interval traffic stats: every event range-joined into the hot
    * intervals derived from the same stream, then aggregated. The join
    * grid is hourly — matched to the interval granularity.
    */
  def hotIntervalStats(events: DataFrame, ts: Column, user: Column): DataFrame =
    pointInInterval(events, ts, hotIntervals(events, ts), col("start_hour"), col("end_hour"), 3600L)
      .groupBy(col("start_hour"), col("end_hour"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(user).as("n_users"))
}
