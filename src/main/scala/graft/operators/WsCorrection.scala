package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WS ("wrong scheme") correction with cycle defense.
  *
  * In the reference, each message carries its current `dataset` plus the
  * append-only list of `previous_datasets` it has been moved out of. A sync
  * step proposes a correction target per message; applying it follows these
  * rules (reference: src/engagement_db_coda_sync/lib.py:404-449):
  *   - no proposal                      -> labels updated in place, no move
  *   - proposal == current dataset      -> warned, not moved
  *   - proposal in previous_datasets    -> CYCLE: reset to the ORIGINAL
  *     dataset (previous_datasets[0]), clear the history and labels
  *     (`_fix_ws_cycle`, lib.py:293)
  *   - otherwise                        -> move: dataset = proposal,
  *     history += old dataset, labels cleared
  *
  * Spark-first: the whole decision is row-local (the history rides on the
  * row), so one projection — zero shuffle, fully parallel at any scale. The
  * multi-step chase (`correctToFixpoint`) re-proposes from a dataset-level
  * correction map each round; that map is dataset-cardinality (tiny), so
  * each round is one broadcast join + one projection.
  */
object WsCorrection {

  val EventLabelsMatch = "labels_match"
  val EventNotMoved = "ws_correct_to_current"
  val EventFixCycle = "fix_ws_cycle"
  val EventCorrected = "ws_correction"

  /** Applies one sync step. Input columns: `dataset` (string), `previous`
    * (array&lt;string&gt;, the datasets this message was moved out of, oldest
    * first), `proposed` (string, null = no WS code). Emits `new_dataset`,
    * `new_previous`, `sync_event`, `labels_cleared` alongside the input.
    */
  def correctStep(df: DataFrame, dataset: Column, previous: Column, proposed: Column): DataFrame = {
    graft.util.TempCols.assertFree(df, "new_dataset", "new_previous", "sync_event", "labels_cleared")
    val prev = coalesce(previous, array())
    val isCycle = array_contains(prev, proposed)
    df
      .withColumn("sync_event",
        when(proposed.isNull, EventLabelsMatch)
          .when(proposed === dataset, EventNotMoved)
          .when(isCycle, EventFixCycle)
          .otherwise(EventCorrected))
      .withColumn("new_dataset",
        when(col("sync_event") === EventCorrected, proposed)
          // element_at(prev, 1) = the original dataset the message came from
          .when(col("sync_event") === EventFixCycle, element_at(prev, 1))
          .otherwise(dataset))
      .withColumn("new_previous",
        when(col("sync_event") === EventCorrected, concat(prev, array(dataset)))
          .when(col("sync_event") === EventFixCycle, array())
          .otherwise(prev))
      .withColumn("labels_cleared",
        col("sync_event").isin(EventCorrected, EventFixCycle))
  }

  /** Chases corrections to a fixpoint. `corrections` is a dataset-level map
    * (`from_ds`, `to_ds`) — broadcast each round; a message stops moving when
    * its dataset has no outgoing correction, is corrected to itself, or a
    * revisit triggers the cycle fix. A fixed message is FROZEN (`ws_frozen`):
    * in the reference the fix clears all its Coda labels, so no new proposal
    * can arrive until a human recodes it — without freezing, the map would
    * re-propose the same move and the chain would oscillate forever.
    *
    * Terminates after at most `maxRounds` rounds; each round is one
    * broadcast join + row-local step. `countMoves = false` skips the
    * per-round convergence action (always plans `maxRounds` rounds, fully
    * lazy).
    */
  def correctToFixpoint(messages: DataFrame, dataset: String, previous: String,
                        corrections: DataFrame, maxRounds: Int = 8,
                        countMoves: Boolean = true): DataFrame = {
    graft.util.TempCols.assertFree(messages, "ws_frozen", "ws_rounds", "last_event", "from_ds", "to_ds", "__prop")
    // a duplicated from_ds key would MULTIPLY every matching message per
    // round (the join emits one row per map entry), compounding each
    // round — fail fast. The probe is one tiny job on the config frame
    // (broadcast-sized by contract), paid once per operator call.
    val dupKeys = corrections.groupBy(col("from_ds")).count()
      .filter(col("count") > 1).select("from_ds")
      .collect().map(_.getString(0))
    require(dupKeys.isEmpty,
      s"duplicate from_ds keys in corrections: ${dupKeys.mkString(", ")}")
    var cur = messages
      .withColumn("ws_frozen", lit(false))
      .withColumn("ws_rounds", lit(0))
      .withColumn("last_event", lit(EventLabelsMatch))
    var rounds = 0
    var moving = true
    while (rounds < maxRounds && moving) {
      val proposed = cur.join(broadcast(corrections), cur(dataset) === corrections("from_ds"), "left")
        .withColumn("__prop", when(col("ws_frozen"), lit(null: String)).otherwise(col("to_ds")))
      val stepped = correctStep(proposed, col(dataset), col(previous), col("__prop"))
      cur = stepped
        .withColumn(dataset, col("new_dataset"))
        .withColumn(previous, col("new_previous"))
        .withColumn("ws_frozen", col("ws_frozen") || col("sync_event") === EventFixCycle)
        .withColumn("ws_rounds",
          col("ws_rounds") + when(col("sync_event") === EventCorrected, 1).otherwise(0))
        .withColumn("last_event",
          when(col("ws_frozen"), lit(EventFixCycle)).otherwise(col("sync_event")))
        .drop("from_ds", "to_ds", "__prop", "new_dataset", "new_previous",
          "labels_cleared", "sync_event")
      if (countMoves) {
        // truncate lineage before the convergence probe: the probe is an
        // action, and the next round builds on this result — without the
        // checkpoint every round would recompute all prior rounds
        cur = cur.localCheckpoint()
        moving = cur.filter(col("last_event") === EventCorrected).limit(1).count() > 0
      }
      // countMoves=false stays a pure lazy plan: depth is bounded by
      // maxRounds (no per-round growth beyond that), nothing is pinned in
      // executor storage, and each round's join re-resolves `corrections`
      // by plan id (covered by the lazy-equals-probed spec). A lazy
      // localCheckpoint here would pin maxRounds full copies of the
      // dataset at MEMORY_AND_DISK on first materialization.
      rounds += 1
    }
    cur
  }

  /** Per-sync event accounting, the reference's SyncStats
    * (src/common/sync_stats.py:5): event counts per dataset. One map-side
    * combinable groupBy.
    */
  def syncStats(df: DataFrame, groupCols: Seq[Column], eventCol: Column): DataFrame =
    df.groupBy((groupCols :+ eventCol.as("sync_event")): _*)
      .agg(count(lit(1)).as("n"))
}
