package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway dev probe: the typed recursive folds (ewma/cusum) at 20M rows
  * with a deliberately pathological hot entity (one user owning 2M events)
  * — proves the streaming fold's one-double-per-open-entity state really is
  * flat (no per-group materialization) and measures throughput. Also probes
  * markov/kaplan at the same scale.
  */
object FoldScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val nEvents = 20000000L
    // 10% of all rows land on user 0 (the hot entity); the rest spread
    // over 200k users
    val events = spark.range(nEvents).select(
      col("id").as("event_id"),
      when(pmod(col("id"), lit(10)) === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(200000))).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + (col("id") % 7776000L) * 1000000L).as("ts"),
      (pmod(xxhash64(col("id") + 7), lit(100000)) / lit(100.0)).as("value"))
      .localCheckpoint()

    time("baseline_count") { events.count() }
    time("ewma_20M_hot_entity_2M") {
      graft.operators.Ewma.smooth(events, col("user_id"), col("ts"),
        col("event_id"), col("value"), 0.25).count()
    }
    time("cusum_20M_hot_entity_2M") {
      graft.operators.Ewma.cusum(events, col("user_id"), col("ts"),
        col("event_id"), col("value"), 500.0, 2000.0).count()
    }
    time("markov_20M") {
      graft.analysis.Stats.markovTransitions(events, col("user_id"), col("ts"),
        col("event_id"), (pmod(col("event_id"), lit(5))).cast("string")).count()
    }
    time("kaplan_20M") {
      graft.analysis.Stats.kaplanMeier(events, col("user_id"), col("ts"), 1).count()
    }
    time("scd2_20M") {
      graft.operators.Snapshots.scd2(events,
        col("user_id"), col("ts"), (pmod(col("event_id"), lit(5))).cast("string"),
        col("event_id")).count()
    }
    spark.stop()
  }
}
