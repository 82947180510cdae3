package graft.tmp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 probe: distributed two-phase-rank ntile assignment vs the
  * single-partition window formulation, at the 100x replica (VERDICT r10
  * #5 — SURVEY §5 must carry measured numbers, not the r≤9 ones).
  *
  * Measures, cold, at /tmp/sf10 (10M events, ~960k distinct users):
  *   - value_ntiles (grouped NTILE window: each event_type's 2M rows sort
  *     through ONE task) vs value_ntiles_dist (range-partitioned rank);
  *   - rfm_segments as shipped in r11 (the distributed kernel) vs the
  *     retired single-partition triple-ntile formulation, reconstructed
  *     here verbatim for measurement only.
  */
object ScaleProbeR11 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/sf10"
    val spark = graft.GraftSession.builder("local[32]", 32,
      graft.GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$label rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    val ev = graft.GraftSession.table(spark, dir, "events")

    time("VALUE_NTILES_WINDOW") {
      val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      ev.filter(col("value").isNotNull)
        .withColumn("decile", ntile(10).over(w))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("lo"), max(col("value")).as("hi"))
        .count()
    }
    time("VALUE_NTILES_DIST") {
      graft.analysis.Stats.valueNtilesDist(ev.filter(col("value").isNotNull),
        col("event_type"), col("value"), col("event_id"), 10).count()
    }

    // the retired rfm formulation (global triple ntile), verbatim
    time("RFM_WINDOW_RETIRED") {
      val base = ev.select(col("user_id"), col("ts").as("__ts"), col("value").as("__v"),
          (col("event_type") === "purchase").as("__m"))
        .filter(col("__ts").isNotNull)
      val anchor = broadcast(base.agg(max(col("__ts")).as("__corpus_max")))
      val q6 = (c: org.apache.spark.sql.Column) =>
        floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
      val perUser = base.groupBy(col("user_id")).agg(
          max(col("__ts")).as("__last"),
          sum(when(col("__m"), 1L).otherwise(0L)).as("__freq"),
          sum(when(col("__m"), q6(col("__v"))).otherwise(lit(0.0))
            .cast("decimal(28,6)")).as("__money"))
        .crossJoin(anchor)
        .withColumn("__rdays",
          datediff(col("__corpus_max").cast("date"), col("__last").cast("date")))
      val rT = ntile(5).over(Window.partitionBy(lit(1))
        .orderBy(col("__rdays").desc, col("user_id")))
      val fT = ntile(5).over(Window.partitionBy(lit(1))
        .orderBy(col("__freq"), col("user_id")))
      val mT = ntile(5).over(Window.partitionBy(lit(1))
        .orderBy(col("__money"), col("user_id")))
      perUser
        .withColumn("r_tile", rT).withColumn("f_tile", fT).withColumn("m_tile", mT)
        .groupBy(col("r_tile"), col("f_tile"), col("m_tile"))
        .agg(count(lit(1)).as("n_users"),
          (sum(col("__money")).cast("double") / count(lit(1)).cast("double")).as("avg_monetary"))
        .count()
    }
    time("RFM_DIST_SHIPPED") {
      graft.analysis.Stats.rfmSegments(ev, col("user_id"), col("ts"),
        col("value"), col("event_type") === "purchase").count()
    }
    spark.stop()
  }
}
