package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway dev probe: where does the native as-of's time go — the
  * children's shuffle+sort, or the exec itself? */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = GraftSession.table(spark, sfDir, "events")
    ev.count()

    def time(tag: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"PROBE $tag run$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }

    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")

    time("left_shuffle_sort") {
      purchases.repartition(32, col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts")).count()
    }
    time("right_shuffle_sort") {
      clicks.select(col("user_id"), col("ts"), col("value"), col("event_id"))
        .repartition(32, col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"), col("event_id")).count()
    }
    time("both_children_one_job") {
      purchases.repartition(32, col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"))
        .unionByName(clicks.select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .repartition(32, col("user_id"))
          .sortWithinPartitions(col("user_id"), col("ts"), col("event_id")))
        .count()
    }
    val native = graft.plans.AsOfJoinNative.asOf(
      purchases, clicks, "user_id", "ts", "ts", "event_id", Seq("value"))
    time("native_full") { native.count() }
    val composed = graft.operators.AsOfJoin.asOf(
      purchases, clicks, "user_id", "ts", "ts", "event_id", Seq("value"))
    time("composed_full") { composed.count() }
    spark.stop()
  }
}
object AsofPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val ev = graft.GraftSession.table(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
    val native = graft.plans.AsOfJoinNative.asOf(
      purchases, clicks, "user_id", "ts", "ts", "event_id", Seq("value"))
    native.count()
    println("==== FINAL ADAPTIVE PLAN ====")
    println(native.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
