package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.analysis.Glm

/** Throwaway dev probe: GLM family at ~200x the sf0.1 row count. The IRLS
  * loops persist a narrow projected working set across their K iteration
  * passes; this measures what that costs/buys at 20M rows, where the
  * uncached design re-scans the synthetic fact K times.
  */
object GlmScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val n = 20000000L
    val rows = spark.range(n).select(
      col("id"),
      element_at(array(lit("click"), lit("view"), lit("purchase"), lit("signup"), lit("error")),
        (pmod(col("id"), lit(5)) + 1).cast("int")).as("event_type"),
      (pmod(xxhash64(col("id") + 1), lit(10000)) / lit(100.0)).as("x1"),
      (pmod(xxhash64(col("id") + 2), lit(1000)) / lit(10.0)).as("x2"),
      (pmod(xxhash64(col("id") + 3), lit(100)) / lit(1.0)).as("x3"),
      // y correlated with x1 through the shared hash stream
      (pmod(xxhash64(col("id") + 1), lit(10000)) > 5000L).cast("double").as("y"),
      // 20% missing predictor for the MI path
      when(pmod(xxhash64(col("id") + 4), lit(5)) === 0, lit(null))
        .otherwise(pmod(xxhash64(col("id") + 5), lit(10000)) / lit(100.0)).as("xmiss"))
      .localCheckpoint()

    time("baseline_count_20M") { rows.count() }

    time("logit_irls_p4_k6_20M") {
      Glm.logitByGroup(rows, "event_type",
        Seq(col("x1"), col("x2"), col("x3")), col("y"),
        Seq("b0", "b1", "b2", "b3")).count()
    }
    time("ols_multi_p4_20M") {
      Glm.olsMultiByGroup(rows, "event_type",
        Seq(col("x1"), col("x2"), col("x3")), col("y"),
        Seq("b0", "b1", "b2", "b3")).count()
    }
    time("mi_logit_pooled_m5_k6_20M") {
      Glm.miLogitPooledByGroup(rows, "event_type", col("id"),
        col("xmiss"), col("y"), draws = 5).count()
    }
    spark.stop()
  }
}
