package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.QuantileSketchAgg

/** Throwaway dev probe: quantile paths at 20M rows / ~1M distinct values
  * across 5 groups — exact `percentile` (buffers every group value at the
  * merger) vs the BHT streaming-histogram sketch (capacity centroids per
  * partial buffer) vs Spark's built-in percentile_approx. Also records the
  * sketch's realized rank error in the estimation regime at this scale.
  */
object QsScaleProbe {
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
      element_at(array(lit("click"), lit("view"), lit("purchase"), lit("signup"), lit("error")),
        (pmod(col("id"), lit(5)) + 1).cast("int")).as("g"),
      (pmod(xxhash64(col("id")), lit(1000000)) / lit(1000.0)).as("v"))
      .localCheckpoint()

    time("baseline_count_20M") { rows.count() }

    time("exact_percentile_20M") {
      rows.groupBy(col("g"))
        .agg(expr("percentile(v, array(0.25D, 0.5D, 0.75D, 0.95D))").as("q")).count()
    }
    time("bht_sketch_cap256_20M") {
      rows.groupBy(col("g"))
        .agg(QuantileSketchAgg.quantiles(col("v"), 256, Seq(250, 500, 750, 950)).as("q"))
        .count()
    }
    time("percentile_approx_acc10k_20M") {
      rows.groupBy(col("g"))
        .agg(percentile_approx(col("v"), array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)),
          lit(10000)).as("q")).count()
    }

    // realized rank error of the sketch estimates (values are ~uniform on
    // [0, 1000), so true rank fraction of estimate x is ~x/1000)
    val est = rows.groupBy(col("g"))
      .agg(QuantileSketchAgg.quantiles(col("v"), 256, Seq(250, 500, 750, 950)).as("q"))
      .select(col("g"), col("q")).collect()
    est.foreach { r =>
      val qs = r.getSeq[Double](1)
      val errs = Seq(0.25, 0.5, 0.75, 0.95).zip(qs)
        .map { case (p, x) => math.abs(x / 1000.0 - p) }
      println(f"SCALE rank_error_${r.getString(0)} max=${errs.max}%.4f")
    }
    spark.stop()
  }
}
