package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.HeavyHittersAgg.heavyHitters
import graft.functions.TopKAgg

/** Throwaway dev probe: heavy hitters at 20M rows with ~1M distinct values
  * — the regime the sketch exists for. Compares the Misra-Gries
  * capacity-bounded aggregate against the exact groupBy(value).count +
  * rank path whose reduce state is distinct-value-bound.
  */
object HhScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val n = 20000000L
    // zipf-flavored: ~20 hot values (power-of-two buckets) floating on a
    // ~1M-distinct cold tail, across 5 groups
    val rows = spark.range(n).select(
      (col("id") % 5).cast("string").as("g"),
      when(pmod(col("id"), lit(2)) === 0,
        concat(lit("hot"), pmod(xxhash64(col("id")), lit(20))))
        .otherwise(concat(lit("cold"), pmod(xxhash64(col("id") + 1), lit(1000000))))
        .as("value"))
      .localCheckpoint()

    time("baseline_count_20M") { rows.count() }
    time("exact_topk_20M_1Mdistinct") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("g")).orderBy(col("cnt").desc, col("value").asc)
      rows.groupBy(col("g"), col("value")).agg(count(lit(1)).as("cnt"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10).count()
    }
    time("mg_sketch_cap4096_20M") {
      rows.groupBy(col("g"))
        .agg(heavyHitters(col("value"), 4096, 10).as("hh"))
        .select(col("g"), explode(col("hh"))).count()
    }
    time("mg_sketch_cap256_20M") {
      rows.groupBy(col("g"))
        .agg(heavyHitters(col("value"), 256, 10).as("hh"))
        .select(col("g"), explode(col("hh"))).count()
    }
    spark.stop()
  }
}
