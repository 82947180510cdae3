package graft.tmp

import org.apache.spark.sql.functions._

/** 20M-row scale probe for ksDrift: the two-phase distributed ECDF must
  * hold its shape (no SinglePartition funnel, runtime exchange reuse) and
  * finish in seconds at ~20M distinct-ish values.
  */
object KsScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[16]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 20000000
    val df = spark.range(n).select(
      (rand(7) * 1000.0 + when(col("id") % 2 === 0, lit(0.0)).otherwise(lit(50.0))).as("v"),
      (col("id") % 2 === 0).as("b"))
    val t0 = System.nanoTime()
    val out = graft.analysis.Stats.ksDrift(df, col("v"), col("b")).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"KS20M: ${sec}%.1f s -> ${out.mkString}")
    spark.stop()
  }
}
