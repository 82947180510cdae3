package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway dev probe: prefix-filter candidate volume vs the any-shared-
  * shingle join at 200k synthetic docs with heavy boilerplate (every doc
  * opens with the same 6-token header — the stop-shingle trap). The naive
  * join's candidate volume Σ_sh C(df,2) is computed from the df table
  * (materializing it would be ~10^10 rows); the prefix-filtered join runs
  * for real.
  *
  * Every (2k, 2k+1) doc pair shares its body — 100k planted J=1 pairs.
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val n = 200000L
    val docs = spark.range(n).select(col("id"),
      concat(
        lit("terms of service apply to this "),
        concat_ws(" ", (0 until 20).map(i =>
          concat(lit("w"), pmod(xxhash64((col("id") - pmod(col("id"), lit(2))) * lit(31) + lit(i)),
            lit(50000)).cast("string"))): _*)).as("text"))
      .localCheckpoint()
    println(s"docs: ${docs.count()}")

    def pairVolume(framed: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      framed.groupBy(col("sh")).agg(count(lit(1)).as("c"))
        .agg(sum((col("c").cast("decimal(19,0)") * (col("c") - 1).cast("decimal(19,0)")) / 2))
        .collect().head.getDecimal(0)

    val sh = docs.select(col("id"),
      explode(graft.functions.ShingleExpressions.distinctShingles(col("text"), 3)).as("sh"))
    val naiveVol = time("naive_volume_calc") { pairVolume(sh) }
    println(s"naive any-shared-shingle candidate volume: $naiveVol")

    // replicate the operator's prefix selection to measure ITS volume
    val freq = sh.groupBy(col("sh")).agg(count(lit(1)).as("__df"))
    val sz = docs.select(col("id"),
      size(graft.functions.ShingleExpressions.distinctShingles(col("text"), 3)).as("sz"))
    val ranked = sh.join(freq, Seq("sh")).join(sz, Seq("id"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("__df"), col("sh"))))
      .filter(col("__rn") <= (col("sz") - ceil(lit(0.5) * col("sz") - lit(1e-9)) + 1).cast("int"))
      .select(col("id"), col("sh"))
    val prefixVol = time("prefix_volume_calc") { pairVolume(ranked) }
    println(s"prefix candidate volume: $prefixVol")

    val pairs = time("prefix_filter_full_join") {
      graft.dedup.Dedup.prefixFilterJoin(docs, col("id"), col("text"), 3, 0.5).count()
    }
    println(s"prefix-filter verified pairs (J>=0.5): $pairs")

    spark.stop()
  }
}
