package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway dev probe for the round-8 bounded aggregates.
  *
  * 1) Stratified sampling at 20M rows / 5 strata: bottom-k aggregate
  *    (k pairs per partial buffer) vs the window row_number formulation
  *    (sorts every stratum) — the skew story is the point: one stratum
  *    holds ~12M rows.
  * 2) Gram moments at 1M x 64-dim vectors: the one-pass bounded-buffer
  *    aggregate vs the posexplode² self-join formulation the oracle uses.
  */
object SampleGramProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    // ---- sampling: 20M rows, skewed strata (s0 ~ 12M rows) ----
    val n = 20000000L
    val rows = spark.range(n).select(col("id"),
      concat(lit("s"), least(pmod(xxhash64(col("id")), lit(8)), lit(4)).cast("string")).as("src"))
      .localCheckpoint()
    time("baseline_count_20M") { rows.count() }

    time("sample_bottomk_agg_k100_20M") {
      rows.withColumn("__dig", md5(concat(lit("probe:"), col("id").cast("string"))))
        .groupBy(col("src"))
        .agg(graft.functions.BottomKAgg.bottomKByKey(col("__dig"), col("id"), 100).as("p"))
        .select(col("src"), posexplode(col("p")).as(Seq("pos", "pick")))
        .count()
    }
    time("sample_window_rownum_k100_20M") {
      graft.curation.Curation
        .stratifiedSample(rows, col("src"), col("id"), 100, "probe").count()
    }

    // ---- gram moments: 1M x 64 floats ----
    val d = 64
    val vecs = spark.range(1000000L).select(col("id"),
      transform(sequence(lit(0), lit(d - 1)),
        i => (pmod(xxhash64(col("id") * lit(64) + i), lit(2000)) / lit(1000.0) - lit(1.0))
          .cast("float")).as("vec"))
      .localCheckpoint()
    time("baseline_count_1M") { vecs.count() }

    time("gram_agg_onepass_1Mx64") {
      graft.analysis.Pca.covariance(vecs, col("vec"), d).count()
    }
    // the exploded side is 64M rows with post-generator stats unknown —
    // without this AQE tries to broadcast it and dies; the honest number
    // is the shuffle-join one
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("gram_explode_selfjoin_1Mx64") {
      val x = vecs.select(col("id"), posexplode(col("vec")).as(Seq("i", "v")))
        .select(col("id"), col("i"), col("v").cast("double").as("v"))
      val q = (c: org.apache.spark.sql.Column) =>
        floor(c * lit(1000000.0) + lit(0.5)).cast("long")
      x.as("a").join(x.as("b"),
          col("a.id") === col("b.id") && col("a.i") <= col("b.i"))
        .groupBy(col("a.i"), col("b.i"))
        .agg(sum(q(col("a.v") * col("b.v"))).as("sp"), count(lit(1)).as("n"))
        .count()
    }

    spark.stop()
  }
}
