package graft.tmp

/** Dev probe: regression queries run clean at sf0.001 and sf0.1 (post-IRLS-cache parity check). */
object RegSfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("local[8]")
    for {
      sf <- Seq("sf0.001", "sf0.1")
      q <- Seq("regression_logit", "regression_logit_multi", "regression_mi_logit", "regression_mi_pooled")
    } {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(q)(spark, s"/root/testdata/$sf").collect()
      println(f"OK $sf $q rows=${rows.length} t=${(System.nanoTime() - t0) / 1e9}%.1fs head=${rows.headOption.getOrElse("")}")
    }
    spark.stop()
  }
}
