package graft.tmp
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    def count(h: String, n: String) = h.sliding(n.length).count(_ == n)
    Seq("chi2_independence","mutual_information","zscore_outliers","gini_concentration",
        "rfm_segments","scd2_intervals","bigram_pmi","record_linkage_jw",
        "markov_transitions","kaplan_meier","ab_test_zscore").foreach { q =>
      val p = graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      println(s"$q :: scans=${count(p,"Scan parquet")} exchanges=${count(p,"Exchange")} " +
        s"bhj=${count(p,"BroadcastHashJoin")} smj=${count(p,"SortMergeJoin")} " +
        s"cart=${p.contains("CartesianProduct")} wsc=${count(p,"WholeStageCodegen")}")
    }
    spark.stop()
  }
}
