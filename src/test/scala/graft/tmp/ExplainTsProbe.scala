package graft.tmp

/** Dev probe: PushedFilters/ReadSchema on ts-filtering queries after the
  * NTZ ingest cast (not part of the test suite). */
object ExplainTsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("local[4]")
    for (q <- Seq("time_range_filter", "incremental_watermark")) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      val s = df.queryExecution.executedPlan.toString
      val pf = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(s).mkString(" | ")
      println(s"== $q == $pf")
    }
    spark.stop()
  }
}
