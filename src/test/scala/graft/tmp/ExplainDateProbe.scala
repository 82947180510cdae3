package graft.tmp

/** Dev probe: full q6 executed plan. */
object ExplainDateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("local[4]")
    val df = graft.SparkEntry.queries("q6_forecast_revenue")(spark, "/root/testdata/sf0.01")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
