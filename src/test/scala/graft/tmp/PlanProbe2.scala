package graft.tmp
object PlanProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("bigram_pmi")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    def count(h: String, n: String) = h.sliding(n.length).count(_ == n)
    println(s"FINAL :: scans=${count(p,"Scan parquet")} reused=${count(p,"ReusedExchange")} exchanges=${count(p,"Exchange")}")
    spark.stop()
  }
}
