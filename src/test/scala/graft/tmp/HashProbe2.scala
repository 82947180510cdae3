package graft.tmp
object HashProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def hashOf(q: String): String = {
      val s = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").queryExecution.optimizedPlan.toString
      val stable = s
        .replaceAll("Lambda\\$\\d+/0x[0-9a-fA-F]+@[0-9a-fA-F]+", "Lambda")
        .replaceAll("#\\d+", "#x")
        .replaceAll("lambda ([A-Za-z]+)_\\d+#x", "lambda $1#x")
        .replaceAll("_common_expr_\\d+", "_common_expr_")
      f"${scala.util.hashing.MurmurHash3.stringHash(stable)}%08x"
    }
    println("solo1 " + hashOf("chi2_independence"))
    println("after_mi " + { hashOf("mutual_information"); hashOf("chi2_independence") })
    println("again " + hashOf("chi2_independence"))
    spark.stop()
  }
}
