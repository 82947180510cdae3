package graft.tmp

/** Dev probe: why do some canonicalized plan fingerprints differ across
  * JVMs on identical code? Prints the canonicalized plan for the wobbly
  * queries so two runs can be diffed. */
object PlanHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("local[4]")
    val sfDir = "/root/testdata/sf0.01"
    args.foreach { q =>
      val s = graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.optimizedPlan.toString
        .replaceAll("Lambda\\$\\d+/0x[0-9a-fA-F]+@[0-9a-fA-F]+", "Lambda")
        .replaceAll("#\\d+", "#x")
        .replaceAll("lambda ([A-Za-z]+)_\\d+#x", "lambda $1#x")
      .replaceAll("_common_expr_\\d+", "_common_expr_")
      println(s"=== $q hash=${f"${scala.util.hashing.MurmurHash3.stringHash(s)}%08x"}")
      println(s.linesIterator.take(12).mkString("\n"))
    }
    spark.stop()
  }
}
