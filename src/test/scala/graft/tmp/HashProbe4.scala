package graft.tmp
object HashProbe4 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    Seq("lineitem", "orders", "events", "documents", "embeddings", "customer",
      "supplier", "nation", "region", "part")
      .foreach(t => graft.GraftSession.table(spark, sfDir, t).count())
    def planOf(q: String): String = {
      val s = graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.optimizedPlan.toString
      s.replaceAll("Lambda\\$\\d+/0x[0-9a-fA-F]+@[0-9a-fA-F]+", "Lambda")
        .replaceAll("#\\d+", "#x")
        .replaceAll("lambda ([A-Za-z]+)_\\d+#x", "lambda $1#x")
        .replaceAll("_common_expr_\\d+", "_common_expr_")
    }
    val before = planOf("chi2_independence")
    graft.SparkEntry.queries.keys.toSeq.sorted.takeWhile(_ != "chi2_independence")
      .foreach { n =>
        try { planOf(n); graft.SparkEntry.queries(n)(spark, sfDir).count() }
        catch { case _: Throwable => () }
      }
    val after = planOf("chi2_independence")
    println("HASH before=" + f"${scala.util.hashing.MurmurHash3.stringHash(before)}%08x" +
      " after=" + f"${scala.util.hashing.MurmurHash3.stringHash(after)}%08x")
    if (before != after) {
      val bl = before.split("\n"); val al = after.split("\n")
      var shown = 0
      bl.zip(al).zipWithIndex.foreach { case ((x, y), i) =>
        if (x != y && shown < 4) { println(s"LINE $i\nA: $x\nB: $y"); shown += 1 }
      }
      if (bl.length != al.length) println(s"LEN ${bl.length} vs ${al.length}")
    }
    spark.stop()
  }
}
