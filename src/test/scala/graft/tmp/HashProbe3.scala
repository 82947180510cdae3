package graft.tmp
object HashProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def planOf(q: String): String = {
      val s = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").queryExecution.optimizedPlan.toString
      s.replaceAll("Lambda\\$\\d+/0x[0-9a-fA-F]+@[0-9a-fA-F]+", "Lambda")
        .replaceAll("#\\d+", "#x")
        .replaceAll("lambda ([A-Za-z]+)_\\d+#x", "lambda $1#x")
        .replaceAll("_common_expr_\\d+", "_common_expr_")
    }
    def hashOf(q: String) = f"${scala.util.hashing.MurmurHash3.stringHash(planOf(q))}%08x"
    val before = planOf("chi2_independence")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted.takeWhile(_ != "chi2_independence")
    names.foreach { n => try planOf(n) catch { case _: Throwable => () } }
    val after = planOf("chi2_independence")
    println("HASH before=" + f"${scala.util.hashing.MurmurHash3.stringHash(before)}%08x" +
      " after=" + f"${scala.util.hashing.MurmurHash3.stringHash(after)}%08x")
    if (before != after) {
      val bl = before.split("\n"); val al = after.split("\n")
      bl.zip(al).zipWithIndex.foreach { case ((x, y), i) =>
        if (x != y) println(s"LINE $i\nA: $x\nB: $y")
      }
      if (bl.length != al.length) println(s"LEN ${bl.length} vs ${al.length}")
    }
    spark.stop()
  }
}
