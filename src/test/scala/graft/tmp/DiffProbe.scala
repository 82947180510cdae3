package graft.tmp

/** Dev probe: dump FULL normalized plan of one query to a file, for diffing
  * across run contexts. args: <query> <outfile> [warmup-queries...] */
object DiffProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("local[4]")
    val sfDir = "/root/testdata/sf0.01"
    args.drop(2).foreach { q =>
      graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.optimizedPlan.toString
    }
    val s = graft.SparkEntry.queries(args(0))(spark, sfDir)
      .queryExecution.optimizedPlan.toString
      .replaceAll("Lambda\\$\\d+/0x[0-9a-fA-F]+@[0-9a-fA-F]+", "Lambda")
      .replaceAll("#\\d+", "#x")
      .replaceAll("lambda ([A-Za-z]+)_\\d+#x", "lambda $1#x")
      .replaceAll("_common_expr_\\d+", "_common_expr_")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), s)
    println("hash=" + f"${scala.util.hashing.MurmurHash3.stringHash(s)}%08x")
    spark.stop()
  }
}
