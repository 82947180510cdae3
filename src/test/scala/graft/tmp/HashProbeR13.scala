package graft.tmp

import org.apache.spark.sql.DataFrame

/** Round-13 probe: is the bench plan fingerprint of a shareLazily-backed
  * query a pure function of declared plan shape? Writes the NORMALIZED
  * optimized-plan string for rfm_segments in two session states — solo,
  * and after other queries have advanced JVM-global counters — so a diff
  * exposes exactly which tokens still vary (the round-8 methodology).
  */
object HashProbeR13 {
  def norm(s: String): String = s
    .replaceAll("Lambda\\$\\d+/0x[0-9a-fA-F]+@[0-9a-fA-F]+", "Lambda")
    .replaceAll("#\\d+", "#x")
    .replaceAll("lambda ([A-Za-z]+)_\\d+#x", "lambda $1#x")
    .replaceAll("_common_expr_\\d+", "_common_expr_")
    .replaceAll("graft_dataset_export_[0-9a-f_]+", "graft_dataset_export_")
  def unwrap(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case n: graft.plans.DeferredFrameNode => unwrap(n.frame())
      case _ => df
    }
  def main(args: Array[String]): Unit = {
    val mode = args(0) // "solo" or "mid"
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (mode == "mid") {
      Seq("q1_pricing_summary", "benford_digits", "clustering_coeff").foreach { q =>
        graft.SparkEntry.queries(q)(spark, sfDir).count(); ()
      }
      org.apache.spark.sql.graft.Bridge.releaseShared()
    }
    val df = graft.SparkEntry.queries("rfm_segments")(spark, sfDir)
    df.count() // cold rep first, as Bench does before hashing
    val s = norm(unwrap(df).queryExecution.optimizedPlan.toString)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"/tmp/hashprobe_$mode.txt"), s)
    println("WROTE " + mode)
    spark.stop()
  }
}
