package graft.tmp

import java.nio.file.{Files, Paths}

/** Dev probe: write the full canonicalized plan of a query to a file. */
object PlanDumpProbe {
  def main(args: Array[String]): Unit = {
    val Array(q, out) = args
    val spark = graft.GraftSession.get("local[4]")
    val s = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      .queryExecution.optimizedPlan.canonicalized.toString
    Files.write(Paths.get(out), s.getBytes("UTF-8"))
    spark.stop()
  }
}
