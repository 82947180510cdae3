package graft.tmp

import graft.{GraftSession, SparkEntry}

/** Throwaway dev harness: run a query, then dump the FINAL adaptive plan
  * (post-execution) so runtime exchange/stage reuse is visible — static
  * explain can't show AQE's stage dedup. Not part of the library. */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      println(s"========== $name ==========")
      println(plan)
    }
    spark.stop()
  }
}
