package graft.tmp

import graft.{GraftSession, SparkEntry}

/** Throwaway dev harness: dumps the formatted physical plan of each named
  * query for shuffle/pushdown audits. Not part of the library. */
object ExplainOnce {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
