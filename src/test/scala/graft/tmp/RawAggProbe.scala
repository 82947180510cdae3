package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway dev probe: isolate the cost of a wide quantized-decimal
  * aggregation (the GLM Gram pass) vs plain double sums on the same scan.
  * Not part of the library. */
object RawAggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = GraftSession.table(spark, sfDir, "events")
    ev.count()
    def time(tag: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val base = ev.select(col("event_type"), col("value").as("__y"),
      hour(col("ts")).cast("double").as("__x"))
    def qsum(e: String) =
      s"CAST(SUM(CAST(FLOOR(($e) * 1.0e12 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1.0e12"
    val qsums = (0 until 20).map(i => expr(qsum(s"__x * __y + $i")).as(s"q_$i"))
    val dsums = (0 until 20).map(i => sum(expr(s"__x * __y + $i")).as(s"d_$i"))
    val lsums = (0 until 20).map(i =>
      sum(expr(s"CAST(FLOOR((__x * __y + $i) * 1.0e12 + 0.5) AS LONG)")).as(s"l_$i"))
    time("double20")(base.groupBy("event_type").agg(dsums.head, dsums.tail: _*).count())
    time("qsum20")(base.groupBy("event_type").agg(qsums.head, qsums.tail: _*).count())
    time("longsum20")(base.groupBy("event_type").agg(lsums.head, lsums.tail: _*).count())
    spark.stop()
  }
}
