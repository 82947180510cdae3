package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession

/** r15 probe: what is the fixed per-job / per-stage latency on this box? */
object LatencyProbeR15 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32,
      GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String, n: Int = 5)(f: => A): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (0 until n).foreach(_ => f)
      println(f"[probe] $label%-52s ${(System.nanoTime() - t0) / 1e9 / n}%8.4f s/op")
    }
    t("empty job: sc.parallelize(1 to 32, 32).count") {
      spark.sparkContext.parallelize(1 to 32, 32).count()
    }
    t("1-task job: sc.parallelize(1, 1).count") {
      spark.sparkContext.parallelize(Seq(1), 1).count()
    }
    t("df 1-stage: range(1e6,32).sum collect (same plan)") {
      spark.range(0, 1000000, 1, 32).agg(sum(col("id"))).collect()
    }
    var k = 0L
    t("df 1-stage: fresh literal each time") {
      k += 1
      spark.range(0, 1000000, 1, 32).agg(sum(col("id") + lit(k))).collect()
    }
    t("df 2-stage: range groupBy(id%13).count.collect") {
      spark.range(0, 1000000, 1, 32).groupBy((col("id") % 13).as("k"))
        .agg(count(lit(1))).collect()
    }
    t("df 2-stage AQE off", 5) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val r = spark.range(0, 1000000, 1, 32).groupBy((col("id") % 13).as("k"))
        .agg(count(lit(1))).collect()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      r
    }
    t("broadcast build: broadcast(range(100)) join range(1e5)") {
      spark.range(0, 100000, 1, 8).join(
        broadcast(spark.range(100).withColumnRenamed("id", "id2")),
        col("id") === col("id2")).agg(count(lit(1))).collect()
    }
    t("localCheckpoint of 100k rows") {
      spark.range(0, 100000, 1, 8).localCheckpoint(true).count()
    }
    spark.stop()
  }
}
