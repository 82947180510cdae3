package graft.tmp

import org.apache.spark.sql.functions._

/** Round-12 profiler: is the deferred-frame wrapper costing clustering_coeff
  * anything vs the raw kernel? Times wrapped vs unwrapped constructions.
  */
object DeferProfileR12 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builder("local[32]", 32,
      graft.GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.util.concurrent.atomic.AtomicInteger
    val jobs = new AtomicInteger(); val tasks = new AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); () }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(); () }
    })
    def time[T](label: String)(f: => T): T = {
      val (j0, t0) = (jobs.get(), tasks.get()); val n0 = System.nanoTime()
      val r = f
      println(f"$label%-46s ${(System.nanoTime() - n0) / 1e9}%7.2fs jobs=${jobs.get() - j0} tasks=${tasks.get() - t0}")
      r
    }
    graft.GraftSession.table(spark, dir, "events").count()
    // wrapped (the registry binding)
    for (i <- 1 to 3)
      time(s"wrapped clustering_coeff rep$i")(
        graft.SparkEntry.queries("clustering_coeff")(spark, dir).count())
    // unwrapped (the raw kernel, r11's execution shape)
    val ev = graft.GraftSession.table(spark, dir, "events")
    def raw() = {
      val k = graft.text.Cleaners.firstInt(col("props"))
      val edges = ev.filter(k.isNotNull && col("user_id").isNotNull)
        .select(col("user_id").as("src"), (k % 150).cast("long").as("dst"))
      graft.analysis.Graph.clusteringCoefficient(edges, col("src"), col("dst"))
    }
    for (i <- 1 to 3)
      time(s"raw clustering_coeff rep$i")(raw().count())
    // wrapped-equivalent, phase-split
    for (i <- 1 to 3) {
      val inner = time(s"phase construct rep$i")(raw())
      val rdd = time(s"phase toRdd rep$i")(inner.queryExecution.toRdd)
      time(s"phase rdd.count rep$i")(rdd.count())
    }
  }
}
