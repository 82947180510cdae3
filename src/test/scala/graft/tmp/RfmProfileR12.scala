package graft.tmp

import org.apache.spark.sql.functions._

/** Throwaway round-12 profiler: where do rfm_segments' ~5 s warm go?
  * Times (a) per-user frame materialization, (b) each rank axis alone over
  * the cached frame, (c) the full query, with job/stage counts.
  */
object RfmProfileR12 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builder("local[32]", 32,
      graft.GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.util.concurrent.atomic.AtomicInteger
    val jobs = new AtomicInteger()
    val tasks = new AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); () }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(); () }
    })
    def time[T](label: String)(f: => T): T = {
      val (j0, t0) = (jobs.get(), tasks.get())
      val n0 = System.nanoTime()
      val r = f
      println(f"$label%-40s ${(System.nanoTime() - n0) / 1e9}%7.2fs jobs=${jobs.get() - j0} tasks=${tasks.get() - t0}")
      r
    }
    val ev = graft.GraftSession.table(spark, dir, "events")
    // warm the scan
    ev.count()

    def full() = graft.SparkEntry.queries("rfm_segments")(spark, dir)
    time("full rfm_segments #1 (cold)")(full().count())
    time("full rfm_segments #2 (warm)")(full().count())
    time("full rfm_segments #3 (warm)")(full().count())

    // top-10 slowest jobs of one warm run, with call sites
    val jobInfo = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val jobDur = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(j.properties).flatMap(p =>
          Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobInfo.put(j.jobId, (site, j.time)); () }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobInfo.get(j.jobId)).foreach { case (_, t0) =>
          jobDur.put(j.jobId, j.time - t0) }; () }
    })
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val dur = (for (a <- si.submissionTime; b <- si.completionTime) yield b - a).getOrElse(-1L)
        val rdds = si.rddInfos.map(r => r.name).mkString(">")
        stages.add((rdds.take(160), si.numTasks, dur)); () }
    })
    time("full rfm_segments #4 (instrumented)")(full().count())
    import scala.jdk.CollectionConverters._
    jobDur.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (id, d) =>
      println(f"  job $id%3d ${d}ms  ${jobInfo.get(id)._1}") }
    println("stages by time:")
    stages.asScala.toSeq.sortBy(-_._3).take(20).foreach { case (n, t, d) =>
      println(f"  ${d}%6dms tasks=$t%4d  $n") }
    println("stage count: " + stages.size + "  task sum: " + stages.asScala.map(_._2).sum)

    // is the per-user frame actually served from cache?
    val cm = spark.sharedState.cacheManager
    println(s"cacheManager isEmpty=${cm.isEmpty}")
    val f = full()
    val exec = f.queryExecution.executedPlan.toString
    println("InMemoryTableScan in executed plan: " +
      exec.linesIterator.count(_.contains("InMemoryTableScan")) +
      "  Scan parquet occurrences: " +
      exec.linesIterator.count(_.contains("Scan parquet")))

    // A/B: identical kernel, eager localCheckpoint vs the shipped persist
    println("perUser rows: " +
      ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select("user_id").distinct().count())
    val lcPerUser = graft.analysis.Stats
      .rfmPerUser(ev, col("user_id"), col("ts"), col("value"),
        col("event_type") === "purchase")
      .localCheckpoint(true)
    for (i <- 1 to 3)
      time(s"melted kernel over an eager localCheckpoint rep$i") {
        graft.analysis.Stats.rfmFromPerUser(lcPerUser).count()
      }

    // per-piece timing over the SAME cached frame
    import graft.analysis.Stats
    val evd = graft.GraftSession.table(spark, dir, "events")
    val m = java.time.Duration.ofDays(28)
    // replicate the query binding's argument shape by reflection-free call:
    // time each axis via the public rfm entry minus the rollup is not
    // exposed; instead time a bare two-phase rank over a 100k-row cached df
    val users = evd.groupBy("user_id").agg(count(lit(1)).as("c"),
        sum("value").cast("decimal(28,6)").as("m2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("materialize bare per-user cache")(users.count())
    for (i <- 1 to 3) {
      val ranked = users
        .select(col("c").as("__k"), col("user_id").as("__id"))
        .repartitionByRange(col("__k"), col("__id"))
        .sortWithinPartitions(col("__k"), col("__id"))
        .select(col("__id"), spark_partition_id().as("p"),
          monotonically_increasing_id().as("i"))
      time(s"bare rank axis rep$i")(ranked.groupBy("p").agg(max("i")).count())
    }
  }
}
