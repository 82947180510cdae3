package graft

/** Measurement tool (round 16, guide §1): run named registry queries with a
  * job listener that prints every Spark job's wall time, so driver-kernel
  * queries (IRLS fits, PQ training, graph fixpoints) — whose unwrapped plans
  * are LocalTableScans — can be attributed job by job. Dev tooling only;
  * never part of the bench or oracle contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *   sbt "runMain graft.Probe <query> [query ...]"
  * Each query runs 3 reps (rep 1 cold, 2-3 warm).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt,
      GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "orders", "events", "documents", "embeddings")
      .foreach(t => GraftSession.table(spark, sfDir, t).count())
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse(""),
          js.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) println(
          f"JOB ${je.jobId}%4d ${(System.nanoTime() - s._1) / 1e9}%8.3f s ${s._3}%4d tasks  ${s._2.take(80)}")
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { a <- si.completionTime; b <- si.submissionTime } yield a - b).getOrElse(-1L)
        if (wall > 300) println(
          f"  STAGE ${si.stageId}%4d ${wall / 1e3}%8.3f s ${si.numTasks}%4d tasks  ${si.name.take(90)}")
      }
    })
    for (n <- args.toSeq; rep <- 1 to 3) {
      spark.sparkContext.setJobDescription(s"$n rep$rep")
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"QUERY $n rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
      // final adaptive plan of the last rep, for attributing stage costs
      if (rep == 3 && sys.env.get("SPARK_GRAFT_PROBE_PLAN").contains("1"))
        println(df.queryExecution.executedPlan.toString.take(12000))
      org.apache.spark.sql.graft.Bridge.releaseShared()
    }
    spark.stop()
  }
}
