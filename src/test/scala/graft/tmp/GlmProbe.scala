package graft.tmp

import graft.{GraftSession, SparkEntry}

/** Throwaway dev probe: split Catalyst plan-build/optimize time from
  * execution time for the iterative GLM queries. Not part of the library. */
object GlmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.table(spark, sfDir, "events").count()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
        val info = s.stageInfo
        val dur = (info.completionTime.getOrElse(0L) - info.submissionTime.getOrElse(0L)) / 1000.0
        println(f"  STAGE ${info.stageId}%3d tasks=${info.numTasks}%3d ${dur}%6.2f s  ${info.name.take(60)}")
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.executorRunTime + m.executorDeserializeTime > 500)
          println(f"    TASK stage=${t.stageId} run=${m.executorRunTime}ms " +
            f"deser=${m.executorDeserializeTime}ms gc=${m.jvmGCTime}ms " +
            f"cpu=${m.executorCpuTime / 1000000}ms")
      }
    })
    args.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.optimizedPlan // force analysis+optimization
      val t2 = System.nanoTime()
      df.queryExecution.executedPlan
      val t3 = System.nanoTime()
      jobs.set(0); stages.set(0); tasks.set(0)
      val n = df.count()
      val t4 = System.nanoTime()
      Thread.sleep(300) // let listener events drain
      val j1 = jobs.get; val s1 = stages.get; val tk1 = tasks.get
      jobs.set(0); stages.set(0); tasks.set(0)
      val t5 = System.nanoTime()
      df.count() // same Dataset object: cached betas + codegen cache warm
      val t6 = System.nanoTime()
      Thread.sleep(300)
      println(f"PROBE $name build=${(t1 - t0) / 1e9}%.2f optimize=${(t2 - t1) / 1e9}%.2f " +
        f"plan=${(t3 - t2) / 1e9}%.2f exec=${(t4 - t3) / 1e9}%.2f " +
        f"jobs=$j1 stages=$s1 tasks=$tk1 " +
        f"re-exec=${(t6 - t5) / 1e9}%.2f rejobs=${jobs.get} restages=${stages.get} ($n rows)")
    }
    spark.stop()
  }
}
