package graft.tmp

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Round-12 probe: which registry queries run Spark jobs at DataFrame
  * CONSTRUCTION (or plan-only inspection) time?
  *
  * VERDICT r11 #2 asks that constructing EVERY registry DataFrame runs
  * zero jobs. This probe finds the offenders empirically: each query
  * function is invoked (then its optimized + spark plans rendered — the
  * PlanAuditSpec / bench plan-hash access pattern) inside a thread-local
  * job group; any job carrying that group id is a construction-time job.
  */
object ConstructProbeR12 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.get("local[8]")
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    sc.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val grp = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("")
        if (grp.startsWith("probe_")) { jobs.add(grp); () }
      }
    })
    // warm the per-JVM schema catalog: first access per table pays the
    // one-time footer-inference job; query construction must then be free
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => graft.GraftSession.table(spark, dir, t))
    val offenders = scala.collection.mutable.ListBuffer[(String, Int)]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sc.setJobGroup(s"probe_$name", name)
      try {
        val df = fn(spark, dir)
        df.queryExecution.optimizedPlan.toString
        df.queryExecution.sparkPlan.toString
        ()
      } catch {
        case e: Throwable => println(s"CONSTRUCT_ERROR $name: ${e.getMessage}")
      } finally sc.clearJobGroup()
      // flush: run a marker job so async listener events for this query land
      sc.setJobGroup("probe__marker", "marker")
      try { spark.range(1).count(); () } finally sc.clearJobGroup()
      import scala.jdk.CollectionConverters._
      val n = jobs.asScala.count(_ == s"probe_$name")
      if (n > 0) { offenders += ((name, n)); println(s"CONSTRUCT_JOBS $name $n") }
    }
    println(s"TOTAL_OFFENDERS ${offenders.size}: " +
      offenders.map { case (n, c) => s"$n($c)" }.mkString(", "))
    spark.stop()
  }
}
