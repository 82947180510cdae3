package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The export-sink contracts behind the `dataset_export` gate query.
  *
  * Round 11 rebound the gate query to a PARQUET round trip with a loud
  * write/read row-count assertion (two rounds of driver-red on a CSV
  * read-back whose only failure mode was a plausible-but-wrong hash). The
  * CSV fidelity proof — every row and value survives the text round trip,
  * unix-micros timestamps, shortest-round-trip doubles — moves HERE, where
  * a failure is a named assertion instead of a hash mismatch.
  */
class ExportFidelitySpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def purchases = GraftSession.table(spark, sfDir, "events")
    .filter(col("event_type") === "purchase")
    .select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_micros"), col("value"))

  // mirrors the query's hashed surface: exact DECIMAL(38,0) accumulation,
  // ONE conversion to DOUBLE (no raw wide decimal leaves any query)
  private def summarize(df: org.apache.spark.sql.DataFrame) =
    df.agg(count(lit(1)).as("n_rows"),
      countDistinct(col("user_id")).as("n_users"),
      sum(col("event_id").cast("decimal(38,0)")).cast("double").as("sum_event_id"),
      sum(floor(col("value") * lit(1000000.0) + lit(0.5)).cast("decimal(38,0)"))
        .cast("double").as("sum_value_q6"),
      sum(col("ts_micros").cast("decimal(38,0)")).cast("double").as("sum_ts_micros"))
      .collect()(0).toSeq

  test("csv export round-trips every row and value (FAILFAST, explicit schema)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_fidelity").toString
    try {
      graft.sources.Sources.writeCsv(purchases, dir)
      val back = spark.read.option("header", "true").option("mode", "FAILFAST")
        .schema("event_id BIGINT, user_id BIGINT, ts_micros BIGINT, value DOUBLE")
        .csv(dir)
      assert(summarize(back) == summarize(purchases))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("constructing the dataset_export DataFrame runs no Spark job") {
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val grp = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("")
        jobs.add((js.jobId, grp)); ()
      }
    }
    sc.addSparkListener(listener)
    try {
      // job groups are THREAD-local: tagging this thread before construction
      // isolates the assertion from jobs of concurrently-running suites
      // (SparkSpec shares one session across the parallel ScalaTest run)
      sc.setJobGroup("graft_export_construct", "construction window")
      val df = try {
        val d = SparkEntry.queries("dataset_export")(spark, sfDir)
        // also make sure PLAN-ONLY inspection stays inert (PlanAuditSpec's
        // access pattern — this used to fire the CSV write job)
        d.queryExecution.optimizedPlan.toString
        d.queryExecution.sparkPlan.toString
        d
      } finally sc.clearJobGroup()
      // marker job: listener events are async, so submit one identifiable
      // job from this thread and wait for it — any construction-time job
      // would have been enqueued (and observed) before it
      sc.setJobGroup("graft_export_marker", "marker")
      try spark.range(1).count() finally sc.clearJobGroup()
      import scala.jdk.CollectionConverters._
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!jobs.asScala.exists(_._2 == "graft_export_marker") &&
             System.nanoTime() < deadline) Thread.sleep(20)
      val observed = jobs.asScala.toSeq
      assert(observed.exists(_._2 == "graft_export_marker"), "marker job never observed")
      val construction = observed.filter(_._2 == "graft_export_construct")
      assert(construction.isEmpty,
        s"dataset_export construction triggered jobs: $construction")
      df.queryExecution // keep the frame reachable past the assertions
    } finally sc.removeSparkListener(listener)
  }

  test("dataset_export executes the round trip at action time and matches the direct summary") {
    val row = SparkEntry.queries("dataset_export")(spark, sfDir).collect()(0)
    assert(row.toSeq == summarize(purchases))
  }

  test("dataset_export is idempotent across actions (fresh scratch per execution, same summary)") {
    val df = SparkEntry.queries("dataset_export")(spark, sfDir)
    // each action re-runs the thunk against a NEW scratch dir; the summary
    // is a pure function of the source, so re-execution must agree exactly
    assert(df.collect()(0).toSeq == df.collect()(0).toSeq)
  }

  test("dataset_export sink fidelity: a value-mangling sink throws a NAMED error") {
    // Round 13: the source-side checksums ride the write's Observation, so
    // the proof must still fire when the SINK lies. The afterWrite hook
    // strikes exactly where a corrupting sink or scratch sweeper would —
    // between write and read-back — and overwrites the scratch parquet
    // with same-schema rows whose values differ. The action must fail with
    // the field named, never return a plausible row.
    val e = intercept[IllegalStateException] {
      SparkEntry.datasetExportRows(spark, sfDir, { path =>
        purchases.withColumn("value", col("value") * 2)
          .write.mode("overwrite").parquet(path)
      })
    }
    assert(e.getMessage.contains("sink fidelity"), e.getMessage)
  }

  test("dataset_export sink fidelity: row loss in the sink throws a NAMED error") {
    val e = intercept[IllegalStateException] {
      SparkEntry.datasetExportRows(spark, sfDir, { path =>
        purchases.limit(3).write.mode("overwrite").parquet(path)
      })
    }
    assert(e.getMessage.contains("sink fidelity"), e.getMessage)
  }

  test("dataset_export is zero-extra-pass: the source is never re-read after the write") {
    // The direct proof that the fidelity checksums ride the write's own
    // scan: run the kernel against a COPY of the source, delete that copy
    // the instant the write completes, and the action must still succeed
    // and produce the exact same summary — any post-write source re-scan
    // (the pre-round-13 shape: summarize(out) re-aggregated the source
    // per action) would fail on the missing file.
    val dir = java.nio.file.Files.createTempDirectory("graft_zep_src")
    val src = dir.resolve("events.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), src)
    try {
      val expected = summarize(purchases)
      val rows = SparkEntry.datasetExportRows(spark, dir.toString, { _ =>
        assert(java.nio.file.Files.deleteIfExists(src), "source copy vanished early")
      })
      val got = Seq[Any](rows(0).getLong(0), rows(0).getLong(1),
        rows(0).getDouble(2), rows(0).getDouble(3), rows(0).getDouble(4))
      assert(got == expected)
    } finally {
      java.nio.file.Files.deleteIfExists(src)
      java.nio.file.Files.deleteIfExists(dir)
      ()
    }
  }

  test("a DeferredSummary thunk that throws surfaces at action time, loudly") {
    val schema = StructType(Seq(StructField("x", LongType)))
    val df = graft.plans.DeferredSummary.of(spark, "boom", schema) { () =>
      throw new IllegalStateException("round-trip integrity: injected")
    }
    // construction did not throw; the action must, with the thunk's message
    val e = intercept[Exception](df.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).map(x => x.getMessage +: messages(x.getCause)).getOrElse(Nil)
    assert(messages(e).exists(m => m != null && m.contains("round-trip integrity")))
  }
}
