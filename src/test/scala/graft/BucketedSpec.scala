package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Proves the bucketing scale path from SURVEY §5: persisting the fact
  * table bucketed by the entity key removes the shuffle from every
  * entity-keyed aggregation (the dominant cost of the engagement pipeline at
  * 100 TB — sessions, column views, snapshot dedup all re-key on user).
  */
class BucketedSpec extends SparkSpec {

  test("aggregations on a user-bucketed events table plan no exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val ev = GraftSession.table(spark, "/root/testdata/sf0.001", "events")
    graft.sources.Sources.writeBucketed(ev, "events_bucketed", s"$wh/events_bucketed",
      "user_id", 8, Seq("user_id", "ts"))

    val agg = spark.table("events_bucketed")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)

    // same aggregation on the unbucketed table must shuffle — the bucketed
    // layout is what removed it
    val plain = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert(plain.contains("Exchange"), plain)

    // and the results agree
    val a = agg.orderBy("user_id").collect().toSeq
    val b = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
      .orderBy("user_id").collect().toSeq
    assert(a == b)
  }

  test("range layout yields disjoint per-file time ranges (min/max pruning holds)") {
    val dir = Files.createTempDirectory("graft_range").toString + "/ev"
    val ev = GraftSession.table(spark, "/root/testdata/sf0.001", "events")
    graft.sources.Sources.writeRangeLayout(ev, dir, "ts", 8)
    val back = spark.read.parquet(dir)
    // nothing lost, and a time-bounded read equals the logical filter
    assert(back.count() == ev.count())
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    assert(back.filter(col("ts") < cut).count() == ev.filter(col("ts") < cut).count())
    // per-file min/max must not overlap — that disjointness is exactly what
    // lets parquet footer stats prune a time-bounded scan to few files
    val files = back.inputFiles
    assert(files.length > 1, files.mkString(","))
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("ts")), max(col("ts"))).head
      (r.getTimestamp(0), r.getTimestamp(1))
    }.filter(r => r._1 != null).sortBy(_._1.getTime)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(!hi.after(lo), s"file ranges overlap: $hi > $lo")
      case _ =>
    }
  }

  test("window operators on the bucketed table need no exchange either") {
    // relies on the table created by the previous test in this suite
    val sess = graft.operators.Sessionize.sessionCounts(
      spark.table("events_bucketed"), "user_id", col("ts"), col("event_id"), 1800L)
    val plan = sess.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val expected = graft.operators.Sessionize.sessionCounts(
      GraftSession.table(spark, "/root/testdata/sf0.001", "events"),
      "user_id", col("ts"), col("event_id"), 1800L)
      .orderBy("user_id").collect().toSeq
    assert(sess.orderBy("user_id").collect().toSeq == expected)
  }
}
