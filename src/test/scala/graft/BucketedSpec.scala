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
