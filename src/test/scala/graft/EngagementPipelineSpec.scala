package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analysis.EngagementPipeline

/** The composed end-to-end analysis run. The oracle gate covers the
  * events-table binding; these specs pin the ORDER semantics on a
  * constructed fixture where each stage removes or moves a known row — the
  * stage-composition contracts (filters before imputation, WS correction
  * conserving totals while moving rows between datasets) that per-stage
  * unit parity can't observe.
  */
class EngagementPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  // fixture: u1 in-window clean; u2 is a test participant; u3 withdrew
  // consent; u4 in-window with a WS-move row and a missing-code row;
  // u1 also has one out-of-window row.
  private val msgs = Seq(
    (1L, 10L, "rqa_s01", ts(9), "code=10"),   // keeps
    (2L, 10L, "rqa_s01", ts(25), "code=10"),  // out of window
    (3L, 20L, "rqa_s01", ts(9), "code=10"),   // test participant
    (4L, 30L, "rqa_s01", ts(9), "code=10"),   // consent withdrawn
    (5L, 40L, "rqa_s01", ts(10), "code=90"),  // ws-moves to ws_rqa_s01
    (6L, 40L, "demog_age", ts(10), "")        // missing code -> imputed
  ).toDF("event_id", "user_id", "event_type", "ts", "props")

  private val testDeny = Seq(20L).toDF("user_id")
  private val withdrawn = Seq(30L).toDF("user_id")
  private def kCol = nullif(regexp_extract(col("props"), "[0-9]+", 0), lit("")).cast("int")

  private def runFunnel() = EngagementPipeline.funnel(
    msgs, "user_id", col("event_type"), col("ts"),
    "2024-01-01 00:00:00", "2024-01-21 00:00:00",
    testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", kCol)

  test("stage totals shrink only at filter stages; WS and imputation conserve rows") {
    val byStage = runFunnel().groupBy("stage")
      .agg(sum("n_rows").as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byStage(0) == 6L) // fetched
    assert(byStage(1) == 5L) // time_range drops event 2
    assert(byStage(2) == 4L) // test participant u2 dropped
    assert(byStage(3) == 3L) // withdrawn u3 dropped
    assert(byStage(4) == 3L) // WS correction conserves the total
    assert(byStage(5) == 3L) // imputation conserves the total
  }

  test("WS correction moves the row between datasets without changing totals") {
    val stage4 = runFunnel().filter(col("stage") === 4)
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(stage4 == Map("rqa_s01" -> 1L, "ws_rqa_s01" -> 1L, "demog_age" -> 1L))
    // pre-WS stage still has the row under its original dataset
    val stage3 = runFunnel().filter(col("stage") === 3)
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(stage3 == Map("rqa_s01" -> 2L, "demog_age" -> 1L))
  }

  test("imputation counts only surviving rows with a missing code") {
    val imputed = runFunnel().filter(col("stage") === 5)
      .collect().map(r => r.getString(2) -> r.getLong(5)).toMap
    assert(imputed == Map("rqa_s01" -> 0L, "ws_rqa_s01" -> 0L, "demog_age" -> 1L))
  }

  test("export emits exactly the surviving rows with corrected dataset and imputed code") {
    val out = EngagementPipeline.messagesExport(
      msgs, "user_id", col("event_type"), col("ts"),
      "2024-01-01 00:00:00", "2024-01-21 00:00:00",
      testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", kCol,
      col("event_id"), col("props"), "TRUE_MISSING")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(5))).toSet
    assert(out == Set(
      (1L, "rqa_s01", "10"),
      (5L, "ws_rqa_s01", "90"),
      (6L, "demog_age", "TRUE_MISSING")))
  }

  test("participants export folds codes under the WS-CORRECTED dataset") {
    val out = EngagementPipeline.participantsExport(
      msgs, "user_id", col("event_type"), col("ts"),
      "2024-01-01 00:00:00", "2024-01-21 00:00:00",
      testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", kCol,
      col("event_id"), col("props"), "TRUE_MISSING")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    // event 5 (code 90) moved to ws_rqa_s01 — it must fold THERE, and
    // nothing of user 40 remains under plain rqa_s01
    assert(out((40L, "ws_rqa_s01")) == (("90", 1L)))
    assert(!out.contains((40L, "rqa_s01")))
    assert(out((40L, "demog_age")) == (("TRUE_MISSING", 1L)))
    assert(out((10L, "rqa_s01")) == (("10", 1L)))
  }

  test("incremental funnel state: merged batch states reproduce the full-run funnel") {
    val run = (df: org.apache.spark.sql.DataFrame) => EngagementPipeline.funnelState(
      df, "user_id", col("event_type"), col("ts"),
      "2024-01-01 00:00:00", "2024-01-21 00:00:00",
      testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", kCol)
    // odd/even split: users 10 and 40 appear in BOTH batches, so the merged
    // participant counts are only right if the sketches actually UNION —
    // summing per-batch distincts would double-count them
    val merged = EngagementPipeline.mergeFunnelStates(
      run(msgs.filter(col("event_id") % 2 === 1)).unionByName(
        run(msgs.filter(col("event_id") % 2 === 0))))
    val est = EngagementPipeline.funnelEstimate(merged)
      .collect().map(r => (r.getInt(0), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val exact = runFunnel()
      .collect().map(r => (r.getInt(0), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // counts add exactly; at fixture cardinality the HLL estimate is exact
    assert(est == exact)
  }

  test("the project window is inclusive on both ends (reference: on-or-before)") {
    // a row timestamped exactly at the project end must survive stage 1 —
    // the stand-alone Filters.timeRange and the config layer are inclusive,
    // and the composed flow must agree with them (and the reference)
    val boundary = Seq((7L, 50L, "rqa_s01",
      Timestamp.valueOf("2024-01-21 00:00:00"), "code=10"))
      .toDF("event_id", "user_id", "event_type", "ts", "props")
    val out = EngagementPipeline.messagesExport(
      boundary, "user_id", col("event_type"), col("ts"),
      "2024-01-01 00:00:00", "2024-01-21 00:00:00",
      testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", kCol,
      col("event_id"), col("props"), "TRUE_MISSING")
    assert(out.count() == 1, "boundary-timestamp row must be kept (inclusive end)")
  }

  test("rqaDatasets exempts demographic datasets from the project window") {
    // a demographic row collected after the window must survive when the
    // window is scoped to the RQA datasets (traced_data_filters.py:14
    // applies the range only to RESEARCH_QUESTION_ANSWER datasets)
    val rows = Seq(
      (1L, 10L, "rqa_s01", ts(9), "code=10"),   // rqa, in window: keeps
      (2L, 10L, "rqa_s01", ts(25), "code=10"),  // rqa, late: dropped
      (3L, 10L, "demog_age", ts(25), "code=10") // demographic, late: keeps
    ).toDF("event_id", "user_id", "event_type", "ts", "props")
    val out = EngagementPipeline.messagesExport(
      rows, "user_id", col("event_type"), col("ts"),
      "2024-01-01 00:00:00", "2024-01-21 00:00:00",
      testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", kCol,
      col("event_id"), col("props"), "TRUE_MISSING",
      rqaDatasets = Some(Seq("rqa_s01")))
    assert(out.select("message_id").as[Long].collect().toSet == Set(1L, 3L))
    // without the scoping, the window applies to everything (gate behavior)
    val all = EngagementPipeline.messagesExport(
      rows, "user_id", col("event_type"), col("ts"),
      "2024-01-01 00:00:00", "2024-01-21 00:00:00",
      testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", kCol,
      col("event_id"), col("props"), "TRUE_MISSING")
    assert(all.select("message_id").as[Long].collect().toSet == Set(1L))
  }

  test("the composed plan scans the fact table once per branch with broadcast deny-lists") {
    val plan = runFunnel().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
