package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.config._

/** Typed-config layer: the contracts that make a configured run faithful to
  * the reference's configuration semantics — the RQA-only time window,
  * config-driven pivot columns, age categorisation bounds — plus the plan
  * contract that one config = one aggregation pass.
  */
class ConfigSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  private val cfg = PipelineConfig(
    datasets = Seq(
      AnalysisDatasetConfig(Seq("rqa_s01", "rqa_s02"),
        DatasetType.ResearchQuestionAnswer, "rqa_raw"),
      AnalysisDatasetConfig(Seq("demog_age"), DatasetType.Demographic, "age_raw",
        Seq(CodingConfig("age_category", Some(AgeCategoryConfig("age_raw",
          Seq((0, 17, "child"), (18, 64, "adult"), (65, 120, "elder")))))))),
    projectStart = Some("2024-01-05 00:00:00"),
    projectEnd = Some("2024-01-10 23:59:59"))

  private val msgs = Seq(
    (1L, 10L, "rqa_s01", ts(6), "answer a"),
    (2L, 10L, "rqa_s02", ts(20), "late answer"),  // RQA outside window -> dropped
    (3L, 10L, "demog_age", ts(20), "34"),         // demographic outside window -> KEPT
    (4L, 20L, "rqa_s01", ts(7), "answer b"),
    (5L, 20L, "demog_age", ts(7), "70")
  ).toDF("event_id", "user_id", "event_type", "ts", "text")

  private val noTest = Seq.empty[Long].toDF("user_id")

  private def runCfg() = ConfiguredPipeline.run(msgs, cfg, "user_id",
    col("event_type"), col("ts"), col("event_id"), col("text"),
    col("text").cast("int"), noTest)

  test("the project window applies only to RQA datasets; demographics pass through") {
    val rows = runCfg().collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rows(10L) == (("answer a", "34")))   // late RQA dropped, late demog kept
    assert(rows(20L) == (("answer b", "70")))
  }

  test("age categories come from the config's inclusive bounds") {
    val cats = runCfg().collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(cats(10L) == "adult")
    assert(cats(20L) == "elder")
  }

  test("a null-text message folds as an empty slot, not silently dropped") {
    // array_join drops null elements; the view must coalesce first so
    // positions keep aligning with message count (ColumnView.foldConcat's
    // documented invariant)
    val rows = Seq(
      (1L, 10L, "rqa_s01", ts(6), Some("a")),
      (2L, 10L, "rqa_s01", ts(7), Option.empty[String]),
      (3L, 10L, "rqa_s01", ts(8), Some("b"))
    ).toDF("event_id", "user_id", "event_type", "ts", "text")
    val out = ConfiguredPipeline.run(rows, cfg, "user_id", col("event_type"),
      col("ts"), col("event_id"), col("text"), col("text").cast("int"), noTest)
    assert(out.collect().head.getString(1) == "a;;b")
  }

  test("a typo'd ageAnalysisDataset fails fast with the offending name") {
    val bad = cfg.copy(datasets = cfg.datasets.map {
      case d if d.codingConfigs.nonEmpty =>
        d.copy(codingConfigs = Seq(CodingConfig("age_category",
          Some(AgeCategoryConfig("age_rawx", // typo
            Seq((0, 17, "child"), (18, 64, "adult"), (65, 120, "elder")))))))
      case d => d
    })
    val e = intercept[IllegalArgumentException] {
      ConfiguredPipeline.run(msgs, bad, "user_id", col("event_type"),
        col("ts"), col("event_id"), col("text"), col("text").cast("int"), noTest)
    }
    assert(e.getMessage.contains("age_rawx"), e.getMessage)
  }

  test("a dataset group with no rows for a user folds to empty, not null") {
    val solo = Seq((9L, 30L, "demog_age", ts(6), "12"))
      .toDF("event_id", "user_id", "event_type", "ts", "text")
    val out = ConfiguredPipeline.run(solo, cfg, "user_id", col("event_type"),
      col("ts"), col("event_id"), col("text"), col("text").cast("int"), noTest)
      .collect().head
    assert(out.getString(1) == "")          // rqa_raw
    assert(out.getString(2) == "12")        // age_raw
    assert(out.getString(3) == "child")
  }

  test("an unconfigured age stays uncategorised (null), as in the reference") {
    val solo = Seq((9L, 30L, "demog_age", ts(6), "150"))
      .toDF("event_id", "user_id", "event_type", "ts", "text")
    val out = ConfiguredPipeline.run(solo, cfg, "user_id", col("event_type"),
      col("ts"), col("event_id"), col("text"), col("text").cast("int"), noTest)
      .collect().head
    assert(out.isNullAt(3))
  }

  test("overlapping age bands resolve to the FIRST configured band, as in the reference") {
    val overlapping = AgeCategoryConfig("age_raw",
      Seq((0, 17, "child"), (15, 20, "teen")))
    val out = Seq((16, "x")).toDF("age", "pad")
      .select(overlapping.categoryColumn(col("age")).as("cat")).collect().head
    assert(out.getString(0) == "child")
  }

  test("ageAnalysisDataset resolves to the NAMED dataset group's rows") {
    // the age categorisation lives on a coding config of the RQA dataset but
    // points at the demographic group — the category must come from
    // demog_age rows, not the enclosing rqa rows
    val crossCfg = PipelineConfig(
      datasets = Seq(
        AnalysisDatasetConfig(Seq("rqa_s01"), DatasetType.ResearchQuestionAnswer,
          "rqa_raw", Seq(CodingConfig("age_category",
            Some(AgeCategoryConfig("age_raw",
              Seq((0, 17, "child"), (18, 64, "adult"))))))),
        AnalysisDatasetConfig(Seq("demog_age"), DatasetType.Demographic, "age_raw")))
    val rows = Seq(
      (1L, 10L, "rqa_s01", ts(6), "999"),  // enclosing dataset's value: not an age
      (2L, 10L, "demog_age", ts(6), "40")
    ).toDF("event_id", "user_id", "event_type", "ts", "text")
    val out = ConfiguredPipeline.run(rows, crossCfg, "user_id", col("event_type"),
      col("ts"), col("event_id"), col("text"), col("text").cast("int"), noTest)
      .collect().head
    assert(out.getString(out.fieldIndex("age_category")) == "adult")
  }

  test("one config = one aggregation pass, however many datasets are configured") {
    val plan = runCfg().queryExecution.executedPlan.toString
    // a single groupBy: exactly one shuffle exchange feeds one final agg
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("configured curation equals the hand-written composition, both dedup modes") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
    val w = Map("en" -> 100, "fr" -> 50, "es" -> 25, "de" -> 10, "zh" -> 75)
    // exact mode
    val exactCfg = graft.config.CurationConfig(mixtureWeights = w)
    val viaCfg = graft.config.ConfiguredCuration.funnel(docs, col("doc_id"),
      col("text"), col("lang"), exactCfg).orderBy("stage").collect().toSeq
    val byHand = graft.curation.Curation.curationFunnel(docs, col("doc_id"),
      col("text"), col("lang"), w).orderBy("stage").collect().toSeq
    assert(viaCfg.nonEmpty && viaCfg == byHand)
    // near-dup mode, with export shaping
    val fuzzyCfg = graft.config.CurationConfig(
      dedup = graft.config.NearDupKeepBest(3, 16, 4, 0.5), mixtureWeights = w,
      split = Some((90, 5)), shuffleShards = Some(8))
    val ex = graft.config.ConfiguredCuration.export(docs, col("doc_id"),
      col("text"), col("lang"), fuzzyCfg)
    assert(ex.columns.toSeq === Seq("doc_id", "source", "n_tok", "split", "shard"))
    val pairs = graft.dedup.Dedup.minhashDedupVerified(docs, col("doc_id"),
      col("text"), 3, 16, 4, 0.5)
    val handRows = graft.curation.Curation.fuzzyCurationExport(docs, col("doc_id"),
      col("text"), col("lang"), pairs,
      graft.text.TextFeatures.qualityColumns(col("text")).last, w)
      .select("doc_id").orderBy("doc_id").collect().toSeq
    assert(ex.select("doc_id").orderBy("doc_id").collect().toSeq === handRows)
    // export shaping is deterministic: same config, same assignment
    assert(ex.orderBy("doc_id").collect().toSeq ===
      graft.config.ConfiguredCuration.export(docs, col("doc_id"), col("text"),
        col("lang"), fuzzyCfg).orderBy("doc_id").collect().toSeq)
  }
}
