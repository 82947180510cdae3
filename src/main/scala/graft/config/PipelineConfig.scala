package graft.config

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed configuration layer: the reference is operated entirely through
  * config objects that map engagement-db datasets to code schemes and
  * analysis columns (reference:
  * src/engagement_db_to_analysis/configuration.py:13-122,
  * src/pipeline_configuration_spec.py:183). This is the query-relevant
  * subset as plain case classes — dataset grouping, dataset type,
  * raw-column naming, age categorisation — plus an interpreter that turns
  * a config into the corresponding Spark plan. Everything stays
  * declarative Column algebra, so a configured run optimizes exactly like
  * a hand-written one (the config only decides WHICH filters and pivot
  * columns exist, never how they execute).
  */
object DatasetType {
  sealed trait Type
  /** Attributes of the participant (age, gender, location) — exempt from
    * the project time window. */
  case object Demographic extends Type
  /** Answers to the project's research questions — the time-windowed,
    * episode-keyed data. */
  case object ResearchQuestionAnswer extends Type
}

/** Inclusive [minAge, maxAge] -> category label, mirroring
  * AgeCategoryConfiguration (configuration.py:18). */
final case class AgeCategoryConfig(ageAnalysisDataset: String,
                                   categories: Seq[(Int, Int, String)]) {
  /** The imputed category column: first matching band in config order
    * (the reference iterates the categories dict and takes the first
    * match), else null — the reference leaves out-of-range ages
    * uncategorised. foldRight so the FIRST band is the outermost branch
    * of the generated CASE; with overlapping bands the earlier one wins. */
  def categoryColumn(age: Column): Column =
    categories.foldRight(lit(null).cast("string")) { case ((lo, hi, label), acc) =>
      when(age >= lo && age <= hi, lit(label)).otherwise(acc)
    }
}

/** One coded view of a dataset (CodingConfiguration, configuration.py:47). */
final case class CodingConfig(analysisDataset: String,
                              ageCategoryConfig: Option[AgeCategoryConfig] = None)

/** One analysis dataset: the union of several engagement-db datasets under
  * one raw column name (AnalysisDatasetConfiguration, configuration.py:71). */
final case class AnalysisDatasetConfig(engagementDbDatasets: Seq[String],
                                       datasetType: DatasetType.Type,
                                       rawDataset: String,
                                       codingConfigs: Seq[CodingConfig] = Nil)

/** The pipeline-level analysis configuration: dataset configs plus the
  * project time window and test-participant filtering
  * (pipeline_configuration_spec.py:183 `project_start_date` /
  * `project_end_date` / `filter_test_messages`). Timestamps are inclusive
  * bounds, as in the reference. */
final case class PipelineConfig(datasets: Seq[AnalysisDatasetConfig],
                                projectStart: Option[String] = None,
                                projectEnd: Option[String] = None,
                                filterTestMessages: Boolean = true) {
  def rqaDatasets: Seq[String] = datasets
    .filter(_.datasetType == DatasetType.ResearchQuestionAnswer)
    .flatMap(_.engagementDbDatasets)
  def allDatasets: Seq[String] = datasets.flatMap(_.engagementDbDatasets)
}

/** Interprets a PipelineConfig into Spark plans — the graft twin of
  * driving the reference through its configuration module instead of
  * calling each stage by hand. */
object ConfiguredPipeline {

  /** The reference's rqa_time_range_filter (traced_data_filters.py:14):
    * the project window applies ONLY to research-question datasets;
    * demographic messages pass through regardless of timestamp. Both
    * bounds inclusive. A plain disjunctive predicate — row-local, pushed
    * to the scan, no shuffle. */
  def rqaTimeRangeFilter(df: DataFrame, cfg: PipelineConfig,
                         datasetCol: Column, tsCol: Column): DataFrame = {
    if (cfg.projectStart.isEmpty && cfg.projectEnd.isEmpty) df
    else {
      val inWindow =
        cfg.projectStart.map(s => tsCol >= lit(s).cast("timestamp")).getOrElse(lit(true)) &&
        cfg.projectEnd.map(e => tsCol <= lit(e).cast("timestamp")).getOrElse(lit(true))
      df.filter(!datasetCol.isin(cfg.rqaDatasets: _*) || inWindow)
    }
  }

  /** filter_test_messages (traced_data_filters.py:68): drop all messages
    * from the configured test participants. Tiny deny-list -> broadcast
    * LEFT ANTI. No-op when the config disables the filter. */
  def testMessageFilter(df: DataFrame, cfg: PipelineConfig,
                        userKey: String, testParticipants: DataFrame): DataFrame =
    if (!cfg.filterTestMessages) df
    else df.join(broadcast(testParticipants.select(col(userKey)).distinct()),
      Seq(userKey), "left_anti")

  /** The configured participants column view
    * (column_view_conversion.py:354 driven by the dataset configs): one
    * row per participant; per AnalysisDatasetConfig one raw column named
    * `rawDataset` holding the order-deterministic fold of that dataset
    * group's texts; age-category columns appear for every CodingConfig
    * that declares one. ONE groupBy pass computes every configured column
    * (conditional collects fused in a single shuffle — adding datasets to
    * the config widens the row, it never adds passes). */
  def participantsColumnView(df: DataFrame, cfg: PipelineConfig,
                             userKey: String, datasetCol: Column,
                             ts1: Column, ts2: Column, textCol: Column,
                             ageCol: Column, sep: String = ";"): DataFrame = {
    // fail fast with a named precondition instead of the opaque
    // UnsupportedOperationException aggCols.head would raise at plan time
    require(cfg.datasets.nonEmpty, "PipelineConfig needs at least one dataset")
    val rawCols = cfg.datasets.map { d =>
      val member = datasetCol.isin(d.engagementDbDatasets: _*)
      array_join(
        transform(
          // coalesce BEFORE the fold: array_join silently drops null
          // elements, so a null-text message would vanish from the folded
          // column and positions would stop aligning with message count —
          // the invariant ColumnView.foldConcat documents ("the reference
          // renders every message")
          array_sort(collect_list(when(member,
            struct(ts1.as("o1"), ts2.as("o2"), coalesce(textCol, lit("")).as("t"))))),
          x => x.getField("t")),
        sep).as(d.rawDataset)
    }
    val ageCols = for {
      d <- cfg.datasets
      coding <- d.codingConfigs
      ageCfg <- coding.ageCategoryConfig.toSeq
    } yield {
      // the config names the analysis dataset carrying the labelled age
      // data (configuration.py:18 age_analysis_dataset); resolve it to
      // that dataset group's membership. A name that resolves to nothing
      // is a config typo — fail fast with the offending name instead of
      // silently computing ages from the enclosing dataset's rows
      val srcDatasets = cfg.datasets
        .find(_.rawDataset == ageCfg.ageAnalysisDataset)
        .map(_.engagementDbDatasets)
        .getOrElse(throw new IllegalArgumentException(
          s"ageAnalysisDataset '${ageCfg.ageAnalysisDataset}' does not name any " +
            s"configured rawDataset (have: ${cfg.datasets.map(_.rawDataset).mkString(", ")})"))
      val member = datasetCol.isin(srcDatasets: _*)
      val age = max(when(member, ageCol))
      ageCfg.categoryColumn(age).as(coding.analysisDataset)
    }
    val aggCols = rawCols ++ ageCols
    df.groupBy(col(userKey)).agg(aggCols.head, aggCols.tail: _*)
  }

  /** The full configured flow in the reference's order: RQA time window ->
    * test-participant filter -> configured column view. */
  def run(df: DataFrame, cfg: PipelineConfig, userKey: String,
          datasetCol: Column, tsCol: Column, tiebreak: Column,
          textCol: Column, ageCol: Column,
          testParticipants: DataFrame): DataFrame = {
    val scoped = df.filter(datasetCol.isin(cfg.allDatasets: _*))
    val windowed = rqaTimeRangeFilter(scoped, cfg, datasetCol, tsCol)
    val filtered = testMessageFilter(windowed, cfg, userKey, testParticipants)
    participantsColumnView(filtered, cfg, userKey, datasetCol, tsCol, tiebreak,
      textCol, ageCol)
  }
}
