package graft.tmp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.GraftSession

/** Throwaway dev probe (round 9): do the ROUND-8 additions hold at ~200x
  * the sf0.1 row count? 20M synthetic events / 7M annotation units
  * (probe-only data — the oracle gate always runs on the provided
  * testdata). Times the operators VERDICT r8 asked to probe:
  * krippendorff_alpha, regression_huber, holt family (+ backtest),
  * attribution_compare, pii_scan_report, seasonal_anomalies,
  * weighted_median, interval_coverage, bootstrap_ci.
  */
object R8ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val nEvents = 20000000L
    val events = spark.range(nEvents).select(
      col("id").as("event_id"),
      pmod(xxhash64(col("id")), lit(200000)).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + (col("id") % 7776000L) * 1000000L).as("ts"),
      element_at(array(lit("click"), lit("view"), lit("purchase"), lit("signup"), lit("error")),
        (pmod(col("id"), lit(5)) + 1).cast("int")).as("event_type"),
      (pmod(xxhash64(col("id") + 7), lit(100000)) / lit(100.0)).as("value"))
      .localCheckpoint()
    time("baseline_count") { events.count() }

    // 7M units x 3 labelers = 21M votes across 5 labels, ~80% agreement
    val votes = spark.range(7000000L).select(col("id").as("doc_id"),
      explode(array((0 until 3).map(j =>
        concat(lit("l"), when(pmod(xxhash64(col("id") * 3 + j), lit(10)) < 8,
          pmod(xxhash64(col("id")), lit(5)))
          .otherwise(pmod(xxhash64(col("id") * 7 + j), lit(5))))): _*)).as("vote"))
      .localCheckpoint()
    time("krippendorff_21M_votes") {
      graft.analysis.Eval.krippendorffAlpha(votes, col("doc_id"), col("vote")).count()
    }

    time("huber_20M") {
      graft.analysis.Glm.huberByGroup(events, "event_type",
        Seq(hour(col("ts")).cast("double")), col("value"),
        Seq("b0", "b_hour"), delta = 150.0).count()
    }
    val holt = graft.operators.Ewma.holtLinear(events, col("user_id"),
      col("ts"), col("event_id"), col("value"), 0.5, 0.25)
    time("holt_linear_20M") { holt.count() }
    // the backtest shape (forecast_accuracy/forecast_interval): lag the
    // per-user forecast one step, fold errors into one summary row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
    val evals = holt
      .withColumn("__f_prev", lag(col("forecast"), 1).over(w))
      .filter(col("__f_prev").isNotNull)
      .withColumn("__err", col("value") - col("__f_prev"))
    time("holt_backtest_20M") {
      evals.agg(count(lit(1)), avg(abs(col("__err")))).count()
    }
    time("forecast_interval_20M") {
      val q = broadcast(evals.agg(expr("percentile(abs(__err), 0.9D)").as("__q90")))
      evals.crossJoin(q)
        .agg(count(lit(1)).as("n_evals"), max(col("__q90")),
          sum(when(abs(col("__err")) <= col("__q90"), 1L).otherwise(0L))).count()
    }

    time("attribution_compare_20M") {
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      events.filter(col("ts").isNotNull)
        .withColumn("__first", first(touch, ignoreNulls = true).over(wp))
        .withColumn("__last", last(touch, ignoreNulls = true).over(wp))
        .filter(col("event_type") === "purchase" && col("__first").isNotNull)
        .select(explode(array(
          struct(lit("first_touch").as("model"), col("__first").as("channel"), col("value")),
          struct(lit("last_touch").as("model"), col("__last").as("channel"), col("value")))).as("e"))
        .groupBy(col("e.model"), col("e.channel"))
        .agg(count(lit(1)), sum(col("e.value"))).count()
    }

    time("seasonal_anomalies_20M") {
      graft.analysis.Stats.seasonalAnomalies(events, col("ts"),
        col("event_type"), 3.0).count()
    }
    time("interval_coverage_20M") {
      graft.analysis.Stats.intervalCoverage(events, col("user_id"),
        col("ts"), col("event_id"), 1800L).count()
    }
    time("bootstrap_ci_20M") {
      graft.analysis.Stats.bootstrapCiMean(events, col("event_id"),
        col("value"), 32, 63).count()
    }

    // 1M ~40-word docs (the ScaleProbe generator), 20 sources
    val words = (0 until 500).map(i => s"w$i")
    val docs = spark.range(1000000L).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(j =>
        element_at(array(words.map(lit): _*),
          (pmod(xxhash64(col("id") / 100 * 100 + lit(j * 7)), lit(500)) + 1).cast("int"))): _*)
        .as("text"))
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(20))))
      .localCheckpoint()
    time("docs_count") { docs.count() }
    time("pii_scan_report_1M") {
      val withPii = when(col("doc_id") % 3 === 0, concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example or call +2547"),
        lpad((col("doc_id") % 1000000).cast("string"), 6, "0")))
        .otherwise(col("text"))
      val cols: Seq[Column] = graft.text.Redact.piiColumns(withPii)
      docs.select(col("source"), cols(0), cols(1), cols(2))
        .groupBy(col("source"))
        .agg(count(lit(1)), sum(col("n_emails")), sum(col("n_phones"))).count()
    }
    time("weighted_median_1M") {
      graft.analysis.Stats.weightedMedian(docs, col("source"),
        length(col("text")),
        graft.functions.TokenCount.tokenCount(col("text"))).count()
    }
    spark.stop()
  }
}
