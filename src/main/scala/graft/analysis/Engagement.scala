package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.Relational.exactSum

/** Engagement/automated-analysis aggregations.
  *
  * Reference semantics: run_automated_analysis (reference:
  * src/engagement_db_to_analysis/automated_analysis.py:46) — engagement
  * counts, theme distributions, demographic cross-tabs — and the weekly
  * advert grouping (rapid_pro_advert_functions.py:16).
  *
  * All are single-shuffle groupBy aggregations with map-side partial
  * aggregation; distinct-counts are exact here (gated by the oracle) with
  * approx_count_distinct offered for ungated 100 TB dashboards.
  */
object Engagement {
  // oracle-compared 6-decimal rounding uses the portable floor arithmetic
  // (Portable.round6): engine round() implementations disagree on
  // knife-edge quotients, and both sides of the oracle contract must run
  // the identical IEEE op sequence
  private val r6 = graft.util.Portable.round6 _


  /** Per-dataset engagement stats: rows, distinct participants, exact value
    * sum. Reference: engagement counts + SyncStats (src/common/sync_stats.py).
    */
  def stats(df: DataFrame, dim: Column, key: Column, value: Column): DataFrame =
    df.groupBy(dim)
      .agg(
        count(lit(1)).as("n"),
        countDistinct(key).as("n_users"),
        exactSum(value).as("val_sum"))

  /** Distinct active entities per calendar week.
    * Reference: _generate_weekly_advert_uuids (rapid_pro_advert_functions.py:16).
    */
  def weeklyActive(df: DataFrame, ts: Column, key: Column): DataFrame =
    df.groupBy(date_trunc("week", ts).cast("date").as("week"))
      .agg(countDistinct(key).as("n_users"), count(lit(1)).as("n"))

  /** Distinct (entity, active week) pairs with the entity's first active
    * week attached — the shared base of episode and retention analyses.
    */
  private def userWeeksWithFirst(df: DataFrame, ts: Column, key: Column): DataFrame =
    df.select(key.as("k"), date_trunc("week", ts).cast("date").as("week")).distinct()
      .withColumn("first_week", min(col("week")).over(Window.partitionBy(col("k"))))

  /** Per-week new vs repeat participation: an entity is "new" in its first
    * active week. Reference: repeat/new participation per episode
    * (automated_analysis.py). Two shuffles: distinct on (entity, week),
    * then the window min reuses that partitioning; final rollup is tiny.
    */
  def episodeNewVsRepeat(df: DataFrame, ts: Column, key: Column): DataFrame = {
    userWeeksWithFirst(df, ts, key).groupBy(col("week"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("week") === col("first_week"), 1).otherwise(0)).as("new_users"))
      .withColumn("repeat_users", col("n_users") - col("new_users"))
  }

  /** Theme distribution / demographic cross-tab: counts along two dims. */
  def crosstab2(df: DataFrame, dim1: Column, dim2: Column): DataFrame =
    df.groupBy(dim1, dim2).agg(count(lit(1)).as("n"))

  /** Approximate distinct participants per dim — the ungated 100 TB
    * dashboard variant of stats(): HLL sketch, mergeable map-side, no exact
    * shuffle of the key space. rsd=0.02 ≈ 2% error.
    */
  def statsApprox(df: DataFrame, dim: Column, key: Column): DataFrame =
    df.groupBy(dim).agg(
      count(lit(1)).as("n"),
      approx_count_distinct(key, 0.02).as("n_users_approx"))

  /** Persisted mergeable distinct-count sketches — the INCREMENTAL
    * dashboard path at 100 TB. One Apache DataSketches HLL sketch per
    * slice (e.g. dataset × day), stored as bytes next to the data: any
    * later rollup — day→month, dataset→global, yesterday ∪ today — is a
    * union over sketch bytes (`rollupSketches`), never a rescan of the
    * raw corpus. Unlike `statsApprox` (one-shot estimate), the sketch
    * COLUMN survives its query, so each sync appends only its own slice's
    * sketches and dashboards recombine them at read time. `lgK` trades
    * 4·2^lgK bytes per sketch for accuracy (rel. stderr ≈ 1.04/√2^lgK;
    * lgK=12 ≈ 1.6%).
    */
  def distinctSketches(df: DataFrame, slice: Seq[Column], key: Column,
                       lgK: Int = 12): DataFrame =
    df.groupBy(slice: _*).agg(hll_sketch_agg(key, lit(lgK)).as("sketch"))

  /** Unions persisted sketches up to `rollup` granularity, KEEPING the
    * merged sketch column — so intermediate granularities (day→month) can
    * be re-persisted and unioned further later (month→year) without ever
    * returning to the finest slices. Union is associative/commutative, so
    * any slicing of the original data gives the same merged state.
    */
  def unionSketches(sketches: DataFrame, rollup: Seq[Column]): DataFrame =
    sketches.groupBy(rollup: _*)
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))

  /** Rolls persisted sketches up to `rollup` granularity and estimates the
    * distinct count per group (the dashboard read path over
    * `unionSketches`).
    */
  def rollupSketches(sketches: DataFrame, rollup: Seq[Column]): DataFrame =
    unionSketches(sketches, rollup)
      .withColumn("n_distinct_est", hll_sketch_estimate(col("sketch")))
      .drop("sketch")

  /** Persisted theta sketches per slice — like `distinctSketches` (HLL)
    * but supporting SET OPERATIONS on the persisted bytes: intersection
    * and difference, which HLL structurally cannot provide. This is the
    * artifact behind overlap/retention/churn dashboards that never rescan
    * the corpus (see `overlapMatrix`). Exact below `nominalEntries`
    * distinct keys per slice; ~1/sqrt(nominalEntries) relative error
    * beyond.
    */
  def thetaSketches(df: DataFrame, slice: Seq[Column], key: Column,
                    nominalEntries: Int = 4096): DataFrame =
    df.groupBy(slice: _*)
      .agg(graft.functions.ThetaSketchAgg.thetaSketch(key, nominalEntries).as("sketch"))

  /** Pairwise audience-overlap matrix from PERSISTED theta sketches: for
    * every slice pair (a < b), the distinct-key estimates |A|, |B|,
    * |A∩B|, |A\B| and the Jaccard overlap — all computed from sketch
    * bytes, no rescan. The self-join is slice-cardinality (dashboard
    * dimensions), never data-sized; sketches ride the rows.
    */
  def overlapMatrix(sketches: DataFrame, sliceCol: String): DataFrame = {
    import graft.functions.ThetaSketchAgg._
    val a = sketches.select(col(sliceCol).as("slice_a"), col("sketch").as("__sa"))
    val b = sketches.select(col(sliceCol).as("slice_b"), col("sketch").as("__sb"))
    a.join(b, col("slice_a") < col("slice_b"))
      .select(col("slice_a"), col("slice_b"),
        thetaEstimate(col("__sa")).as("n_a"),
        thetaEstimate(col("__sb")).as("n_b"),
        thetaIntersect(col("__sa"), col("__sb")).as("n_both"),
        thetaDifference(col("__sa"), col("__sb")).as("n_only_a"))
      .withColumn("jaccard",
        when(col("n_a") + col("n_b") - col("n_both") > 0,
          r6(col("n_both") / (col("n_a") + col("n_b") - col("n_both")))))
  }

  /** Approximate per-group quantiles — the ungated 100 TB variant of
    * value_quantiles: exact `percentile` materializes every group's values
    * at the merger, while percentile_approx keeps a bounded KLL-style
    * sketch per group (mergeable map-side). `accuracy` trades memory for
    * error: 1/accuracy is the approximate relative rank error.
    */
  def quantilesApprox(df: DataFrame, dim: Column, value: Column,
                      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val arr = probs.map(p => lit(p))
    val qs = percentile_approx(value, array(arr: _*), lit(accuracy))
    // full-precision names (p50, p99_5, p0_5) — rounding to whole percents
    // would collide p0.005 and p0.01 into one ambiguous column
    def nameOf(p: Double): String =
      "p" + BigDecimal(p * 100).underlying.stripTrailingZeros.toPlainString.replace(".", "_")
    df.groupBy(dim)
      .agg(qs.as("__q"))
      .select((dim +: probs.zipWithIndex.map { case (p, i) =>
        element_at(col("__q"), i + 1).as(nameOf(p))
      }): _*)
  }

  /** Funnel conversion: of the entities that reached `fromStage`, how many
    * later (strictly) reached `toStage`. One per-entity aggregation, then a
    * single-row rollup.
    */
  def funnel(df: DataFrame, key: Column, stageCol: Column, ts: Column,
             fromStage: String, toStage: String): DataFrame = {
    val per = df.groupBy(key.as("k")).agg(
      min(when(stageCol === fromStage, ts)).as("t_from"),
      // latest to-stage time: converted iff ANY to-stage event is strictly
      // after the first from-stage event (min would miss users who hit the
      // to-stage both before and after entering the funnel)
      max(when(stageCol === toStage, ts)).as("t_to"))
    per.filter(col("t_from").isNotNull)
      .agg(
        count(lit(1)).as("n_entered"),
        sum(when(col("t_to").isNotNull && col("t_to") > col("t_from"), 1).otherwise(0)).as("n_converted"))
      .withColumn("conv_rate",
        when(col("n_entered") =!= 0,
          r6(col("n_converted").cast("double") / col("n_entered").cast("double"))))
  }

  /** Time-bounded funnel conversion: converted = a to-stage event STRICTLY
    * after the user's first from-stage event AND within `windowDays` of it
    * — the SLA variant of [[funnel]] (an unbounded funnel calls any
    * eventual purchase a conversion; campaign analysis cares whether it
    * happened inside the attribution window).
    *
    * Two stage-filtered passes (both event-type predicates reach the scan):
    * the entry frame is first-from-ts per user, the to-events fan onto it
    * by user key and fold back to one flag per user — the window bound
    * depends on the per-user aggregate, so a single-pass conditional agg
    * cannot express it. Output (one row): n_entered, n_converted,
    * conv_rate.
    */
  def funnelWithin(df: DataFrame, key: Column, stageCol: Column, ts: Column,
                   fromStage: String, toStage: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"funnelWithin needs windowDays >= 1, got $windowDays")
    val entered = df.filter(stageCol === fromStage)
      .groupBy(key.as("k")).agg(min(ts).as("t_from"))
    val tos = df.filter(stageCol === toStage).select(key.as("k"), ts.as("__tt"))
    entered.join(tos, Seq("k"), "left")
      .groupBy(col("k"), col("t_from"))
      .agg(max(col("__tt") > col("t_from") &&
        col("__tt") <= col("t_from") + expr(s"INTERVAL $windowDays DAY")).as("__conv"))
      .agg(
        count(lit(1)).as("n_entered"),
        sum(when(col("__conv"), 1L).otherwise(0L)).as("n_converted"))
      .withColumn("conv_rate",
        when(col("n_entered") =!= 0,
          r6(col("n_converted").cast("double") / col("n_entered").cast("double"))))
  }

  /** Retention cohorts: entities grouped by first active week, counted per
    * subsequent week offset. Two shuffles: the (entity, week) distinct and
    * the cohort rollup; the window min reuses the first shuffle's
    * partitioning.
    */
  def retentionCohorts(df: DataFrame, ts: Column, key: Column): DataFrame = {
    userWeeksWithFirst(df, ts, key)
      .withColumnRenamed("first_week", "cohort_week")
      .withColumn("week_offset", (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
