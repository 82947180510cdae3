package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.table
import graft.analysis.{Engagement, Relational}
import graft.dedup.Dedup
import graft.operators.{ColumnView, Filters, Imputation, Sessionize, Snapshots, WsCorrection}
import graft.similarity.Knn

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * query key maps to.
  *
  * Conventions for oracle parity (SURVEY.md §3): identical column aliases on
  * both sides; exact DECIMAL sums cast to double (never raw double sums);
  * deterministic orderings with unique tie-breaks; UTC timestamps; DuckDB
  * integer SUMs cast to BIGINT to match Spark's long.
  */
object SparkEntry {

  // oracle-compared 6-decimal rounding uses the portable floor arithmetic
  // (Portable.round6); the oracle SQL twins inline the identical
  // floor((x) * 1000000.0 + 0.5) / 1000000.0 expression
  private val r6 = graft.util.Portable.round6 _

  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  private def events(s: SparkSession, dir: String): DataFrame = table(s, dir, "events")

  /** Shared by forecast_accuracy and forecast_interval: the Holt
    * one-step backtest residual frame (err_t = value_t − forecast_{t−1}
    * over the same (ts, event_id) order as the fold). */
  private def holtBacktestErrors(s: SparkSession, dir: String): DataFrame = {
    val h = graft.operators.Ewma.holtLinear(events(s, dir), col("user_id"),
      col("ts"), col("event_id"), col("value"), 0.5, 0.25)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    h.join(events(s, dir).select(col("event_id"), col("ts")), Seq("event_id"))
      .withColumn("__pf", lag(col("forecast"), 1).over(w))
      .filter(col("__pf").isNotNull)
      .withColumn("__err", col("value") - col("__pf"))
  }

  /** Numeric answer extracted from the props payload — delegates to the ONE
    * owner of the "first integer" contract (Cleaners.firstInt: nullif guard
    * for ANSI CAST('' AS INT), <=9-digit length cap so a long digit run
    * cleans to null instead of throwing mid-job). Oracle twin everywhere:
    * CAST(CASE WHEN length(NULLIF(regexp_extract(props,'[0-9]+',0),'')) <= 9
    *      THEN NULLIF(regexp_extract(props,'[0-9]+',0),'') END AS INT). */
  private def propsInt = graft.text.Cleaners.firstInt(col("props"))

  /** Per-JVM token for side-effecting sink queries (dataset_export): keeps
    * concurrent processes out of each other's scratch dirs. A per-CALL
    * counter is appended on top so same-JVM concurrent builds (parallel
    * test suites) never share a path either; Bench normalizes the whole
    * suffix out of the plan fingerprint. */
  private val jvmToken: String =
    java.lang.Long.toHexString(java.util.UUID.randomUUID().getMostSignificantBits)
  private val exportSeq = new java.util.concurrent.atomic.AtomicLong()
  private val exportDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }
  private lazy val exportCleanup: Unit = {
    // Stale-dir sweep (the eraseKeys discipline): a hard-killed JVM never
    // reaches its shutdown hook, and the per-JVM token means later runs
    // would neither match nor reclaim its scratch — so on first use, sweep
    // sibling graft_dataset_export_* dirs older than an hour. The age bound
    // keeps the sweep safe against a concurrently-running sibling process.
    val root = new java.io.File(exportScratchRoot)
    val cutoff = System.currentTimeMillis() - 60L * 60 * 1000
    Option(root.listFiles()).foreach(_.foreach { f =>
      if (f.getName.startsWith("graft_dataset_export_") && f.lastModified() < cutoff)
        rmTree(f)
    })
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exportDirs.forEach(p => rmTree(new java.io.File(p)))))
  }

  /** Root for export scratch: the harness-owned path when the running main
    * declares one (`graft.scratch.root`, set by Verify under its outDir),
    * else the JVM tmpdir. The round-9 gate showed the sink query red ONLY
    * in the driver container while green in every local replica — writing
    * the round-trip files outside the harness-owned output tree (where a
    * tmp cleaner or tmpfs pressure can touch them between write and
    * read-back) was the one environment-coupled dependency, so the scratch
    * now lives wherever the harness owns. */
  private def exportScratchRoot: String =
    sys.props.getOrElse("graft.scratch.root", System.getProperty("java.io.tmpdir"))

  /** Fresh scratch dir for one export build, registered for JVM-exit
    * cleanup (scratch dirs must not accumulate across gate/bench runs). */
  private def exportScratchDir(dir: String): String = {
    val root = exportScratchRoot
    exportCleanup
    val p = root +
      s"/graft_dataset_export_${Integer.toHexString(dir.hashCode)}_${jvmToken}_${exportSeq.incrementAndGet()}"
    exportDirs.add(p)
    p
  }

  /** Output contract of the `dataset_export` gate row. */
  private[graft] val datasetExportSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("n_rows", LongType), StructField("n_users", LongType),
      StructField("sum_event_id", DoubleType),
      StructField("sum_value_q6", DoubleType),
      StructField("sum_ts_micros", DoubleType)))
  }

  /** The `dataset_export` sink round trip, factored out of the registry so
    * ExportFidelitySpec can inject a fault between write and read-back.
    *
    * Round 12's hashed surface (exact DECIMAL(38,0) checksums converted
    * ONCE to DOUBLE — the Glm qsum discipline that ended three driver-red
    * rounds) is unchanged. Round 13 makes the sink-fidelity proof
    * ZERO-EXTRA-PASS: the source-side truth now rides the write's own
    * `Observation` (CollectMetrics computes the checksums during the write
    * scan itself), so the thunk runs exactly two passes over data — the
    * write (one source scan) and the read-back summary — where it
    * previously re-aggregated the source a third time per action. At
    * 100 TB that third pass scanned the export subset twice.
    *
    * One metric cannot ride the Observation: DISTINCT aggregates are
    * rejected by CollectMetrics analysis (Spark's observed-metrics
    * contract), so `n_users` is computed from the READ-BACK (the exported
    * artifact itself) and the user column's fidelity is attested by an
    * exact `sum(user_id)` checksum instead — the same checksum class as
    * every other field. Any sink-mangled value surfaces as a NAMED throw
    * (observed-source vs read-back field mismatch), never a hash delta.
    *
    * `afterWrite` is test instrumentation only (default no-op): it runs
    * between the write and the read-back, where a scratch sweeper or a
    * corrupting sink would strike (ExportFidelitySpec corrupts the scratch
    * parquet there and asserts the loud throw; a sibling spec deletes the
    * SOURCE there and proves the action no longer re-reads it). */
  private[graft] def datasetExportRows(
      s: SparkSession, dir: String,
      afterWrite: String => Unit = _ => ()): Array[org.apache.spark.sql.catalyst.InternalRow] = {
    val out = events(s, dir).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_micros"), col("value"))
    // fresh per-execution scratch dir (the thunk re-runs per action;
    // no process- or thread-level sharing), cleaned up at JVM exit
    val path = exportScratchDir(dir)
    val obs = new org.apache.spark.sql.Observation()
    out.observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("event_id").cast("decimal(38,0)")).cast("double").as("sum_event_id"),
        sum(floor(col("value") * lit(1000000.0) + lit(0.5)).cast("decimal(38,0)"))
          .cast("double").as("sum_value_q6"),
        sum(col("ts_micros").cast("decimal(38,0)")).cast("double").as("sum_ts_micros"),
        sum(col("user_id").cast("decimal(38,0)")).cast("double").as("sum_user_id"))
      .write.mode("overwrite").parquet(path)
    afterWrite(path)
    val src = obs.get
    // read-back summary: the 5 contract fields plus the user-id checksum
    // (compared against the observed source values, then dropped)
    val summary = s.read
      .schema("event_id BIGINT, user_id BIGINT, ts_micros BIGINT, value DOUBLE")
      .parquet(path)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id").cast("decimal(38,0)")).cast("double").as("sum_event_id"),
        sum(floor(col("value") * lit(1000000.0) + lit(0.5)).cast("decimal(38,0)"))
          .cast("double").as("sum_value_q6"),
        sum(col("ts_micros").cast("decimal(38,0)")).cast("double").as("sum_ts_micros"),
        sum(col("user_id").cast("decimal(38,0)")).cast("double").as("sum_user_id"))
    require(org.apache.spark.sql.types.DataType.equalsStructurally(
      org.apache.spark.sql.types.StructType(summary.schema.fields.take(5)),
      datasetExportSchema, ignoreNullability = true),
      s"dataset_export summary schema drifted: ${summary.schema.sql}")
    val r = summary.queryExecution.executedPlan.executeCollect()(0)
    def boxed(i: Int): Any =
      if (r.isNullAt(i)) null
      else if (i <= 1) Long.box(r.getLong(i))
      else Double.box(r.getDouble(i))
    // the export-integrity + sink-fidelity assertion, zero-extra-pass: the
    // observed-during-write source values must equal the read-back summary
    // field-for-field — a swept scratch tree (row loss) or a value-mangling
    // sink can never again yield a plausible hash; it fails HERE, loudly,
    // with the field named
    val checks = Seq(
      ("n_rows", 0, src("n_rows")), ("sum_event_id", 2, src("sum_event_id")),
      ("sum_value_q6", 3, src("sum_value_q6")),
      ("sum_ts_micros", 4, src("sum_ts_micros")),
      ("sum_user_id", 5, src("sum_user_id")))
    checks.foreach { case (name, i, srcV) =>
      if (!java.util.Objects.equals(boxed(i), srcV)) throw new IllegalStateException(
        s"dataset_export sink fidelity: $name read-back ${boxed(i)} != source $srcV ($path)")
    }
    // the leaf's consumers assume UnsafeRow (the executeCollect contract
    // the pre-round-13 shape delivered) — project the driver-built row
    val unsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(datasetExportSchema)
    Array(unsafe(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](boxed(0), boxed(1), boxed(2), boxed(3), boxed(4)))).copy())
  }

  /** The three-labeler vote frame over documents (declared lang + both
    * heuristic labelers) — ONE definition shared by krippendorff_alpha
    * and label_consensus, so the reliability statistic and the consensus
    * labeler can never disagree on who voted (the oracle side shares the
    * langidOracle/langidProfiledOracle CTEs the same way). */
  private def threeLabelerVotes(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"),
      col("lang").as("vote_a"),
      graft.text.TextFeatures.langIdColumns(col("text")).last.as("vote_b"),
      graft.text.TextFeatures.langIdProfiled(col("text"),
        graft.text.TextFeatures.defaultProfiles).last.as("vote_c"))

  /** Binary outcome for the logistic family (answered-high). Null value
    * stays null (NOT false) so the GLM's complete-case filter sees the
    * same rows as the oracle's — a bare `CASE WHEN value > 50` would send
    * nulls to the ELSE branch on both engines. */
  private def logitY: Column =
    when(col("value").isNull, lit(null).cast("double"))
      .when(col("value") > 50, lit(1.0)).otherwise(lit(0.0))

  /** Four one-hot demographic dummies derived from user_id arithmetic —
    * the reference's predictor shape (gender / age_category / disability /
    * recently_displaced, complete_case_regression_analysis.py:60).
    * Deliberately CHEAP per-row: dummy expressions are referenced many
    * times (each GLM moment term, plus the complete-case filter after
    * predicate pushdown substitutes the aliases), so deriving them from
    * the props regexp re-inlined ~10 regexp evals per row into the pushed
    * filter (~3 s/scan at sf0.1); int ops make every reference free.
    * Missing-data paths are exercised by logitY and the MI queries. */
  private def demogDummies: Seq[Column] = {
    val k = col("user_id")
    def dummy(cond: Column) = when(cond, lit(1.0)).otherwise(lit(0.0))
    Seq(dummy(k % 2 === 1), dummy(k % 7 === 0), dummy(k % 3 === 1), dummy(k % 3 === 2))
  }

  /** DuckDB twin of [[propsInt]] (Cleaners.firstInt) for generated oracle
    * row-prep — same text as the hand-written oracle CTEs elsewhere. */
  private val propsIntSql =
    "CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 " +
      "THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT)"

  /** DuckDB twin of [[logitY]]. */
  private val logitYSql =
    "CASE WHEN value IS NULL THEN NULL WHEN value > 50 THEN 1.0 ELSE 0.0 END"

  /** DuckDB twin of [[demogDummies]]; `extraX` appends further predictor
    * expressions after the four dummies (__x5, ...). */
  private def demogRowsSql(extraX: Seq[String], yExpr: String): String = {
    def dummy(cond: String) = s"CASE WHEN $cond THEN 1.0 ELSE 0.0 END"
    val xs = Seq(dummy("user_id % 2 = 1"), dummy("user_id % 7 = 0"),
      dummy("user_id % 3 = 1"), dummy("user_id % 3 = 2")) ++ extraX
    s"SELECT event_type, " +
      xs.zipWithIndex.map { case (x, i) => s"$x AS __x${i + 1}" }.mkString(", ") +
      s", $yExpr AS __y FROM events"
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** Per-message WS-correction state derived deterministically from props:
    * current dataset, previous-datasets history, proposed correction target
    * (null = no WS code). Shared by ws_cycle_relabel and sync_stats.
    */
  private def wsState(s: SparkSession, dir: String): DataFrame = {
    val k = propsInt
    events(s, dir).select(
      col("event_id"),
      col("event_type").as("dataset"),
      when(k % 5 === 1, col("event_type"))
        .when(k % 5 === 2, lit("click"))
        .when(k % 5 === 3, lit("view"))
        .when(k % 5 === 4, lit("purchase")).as("proposed"),
      when(k % 3 === 1, array(lit("click")))
        .when(k % 3 === 2, array(lit("view"), lit("error")))
        .otherwise(array().cast("array<string>")).as("previous"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (the raw
    * builders; [[queries]] wraps the construction-time-job kernels in the
    * deferred-frame leaf — see [[deferredContracts]]). */
  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A. reference-derived core operators ----
    "snapshot_latest" -> ((s, dir) =>
      Snapshots.latest(events(s, dir), Seq(col("user_id")), col("ts"), col("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts"))),
    "active_records" -> ((s, dir) =>
      Filters.activeRecords(events(s, dir), "user_id",
          col("event_type") === "purchase", col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))),
    "time_range_filter" -> ((s, dir) =>
      Filters.timeRange(events(s, dir), col("ts"), Some("2024-01-08 00:00:00"), Some("2024-01-21 00:00:00"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))),
    "exclude_participants" -> ((s, dir) => {
      val ev = events(s, dir)
      val deny = ev.filter(col("event_type") === "error" && col("value") > 320.0)
        .select(col("user_id")).distinct()
      Filters.excludeKeys(ev, "user_id", deny)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
    }),
    "rqa_participants_only" -> ((s, dir) => {
      val ev = events(s, dir)
      val allow = ev.filter(col("event_type") === "purchase").select(col("user_id")).distinct()
      Filters.semiJoinKeys(ev, "user_id", allow)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    }),
    "participants_column_view" -> ((s, dir) =>
      ColumnView.participantView(events(s, dir), "user_id", "event_type", eventTypes, "value")),
    "fold_concat_texts" -> ((s, dir) =>
      ColumnView.foldConcat(events(s, dir).filter(col("event_type") === "purchase"),
        "user_id", col("ts"), col("event_id"), col("props"), ";")),
    "relabel_move_datasets" -> ((s, dir) => {
      val k = propsInt
      Imputation.relabel(events(s, dir), "event_type", k >= 50, "ws_")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
    }),
    "impute_missing_code" -> ((s, dir) => {
      val ev = events(s, dir)
      val k = propsInt
      val users = ev.select(col("user_id")).distinct()
      val demog = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(max(k).as("demog_k"))
      users.join(demog, Seq("user_id"), "left")
        .select(Imputation.imputeMissing(col("demog_k").cast("string"), "TRUE_MISSING").as("code"))
        .groupBy(col("code")).agg(count(lit(1)).as("n_users"))
    }),
    "age_banding" -> ((s, dir) =>
      table(s, dir, "customer")
        .groupBy(Imputation.band(col("c_acctbal"), Seq(0.0, 1000.0, 5000.0),
          Seq("negative", "low", "mid", "high")).as("band"))
        .agg(count(lit(1)).as("n"), countDistinct(col("c_nationkey")).as("n_nations"))),
    "location_hierarchy" -> ((s, dir) =>
      table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), Relational.exactSum(col("c_acctbal")).as("acct_sum"))),
    "participation_by_location" -> ((s, dir) =>
      // the participation-map frequency table (reference renders these as
      // choropleth maps; the queryable artifact is distinct participants
      // per admin region x dataset): fact shuffles once on the entity key,
      // location dims broadcast up the hierarchy
      table(s, dir, "orders")
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("o_orderpriority").as("dataset"))
        .agg(countDistinct(col("c_custkey")).as("n_participants"),
          count(lit(1)).as("n_messages"))),
    "consent_withdrawn" -> ((s, dir) =>
      Imputation.propagateFlag(events(s, dir), "user_id",
          col("event_type") === "error" && col("value") > 250.0, "consent_withdrawn")
        .groupBy(col("consent_withdrawn"))
        .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))),
    "operator_attribution" -> ((s, dir) =>
      ColumnView.attributeSet(events(s, dir), "user_id", col("event_type"), ";")),
    "engagement_stats" -> ((s, dir) =>
      Engagement.stats(events(s, dir), col("event_type"), col("user_id"), col("value"))),
    "weekly_adverts" -> ((s, dir) =>
      Engagement.weeklyActive(events(s, dir), col("ts"), col("user_id"))),
    "episode_new_vs_repeat" -> ((s, dir) =>
      Engagement.episodeNewVsRepeat(events(s, dir), col("ts"), col("user_id"))),
    "funnel_conversion" -> ((s, dir) =>
      Engagement.funnel(events(s, dir), col("user_id"), col("event_type"), col("ts"),
        "view", "purchase")),
    "retention_cohorts" -> ((s, dir) =>
      Engagement.retentionCohorts(events(s, dir), col("ts"), col("user_id"))),
    "repeat_participations" -> ((s, dir) =>
      // the reference's repeat_participations export: how many participants
      // engaged in exactly n episodes (weeks)
      events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("week")).distinct()
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_episodes"))
        .groupBy(col("n_episodes")).agg(count(lit(1)).as("n_participants"))),
    "sessionize" -> ((s, dir) =>
      Sessionize.sessionCounts(events(s, dir), "user_id", col("ts"), col("event_id"), 1800L)),
    "pseudonymize" -> ((s, dir) =>
      events(s, dir)
        .groupBy(sha2(col("user_id").cast("string"), 256).as("uid_hash"))
        .agg(count(lit(1)).as("n"))),
    "incremental_watermark" -> ((s, dir) =>
      events(s, dir).filter(col("ts") > lit("2024-01-25 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("ts")).as("max_ts"))),
    "tumbling_window_agg" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), Relational.exactSum(col("value")).as("val_sum"))
        .select(col("window.start").as("hour"), col("event_type"), col("n"), col("val_sum"))),
    "sliding_window_agg" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"))),
    "theme_distribution" -> ((s, dir) =>
      table(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"))),
    "demog_crosstab" -> ((s, dir) =>
      Engagement.crosstab2(events(s, dir), col("event_type"),
        Imputation.band(col("value"), Seq(10.0, 100.0), Seq("small", "mid", "large")).as("value_band"))),
    "messages_column_view" -> ((s, dir) => {
      val ev = events(s, dir)
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
      val demogs = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("signup_n"), min(col("ts")).as("first_signup_ts"))
      ColumnView.messageView(facts, demogs, "user_id")
        .withColumn("signup_n", coalesce(col("signup_n"), lit(0L)))
    }),

    "clean_responses" -> ((s, dir) => {
      // cleaner layer over raw response text (props standing in for survey
      // answers): extract ONCE into an attribute, then bound-check and band
      // the attribute — banding the raw extraction instead re-evaluates the
      // regex per predicate reference (the round-1 5.6 s)
      import graft.text.Cleaners
      events(s, dir)
        .select(Cleaners.firstInt(col("props")).as("__age_raw"), col("user_id"))
        .select(Cleaners.boundedAge(col("__age_raw"), 10, 99).as("__cleaned"), col("user_id"))
        .groupBy(when(col("__cleaned").isNull, "INVALID")
          .otherwise(Imputation.band(col("__cleaned").cast("double"),
            Seq(20.0, 40.0, 60.0), Seq("10s", "20-39", "40-59", "60+"))).as("age_band"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
    }),
    "membership_tagging" -> ((s, dir) => {
      // external membership list (customer segments standing in for the
      // reference's membership-group CSVs), broadcast-joined onto activity
      val members = table(s, dir, "customer")
        .select((col("c_custkey") - 1).as("user_id"), col("c_mktsegment").as("membership_group"))
      events(s, dir).join(broadcast(members), Seq("user_id"), "left")
        .withColumn("membership_group", coalesce(col("membership_group"), lit("NON_MEMBER")))
        .groupBy(col("membership_group"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
    }),
    "advert_nonrelevant_uuids" -> ((s, dir) =>
      // participants whose research answers are all below the relevance bar
      events(s, dir).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(col("value")).as("max_value"), count(lit(1)).as("n_answers"))
        .filter(col("max_value") < 50.0)),
    "asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
      graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "ts", "event_id", Seq("value"))
        .withColumnRenamed("asof_ts", "click_ts")
        .withColumnRenamed("asof_value", "click_value")
    }),
    "asof_join_native" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
      graft.plans.AsOfJoinNative.asOf(purchases, clicks, "user_id", "ts", "ts", "event_id", Seq("value"))
        .withColumnRenamed("asof_ts", "click_ts")
        .withColumnRenamed("asof_value", "click_value")
    }),
    "asof_tolerance" -> ((s, dir) => {
      // bounded-lookback as-of: a click older than 10 minutes no longer
      // explains the purchase (merge_asof tolerance semantics)
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
      graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "ts",
          "event_id", Seq("value"), toleranceSeconds = Some(600L))
        .withColumnRenamed("asof_ts", "click_ts")
        .withColumnRenamed("asof_value", "click_value")
    }),
    "asof_forward" -> ((s, dir) => {
      // merge_asof direction='forward': the NEXT click at-or-after each
      // purchase (reaction lookup instead of attribution lookup)
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
      graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "ts",
          "event_id", Seq("value"), direction = "forward")
        .withColumnRenamed("asof_ts", "click_ts")
        .withColumnRenamed("asof_value", "click_value")
    }),
    "session_window_agg" -> ((s, dir) =>
      // Spark-native session windows (the built-in gap-merge operator);
      // boundary convention spec-pinned: an event at EXACTLY prev+gap
      // still merges (touching windows coalesce) — the same inclusive
      // boundary as the lag-based sessionize operator
      events(s, dir).filter(col("ts").isNotNull)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("win_start"),
          col("sw.end").as("win_end"), col("n_events"))),
    "funnel_within" -> ((s, dir) =>
      // attribution-window funnel: view -> purchase within 2 days
      Engagement.funnelWithin(events(s, dir), col("user_id"), col("event_type"),
        col("ts"), "view", "purchase", 2)),
    "sketch_distinct_users" -> ((s, dir) =>
      // theta sketch in its EXACT regime (distinct users per type << nominal
      // entries): the estimate must equal COUNT(DISTINCT) to the last bit.
      // Sizing the sketch for the corpus IS the documented usage — 4096
      // held exactness only to ~sf0.1 and the sf1 probe left the regime
      // (15k distinct/type -> a 3% estimate, correctly, per the sketch
      // contract); 64k nominal (512 KB/group state) keeps the exact-regime
      // demo valid at every probe SF while the estimate-regime error is
      // property-tested in ThetaSketchSpec
      events(s, dir).groupBy(col("event_type"))
        .agg(graft.functions.ThetaSketchAgg.thetaSketch(col("user_id"), 65536).as("__sk"))
        .select(col("event_type"),
          graft.functions.ThetaSketchAgg.thetaEstimate(col("__sk")).as("n_users"))),
    "value_ntiles" -> ((s, dir) => {
      // exact per-dataset deciles (distribution table); the total order is
      // the semantic here — the sketch row is the bounded-state sibling and
      // value_ntiles_dist the no-single-partition-window sibling at scale
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      events(s, dir).filter(col("value").isNotNull)
        .withColumn("decile", ntile(10).over(w))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("lo"), max(col("value")).as("hi"))
    }),
    "value_ntiles_dist" -> ((s, dir) =>
      // the same decile table via the distributed two-phase rank (no
      // per-group total-order window) — the >100M-rows-per-group path
      graft.analysis.Stats.valueNtilesDist(
        events(s, dir), col("event_type"), col("value"), col("event_id"), 10)),
    "event_paths" -> ((s, dir) =>
      // the funnel's exploratory sibling: which 3-step orders actually occur
      graft.analysis.Eval.topPaths(events(s, dir), col("user_id"),
        col("ts"), col("event_id"), col("event_type"), 20)),
    "asof_nearest" -> ((s, dir) => {
      // merge_asof direction='nearest': whichever click is closer in time,
      // ties to the backward match
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
      graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "ts",
          "event_id", Seq("value"), direction = "nearest")
        .withColumnRenamed("asof_ts", "click_ts")
        .withColumnRenamed("asof_value", "click_value")
    }),
    "clustering_coeff" -> ((s, dir) => {
      // per-node neighborhood cohesion over the interaction graph
      val k = propsInt
      val edges = events(s, dir)
        .filter(k.isNotNull && col("user_id").isNotNull)
        .select(col("user_id").as("src"), (k % 150).cast("long").as("dst"))
      graft.analysis.Graph.clusteringCoefficient(edges, col("src"), col("dst"))
    }),
    "triangle_count" -> ((s, dir) => {
      // cohesion of the interaction graph: exact triangles via
      // degree-ordered orientation (no hub blow-up)
      val k = propsInt
      val edges = events(s, dir)
        .filter(k.isNotNull && col("user_id").isNotNull)
        .select(col("user_id").as("src"), (k % 150).cast("long").as("dst"))
      graft.analysis.Graph.triangleCount(edges, col("src"), col("dst"))
    }),
    "degree_assortativity" -> ((s, dir) => {
      // hub-mixing read-out on the same interaction graph: do hubs attach
      // to hubs (r > 0) or leaves (r < 0)?
      val k = propsInt
      val edges = events(s, dir)
        .filter(k.isNotNull && col("user_id").isNotNull)
        .select(col("user_id").as("src"), (k % 150).cast("long").as("dst"))
      graft.analysis.Graph.degreeAssortativity(edges, col("src"), col("dst"))
    }),
    "k_anonymity" -> ((s, dir) => {
      // pre-export privacy audit: (dataset, week, derived age band) as the
      // quasi-identifier triple, k = 5
      val qis = Seq(col("event_type"), date_trunc("week", col("ts")),
        (col("user_id") % 7).cast("int"))
      graft.analysis.Eval.kAnonymityReport(events(s, dir), qis, 5)
    }),
    "l_diversity" -> ((s, dir) => {
      // k-anonymity's sharper sibling: same QI triple, sensitive attribute
      // = coarse value band, diversity floor l = 3
      val qis = Seq(col("event_type"), date_trunc("week", col("ts")),
        (col("user_id") % 7).cast("int"))
      graft.analysis.Eval.lDiversityReport(events(s, dir), qis,
        floor(col("value") / 25).cast("int"), 3)
    }),
    "t_closeness" -> ((s, dir) =>
      // the privacy trio's third leg: per-group sensitive-distribution
      // EMD vs the table (a group can be k-anonymous and l-diverse and
      // still tell you the value range)
      graft.analysis.Eval.tClosenessReport(events(s, dir), col("event_type"),
        col("value"), 0.2)),
    "winsorize_stats" -> ((s, dir) =>
      // outlier-robust cleaning audit: clamp at each dataset's own
      // [p05, p95] and report how far the tails moved the mean
      graft.analysis.Eval.winsorizeStats(events(s, dir), col("event_type"),
        col("value"), 0.05, 0.95)),
    "rolling_mean" -> ((s, dir) => {
      // 3-event trailing mean per user (time-series smoothing); DECIMAL
      // frame sums so the windowed reduction is exact on both engines
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      events(s, dir).select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("roll_avg",
          r6(sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
            / count(col("value")).over(w).cast("double")))
    }),
    "feature_lags" -> ((s, dir) => {
      // ML feature prep: per-user lag-1..3 values, seconds-since-previous
      // and the exact 3-event trailing mean — ALL features ride ONE
      // entity-key window exchange (lags copy values, no arithmetic;
      // dt in exact integer seconds; the mean reuses rolling_mean's
      // DECIMAL frame-sum discipline)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wr = w.rowsBetween(-2, 0)
      events(s, dir).select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("lag_1", lag(col("value"), 1).over(w))
        .withColumn("lag_2", lag(col("value"), 2).over(w))
        .withColumn("lag_3", lag(col("value"), 3).over(w))
        .withColumn("dt_sec",
          // exact long micros diff, floor-divided: a bare long cast
          // truncates on Spark but ROUNDS on DuckDB — floor is the one
          // portable spelling (the conversion_lag lesson)
          floor((unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
            / lit(1000000.0)).cast("long"))
        .withColumn("roll_mean_3",
          r6(sum(col("value").cast("decimal(18,2)")).over(wr).cast("double")
            / count(col("value")).over(wr).cast("double")))
    }),
    "resample_hourly" -> ((s, dir) => {
      // gap-filled hourly series per event type: empty hours appear as
      // zero rows (the time-series shape a forecaster consumes)
      val ev = events(s, dir).filter(col("ts").isNotNull)
      val range = ev.agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      val hours = range.select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
      val types = ev.select(col("event_type")).distinct()
      val counts = ev.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("__n"))
      hours.crossJoin(types).join(counts, Seq("hour", "event_type"), "left")
        .select(col("hour"), col("event_type"), coalesce(col("__n"), lit(0L)).as("n"))
    }),
    "pagerank" -> ((s, dir) => {
      // influence ranking over the derived interaction graph (user ->
      // answered-target); d = 0.75 — binary-exact, so the damping literal
      // parses identically as SQL DECIMAL and JVM double
      val k = propsInt
      val edges = events(s, dir)
        .filter(k.isNotNull && col("user_id").isNotNull)
        .select(col("user_id").as("src"), (k % 150).cast("long").as("dst"))
      graft.analysis.Graph.pageRank(edges, col("src"), col("dst"), 5, 0.75)
    }),
    "coder_agreement" -> ((s, dir) => {
      // two deterministic "coders" labeling the same messages (the Coda
      // double-coding scenario): coder B breaks from A on high-value rows.
      // __k is materialized in its OWN projection: the coder expressions
      // reference it five times, and conditional branches defeat codegen
      // subexpression elimination — without the boundary the regexp ran
      // ~10x per row and this was the slowest small query in the suite
      val k = col("__k")
      // CpuFloor the RAW rows before the regex projection (guide §2.5,
      // round 16): the whole extract+label pass ran as ONE scan task on the
      // single-row-group events file (probe: 0.6-1.5 s single-task job)
      val base = graft.util.CpuFloor(events(s, dir).select(col("value"), col("props")))
        .select(col("value"), propsInt.as("__k"))
      val coderA = when(k.isNotNull, concat(lit("c"), k % 4))
      val coderB = when(k.isNotNull,
        concat(lit("c"), when(col("value") > 75.0, (k + 1) % 4).otherwise(k % 4)))
      graft.analysis.Eval.cohenKappa(base, coderA, coderB)
    }),
    "regression_ols" -> ((s, dir) =>
      graft.analysis.Regression.olsByGroup(
        events(s, dir), Seq(col("event_type")),
        propsInt, col("value"))),
    "regression_ols2" -> ((s, dir) =>
      graft.analysis.Regression.ols2ByGroup(
        events(s, dir), Seq(col("event_type")),
        propsInt,
        hour(col("ts")), col("value"))),
    "regression_ols_imputed" -> ((s, dir) => {
      // the events fixture has no organic nulls, so missingness is injected
      // with the repo's deterministic md5 hash coin (20% of rows), mirrored
      // verbatim in the oracle SQL
      val coin = graft.curation.Curation.hashPct(col("event_id"), 1)
      val xMiss = when(coin < 20, lit(null).cast("int")).otherwise(propsInt)
      graft.analysis.Regression.olsImputedByGroup(
        events(s, dir), Seq(col("event_type")), xMiss, col("value"))
    }),
    "regression_ols_multi" -> ((s, dir) =>
      // the reference's formula shape — 4 one-hot demographic dummies plus
      // a numeric regressor (complete_case_regression_analysis.py:60) —
      // via ONE Gram-moment aggregation and an unrolled p×p solve
      graft.analysis.Glm.olsMultiByGroup(events(s, dir), "event_type",
        demogDummies :+ hour(col("ts")).cast("double"), col("value"),
        Seq("b0", "b_gender", "b_disability", "b_age1", "b_age2", "b_hour"))),
    "regression_logit" -> ((s, dir) =>
      // binomial-logit GLM (the reference's GLM_FAMILY,
      // complete_case_regression_analysis.py:10): fixed-iteration IRLS,
      // one aggregation pass per iteration
      graft.analysis.Glm.logitByGroup(events(s, dir), "event_type",
        Seq(hour(col("ts")).cast("double")), logitY,
        Seq("b0", "b_hour"))),
    "regression_huber" -> ((s, dir) =>
      // robust OLS: residuals past delta = 150 downweight to delta/|r|,
      // so a fat-tailed value feed can't drag the fitted line (the
      // outlier-safe sibling of regression_ols, same IRLS machinery)
      graft.analysis.Glm.huberByGroup(events(s, dir), "event_type",
        Seq(hour(col("ts")).cast("double")), col("value"),
        Seq("b0", "b_hour"), delta = 150.0)),
    "regression_logit_multi" -> ((s, dir) =>
      // all-categorical predictor set like the reference's
      // gender/age_category/disability/recently_displaced one-hots
      graft.analysis.Glm.logitByGroup(events(s, dir), "event_type",
        demogDummies, logitY,
        Seq("b0", "b_gender", "b_disability", "b_age1", "b_age2"))),
    "regression_mi_pooled" -> ((s, dir) => {
      // mice(m)+pool analogue (multiple_imputation_regression_analysis
      // .py:61,74): same 20% missingness coin as regression_ols_imputed
      // (digest window 1), 5 hash-seeded draws in windows 2-6, Rubin's
      // rules pooling
      val coin = graft.curation.Curation.hashPct(col("event_id"), 1)
      val xMiss = when(coin < 20, lit(null).cast("int")).otherwise(propsInt % 97)
      graft.analysis.Glm.miPooledByGroup(events(s, dir), "event_type",
        col("event_id"), xMiss, col("value"), draws = 5, firstOffset = 2)
    }),
    "regression_mi_logit" -> ((s, dir) => {
      // the reference's ACTUAL MI model — bayesglm (logit) per imputed
      // dataset then pool (multiple_imputation_regression_analysis.py:74)
      // — m IRLS chains folded into one aggregation pass per iteration
      val coin = graft.curation.Curation.hashPct(col("event_id"), 1)
      val xMiss = when(coin < 20, lit(null).cast("int")).otherwise(propsInt % 97)
      graft.analysis.Glm.miLogitPooledByGroup(events(s, dir), "event_type",
        col("event_id"), xMiss, logitY, draws = 3, firstOffset = 2)
    }),
    "value_quantiles" -> ((s, dir) =>
      // scalar columns (not an array) so the driver's pandas sort-hash can
      // factorize the result; Spark exact `percentile` ≡ DuckDB quantile_cont
      events(s, dir).groupBy(col("event_type"))
        .agg(expr("percentile(value, array(0.5D, 0.9D))").as("__q"))
        .select(col("event_type"),
          r6(element_at(col("__q"), 1)).as("p50"),
          r6(element_at(col("__q"), 2)).as("p90"))),
    "value_quantiles_sketch" -> ((s, dir) =>
      // bounded-state twin of value_quantiles for groups too large to
      // sort: a streaming-histogram summary (capacity centroids per
      // partial buffer) makes reduce state capacity-bound instead of
      // group-size-bound. capacity 1024 >> the distinct token-count
      // values here, so the sketch is in its exact deterministic regime
      // and the oracle is the plain nearest-rank quantile (integer
      // per-mille rank arithmetic on both sides); the approximation
      // regime is bounded in QuantileSketchSpec
      table(s, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).cast("double").as("__v"))
        .groupBy(col("source"))
        .agg(graft.functions.QuantileSketchAgg.quantiles(
          col("__v"), 1024, Seq(250, 500, 750, 950)).as("__q"))
        .select(col("source"),
          element_at(col("__q"), 1).as("p25"),
          element_at(col("__q"), 2).as("p50"),
          element_at(col("__q"), 3).as("p75"),
          element_at(col("__q"), 4).as("p95"))),
    "normalize_scheme_versions" -> ((s, dir) => {
      // duplicate code schemes carry a numeric suffix; normalize to the base
      // scheme id, then keep the latest label per (participant, base scheme)
      val k = propsInt
      val labeled = events(s, dir)
        .withColumn("scheme",
          concat(lit("sch"), (k % 5).cast("string"),
            when(k % 7 === 0, "-1").otherwise("")))
        .withColumn("base_scheme", regexp_replace(col("scheme"), "-[0-9]+$", ""))
      Snapshots.latest(labeled, Seq(col("user_id"), col("base_scheme")), col("ts"), col("event_id"))
        .groupBy(col("base_scheme"))
        .agg(count(lit(1)).as("n_latest"), Relational.exactSum(col("value")).as("val_sum"))
    }),
    "latest_label_per_scheme" -> ((s, dir) => {
      val latest = Snapshots.latest(events(s, dir), Seq(col("user_id"), col("event_type")),
        col("ts"), col("event_id"))
      val codes = eventTypes.map(t => max(when(col("event_type") === t, col("value"))).as(s"${t}_code"))
      latest.groupBy(col("user_id")).agg(codes.head, codes.tail: _*)
    }),
    "demog_conflicts" -> ((s, dir) => {
      // NIC imputation input (reference _demog_has_conflicting_normal_labels
      // / _impute_nic_demogs, code_imputation_functions.py:595,636): a
      // participant whose answers within one dataset disagree is flagged
      // "not internally consistent" rather than trusted
      val k = propsInt
      events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(countDistinct(k).as("nd"))
        .groupBy(col("event_type"))
        .agg(count(when(col("nd") > 1, 1)).as("n_conflicted"),
          count(when(col("nd") <= 1, 1)).as("n_consistent"))
    }),
    "traffic_heatmap" -> ((s, dir) =>
      // the broadcast-planning view: engagement by weekday x hour (when do
      // participants actually text in). Spark dayofweek is 1=Sunday;
      // DuckDB date_part('dow') is 0=Sunday — the oracle adds 1.
      events(s, dir)
        .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hour_of_day"))
        .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))),
    "quality_drift" -> ((s, dir) => {
      // corpus-regression check between two snapshots (even doc ids stand
      // in for the previous sync, odd for the new one): per-source mean
      // quality for each cohort plus the delta — the alert a nightly
      // ingest watches. Averages are double(exact decimal sum)/count.
      val q = graft.text.TextFeatures.qualityColumns(col("text")).last
      table(s, dir, "documents")
        .select(col("source"), (col("doc_id") % 2 === 0).as("__old"),
          q.cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6)).as("__q"))
        .groupBy(col("source"))
        .agg(
          (sum(when(col("__old"), col("__q"))).cast("double") /
            sum(when(col("__old"), 1L).otherwise(0L)).cast("double")).as("mean_q_old"),
          (sum(when(!col("__old"), col("__q"))).cast("double") /
            sum(when(!col("__old"), 1L).otherwise(0L)).cast("double")).as("mean_q_new"))
        .select(col("source"), col("mean_q_old"), col("mean_q_new"),
          r6(col("mean_q_new") - col("mean_q_old")).as("drift"))
    }),
    "length_histogram" -> ((s, dir) =>
      // per-source document-length distribution in log2 token buckets —
      // the at-a-glance shape check a corpus report links to
      table(s, dir, "documents")
        .groupBy(col("source"),
          floor(log2(size(split(col("text"), " ", -1)).cast("double"))).cast("long")
            .as("len_bucket"))
        .agg(count(lit(1)).as("n_docs"))),
    "traffic_analysis" -> ((s, dir) => {
      // labelled [start, end) time-block message counts (reference
      // automated_analysis traffic_analysis export); block config broadcasts
      val ev = events(s, dir)
      val blocks = graft.analysis.Traffic.uniformBlocks(
        ev, "2024-01-08 00:00:00", "2024-01-22 00:00:00", "6 HOUR")
      graft.analysis.Traffic.trafficCounts(ev, col("ts"), col("event_type"), blocks)
    }),
    "range_join_traffic" -> ((s, dir) => {
      // hot-interval stats via the grid-bucketed range join: both sides of
      // the point-in-interval join stay large at 100 TB, so the equi-join-
      // on-cell rewrite (never a nested loop) is the graded plan shape
      val ev = events(s, dir)
      graft.operators.RangeJoin.hotIntervalStats(ev, col("ts"), col("user_id"))
    }),
    "sample_messages" -> ((s, dir) =>
      // deterministic per-code sample (reference sample_messages export,
      // limit_per_code): md5-of-id order, stable across runs and engines
      graft.analysis.Traffic.sampleMessages(events(s, dir),
        col("event_type"), col("event_id"), col("props"), 10)),
    "ws_cycle_relabel" -> ((s, dir) => {
      // one WS-correction sync step incl. cycle defense over per-message
      // (dataset, previous_datasets, proposed) state derived from props
      WsCorrection.correctStep(wsState(s, dir),
          col("dataset"), col("previous"), col("proposed"))
        .groupBy(col("new_dataset"), col("sync_event"))
        .agg(count(lit(1)).as("n"))
    }),
    "sync_stats" -> ((s, dir) =>
      // the reference's per-dataset SyncStats accounting over the same step
      WsCorrection.syncStats(
        WsCorrection.correctStep(wsState(s, dir),
          col("dataset"), col("previous"), col("proposed")),
        Seq(col("dataset")), col("sync_event"))),
    "reverse_sync_contacts" -> ((s, dir) =>
      // engagement-db -> RapidPro contact fields: per-participant folded
      // texts per dataset + consent flag (CONCATENATE_TEXTS write mode)
      graft.operators.ReverseSync.contactFields(events(s, dir),
        col("user_id"), col("event_type"), col("props"), col("ts"), col("event_id"),
        Seq("click", "view", "purchase"),
        col("event_type") === "error" && col("value") > 250.0)),

    // ---- C. LLM-training-data operators ----
    "lsh_tuning_table" -> ((s, dir) => {
      // the LSH design tool: for each (bands, rows) layout of a
      // 16-hash signature, the S-curve's 50% threshold and the
      // catch probabilities at J = 0.5 / 0.7 / 0.9 — read BEFORE
      // committing a band layout (data-free planning table)
      val layouts = Seq((2, 8), (4, 4), (8, 2), (16, 1))
      val rows = layouts.map { case (b, r) =>
        struct(lit(b).as("bands"), lit(r).as("rows_per_band"))
      }
      def pCatch(sim: Double) = {
        val j = lit(sim)
        r6(lit(1.0) - pow(lit(1.0) -
          pow(j, col("rows_per_band").cast("double")),
          col("bands").cast("double")))
      }
      s.range(1).select(explode(array(rows: _*)).as("__e"))
        .select(col("__e.bands").as("bands"),
          col("__e.rows_per_band").as("rows_per_band"))
        .select(col("bands"), col("rows_per_band"),
          r6(pow(lit(1.0) / col("bands").cast("double"),
            lit(1.0) / col("rows_per_band").cast("double"))).as("s50"),
          pCatch(0.5).as("p_at_50"), pCatch(0.7).as("p_at_70"),
          pCatch(0.9).as("p_at_90"))
    }),
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(table(s, dir, "documents"), col("doc_id"), col("text"))),
    "doc_fingerprint" -> ((s, dir) =>
      Dedup.bottomKFingerprint(table(s, dir, "documents"), col("doc_id"), col("text"), 3, 4)),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(table(s, dir, "documents"), col("doc_id"), col("text"), 3, 16),
        16, 4)),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash32(table(s, dir, "documents"), col("doc_id"), col("text"))),
    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(table(s, dir, "documents"), col("doc_id"), col("text"), 4, 3, 1000L)),
    "dedup_simhash64_pairs" -> ((s, dir) =>
      // production-width variant: same pigeonhole recall at numBands=4,
      // ~256x fewer random band collisions than 32-bit (16-bit band keys)
      Dedup.simhashPairs64(table(s, dir, "documents"), col("doc_id"), col("text"), 4, 3, 1000L)),
    "simhash_block_report" -> ((s, dir) =>
      // the simhash bucket cap's accounting companion (round 15 — the
      // linkage_block_report discipline): dedup_simhash64_pairs runs with
      // maxBucketSize=1000 ENABLED, so its drop accounting must be a
      // gate-verified query, not just a spec; zero drops on healthy data,
      // nonzero = the cap is changing answers
      Dedup.simhashBucketReport(table(s, dir, "documents"), col("doc_id"), col("text"),
        4, 1000L)),
    "ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(table(s, dir, "documents"), col("doc_id"), col("text"), 3,
        col("doc_id") < 50, 0.05)),
    "dedup_minhash_verified" -> ((s, dir) =>
      Dedup.minhashDedupVerified(table(s, dir, "documents"), col("doc_id"), col("text"),
        3, 16, 4, 0.5)),
    "dedup_components" -> ((s, dir) =>
      // the dedup DECISION: LSH-verified near-dup pairs -> connected
      // components -> keep component-min doc id, drop the rest
      Dedup.connectedComponents(
        Dedup.minhashDedupVerified(table(s, dir, "documents"), col("doc_id"), col("text"),
          3, 16, 4, 0.5),
        "doc_a", "doc_b")),
    "dedup_keep_best" -> ((s, dir) => {
      // quality-aware variant: the keeper is the component's best-quality
      // member, not its min id
      val d = table(s, dir, "documents")
      val comp = Dedup.connectedComponents(
        Dedup.minhashDedupVerified(d, col("doc_id"), col("text"), 3, 16, 4, 0.5),
        "doc_a", "doc_b")
      val q = d.select(col("doc_id"), graft.text.TextFeatures.qualityColumns(col("text")).last)
        .withColumnRenamed("quality_score", "qscore")
      Dedup.keepBestPerComponent(comp, q)
    }),
    "dedup_fuzzy_edit" -> ((s, dir) =>
      // fuzzy dedup: LSH candidates verified in character space (Levenshtein
      // similarity) — the verifier that catches small in-place edits
      Dedup.editSimilarityVerified(table(s, dir, "documents"), col("doc_id"), col("text"),
        3, 16, 4, 0.4)),
    "dedup_containment" -> ((s, dir) =>
      // the subset-duplication signal Jaccard misses: an excerpt quoted
      // inside a long doc has tiny Jaccard but containment ~1; candidates
      // from shared shingles (band candidacy would drop subset pairs)
      Dedup.ngramContainment(table(s, dir, "documents"), col("doc_id"), col("text"),
        3, col("doc_id") < 50, 0.5)),
    "dedup_incremental" -> ((s, dir) => {
      // the daily-ingest formulation: an incoming batch (doc_id % 7 == 0
      // stands in for today's sync) checked against the already-indexed
      // archive — the archive's band keys are persisted in production and
      // never recomputed
      val d = table(s, dir, "documents")
      Dedup.incrementalDedupVerified(
        d.filter(col("doc_id") % 7 === 0), d.filter(col("doc_id") % 7 =!= 0),
        col("doc_id"), col("text"), 3, 16, 4, 0.5)
    }),
    "minhash_jaccard_est" -> ((s, dir) =>
      // verification-free scale path: Jaccard estimated from signature
      // agreement alone — shingle sets never materialize past the sketch
      Dedup.minhashJaccardEstimate(table(s, dir, "documents"), col("doc_id"), col("text"),
        3, 16, 4)),
    "cross_source_leakage" -> ((s, dir) =>
      // which sources mirror each other: distinct verbatim 16-token spans
      // shared per source pair (span chunker shared with dup_span_stats)
      graft.curation.Curation.crossSourceLeakage(table(s, dir, "documents"),
        col("text"), col("source"), 16, 8)),
    "neardup_rate_report" -> ((s, dir) => {
      // corpus-health panel: which sources are internally duplicative —
      // fraction of each source's docs with at least one VERIFIED near-dup
      // partner anywhere in the corpus (the signal that decides whether a
      // source needs aggressive dedup before mixing)
      val d = table(s, dir, "documents")
      val pairs = Dedup.minhashDedupVerified(d, col("doc_id"), col("text"), 3, 16, 4, 0.5)
      val dupped = pairs
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()
        .withColumn("__dup", lit(true))
      val hit = sum(when(col("__dup"), 1L).otherwise(0L))
      d.select(col("doc_id"), col("source"))
        .join(dupped, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), hit.as("n_neardup"),
          r6(hit.cast("double") / count(lit(1)).cast("double")).as("neardup_rate"))
    }),
    "quality_filter" -> ((s, dir) =>
      // the curation DECISION: per-document keep/drop verdict with the first
      // failing Gopher-style rule as the reason; projected before the
      // groupBy so the fused expressions evaluate once per row
      table(s, dir, "documents")
        .select(graft.text.TextFeatures.filterDecision(col("text")).as("decision"))
        .groupBy(col("decision")).agg(count(lit(1)).as("n_docs"))),
    "repetition_stats" -> ((s, dir) => {
      // Gopher-style repetition quality signals, all row-local (zero
      // shuffle): fraction of a doc's n-gram shingles that are internal
      // repeats, and the share of tokens taken by the single most common
      // token
      val se = graft.functions.ShingleExpressions
      table(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("n_words"),
          size(se.distinctShingles(col("text"), 3)).cast("long").as("n_shingles_distinct"),
          se.topTokenCount(col("text")).as("__top"))
        .select(col("doc_id"), col("n_words"),
          greatest(col("n_words") - 2, lit(0L)).as("n_shingles_total"),
          col("n_shingles_distinct"), col("__top"))
        .select(col("doc_id"), col("n_words"), col("n_shingles_total"), col("n_shingles_distinct"),
          when(col("n_shingles_total") > 0,
            r6(lit(1.0) - col("n_shingles_distinct").cast("double")
              / col("n_shingles_total").cast("double"))).as("dup_shingle_frac"),
          r6(col("__top").cast("double") / col("n_words").cast("double")).as("top_token_frac"))
    }),
    "topk_ngrams" -> ((s, dir) =>
      // corpus-wide n-gram document frequency, top-k: map-side partial agg on
      // the exploded shingles, then TakeOrderedAndProject (no global sort
      // materialization); ties at the cut broken on the ngram itself
      table(s, dir, "documents")
        .select(explode(graft.functions.ShingleExpressions.distinctShingles(col("text"), 3)).as("ngram"))
        .groupBy(col("ngram")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("ngram").asc)
        .limit(20)),
    "topk_values_agg" -> ((s, dir) =>
      // exploded to (event_type, rank, value) rows — array columns break the
      // driver's pandas sort-hash; the heap agg itself is unchanged
      events(s, dir).groupBy(col("event_type"))
        .agg(graft.functions.TopKAgg.topK(col("value"), 5).as("__tv"))
        .select(col("event_type"), posexplode(col("__tv")).as(Seq("__pos", "value")))
        .select(col("event_type"), (col("__pos") + 1).as("rank"), col("value"))),
    "topk_values_sketch" -> ((s, dir) =>
      // bounded-state twin of topk_values_agg for unbounded value domains:
      // a Misra-Gries summary (capacity counters per partial buffer) makes
      // reduce state and shuffle volume capacity-bound instead of
      // distinct-value-bound. capacity 1024 >> the testdata vocabulary, so
      // the sketch is in its exact deterministic regime here and the
      // oracle is plain counting; the approximation regime is bounded in
      // HeavyHittersSpec
      table(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ", -1)).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"))
        .agg(graft.functions.HeavyHittersAgg.heavyHitters(col("tok"), 1024, 5).as("__hh"))
        .select(col("source"), posexplode(col("__hh")).as(Seq("__pos", "__e")))
        .select(col("source"), (col("__pos") + 1).cast("int").as("rank"),
          col("__e.value").as("token"), col("__e.cnt").as("cnt"))),
    "production_export" -> ((s, dir) => {
      // consent filter -> message column view -> stable export projection.
      // The withdrawn-user set is tiny (error events over a high threshold),
      // so a broadcast anti-join replaces the per-user window: both branches
      // stay shuffle-free, the event_type filters push down to the scan, and
      // the flag subtree is no longer executed once per consumer (the
      // identical broadcast exchange is reused across the two branches).
      val ev = events(s, dir)
      val withdrawn = ev
        .filter(col("event_type") === "error" && col("value") > 250.0)
        .select(col("user_id")).distinct()
      val facts = ev.filter(col("event_type") === "purchase")
        .join(broadcast(withdrawn), Seq("user_id"), "left_anti")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val demogs = ev.filter(col("event_type") === "signup")
        .join(broadcast(withdrawn), Seq("user_id"), "left_anti")
        .groupBy(col("user_id")).agg(count(lit(1)).as("signup_n"))
      ColumnView.messageView(facts, demogs, "user_id")
        .withColumn("signup_n", coalesce(col("signup_n"), lit(0L)))
        .select(col("event_id").as("message_id"), col("user_id").as("participant_uuid"),
          col("ts").as("timestamp"), col("value").as("message_value"), col("signup_n"))
    }),
    // the dataset sink (analysis_files.py's production/messages/participants
    // exports), driven END-TO-END as a query: the purchase export is
    // written to a scratch sink, read back with an explicit schema, counted
    // against the writer's own row metric, and summarized. The oracle
    // computes the identical summary straight from the source parquet — a
    // hash match proves the sink emitted every row and every value
    // faithfully through the round trip.
    //
    // Two hard-won disciplines (rounds 9-10 were red in the driver gate on
    // this row while green in every local replica):
    //  * the round trip is PARQUET, not text — footer-validated files, no
    //    parse layer whose failure mode is a plausible-but-wrong value
    //    (CSV fidelity is pinned separately by ExportFidelitySpec);
    //  * the query SELF-CHECKS: the source-side checksums ride the write's
    //    own Observation (computed during the write scan, no extra pass)
    //    and must equal the read-back summary field-for-field, else it
    //    THROWS — an environment that disturbs the scratch tree between
    //    write and read-back, or a value-mangling sink, surfaces as a
    //    loud, diagnosable error row in the gate instead of a silent hash
    //    mismatch.
    // The write runs at FIRST ACTION, not at DataFrame construction:
    // DeferredSummary moves the side effect into query execution, so
    // plan-only consumers (PlanAuditSpec, bench plan-hashing, .explain)
    // never trigger write jobs. Kernel + full design history (rounds 9-12
    // red-row forensics, the exact-decimal discipline, the round-13
    // zero-extra-pass Observation proof): [[datasetExportRows]].
    "dataset_export" -> ((s, dir) =>
      graft.plans.DeferredSummary.of(s, "dataset_export", datasetExportSchema)(
        () => datasetExportRows(s, dir))),
    // harness witness (SURVEY §2): a CONSTANT row bound through the
    // deferred-summary leaf and driven through the full driver gate
    // (Verify parquet dump -> DuckDB oracle -> value hash). Isolates the
    // leaf's row plumbing from every kernel semantics: if a deferred query
    // ever goes hash-red while this row is green, the vehicle is exonerated
    // and the kernel is the suspect (the r11 dataset_export triage, made a
    // permanent instrument).
    "deferred_leaf_witness" -> ((s, _) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("label", StringType),
        StructField("ratio", DoubleType)))
      graft.plans.DeferredSummary.of(s, "deferred_leaf_witness", schema) { () =>
        s.range(1)
          .select(lit(42L).as("k"), lit("deferred").as("label"),
            (lit(1.0) / lit(3.0)).as("ratio"))
          .queryExecution.executedPlan.executeCollect()
      }
    }),
    // the composed end-to-end analysis run (engagement_db_to_analysis.py:56-130):
    // every stage above, chained in the reference's order, with per-stage
    // (stage x dataset) accounting — order-sensitive where unit parity isn't
    "engagement_pipeline" -> ((s, dir) => {
      val ev = events(s, dir)
      val testDeny = ev.filter(col("event_type") === "error" && col("value") > 320.0)
        .select(col("user_id"))
      val withdrawn = ev.filter(col("event_type") === "error" && col("value") > 250.0)
        .select(col("user_id"))
      graft.analysis.EngagementPipeline.funnel(ev, "user_id", col("event_type"),
        col("ts"), "2024-01-08 00:00:00", "2024-01-21 00:00:00",
        testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", propsInt)
    }),
    // the same composed flow's terminal message export — row-level parity
    "engagement_export" -> ((s, dir) => {
      val ev = events(s, dir)
      val testDeny = ev.filter(col("event_type") === "error" && col("value") > 320.0)
        .select(col("user_id"))
      val withdrawn = ev.filter(col("event_type") === "error" && col("value") > 250.0)
        .select(col("user_id"))
      graft.analysis.EngagementPipeline.messagesExport(ev, "user_id", col("event_type"),
        col("ts"), "2024-01-08 00:00:00", "2024-01-21 00:00:00",
        testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", propsInt,
        col("event_id"), col("value"), "TRUE_MISSING")
    }),
    // the composed flow's participants view — folds codes under the
    // WS-CORRECTED dataset, witnessing that the column view composes after
    // relabelling
    "engagement_participants_export" -> ((s, dir) => {
      val ev = events(s, dir)
      val testDeny = ev.filter(col("event_type") === "error" && col("value") > 320.0)
        .select(col("user_id"))
      val withdrawn = ev.filter(col("event_type") === "error" && col("value") > 250.0)
        .select(col("user_id"))
      graft.analysis.EngagementPipeline.participantsExport(ev, "user_id",
        col("event_type"), col("ts"), "2024-01-08 00:00:00", "2024-01-21 00:00:00",
        testDeny, withdrawn, c => c.cast("int") >= 50, "ws_", propsInt,
        col("event_id"), col("value"), "TRUE_MISSING")
    }),
    // the typed-config layer driving the same flow: dataset grouping, RQA-only
    // time window, and the pivot columns all come from a PipelineConfig
    // (configuration.py's shapes), not hand-bound code
    "configured_pipeline_view" -> ((s, dir) => {
      import graft.config._
      val cfg = PipelineConfig(
        datasets = Seq(
          AnalysisDatasetConfig(Seq("purchase", "view"),
            DatasetType.ResearchQuestionAnswer, "activity_raw"),
          AnalysisDatasetConfig(Seq("click"),
            DatasetType.ResearchQuestionAnswer, "click_raw"),
          AnalysisDatasetConfig(Seq("signup"), DatasetType.Demographic, "age_raw",
            Seq(CodingConfig("age_category", Some(AgeCategoryConfig("age_raw",
              Seq((0, 17, "child"), (18, 35, "youth"),
                (36, 64, "adult"), (65, 120, "elder")))))))),
        projectStart = Some("2024-01-08 00:00:00"),
        projectEnd = Some("2024-01-21 00:00:00"))
      val testP = events(s, dir)
        .filter(col("event_type") === "error" && col("value") > 320.0)
        .select(col("user_id"))
      ConfiguredPipeline.run(events(s, dir), cfg, "user_id", col("event_type"),
        col("ts"), col("event_id"), col("props"), propsInt, testP)
    }),
    "langid" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select((col("doc_id") +: graft.text.TextFeatures.langIdColumns(col("text"))): _*)
    }),
    "langid_profiled" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select((col("doc_id") +: graft.text.TextFeatures.langIdProfiled(
        col("text"), graft.text.TextFeatures.defaultProfiles)): _*)
    }),
    "krippendorff_alpha" -> ((s, dir) => {
      // annotation reliability across the THREE labelers (declared +
      // both heuristics): kappa's multi-coder generalization, in its
      // exact-integer common-m form (one IEEE division at the end)
      val v = threeLabelerVotes(s, dir)
      val votes = v.select(col("doc_id"),
        explode(array(col("vote_a"), col("vote_b"), col("vote_c"))).as("vote"))
      graft.analysis.Eval.krippendorffAlpha(votes, col("doc_id"), col("vote"))
    }),
    "langid_confusion" -> ((s, dir) => {
      // error analysis for the labeler: gold x predicted counts (the
      // matrix classifier_eval's per-class P/R/F1 summarizes away)
      val d = table(s, dir, "documents")
      d.select(col("doc_id"), col("lang").as("gold"),
          graft.text.TextFeatures.langIdColumns(col("text")).last.as("predicted"))
        .filter(col("gold").isNotNull && col("predicted").isNotNull)
        .groupBy(col("gold"), col("predicted"))
        .agg(count(lit(1)).as("n"))
    }),
    "label_consensus" -> ((s, dir) => {
      // ensemble labeling (the Snorkel-style vote): declared lang + two
      // heuristic labelers; a 2-of-3 agreement overrides the declared
      // label, all-distinct keeps it (the declared voter is the prior).
      // ONE row-local scan; the report is label-cardinality
      threeLabelerVotes(s, dir)
        .select((col("doc_id") +: graft.text.TextFeatures.consensusVote(
          col("vote_a"), col("vote_b"), col("vote_c"))): _*)
        .groupBy(col("consensus"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_agree") === 3, 1L).otherwise(0L)).as("n_unanimous"),
          sum(when(col("n_agree") === 2, 1L).otherwise(0L)).as("n_majority"),
          sum(when(col("n_agree") === 1, 1L).otherwise(0L)).as("n_disputed"))
    }),
    "quality_unpivot" -> ((s, dir) => {
      // long-form quality metrics (dashboard/melt shape) via the native
      // unpivot operator — one scan, Expand-style row fan-out, no joins
      val d = table(s, dir, "documents")
      val q = d.select((col("doc_id") +: graft.text.TextFeatures.qualityColumns(col("text"))): _*)
      val metrics = q.columns.filterNot(_ == "doc_id")
      q.select(col("doc_id") +: metrics.toIndexedSeq.map(m => col(m).cast("double").as(m)): _*)
        .unpivot(Array(col("doc_id")), metrics.map(col), "metric", "value")
    }),
    "classifier_eval" -> ((s, dir) => {
      // close the langid loop: per-class precision/recall/F1 against the
      // corpus's gold lang column (classes = gold ∪ predicted)
      val d = table(s, dir, "documents")
      val pred = d.select(col("lang"),
        graft.text.TextFeatures.langIdColumns(col("text")).last.as("predicted_lang"))
      graft.analysis.Eval.classifierReport(pred, col("lang"), col("predicted_lang"))
    }),
    "quality_score" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select((col("doc_id") +: graft.text.TextFeatures.qualityColumns(col("text"))): _*)
    }),
    "lm_bigram_score" -> ((s, dir) =>
      graft.text.LangModel.bigramScore(table(s, dir, "documents"),
        col("doc_id"), col("text"))),
    "ccnet_buckets" -> ((s, dir) => {
      // CCNet-style head/middle/tail: every doc bucketed by its source's
      // OWN perplexity distribution (per-slice calibration)
      val d = table(s, dir, "documents")
      val scored = graft.text.LangModel.bigramScore(d, col("doc_id"), col("text"))
        .join(d.select(col("doc_id"), col("source")), "doc_id")
      graft.text.LangModel.perplexityBuckets(scored,
        col("doc_id"), col("source"), col("lm_nll"))
    }),
    "token_budget_fill" -> ((s, dir) =>
      // fill each source's token budget with its best documents; docs past
      // the cut are reported kept=false, so the accounting is auditable
      graft.curation.Curation.budgetFill(table(s, dir, "documents"),
        col("doc_id"), col("source"), size(split(col("text"), " ", -1)),
        graft.text.TextFeatures.qualityColumns(col("text")).last, 600L)),
    "lm_trigram_score" -> ((s, dir) =>
      graft.text.LangModel.ngramScore(table(s, dir, "documents"),
        col("doc_id"), col("text"), 3)),
    "token_count" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws"),
        graft.functions.TokenCount.tokenCount(col("text")).as("n_tok"),
        graft.text.TextFeatures.regexTokenCount(col("text")).as("n_re"))),
    "weighted_median" -> ((s, dir) =>
      // token-mass median doc length per source: where the budget's
      // median token lives, not the median document (mass vs membership)
      graft.analysis.Stats.weightedMedian(table(s, dir, "documents"),
        col("source"), col("n_chars"),
        graft.functions.TokenCount.tokenCount(col("text")))),
    "tokenizer_fertility" -> ((s, dir) =>
      // tokenizer-efficiency read-out per language: tokens-per-word says
      // which slices burn sequence budget (one map-side pass, exact-long
      // sums, one IEEE division per lang row)
      table(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_words"),
          sum(graft.functions.TokenCount.tokenCount(col("text"))).as("n_tokens"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
          r6(col("n_tokens").cast("double") / col("n_words").cast("double"))
            .as("fertility"))),
    "ann_topk" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      Knn.bruteForceTopK(e.filter(col("id") < 8), e, 10)
    }),
    "ann_rank_eval" -> ((s, dir) => {
      // ranking-quality read-out of the retrieval surface: NDCG@10 /
      // precision@10 / MRR per query against label-match relevance
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      graft.similarity.RankEval.labelMatchEval(
        Knn.bruteForceTopK(e.filter(col("id") < 8), e, 10),
        table(s, dir, "embeddings").select(col("vec_id").as("id"), col("label")), 10)
    }),
    "ann_pq_refined" -> ((s, dir) => {
      // product-quantization two-stage search in its exact regime: the ADC
      // shortlist covers the whole corpus, so the refined re-rank provably
      // equals brute force (PqSpec pins the invariant; the approximate
      // shortlist/IVF-PQ regimes are property-tested there). Exercises the
      // full train -> encode -> ADC-table -> fused-kernel -> re-rank path
      // against the same oracle as ann_topk.
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      // codebook training is sample-bounded (256 vectors per centroid):
      // Lloyd passes run over <= 4096 rows however large the corpus, so
      // train cost is CONSTANT in corpus size — only encode (one
      // row-local pass) and search scale with the data. Sound here
      // because the exact-regime output is codebook-independent (the
      // corpus-wide shortlist is re-ranked exactly), and the right
      // discipline in the approximate regime too (quantizer quality
      // saturates long before the sample does). TakeOrdered keeps the
      // sample deterministic without a full sort.
      val sample = e.orderBy(col("id").asc).limit(4096)
      val cb = graft.similarity.Pq.train(sample, m = 8, dim = 64, ksub = 16, iters = 2)
      val codes = graft.similarity.Pq.encode(e, cb, m = 8, dim = 64)
      // shortlist must cover the corpus at ANY scale factor for the
      // exact-regime contract (sf0.1 has 10x the embeddings of sf0.01).
      // Corpus size from the parquet-footer catalog statistic (cached,
      // driver-side — the hard_negatives_dispatch discipline) instead of a
      // count() job per construction: same number, one less Spark job in
      // every timed rep.
      graft.similarity.Pq.refinedTopK(e.filter(col("id") < 8), e, codes, cb,
        k = 10, shortlist = GraftSession.rowCount(s, dir, "embeddings").toInt - 1,
        m = 8, dim = 64)
    }),
    "ann_lsh_multiprobe" -> ((s, dir) => {
      // own bucket + every one-bit flip probed: the recall fix for
      // sign-LSH's hard bucket boundaries
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      Knn.lshMultiProbeTopK(e.filter(col("id") < 8), e, 10, 8, 64)
    }),
    "ann_recall_report" -> ((s, dir) => {
      // the index-tuning loop: recall@10 of sign-LSH vs the exact top-k,
      // per query — both sides are the bound ann_topk / ann_lsh_topk runs
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      Knn.recallAtK(
        Knn.bruteForceTopK(e.filter(col("id") < 8), e, 10),
        Knn.lshTopK(e.filter(col("id") < 8), e, 10, 8, 64))
    }),
    "ann_lsh_topk" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      Knn.lshTopK(e.filter(col("id") < 8), e, 10, 8, 64)
    }),
    "ann_ivf_topk" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      Knn.ivfTopK(e.filter(col("id") >= 8 && col("id") < 16), e, e.filter(col("id") < 8), 5)
    }),
    "ann_ivf_multiprobe" -> ((s, dir) => {
      // nprobe=3: same quantizer, 3 nearest cells searched per query
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      Knn.ivfTopKProbes(e.filter(col("id") >= 8 && col("id") < 16), e,
        e.filter(col("id") < 8), 5, 3)
    }),
    "hard_negatives" -> ((s, dir) => {
      // training-pair mining: per anchor, the most-similar vectors that are
      // NOT near-dups (those would be false negatives); anchors share the
      // embedding_neardup query set so its τ=0.25 near-dup tier exists
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      Knn.hardNegativeTopK(e.filter(col("id") % 50 === 0), e, 5, 0.25)
    }),
    "hard_negatives_lsh" -> ((s, dir) => {
      // the corpus-scale mining path: same anchors/threshold, candidates
      // from multi-probe LSH buckets instead of the full cross product
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      Knn.hardNegativeTopKLsh(e.filter(col("id") % 50 === 0), e, 5, 0.25, 8, 64)
    }),
    "hard_negatives_dispatch" -> ((s, dir) => {
      // the PRODUCTION mining entry point (round 15): Knn.hardNegatives
      // dispatches on the CATALOG row count (parquet-footer statistic,
      // read driver-side — construction stays job-free). At the gate SFs
      // (500-2000 vectors, <= the 100k exact bound) the dispatcher picks
      // the exact verification reference, so this row is oracle-gated
      // against the exact SQL; at the 100x replica (200k vectors) it
      // provably flips to the LSH path — the sf10 sweep verifies THAT
      // side against the hard_negatives_lsh oracle
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      Knn.hardNegatives(e.filter(col("id") % 50 === 0), e, 5, 0.25, 8, 64,
        corpusVectors = GraftSession.rowCount(s, dir, "embeddings"))
    }),
    "embedding_neardup" -> ((s, dir) =>
      Knn.nearDupPairs(table(s, dir, "embeddings"), col("vec_id"), col("embedding"),
        col("label"), col("id") % 50 === 0, 0.25)),
    "embedding_dim_stats" -> ((s, dir) =>
      // whitening-prep per-dimension stats; exact decimal sums keep the
      // reduction order-independent (float corpus, deterministic result)
      Knn.dimStats(table(s, dir, "embeddings"), col("embedding"))),
    "embedding_covariance" -> ((s, dir) =>
      // full second-moment table in ONE pass at bounded state (no d²
      // fan-out, no self-join) — the PCA/whitening input
      graft.analysis.Pca.covariance(table(s, dir, "embeddings"),
        col("embedding"), 64)),
    "multimodal_decode" -> ((s, dir) =>
      graft.multimodal.Media.decodeDocuments(s, table(s, dir, "documents"))),
    "multimodal_frames" -> ((s, dir) =>
      graft.multimodal.Media.frameStatsDocuments(s, table(s, dir, "documents"), 32, 3)),
    "multimodal_features" -> ((s, dir) =>
      graft.multimodal.Media.featuresDocuments(s, table(s, dir, "documents"), 8)),
    "multimodal_resize" -> ((s, dir) =>
      graft.multimodal.Media.resizeDocuments(s, table(s, dir, "documents"), 64, 64)),
    "decontaminate" -> ((s, dir) => {
      // benchmark decontamination: every 50th doc plays the eval set; the
      // rest is the training corpus checked for shared trigrams
      val d = table(s, dir, "documents")
      graft.curation.Curation.decontaminate(
        d.filter(col("doc_id") % 50 =!= 0), d.filter(col("doc_id") % 50 === 0),
        col("doc_id"), col("text"), 3)
    }),
    "decontaminate_surgical" -> ((s, dir) => {
      // excise benchmark lines, keep the rest of each doc (same eval-set
      // split as `decontaminate`; width-8 word lines as in line_dedup)
      val d = table(s, dir, "documents")
      val C = graft.curation.Curation
      C.decontaminateSurgical(
        d.filter(col("doc_id") % 50 =!= 0), col("doc_id"), C.wordLines(col("text"), 8),
        d.filter(col("doc_id") % 50 === 0), C.wordLines(col("text"), 8))
    }),
    "line_dedup" -> ((s, dir) =>
      // corpus "lines" derived deterministically by chunking words in
      // groups of 8 (the testdata has no newlines); the operator itself is
      // generic over any array-of-lines column
      graft.curation.Curation.lineDedup(table(s, dir, "documents"), col("doc_id"),
        graft.curation.Curation.wordLines(col("text"), 8))),
    "pii_scan_report" -> ((s, dir) => {
      // export-safety audit per source: how much PII would ship (the
      // decision input BEFORE pii_redact runs); every third doc gets the
      // deterministic injection so rates are non-trivial
      val d = table(s, dir, "documents")
      val withPii = when(col("doc_id") % 3 === 0, concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example or call +2547"),
        lpad((col("doc_id") % 1000000).cast("string"), 6, "0")))
        .otherwise(col("text"))
      val cols = graft.text.Redact.piiColumns(withPii)
      d.select(col("source"), cols(0), cols(1), cols(2))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_urls") + col("n_emails") + col("n_phones") > 0, 1L)
            .otherwise(0L)).as("n_docs_with_pii"),
          sum(col("n_urls")).as("n_urls"),
          sum(col("n_emails")).as("n_emails"),
          sum(col("n_phones")).as("n_phones"))
        .withColumn("pii_rate",
          r6(col("n_docs_with_pii").cast("double") / col("n_docs").cast("double")))
    }),
    "pii_redact" -> ((s, dir) => {
      // deterministic PII injection (the word-soup corpus has none), so the
      // oracle exercises real masking: one URL, one email, one phone per doc
      val d = table(s, dir, "documents")
      val withPii = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example see https://ex.ample/d/"), col("doc_id").cast("string"),
        lit(" tel +2547"), lpad(pmod(col("doc_id"), lit(1000000)).cast("string"), 6, "0"))
      d.select((col("doc_id") +: graft.text.Redact.piiColumns(withPii)): _*)
    }),
    "semdedup" -> ((s, dir) => {
      // semantic dedup: nearest-centroid clusters (same quantizer contract
      // as ann_ivf_topk), drop any vector with a >= 0.3-cosine neighbor of
      // smaller id in its cluster
      val e = table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Knn.toDoubleArray(col("embedding")).as("vec"))
      Knn.semDedup(e, e.filter(col("id") < 8), 0.3)
    }),
    "seq_packing" -> ((s, dir) => {
      val C = graft.curation.Curation
      C.packStats(table(s, dir, "documents"), col("doc_id"),
        graft.functions.TokenCount.tokenCount(col("text")),
        C.hashShard(col("doc_id"), 8), 512)
    }),
    "data_mixture" -> ((s, dir) =>
      graft.curation.Curation.mixtureStats(table(s, dir, "documents"),
        col("doc_id"), col("lang"),
        Map("en" -> 100, "fr" -> 50, "es" -> 25, "de" -> 10, "zh" -> 75))),
    "mixture_temperature" -> ((s, dir) =>
      // temperature-sampled mixing at alpha=0.5: rates DERIVED from the
      // corpus's own language shares (heads downsampled toward the
      // flattened mixture), decided by the same portable md5 coin
      graft.curation.Curation.temperatureMixtureStats(table(s, dir, "documents"),
        col("doc_id"), col("lang"), 0.5)),
    "training_pipeline" -> ((s, dir) => {
      // the COMPOSED pretraining-curation run: langid -> quality -> exact
      // dedup -> decontamination (vs the doc_id%50 eval split) -> mixture,
      // with per-stage doc/token accounting
      val d = table(s, dir, "documents")
      // no "zh" weight: the langid stage has no zh profile, so zh docs die
      // at stage 1 and a zh entry would be dead configuration
      graft.curation.Curation.trainingPipeline(
        d.filter(col("doc_id") % 50 =!= 0), d.filter(col("doc_id") % 50 === 0),
        col("doc_id"), col("text"), col("lang"), col("lang"),
        Map("en" -> 100, "fr" -> 50, "es" -> 25, "de" -> 10))
    }),
    "training_export" -> ((s, dir) => {
      // the corpus the funnel's terminal stage counts, in export shape
      val d = table(s, dir, "documents")
      graft.curation.Curation.trainingSurvivors(
        d.filter(col("doc_id") % 50 =!= 0), d.filter(col("doc_id") % 50 === 0),
        col("doc_id"), col("text"), col("lang"), col("lang"),
        Map("en" -> 100, "fr" -> 50, "es" -> 25, "de" -> 10))
    }),
    "training_incremental" -> ((s, dir) => {
      // the always-on shape: odd doc_ids play today's batch, the even
      // non-benchmark texts' digests play the persisted archive index
      val d = table(s, dir, "documents")
      val archive = d
        .filter(col("doc_id") % 2 === 0 && col("doc_id") % 50 =!= 0)
        .select(md5(col("text")).as("digest"))
      graft.curation.Curation.trainingIngest(
        d.filter(col("doc_id") % 2 === 1), archive,
        d.filter(col("doc_id") % 50 === 0),
        col("doc_id"), col("text"), col("lang"), col("lang"),
        Map("en" -> 100, "fr" -> 50, "es" -> 25, "de" -> 10))
    }),
    "dataset_split" -> ((s, dir) =>
      // 90/5/5 hash split: membership is a pure function of doc_id
      graft.curation.Curation.datasetSplit(table(s, dir, "documents"),
        col("doc_id"), 90, 5)),
    "shuffle_order" -> ((s, dir) =>
      // epoch-salted deterministic training order over 8 shards
      graft.curation.Curation.shuffleOrder(table(s, dir, "documents"),
        col("doc_id"), "epoch0", 8)),
    "cv_folds" -> ((s, dir) => {
      // deterministic 5-fold assignment + the stratification-balance
      // report (per-fold label shares — the check that a fold didn't
      // starve a language)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fold"))
      table(s, dir, "documents")
        .select(graft.curation.Curation.cvFold(col("doc_id"), 5).as("fold"),
          col("lang"))
        .groupBy(col("fold"), col("lang")).agg(count(lit(1)).as("n"))
        .withColumn("fold_total", sum(col("n")).over(w))
        .withColumn("share",
          r6(col("n").cast("double") / col("fold_total").cast("double")))
    }),
    "sample_stratified" -> ((s, dir) =>
      // exactly-10-per-source deterministic sample (bounded bottom-k by
      // salted digest — the eval-set / human-review picker)
      graft.curation.Curation.stratifiedSample(table(s, dir, "documents"),
        col("source"), col("doc_id"), 10, "sample")
        .withColumnRenamed("stratum", "source")
        .withColumnRenamed("id", "doc_id")),
    "contamination_score" -> ((s, dir) => {
      // scored decontamination: same eval split and trigram contract as
      // `decontaminate`, fraction instead of verdict
      val d = table(s, dir, "documents")
      graft.curation.Curation.contaminationScore(
        d.filter(col("doc_id") % 50 =!= 0), d.filter(col("doc_id") % 50 === 0),
        col("doc_id"), col("text"), 3)
    }),
    "corpus_report" -> ((s, dir) =>
      // the dataset card: per-source doc/token counts, quality keep rate,
      // language spread — one pass, one map-side-combinable aggregation
      table(s, dir, "documents")
        .select(col("source"), col("lang"),
          graft.functions.TokenCount.tokenCount(col("text")).as("n_tok"),
          (graft.text.TextFeatures.filterDecision(col("text")) === "kept").as("kept"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          countDistinct(col("lang")).as("n_langs"))
        .withColumn("keep_rate",
          r6(col("n_kept").cast("double") / col("n_docs").cast("double")))),
    "corpus_report_cube" -> ((s, dir) =>
      // the dataset card's multi-dimensional rollup: every (source, lang)
      // slice plus both 1-D margins and the grand total in ONE pass —
      // Spark's Expand feeds 4 grouping sets into a single partial agg,
      // so the cube costs one corpus scan, not four report jobs
      table(s, dir, "documents")
        .select(col("source"), col("lang"),
          graft.functions.TokenCount.tokenCount(col("text")).as("n_tok"))
        .cube(col("source"), col("lang"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .select(col("source"), col("lang"), col("gid"), col("n_docs"), col("n_tokens"))),
    "vocab_build" -> ((s, dir) =>
      // 24 < the corpus's 31 distinct tokens, so OOV is a real case here
      graft.text.Vocab.build(table(s, dir, "documents"), col("text"), 24)),
    "encode_docs" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      graft.text.Vocab.encode(d, col("doc_id"), col("text"),
        graft.text.Vocab.build(d, col("text"), 24))
    }),
    "bpe_pair_counts" -> ((s, dir) =>
      // first-iteration BPE merge statistics (freq-weighted adjacent char
      // pairs over the word-type table); topWords never binds on the
      // word-soup corpus (31 types), so the oracle needs no LIMIT clause
      graft.text.Bpe.initialPairCounts(
        graft.text.Bpe.wordFreqs(table(s, dir, "documents"), col("text"), 100000))),
    "bpe_merges" -> ((s, dir) => {
      // the trained merge table; the iterative argmax loop has no SQL
      // form, so this row is rows-only at the driver (BpeSpec carries the
      // semantic verification against hand-computed merges)
      val d = table(s, dir, "documents")
      graft.text.Bpe.mergesDf(s, graft.text.Bpe.train(d, col("text"), 40, 100000))
    }),
    "bpe_encode_stats" -> ((s, dir) => {
      // per-doc subword compression under the trained merges (rows-only at
      // the driver; BpeSpec proves encode replays train on every word type)
      val d = table(s, dir, "documents")
      graft.text.Bpe.encodeStats(d, col("doc_id"), col("text"),
        graft.text.Bpe.train(d, col("text"), 40, 100000))
    }),
    "chunk_docs" -> ((s, dir) =>
      // 32-word chunks every 24 words: consecutive chunks overlap by 8
      graft.curation.Curation.chunkDocs(table(s, dir, "documents"),
        col("doc_id"), col("text"), 32, 24)),
    "tfidf_topterms" -> ((s, dir) =>
      graft.text.Vocab.tfidfTopTerms(table(s, dir, "documents"),
        col("doc_id"), col("text"), 3)),
    "bm25_topk" -> ((s, dir) =>
      // lexical retrieval against the corpus's 8 highest-df terms (the
      // deterministic probe query): tf saturation + length normalization,
      // broadcast query terms, decimal-summed rounded parts
      graft.text.Bm25.topDocs(table(s, dir, "documents"),
        col("doc_id"), col("text"), 8, 20)),
    "curation_export_fuzzy" -> ((s, dir) => {
      // the dataset the fuzzy funnel's terminal stage counts (shared stage
      // builder — report and export cannot disagree)
      val d = table(s, dir, "documents")
      val pairs = Dedup.minhashDedupVerified(d, col("doc_id"), col("text"), 3, 16, 4, 0.5)
      graft.curation.Curation.fuzzyCurationExport(d, col("doc_id"), col("text"),
        col("lang"), pairs,
        graft.text.TextFeatures.qualityColumns(col("text")).last,
        Map("en" -> 100, "fr" -> 50, "es" -> 25, "de" -> 10, "zh" -> 75))
    }),
    "dup_span_stats" -> ((s, dir) =>
      // 16-token spans every 8: the exact-substring duplication signal
      graft.curation.Curation.dupSpanStats(table(s, dir, "documents"),
        col("doc_id"), col("text"), 16, 8)),
    "dedup_span_rewrite" -> ((s, dir) =>
      // the remove step: every 16-token chunk survives only at its first
      // corpus-wide occurrence, documents reassembled from the survivors
      graft.curation.Curation.spanDedupRewrite(table(s, dir, "documents"),
        col("doc_id"), col("text"), 16)),
    "dedup_prefix_filter" -> ((s, dir) =>
      // exact J >= 0.4 pairs, zero false negatives: prefix-filter candidate
      // generation (rarest-first), candidate-confined verification; the
      // brute-force oracle equality IS the completeness proof
      graft.dedup.Dedup.prefixFilterJoin(table(s, dir, "documents"),
        col("doc_id"), col("text"), 3, 0.4)),
    "token_entropy" -> ((s, dir) =>
      // information-theoretic repetition signal (nats per token draw)
      graft.text.Vocab.tokenEntropy(table(s, dir, "documents"),
        col("doc_id"), col("text"))),
    "key_skew_report" -> ((s, dir) =>
      // the pre-flight shuffle-key diagnosis: cardinality, hottest key,
      // Herfindahl concentration of the candidate partitioning key
      graft.analysis.Eval.keySkewReport(events(s, dir), col("user_id"))),
    "chi2_independence" -> ((s, dir) =>
      // is corpus language independent of source? the crosstab dependence
      // test behind every demographic-by-theme table in the reference
      graft.analysis.Stats.chiSquareIndependence(table(s, dir, "documents"),
        col("lang"), col("source"))),
    "mutual_information" -> ((s, dir) =>
      // the same dependence measured in nats, with marginal entropies and
      // the sqrt-normalized coefficient
      graft.analysis.Stats.mutualInformation(table(s, dir, "documents"),
        col("lang"), col("source"))),
    "zscore_outliers" -> ((s, dir) =>
      // per-event-type anomaly sweep: rows >= 3 sample stddevs from their
      // group mean, with exact DECIMAL moments
      graft.analysis.Stats.zscoreOutliers(events(s, dir), col("event_type"),
        col("event_id"), col("value"), 3.0)),
    "gini_concentration" -> ((s, dir) =>
      // per-source inequality of document length: is a source's token mass
      // a few giant documents or an even spread?
      graft.analysis.Stats.giniConcentration(table(s, dir, "documents"),
        col("source"), col("doc_id"), col("n_chars").cast("double"))),
    "rfm_segments" -> ((s, dir) =>
      // recency/frequency/monetary quintile segmentation of the user base
      // (monetary = purchase events), rolled up per segment cell
      graft.analysis.Stats.rfmSegments(events(s, dir), col("user_id"),
        col("ts"), col("value"), col("event_type") === "purchase")),
    "rfm_segments_dist" -> ((s, dir) =>
      // the same segmentation via three distributed two-phase ranks —
      // no single-partition ntile window anywhere in the plan
      graft.analysis.Stats.rfmSegmentsDist(events(s, dir), col("user_id"),
        col("ts"), col("value"), col("event_type") === "purchase")),
    "scd2_intervals" -> ((s, dir) =>
      // type-2 dimension build from the event change feed: per-user state
      // validity intervals with consecutive-duplicate collapse
      Snapshots.scd2(events(s, dir), col("user_id"), col("ts"),
        col("event_type"), col("event_id"))),
    "bigram_pmi" -> ((s, dir) =>
      // collocation mining: top adjacent-token pairs by pointwise mutual
      // information (phrase-promotion signal for a tokenizer step)
      graft.text.Vocab.bigramPmi(table(s, dir, "documents"), col("text"), 5L, 50)),
    "record_linkage_jw" -> ((s, dir) =>
      // fuzzy entity matching: 16-char-prefix block UNIONED with the
      // sorted-token block (word-order variants reachable), native
      // Jaro-Winkler verify over the 64-char probe, rounded-then-
      // thresholded at 0.9; hot blocks past 1000 members dropped per pass
      // (explicit cap — linkage_block_report is the drop accounting)
      Dedup.jaroWinklerLinkage(table(s, dir, "documents"),
        col("doc_id"), col("text"), 16, 64, 0.9, maxBlock = 1000)),
    "record_linkage_dl" -> ((s, dir) =>
      // transposition-aware edit linkage on the same two-pass blocks as
      // the JW verifier (typo-heavy-source contract); integer threshold.
      // r15: verification is the threshold-BOUNDED banded DP (exact at
      // dl <= 8, early-abandons the rest) behind a recall-free
      // |len_a-len_b| <= 8 candidate gate — same rows, ~k/probeLen of
      // the per-pair DP work
      Dedup.damerauLinkage(table(s, dir, "documents"),
        col("doc_id"), col("text"), 16, 64, 8, maxBlock = 1000)),
    "linkage_block_report" -> ((s, dir) =>
      // the linkage cap's observability companion: per blocking pass,
      // how many blocks/rows the maxBlock occupancy guard drops (zero on
      // healthy data — nonzero means the cap is CHANGING ANSWERS and the
      // corpus needs a boilerplate look)
      Dedup.linkageBlockReport(table(s, dir, "documents"),
        col("doc_id"), col("text"), 16, 64, 1000)),
    "markov_transitions" -> ((s, dir) =>
      // per-user next-step transition matrix (row-normalized) — the
      // model-ready sibling of event_paths
      graft.analysis.Stats.markovTransitions(events(s, dir), col("user_id"),
        col("ts"), col("event_id"), col("event_type"))),
    "kaplan_meier" -> ((s, dir) =>
      // retention curve: per-user lifetime days, churn = >1d silent
      // before the corpus horizon (the feed spans one month), log-space
      // survival accumulation
      graft.analysis.Stats.kaplanMeier(events(s, dir), col("user_id"),
        col("ts"), 1)),
    "ab_test_zscore" -> ((s, dir) =>
      // experiment read-out: user_id parity as the arm, any-purchase as
      // the conversion, pooled two-proportion z
      graft.analysis.Stats.abTestZscore(events(s, dir), col("user_id"),
        col("user_id") % 2 === 0, col("event_type") === "purchase")),
    "benford_digits" -> ((s, dir) =>
      // data-quality tripwire: leading-digit distribution of the value
      // feed vs Benford's law, with the chi-square distance
      graft.analysis.Stats.benfordTest(events(s, dir), col("value"))),
    "ewma_smooth" -> ((s, dir) =>
      // recursive exponential smoother per user (alpha = 0.25,
      // binary-exact); typed secondary-sort fold, recursive-CTE oracle
      graft.operators.Ewma.smooth(events(s, dir), col("user_id"), col("ts"),
        col("event_id"), col("value"), 0.25)),
    "cusum_drift" -> ((s, dir) =>
      // Page's sequential change-point test per user: fires on a
      // SUSTAINED value shift (k = 150 reference, h = 500 decision)
      graft.operators.Ewma.cusum(events(s, dir), col("user_id"), col("ts"),
        col("event_id"), col("value"), 150.0, 500.0)),
    "holt_linear" -> ((s, dir) =>
      // trend-aware smoother: level + trend state per user, one-step
      // forecast out (alpha = 0.5, beta = 0.25, binary-exact)
      graft.operators.Ewma.holtLinear(events(s, dir), col("user_id"),
        col("ts"), col("event_id"), col("value"), 0.5, 0.25)),
    "forecast_accuracy" -> ((s, dir) => {
      // close the forecasting loop: backtest the one-step Holt forecast
      // against what actually arrived (err_t = value_t − forecast_{t−1});
      // MAE says how wrong, signed bias says which way
      def q6d(c: Column) =
        (floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).cast("decimal(28,6)")
      holtBacktestErrors(s, dir)
        .agg(count(lit(1)).as("n_evals"),
          r6(sum(q6d(abs(col("__err")))).cast("double")
            / count(lit(1)).cast("double")).as("mae"),
          r6(sum(q6d(col("__err"))).cast("double")
            / count(lit(1)).cast("double")).as("bias"))
    }),
    "forecast_interval" -> ((s, dir) => {
      // conformal-lite: the 90th-percentile absolute backtest residual is
      // the one-step prediction interval's half-width, and the realized
      // coverage at that width is reported alongside (the calibration
      // check an interval ships with)
      // q90 is 6dp-quantized before the coverage compare (the winsorize/
      // psi knife-edge discipline): a raw interpolated quantile differs by
      // an ulp across engines and flips `abs(err) <= q90` for residuals
      // sitting exactly at the interval edge
      val evals = holtBacktestErrors(s, dir)
      val q = broadcast(evals.agg(
        r6(expr("percentile(abs(__err), 0.9D)")).as("__q90")))
      evals.crossJoin(q)
        .agg(count(lit(1)).as("n_evals"),
          r6(max(col("__q90"))).as("q90_abs_err"),
          r6(sum(when(abs(col("__err")) <= col("__q90"), 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double")).as("coverage"))
    }),
    "mad_outliers" -> ((s, dir) =>
      // robust outlier sweep: median/MAD scoring at 3.5 MADs (the
      // heavy-tail-safe sibling of zscore_outliers)
      graft.analysis.Stats.madOutliers(events(s, dir), col("event_type"),
        col("event_id"), col("value"), 3.5)),
    "conversion_lag" -> ((s, dir) =>
      // funnel latency: first-signup -> first-purchase lag in hour
      // buckets, capped at one week
      graft.analysis.Stats.conversionLag(events(s, dir), col("user_id"),
        col("ts"), col("event_type") === "signup",
        col("event_type") === "purchase", 168)),
    "traffic_anomalies" -> ((s, dir) =>
      // silent-pipeline tripwire: gap-filled hourly series per type,
      // z-scored on exact integer moments (zero hours ARE observations)
      graft.analysis.Stats.trafficAnomalies(events(s, dir), col("ts"),
        col("event_type"), 3.0)),
    "acf_hourly" -> ((s, dir) =>
      // seasonality detector: hourly-series autocorrelation per stream
      // (daily cycle = the lag-24 peak)
      graft.analysis.Stats.acfHourly(events(s, dir), col("ts"),
        col("event_type"), Seq(1, 2, 3, 6, 12, 24))),
    "hourly_percentiles" -> ((s, dir) =>
      // the p50/p95-by-hour-of-day dashboard row: tail behavior by time
      // of day per stream (a p95 that doubles at night is a batch job,
      // not users) — exact percentiles at bounded group cardinality
      events(s, dir)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"), hour(col("ts")).as("hour_of_day"))
        .agg(count(lit(1)).as("n"),
          r6(expr("percentile(value, 0.5D)")).as("p50"),
          r6(expr("percentile(value, 0.95D)")).as("p95"))),
    "seasonal_anomalies" -> ((s, dir) =>
      // the daily-cycle-aware tripwire: z vs the (stream, hour-of-day)
      // profile, not the global mean (quiet nights stop being "anomalies")
      graft.analysis.Stats.seasonalAnomalies(events(s, dir), col("ts"),
        col("event_type"), 3.0)),
    "ab_test_power" -> ((s, dir) =>
      // how long must the experiment run: required per-arm n to detect
      // the observed effect at alpha 0.05 / 80% power
      graft.analysis.Stats.abTestPower(events(s, dir), col("user_id"),
        col("user_id") % 2 === 0, col("event_type") === "purchase")),
    "configured_curation_export" -> ((s, dir) =>
      // the declarative entry point: near-dup keep-best + mixture + split
      // + shards from ONE config object (ConfiguredCuration interpreter)
      graft.config.ConfiguredCuration.export(table(s, dir, "documents"),
        col("doc_id"), col("text"), col("lang"),
        graft.config.CurationConfig(
          dedup = graft.config.NearDupKeepBest(3, 16, 4, 0.5),
          mixtureWeights = Map("en" -> 100, "fr" -> 50, "es" -> 25,
            "de" -> 10, "zh" -> 75),
          split = Some((90, 5)), shuffleShards = Some(8)))),
    "column_profile" -> ((s, dir) =>
      // the ingest's first look: per-column nulls + exact distincts in
      // one pass (pairs with key_skew_report and schemaDiff)
      graft.analysis.Stats.columnProfile(events(s, dir),
        Seq("event_id", "ts", "user_id", "event_type", "value", "props"))),
    "join_cardinality" -> ((s, dir) =>
      // join-explosion pre-flight: exact equi-join output cardinality of
      // events x orders on the user key, top contributing keys first
      graft.analysis.Stats.joinCardinality(events(s, dir), col("user_id"),
        table(s, dir, "orders"), col("o_custkey"), 10)),
    "corr_matrix" -> ((s, dir) =>
      // feature-redundancy audit: exact-moment Pearson pairs over the
      // lineitem measures in one pass
      graft.analysis.Stats.corrPairs(table(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),
    "feature_screen" -> ((s, dir) =>
      // feature-selection pre-flight: completeness, variance and
      // corr-with-target per candidate, one corpus pass
      graft.analysis.Stats.featureScreen(table(s, dir, "lineitem"),
        Seq("l_discount", "l_quantity", "l_tax"), "l_extendedprice")),
    "embedding_centroid_shift" -> ((s, dir) =>
      // embedding-space drift audit: per-label centroid L2 distance from
      // the corpus centroid (encoder skew / domain shift / poisoned slice)
      graft.analysis.Stats.centroidShift(table(s, dir, "embeddings"),
        col("label"), Knn.toDoubleArray(col("embedding")))),
    "ks_drift" -> ((s, dir) =>
      // distribution-shift tripwire: KS distance between purchase and
      // click value distributions (distributed two-phase ECDF prefix)
      graft.analysis.Stats.ksDrift(
        events(s, dir).filter(col("event_type").isin("click", "purchase")),
        col("value"), col("event_type") === "purchase")),
    "bootstrap_ci" -> ((s, dir) =>
      // the uncertainty a point estimate hides, without unreplayable
      // randomness: md5-coin subsample replicates, nearest-rank CI
      graft.analysis.Stats.bootstrapCiMean(events(s, dir), col("event_id"),
        col("value"), 32, 63)),
    "psi_drift" -> ((s, dir) =>
      // model-monitoring standard: PSI of the value feed, second time
      // half vs first, over the baseline's own deciles
      graft.analysis.Stats.psiDrift(events(s, dir), col("ts"), col("value"), 10)),
    "bot_burstiness" -> ((s, dir) =>
      // scripted-traffic audit: inter-arrival CV per user (metronomic
      // gaps flag schedulers; organic traffic sits near CV 1)
      graft.analysis.Stats.burstiness(events(s, dir), col("user_id"),
        col("ts"), col("event_id"), 5, 0.1)),
    "interval_coverage" -> ((s, dir) =>
      // true active time per user: union of 30-minute activity windows
      // (summing raw windows double-counts every overlap)
      graft.analysis.Stats.intervalCoverage(events(s, dir), col("user_id"),
        col("ts"), col("event_id"), 1800L)),
    "json_props_stats" -> ((s, dir) =>
      // the semi-structured surface: JSON-path extraction (not the regex
      // fallback) straight into exact integer aggregation per type
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("__k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_null"),
          min(col("__k")).as("min_k"), max(col("__k")).as("max_k"),
          sum(col("__k").cast("long")).as("sum_k"))),
    "target_encode_loo" -> ((s, dir) =>
      // high-cardinality categorical encoding without self-leakage:
      // each event's category mean-value excludes the event itself
      graft.analysis.Stats.targetEncodeLoo(
        events(s, dir).filter(col("value").isNotNull),
        col("event_id"), get_json_object(col("props"), "$.k"), col("value"))),
    "rare_category_collapse" -> ((s, dir) => {
      // one-hot cardinality control: categories below the support floor
      // collapse into '__other' (the long-tail guard every categorical
      // encoder needs); the counts frame is unbounded-cardinality by
      // construction (the long tail IS the input), so no broadcast
      // hint — AQE picks the join strategy from observed stats
      val ev = events(s, dir)
        .select(get_json_object(col("props"), "$.k").as("cat"))
        .filter(col("cat").isNotNull)
      val counts = ev.groupBy(col("cat")).agg(count(lit(1)).as("__n"))
      ev.join(counts, Seq("cat"))
        .select(when(col("__n") >= 100, col("cat")).otherwise(lit("__other"))
          .as("final_label"))
        .groupBy(col("final_label"))
        .agg(count(lit(1)).as("n"))
    }),
    "langid_profile_train" -> ((s, dir) => {
      // close the langid loop: learn the top-7 words per declared
      // language from the corpus itself — the trained profile table
      // langIdProfiled consumes in place of the built-in lists
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n").desc, col("word").asc)
      table(s, dir, "documents")
        .select(col("lang"),
          explode(graft.text.TextFeatures.words(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 7)
    }),
    "attribution_compare" -> ((s, dir) => {
      // first-touch vs last-touch revenue attribution per channel: the
      // two models disagree exactly where budget decisions live. One
      // entity-key exchange; the touch lookups are frame-bound window
      // lasts/firsts with ignoreNulls (no self-join)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      val purchases = events(s, dir)
        .filter(col("ts").isNotNull)
        .withColumn("__first", first(touch, ignoreNulls = true).over(w))
        .withColumn("__last", last(touch, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .withColumn("__q", col("value").cast("decimal(18,2)"))
      // both models fold in ONE pass: each purchase explodes into its
      // (first, last) role rows and conditional sums split them — the
      // per-model groupBy + full-outer join shape planned a (harmless but
      // needless) sort-merge join of two 4-row frames
      purchases.select(col("__q"), explode(array(
          struct(col("__first").as("channel"), lit("f").as("w")),
          struct(col("__last").as("channel"), lit("l").as("w")))).as("__e"))
        .select(col("__e.channel").as("channel"), col("__e.w").as("__w"), col("__q"))
        .filter(col("channel").isNotNull)
        .groupBy(col("channel"))
        .agg(
          sum(when(col("__w") === "f", 1L).otherwise(0L)).as("n_first"),
          r6(coalesce(sum(when(col("__w") === "f", col("__q"))),
            lit(0).cast("decimal(18,2)")).cast("double")).as("revenue_first_touch"),
          sum(when(col("__w") === "l", 1L).otherwise(0L)).as("n_last"),
          r6(coalesce(sum(when(col("__w") === "l", col("__q"))),
            lit(0).cast("decimal(18,2)")).cast("double")).as("revenue_last_touch"))
    }),
    "event_lift" -> ((s, dir) => {
      // market-basket lite over event types: per type pair, how much more
      // often do they co-occur in a user's history than independence
      // predicts (lift > 1 = the cross-sell/funnel signal)
      val perUser = events(s, dir)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("user_id").as("u"), col("event_type").as("t"))
        .distinct()
      val n = broadcast(perUser.select(col("u")).distinct()
        .agg(count(lit(1)).as("__nu")))
      val typeCounts = perUser.groupBy(col("t")).agg(count(lit(1)).as("__c"))
      val pairs = perUser.as("a").join(perUser.as("b"),
          col("a.u") === col("b.u") && col("a.t") < col("b.t"))
        .groupBy(col("a.t").as("type_a"), col("b.t").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      def d(c: Column) = c.cast("double")
      pairs
        .join(broadcast(typeCounts.select(col("t").as("type_a"), col("__c").as("__ca"))),
          Seq("type_a"))
        .join(broadcast(typeCounts.select(col("t").as("type_b"), col("__c").as("__cb"))),
          Seq("type_b"))
        .crossJoin(n)
        .select(col("type_a"), col("type_b"), col("n_both"),
          r6((d(col("n_both")) * d(col("__nu"))) /
            (d(col("__ca")) * d(col("__cb")))).as("lift"))
    }),
    "contract_check" -> ((s, dir) => {
      // declarative data-contract validation (the dbt-test /
      // Great-Expectations staple): each rule is one conditional sum over
      // ONE corpus pass; the report is rule-cardinality
      val ev = events(s, dir)
      val rules: Seq[(String, Column)] = Seq(
        "value_non_negative" -> (col("value").isNotNull && col("value") < 0),
        "value_below_1000" -> (col("value").isNotNull && col("value") >= 1000.0),
        "event_type_in_domain" ->
          (col("event_type").isNull || !col("event_type").isin(eventTypes: _*)),
        "ts_not_null" -> col("ts").isNull,
        "user_id_not_null" -> col("user_id").isNull,
        "ts_in_2024" ->
          (col("ts").isNotNull && year(col("ts")) =!= 2024))
      val aggs = Seq(count(lit(1)).as("__n")) ++ rules.map { case (name, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"__v_$name")
      }
      val one = ev.agg(aggs.head, aggs.tail: _*)
      val entries = rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(s"__v_$name").as("n_violations"))
      }
      one.select(col("__n"), explode(array(entries: _*)).as("__e"))
        .select(col("__e.rule").as("rule"), col("__n").as("n_rows"),
          col("__e.n_violations").as("n_violations"),
          (col("__e.n_violations") === 0L).as("pass"))
    }),
    "pit_features" -> ((s, dir) =>
      // leakage-safe training set: features strictly pre-cutoff, label
      // strictly in the 7-day horizon after (feature-store discipline)
      graft.analysis.Stats.pitFeatures(events(s, dir), col("user_id"),
        col("ts"), col("value"), col("event_type"),
        col("event_type") === "purchase", "2024-01-20 00:00:00", 7)),
    "cdc_apply" -> ((s, dir) => {
      // MERGE semantics: the pre-mid-month feed is the base snapshot, the
      // rest is a change stream where 'error' rows are tombstones; the
      // newest surviving row per user is the final state
      val ev = events(s, dir).select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      val mid = lit("2024-01-15 00:00:00").cast("timestamp")
      Snapshots.cdcApply(
        ev.filter(col("ts") < mid),
        ev.filter(col("ts") >= mid),
        col("event_type") === "error",
        Seq(col("user_id")), col("ts"), col("event_id"))
    }),
    "snapshot_diff" -> ((s, dir) => {
      // state reconciliation: per-user latest event_type mid-month vs now
      // (added / removed / changed / unchanged counts)
      val ev = events(s, dir)
      val prior = Snapshots.latest(
        ev.filter(col("ts") < lit("2024-01-15 00:00:00").cast("timestamp")),
        Seq(col("user_id")), col("ts"), col("event_id"))
      val now = Snapshots.latest(ev, Seq(col("user_id")), col("ts"), col("event_id"))
      graft.analysis.Stats.snapshotDiff(prior, col("user_id"), col("event_type"),
        now, col("user_id"), col("event_type"))
    }),
    "stickiness_daily" -> ((s, dir) =>
      // habitual-usage series: DAU / trailing-7d WAU per calendar day,
      // gap-filled spine (a dead day is stickiness 0, not absence)
      graft.analysis.Stats.stickinessDaily(events(s, dir), col("user_id"),
        col("ts"), 7)),
    "wilson_rates" -> ((s, dir) =>
      // rate reporting done right: per-type high-value share with a
      // Wilson score interval (a 3/7 and a 300/700 rate differ)
      graft.analysis.Stats.wilsonInterval(events(s, dir), col("event_type"),
        col("value") > 300.0)),
    "topk_movers" -> ((s, dir) =>
      // what changed this week: streams whose traffic share moved most
      // between the window's two halves
      graft.analysis.Stats.topMovers(events(s, dir), col("ts"),
        col("event_type"), 5)),
    "linkage_entities" -> ((s, dir) => {
      // entity resolution end-to-end: blocked JW linkage pairs ->
      // pointer-jumping connected components -> canonical entity table
      val pairs = Dedup.jaroWinklerLinkage(table(s, dir, "documents"),
        col("doc_id"), col("text"), 16, 64, 0.9, maxBlock = 1000)
      Dedup.connectedComponents(pairs, "doc_a", "doc_b")
        .groupBy(col("component").as("entity_id"))
        .agg(count(lit(1)).as("n_members"), min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
    }),
    "curation_funnel" -> ((s, dir) =>
      // the composed pipeline decision: quality -> exact dedup -> mixture
      graft.curation.Curation.curationFunnel(table(s, dir, "documents"),
        col("doc_id"), col("text"), col("lang"),
        Map("en" -> 100, "fr" -> 50, "es" -> 25, "de" -> 10, "zh" -> 75))),
    "curation_funnel_fuzzy" -> ((s, dir) => {
      // the NEAR-DUP composed decision: quality -> component keep-best ->
      // mixture (real corpora hold near-copies, and the production policy
      // keeps the best one, not the first verbatim)
      val d = table(s, dir, "documents")
      val pairs = Dedup.minhashDedupVerified(d, col("doc_id"), col("text"), 3, 16, 4, 0.5)
      graft.curation.Curation.fuzzyCurationFunnel(d, col("doc_id"), col("text"),
        col("lang"), pairs,
        graft.text.TextFeatures.qualityColumns(col("text")).last,
        Map("en" -> 100, "fr" -> 50, "es" -> 25, "de" -> 10, "zh" -> 75))
    }),

    // ---- B. relational surface ----
    "q1_pricing_summary" -> ((s, dir) => Relational.q1PricingSummary(s, dir)),
    "q3_shipping_priority" -> ((s, dir) => Relational.q3ShippingPriority(s, dir)),
    "q5_local_supplier" -> ((s, dir) => Relational.q5LocalSupplier(s, dir)),
    "q6_forecast_revenue" -> ((s, dir) => Relational.q6ForecastRevenue(s, dir)),
    "q8_market_share" -> ((s, dir) => Relational.q8MarketShare(s, dir)),
    "q14_promo_effect" -> ((s, dir) => Relational.q14PromoEffect(s, dir)),
    "q10_returned_items" -> ((s, dir) => Relational.q10ReturnedItems(s, dir)),
    "q15_top_supplier" -> ((s, dir) => Relational.q15TopSupplier(s, dir)),
    "q17_small_quantity" -> ((s, dir) => Relational.q17SmallQuantity(s, dir)),
    "q18_large_orders" -> ((s, dir) => Relational.q18LargeOrders(s, dir)),
    "q4_priority_checking" -> ((s, dir) => Relational.q4PriorityChecking(s, dir)),
    "q7_volume_shipping" -> ((s, dir) => Relational.q7VolumeShipping(s, dir)),
    "q9_product_profit" -> ((s, dir) => Relational.q9ProductProfit(s, dir)),
    "q11_important_value" -> ((s, dir) => Relational.q11ImportantValue(s, dir)),
    "q16_supplier_diversity" -> ((s, dir) => Relational.q16SupplierDiversity(s, dir)),
    "q2_min_cost_supplier" -> ((s, dir) => Relational.q2MinCostSupplier(s, dir)),
    "q20_potential_promotion" -> ((s, dir) => Relational.q20PotentialPromotion(s, dir)),
    "q12_late_shipments" -> ((s, dir) => Relational.q12LateShipments(s, dir)),
    "q13_customer_distribution" -> ((s, dir) => Relational.q13CustomerDistribution(s, dir)),
    "q19_disjunctive_revenue" -> ((s, dir) => Relational.q19DisjunctiveRevenue(s, dir)),
    "q21_waiting_suppliers" -> ((s, dir) => Relational.q21WaitingSuppliers(s, dir)),
    "q22_dormant_accounts" -> ((s, dir) => Relational.q22DormantAccounts(s, dir)),
    "top_n_per_group" -> ((s, dir) =>
      Relational.topNPerGroup(
        table(s, dir, "orders").select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
        Seq(col("o_orderpriority")), col("o_totalprice"), col("o_orderkey"), 3))
  )

  /** Output contracts of the queries whose kernels must interleave driver
    * actions with plan construction — fixed-point/pointer-jumping loops with
    * data-dependent termination (connected components and everything
    * composed on them), IRLS moment collects with driver-side p×p solves,
    * kmeans/PQ codebook training, eager lineage-truncation checkpoints in
    * iterative graph kernels, and the BPE merge loop. [[queries]] wraps each
    * behind [[graft.plans.DeferredSummary.frame]], moving those jobs from
    * DataFrame CONSTRUCTION to first action: constructing any registry
    * entry is job-free (PlanAuditSpec asserts this registry-wide), which is
    * the only posture that survives a 100 TB catalog — a plan audit, bench
    * plan-hash, or .explain must never scan the corpus. The DDL is the
    * static output contract, structurally checked against the inner frame
    * when the thunk runs.
    */
  private val deferredContracts: Map[String, String] = Map(
    "pagerank" -> "node BIGINT, rank DOUBLE",
    "dedup_components" -> "doc_id BIGINT, component BIGINT",
    "dedup_keep_best" -> "component BIGINT, keeper_id BIGINT, n_members BIGINT",
    "linkage_entities" -> "entity_id BIGINT, n_members BIGINT, min_doc BIGINT, max_doc BIGINT",
    "configured_curation_export" -> "doc_id BIGINT, source STRING, n_tok BIGINT, split STRING, shard BIGINT",
    "curation_export_fuzzy" -> "doc_id BIGINT, source STRING, n_tok BIGINT",
    "curation_funnel_fuzzy" -> "stage INT, stage_name STRING, n_docs BIGINT, n_tokens BIGINT",
    "ann_pq_refined" -> "query_id BIGINT, vec_id BIGINT, cos_sim DOUBLE, rank INT",
    "bpe_merges" -> "rank INT, left_sym STRING, right_sym STRING, piece STRING",
    "bpe_encode_stats" -> "doc_id BIGINT, n_words BIGINT, n_pieces BIGINT",
    "regression_huber" -> "event_type STRING, n BIGINT, b0 DOUBLE, b_hour DOUBLE",
    "regression_logit" -> "event_type STRING, n BIGINT, b0 DOUBLE, b_hour DOUBLE",
    "regression_logit_multi" ->
      "event_type STRING, n BIGINT, b0 DOUBLE, b_gender DOUBLE, b_disability DOUBLE, b_age1 DOUBLE, b_age2 DOUBLE",
    "regression_ols_multi" ->
      "event_type STRING, n BIGINT, b0 DOUBLE, b_gender DOUBLE, b_disability DOUBLE, b_age1 DOUBLE, b_age2 DOUBLE, b_hour DOUBLE",
    "regression_mi_logit" ->
      "event_type STRING, n BIGINT, n_obs BIGINT, m_draws INT, intercept_pooled DOUBLE, slope_pooled DOUBLE, var_within DOUBLE, var_between DOUBLE, se_total DOUBLE")

  /** The driver contract: [[rawQueries]] with every construction-time-job
    * kernel deferred behind a leaf plan (see [[deferredContracts]]). */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (name, fn) =>
      deferredContracts.get(name) match {
        case Some(ddl) =>
          name -> ((s: SparkSession, dir: String) =>
            graft.plans.DeferredSummary.frame(s, name, ddl)(() => fn(s, dir)))
        case None => name -> fn
      }
    }

  /** Shared composed-flow CTE prologue for the engagement pipeline oracle
    * pair: per-row stage flags (time window, test-participant, consent) plus
    * the WS-corrected dataset and the imputable code, all in one scan —
    * mirrors EngagementPipeline.flagged so funnel and export share one
    * definition of the flow on BOTH engines.
    */
  private val engagementFlowCtes: String =
    """WITH f AS (
      |  SELECT event_id, user_id, ts, value, event_type AS ds0,
      |    CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) AS k,
      |    (ts >= TIMESTAMP '2024-01-08 00:00:00'
      |       AND ts <= TIMESTAMP '2024-01-21 00:00:00') AS f_time,
      |    NOT EXISTS (SELECT 1 FROM events x
      |                WHERE x.event_type = 'error' AND x.value > 320
      |                  AND x.user_id = events.user_id) AS f_test,
      |    NOT EXISTS (SELECT 1 FROM events x
      |                WHERE x.event_type = 'error' AND x.value > 250
      |                  AND x.user_id = events.user_id) AS f_consent
      |  FROM events),
      |g AS (
      |  SELECT *, CASE WHEN k >= 50 THEN 'ws_' || ds0 ELSE ds0 END AS ds_ws,
      |    CASE WHEN k IS NULL THEN 1 ELSE 0 END AS imputed
      |  FROM f)""".stripMargin

  /** Shared minhash CTE prologue (shingles -> base hashes -> signatures ->
    * bands) used by both minhash oracle queries; constants come from Dedup
    * so Spark and oracle can never drift.
    */
  private def minhashCtes: String = {
    val sigExprs = (0 until 16).map { p =>
      s"list_min(list_transform(hs, x -> (x * ${Dedup.minhashA(p)} + ${Dedup.minhashB(p)}) % ${Dedup.minhashPrime})) AS s$p"
    }.mkString(",\n    ")
    s"""WITH shl AS (
       |  SELECT doc_id, list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                                 for i in generate_series(1, len(w)-2) ]) AS shingles
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |hv AS (
       |  SELECT doc_id, list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
       |  FROM shl WHERE len(shingles) > 0),
       |sig AS (
       |  SELECT doc_id,
       |    $sigExprs
       |  FROM hv),
       |banded AS (
       |  SELECT doc_id, 0 AS band, s0||'|'||s1||'|'||s2||'|'||s3 AS bk FROM sig
       |  UNION ALL SELECT doc_id, 1, s4||'|'||s5||'|'||s6||'|'||s7 FROM sig
       |  UNION ALL SELECT doc_id, 2, s8||'|'||s9||'|'||s10||'|'||s11 FROM sig
       |  UNION ALL SELECT doc_id, 3, s12||'|'||s13||'|'||s14||'|'||s15 FROM sig)""".stripMargin
  }

  /** WS-correction state + one-step decision CTEs, the SQL twin of
    * `wsState` + `WsCorrection.correctStep` — shared by ws_cycle_relabel
    * and sync_stats. */
  private def wsStateCtes: String =
    """WITH st AS (
      |  SELECT event_id, event_type AS dataset,
      |    CASE WHEN k % 5 = 1 THEN event_type
      |         WHEN k % 5 = 2 THEN 'click'
      |         WHEN k % 5 = 3 THEN 'view'
      |         WHEN k % 5 = 4 THEN 'purchase' END AS proposed,
      |    CASE WHEN k % 3 = 1 THEN ['click']
      |         WHEN k % 3 = 2 THEN ['view', 'error']
      |         ELSE [] END AS previous
      |  FROM (SELECT event_id, event_type,
      |          CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) AS k
      |        FROM events)),
      |ws_events AS (
      |  SELECT *,
      |    CASE WHEN proposed IS NULL THEN 'labels_match'
      |         WHEN proposed = dataset THEN 'ws_correct_to_current'
      |         WHEN list_contains(previous, proposed) THEN 'fix_ws_cycle'
      |         ELSE 'ws_correction' END AS sync_event
      |  FROM st)""".stripMargin

  /** The shared simhash + banding CTE prefix (toks → votes → sh →
    * banded_all) — one definition so the pairs oracle and the bucket-cap
    * accounting oracle can never drift on the hash/banding convention. */
  private def simhashBandedAllSql(width: Int): String = {
    val bandLen = width / 4
    s"""WITH toks AS (
       |  SELECT DISTINCT doc_id, md5(tok) AS h FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
       |votes AS (
       |  SELECT doc_id, pos,
       |    SUM((((strpos('0123456789abcdef', substr(h, pos // 4 + 1, 1)) - 1)
       |          // (CASE pos % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) % 2) * 2 - 1) AS s
       |  FROM toks, unnest(generate_series(0, ${width - 1})) AS g(pos)
       |  GROUP BY doc_id, pos),
       |sh AS (
       |  SELECT doc_id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY pos) AS simhash
       |  FROM votes GROUP BY doc_id),
       |banded_all AS (
       |  SELECT doc_id, simhash, band, substr(simhash, band * $bandLen + 1, $bandLen) AS bk
       |  FROM sh, (VALUES (0), (1), (2), (3)) AS v(band))""".stripMargin
  }

  /** DuckDB twin of `Dedup.simhashBucketReport` at the registered
    * (numBands=4, maxBucketSize=1000): the same banded frame, grouped to
    * per-bucket occupancies, folded to the one accounting row. */
  private def simhashBucketReportOracleSql(width: Int): String =
    s"""${simhashBandedAllSql(width)},
       |occ AS (SELECT band, bk, COUNT(*) AS occ FROM banded_all GROUP BY 1, 2)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |  CAST(MAX(occ) AS BIGINT) AS max_bucket,
       |  CAST(SUM(CASE WHEN occ > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS buckets_dropped,
       |  CAST(SUM(CASE WHEN occ > 1000 THEN occ ELSE 0 END) AS BIGINT) AS rows_dropped
       |FROM occ""".stripMargin

  /** Width-parameterized simhash banded-pairs oracle (32- and 64-bit rows
    * share one formulation so they can never drift). numBands=4,
    * maxHamming=3, bucket cap 1000 — the constants the Spark queries use. */
  private def simhashPairsOracleSql(width: Int): String = {
    s"""${simhashBandedAllSql(width)},
       |banded AS (
       |  SELECT * FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY band, bk) AS cnt FROM banded_all)
       |  WHERE cnt <= 1000),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.simhash AS h_a, b.simhash AS h_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, hamming FROM (
       |  SELECT doc_a, doc_b,
       |    CAST(list_sum([CASE WHEN substr(h_a, i, 1) <> substr(h_b, i, 1) THEN 1 ELSE 0 END
       |                   for i in generate_series(1, $width)]) AS BIGINT) AS hamming
       |  FROM cand)
       |WHERE hamming <= 3""".stripMargin
  }

  /** The exact hard-negative-mining oracle — shared by the reference row
    * (`hard_negatives`) and the dispatcher row (`hard_negatives_dispatch`),
    * whose plan at gate SFs IS the exact kernel (corpus under the 100k
    * dispatch bound). */
  private def hardNegativesExactOracle: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
      |SELECT query_id, vec_id, cos_sim, rank FROM (
      |  SELECT query_id, vec_id, cos_sim,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cos_sim DESC, vec_id ASC) AS rank
      |  FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
      |      floor((list_dot_product(q.v, c.v)
      |        / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
      |    FROM e q JOIN e c ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id)
      |  WHERE cos_sim < 0.25)
      |WHERE rank <= 5""".stripMargin

  /** The sign-bucket SQL expression both LSH oracles share — one definition
    * so the plane constants / sign convention can never drift between the
    * single- and multi-probe rows (or from Knn.signBucket, whose
    * hyperplanes these literals come from). */
  private def lshBucketExpr: String =
    Knn.hyperplanes(8, 64).map(p =>
      s"(CASE WHEN list_dot_product(v, [${p.mkString(", ")}]) >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")

  /** nprobe-parameterized IVF oracle: corpus vectors live in their nearest
    * cell; each query searches its `nprobe` nearest cells. nprobe=1 is the
    * classic single-probe row; both rows share one formulation so the
    * quantizer/tiebreak contract can never drift.
    */
  private def ivfOracleSql(nprobe: Int): String =
    s"""WITH e AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cent AS (SELECT id AS cid, v AS cvec FROM e WHERE id < 8),
       |assign AS (
       |  SELECT e.id, e.v, cent.cid,
       |    ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
       |      floor((list_dot_product(e.v, e.v) - 2.0 * list_dot_product(e.v, cent.cvec)
       |            + list_dot_product(cent.cvec, cent.cvec)) * 1000000.0 + 0.5) / 1000000.0 ASC, cent.cid ASC) AS rn
       |  FROM e CROSS JOIN cent),
       |corpus_b AS (SELECT id, v, cid AS bucket FROM assign WHERE rn = 1),
       |queries_b AS (SELECT id, v, cid AS bucket FROM assign
       |              WHERE rn <= $nprobe AND id >= 8 AND id < 16)
       |SELECT query_id, vec_id, cos_sim, rank FROM (
       |  SELECT q.id AS query_id, c.id AS vec_id,
       |    floor((list_dot_product(q.v, c.v)
       |      / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.id
       |      ORDER BY floor((list_dot_product(q.v, c.v)
       |        / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 DESC,
       |        c.id ASC) AS rank
       |  FROM queries_b q JOIN corpus_b c ON q.bucket = c.bucket AND q.id <> c.id)
       |WHERE rank <= 5""".stripMargin

  /** Gopher-style per-document decision SQL, parameterized on pass-through
    * columns so quality_filter and corpus_report share one formulation (the
    * thresholds/rules can never drift between the two rows). `inner` is
    * computed where `text` is in scope; `outer` is the pass-through column
    * list; both end with a trailing comma or are empty.
    */
  private def gopherDecisionSql(inner: String, outer: String): String =
    s"""SELECT $outer
       |  CASE WHEN n_words < 10 THEN 'too_short'
       |       WHEN awl < 3.0 OR awl > 10.0 THEN 'word_length'
       |       WHEN sr < 0.01 THEN 'no_stopwords'
       |       WHEN dup > 0.3 THEN 'repetitive_ngrams'
       |       WHEN tt > 0.2 THEN 'dominant_token'
       |       ELSE 'kept' END AS decision
       |FROM (
       |  SELECT $outer
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(length(text) AS DOUBLE) / len(w) AS awl,
       |    CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w) AS sr,
       |    CASE WHEN len(w) > 2
       |         THEN 1.0 - CAST(len(list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                                             for i in generate_series(1, len(w)-2) ])) AS DOUBLE)
       |                    / (len(w) - 2)
       |         ELSE 0.0 END AS dup,
       |    CAST(list_max(list_transform(list_distinct(list_filter(w, x -> x <> '')), x -> len(list_filter(w, y -> y = x)))) AS DOUBLE)
       |      / len(list_filter(w, x -> x <> '')) AS tt
       |  FROM (SELECT $inner text, string_split(text, ' ') AS w FROM documents))""".stripMargin

  /** The SQL twin of TokenCount ([a-z0-9]+ runs, as BIGINT) — one
    * definition for every oracle that counts tokens. */
  private val sqlTokCount = "CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)"

  /** Shared prologue of the composed training-data pipeline oracles
    * (`training_pipeline` / `training_export`): stage flags l/q/d/c/m in
    * the same conditioned order as Curation.trainingStages — langid
    * agreement, Gopher quality, first-keeper dedup among quality
    * survivors, trigram decontamination vs the doc_id%50 eval split,
    * mixture coin. One owner so the funnel and the export cannot drift.
    */
  /** The langid-agreement prediction CTE body, shared by both composed
    * training-flow variants (batch and incremental) so the stopword
    * tables cannot drift between them. */
  private val langidPredCte: String =
    """pred AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS s_en,
      |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','y','que','en','un'))) AS BIGINT) AS s_es,
      |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et','que','en','un'))) AS BIGINT) AS s_fr,
      |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','zu','in','ist'))) AS BIGINT) AS s_de,
      |    CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
      |         WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
      |         WHEN s_fr >= s_de THEN 'fr'
      |         ELSE 'de' END AS predicted
      |  FROM documents)""".stripMargin

  private def trainingFlowCtes: String = {
    val inner = s"doc_id, lang, $sqlTokCount AS n_tok,"
    val outer = "doc_id, lang, n_tok, text,"
    s"""dec AS (
       |${gopherDecisionSql(inner, outer)}),
       |$langidPredCte,
       |f AS (
       |  SELECT dec.doc_id, dec.lang AS source, dec.n_tok, dec.text,
       |    (pred.predicted = dec.lang) AS l,
       |    (pred.predicted = dec.lang AND dec.decision = 'kept') AS q
       |  FROM dec JOIN pred USING (doc_id)
       |  WHERE dec.doc_id % 50 <> 0),
       |firsts AS (SELECT text, MIN(doc_id) AS first_id FROM f WHERE q GROUP BY text),
       |fd AS (
       |  SELECT f.doc_id, f.source, f.n_tok, f.text, f.l, f.q,
       |    (f.q AND f.doc_id = firsts.first_id) AS d
       |  FROM f LEFT JOIN firsts ON f.text = firsts.text),
       |$trainingTailCtes""".stripMargin
  }

  /** The benchmark-shingle / contamination / staged-flag tail shared by
    * both composed-flow variants — everything downstream of the `fd`
    * (dedup-flagged) CTE is variant-independent. */
  private val trainingTailCtes: String =
    """bsh AS (
      |  SELECT DISTINCT s FROM (
      |    SELECT unnest(list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                                  for i in generate_series(1, len(w)-2) ])) AS s
      |    FROM (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id % 50 = 0))),
      |hits AS (
      |  SELECT DISTINCT doc_id FROM (
      |    SELECT doc_id, unnest(list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                                          for i in generate_series(1, len(w)-2) ])) AS s
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM fd WHERE d)) x
      |  JOIN bsh USING (s)),
      |staged AS (
      |  SELECT fd.doc_id, fd.source, fd.n_tok, fd.l, fd.q, fd.d,
      |    (fd.d AND hits.doc_id IS NULL) AS c,
      |    (fd.d AND hits.doc_id IS NULL AND
      |     ('0x' || substr(md5(CAST(fd.doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 <
      |       CASE fd.source WHEN 'en' THEN 100 WHEN 'fr' THEN 50 WHEN 'es' THEN 25
      |                      WHEN 'de' THEN 10 ELSE 100 END) AS m
      |  FROM fd LEFT JOIN hits ON fd.doc_id = hits.doc_id)""".stripMargin

  /** The per-stage funnel aggregation shared by both composed-flow
    * variants. */
  private val trainingFunnelSelect: String =
    """SELECT stage, stage_name,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      |FROM (
      |  SELECT 0 AS stage, 'ingested' AS stage_name, n_tok FROM staged
      |  UNION ALL SELECT 1, 'langid', n_tok FROM staged WHERE l
      |  UNION ALL SELECT 2, 'quality_filter', n_tok FROM staged WHERE q
      |  UNION ALL SELECT 3, 'exact_dedup', n_tok FROM staged WHERE d
      |  UNION ALL SELECT 4, 'decontaminate', n_tok FROM staged WHERE c
      |  UNION ALL SELECT 5, 'mixture', n_tok FROM staged WHERE m)
      |GROUP BY stage, stage_name""".stripMargin

  /** Incremental (always-on) variant of the composed flow: the batch is
    * the odd doc_ids, the persisted archive index is every even
    * non-benchmark text's digest, and exact dedup also consults it. */
  private def trainingIngestCtes: String = {
    val inner = s"doc_id, lang, $sqlTokCount AS n_tok,"
    val outer = "doc_id, lang, n_tok, text,"
    s"""dec AS (
       |${gopherDecisionSql(inner, outer)}),
       |$langidPredCte,
       |f AS (
       |  SELECT dec.doc_id, dec.lang AS source, dec.n_tok, dec.text,
       |    (pred.predicted = dec.lang) AS l,
       |    (pred.predicted = dec.lang AND dec.decision = 'kept') AS q
       |  FROM dec JOIN pred USING (doc_id)
       |  WHERE dec.doc_id % 2 = 1),
       |arch AS (
       |  SELECT DISTINCT md5(text) AS digest FROM documents
       |  WHERE doc_id % 2 = 0 AND doc_id % 50 <> 0),
       |firsts AS (SELECT text, MIN(doc_id) AS first_id FROM f WHERE q GROUP BY text),
       |fd AS (
       |  SELECT f.doc_id, f.source, f.n_tok, f.text, f.l, f.q,
       |    (f.q AND f.doc_id = firsts.first_id AND arch.digest IS NULL) AS d
       |  FROM f LEFT JOIN firsts ON f.text = firsts.text
       |  LEFT JOIN arch ON md5(f.text) = arch.digest),
       |$trainingTailCtes""".stripMargin
  }

  /** The quality_score oracle's building blocks, shared with the
    * dedup_keep_best keeper so the quality definition cannot drift between
    * the two (same reason componentCtes is shared).
    */
  private val qualityCountsSql: String =
    """SELECT doc_id,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
      |    CAST(length(text) AS BIGINT) AS n_chars_m,
      |    CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS BIGINT) AS n_punct,
      |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stopwords
      |  FROM documents""".stripMargin

  private def qualityScoreExprSql(alias: String): String =
    s"""floor((1.0
       |    - (CASE WHEN CAST(n_chars_m AS DOUBLE) / CAST(n_words AS DOUBLE) < 3.0
       |              OR CAST(n_chars_m AS DOUBLE) / CAST(n_words AS DOUBLE) > 10.0 THEN 0.3 ELSE 0.0 END)
       |    - (CASE WHEN CAST(n_stopwords AS DOUBLE) / CAST(n_words AS DOUBLE) < 0.01 THEN 0.2 ELSE 0.0 END)
       |    - (CASE WHEN n_words < 10 THEN 0.5 ELSE 0.0 END)) * 1e6 + 0.5) / 1e6 AS $alias""".stripMargin

  /** Corpus-trained bigram-LM CTE prologue ending in
    * `lmv(doc_id, n_bigrams, lm_nll)` — shared by the raw score query and
    * the CCNet bucketing so the model definition cannot drift.
    */
  private def lmBigramOracleCtes: String =
    """WITH base AS (SELECT doc_id, text FROM documents),
      |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM base),
      |uni AS (SELECT w, count(*) AS cw FROM toks GROUP BY w),
      |voc AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
      |bigr AS (
      |  SELECT doc_id, unnest([ w[i] || ' ' || w[i+1]
      |                          for i in generate_series(1, len(w)-1) ]) AS bg
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)),
      |bi AS (SELECT bg, count(*) AS cbg FROM bigr GROUP BY bg),
      |scored AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    SUM(CAST(floor(-ln((cbg + 1.0) / (cw + 1.0 * v)) * 1000000.0 + 0.5) / 1000000.0
      |             AS DECIMAL(18,6))) AS nll_sum
      |  FROM bigr JOIN bi USING (bg)
      |  JOIN uni ON string_split(bg, ' ')[1] = uni.w
      |  CROSS JOIN voc
      |  GROUP BY doc_id),
      |lmv AS (
      |  SELECT base.doc_id, CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |    floor(CAST(nll_sum AS DOUBLE) /
      |      (CASE WHEN n_bigrams > 0 THEN CAST(n_bigrams AS DOUBLE) END)
      |      * 1000000.0 + 0.5) / 1000000.0 AS lm_nll
      |  FROM base LEFT JOIN scored USING (doc_id))""".stripMargin

  /** Shared-shingle pair-overlap CTE prologue ending in
    * `inter(doc_a, doc_b, sz_a, sz_b, i)` — the SQL twin of
    * `Dedup.pairOverlaps`, shared by the Jaccard and containment oracles
    * so candidacy and shingle definitions cannot drift between them.
    * Query side: doc_id < 50.
    */
  private val pairOverlapCtes: String =
    """WITH shl AS (
      |  SELECT doc_id, list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                                 for i in generate_series(1, len(w)-2) ]) AS shingles
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      |sets AS (SELECT doc_id, len(shingles) AS sz, s FROM shl, unnest(shingles) AS t(s)),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    MAX(a.sz) AS sz_a, MAX(b.sz) AS sz_b, COUNT(*) AS i
      |  FROM sets a JOIN sets b ON a.s = b.s AND a.doc_id <> b.doc_id
      |    AND (a.doc_id < b.doc_id OR b.doc_id >= 50)
      |  WHERE a.doc_id < 50 GROUP BY 1, 2)""".stripMargin

  /** The LSH candidate-pair subquery (distinct shared-band pairs, a < b) —
    * every banded oracle derives its pairs from this one string. */
  private val candidatePairsSql: String =
    """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |          FROM banded a JOIN banded b
      |            ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id""".stripMargin

  /** Exact-Jaccard SQL over two shl-aliased shingle sets — shared by every
    * verification oracle (self-dedup and incremental) so the similarity
    * definition cannot drift. */
  private def jaccardSql(sa: String, sb: String): String =
    s"""CAST(len(list_intersect($sa.shingles, $sb.shingles)) AS DOUBLE)
       |        / CAST(len($sa.shingles) + len($sb.shingles) - len(list_intersect($sa.shingles, $sb.shingles)) AS DOUBLE)""".stripMargin

  /** Verified near-dup pair fragment `vpairs(doc_a, doc_b, j)` — appended
    * after `minhashCtes`. The ONE owner of the LSH-candidate + exact
    * Jaccard ≥ 0.5 verification SQL: dedup_minhash_verified, the
    * component/keeper oracles and the rate report all read from it, so the
    * verification definition cannot drift between the pair query and the
    * queries that summarize it.
    */
  private def verifiedPairsCte: String =
    s"""vpairs AS (
       |  SELECT doc_a, doc_b, j FROM (
       |    SELECT p.doc_a, p.doc_b,
       |      ${jaccardSql("sa", "sb")} AS j
       |    FROM ($candidatePairsSql) p
       |    JOIN shl sa ON p.doc_a = sa.doc_id
       |    JOIN shl sb ON p.doc_b = sb.doc_id)
       |  WHERE j >= 0.5)""".stripMargin

  /** Near-dup components as a recursive reach CTE (min reachable doc id —
    * exactly the Spark label-propagation fixpoint). The recursive CTE
    * duplicates paths but UNION (set) bounds it. Shared by the min-id and
    * best-quality keeper oracles so the component definition cannot drift.
    */
  private def componentCtes: String = {
    val base = minhashCtes.replaceFirst("WITH ", "WITH RECURSIVE ")
    s"""$base,
       |$verifiedPairsCte,
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM vpairs
       |          UNION ALL SELECT doc_b AS src, doc_a AS dst FROM vpairs),
       |reach(src, node) AS (
       |  SELECT src, src FROM edges GROUP BY src
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.node = e.src),
       |comps AS (
       |  SELECT src AS doc_id, CAST(MIN(node) AS BIGINT) AS component
       |  FROM reach GROUP BY src)""".stripMargin
  }

  /** Frequency-ranked vocab CTE (24 entries, ties on token asc) shared by
    * vocab_build and encode_docs. */
  private val vocabCte: String =
    """f AS (
      |  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token FROM documents)
      |  GROUP BY token),
      |v AS (
      |  SELECT token, freq, CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS INT) AS token_id
      |  FROM (SELECT token, freq FROM f ORDER BY freq DESC, token ASC LIMIT 24))""".stripMargin

  /** Fuzzy-curation prologue ending in `staged(doc_id, source, n_tok, q,
    * d, m)` — shared by the fuzzy funnel and its export so report and
    * dataset cannot drift. */
  private def fuzzyCurationCtes: String = {
    val inner = s"doc_id, lang AS source, $sqlTokCount AS n_tok,"
    val outer = "doc_id, source, n_tok,"
    s"""$componentCtes,
       |dec AS (
       |${gopherDecisionSql(inner, outer)}),
       |qual AS (
       |  SELECT doc_id, ${qualityScoreExprSql("qscore")}
       |  FROM (
       |    $qualityCountsSql)),
       |st AS (
       |  SELECT dec.doc_id, dec.source, dec.n_tok, (dec.decision = 'kept') AS q,
       |    COALESCE(c.component, dec.doc_id) AS comp, qual.qscore
       |  FROM dec LEFT JOIN comps c ON c.doc_id = dec.doc_id
       |  JOIN qual ON qual.doc_id = dec.doc_id),
       |keep AS (
       |  SELECT comp, CAST(-((max({'q': qscore, 'nid': -doc_id})).nid) AS BIGINT) AS keeper
       |  FROM st WHERE q GROUP BY comp),
       |staged AS (
       |  SELECT st.doc_id, st.source, st.n_tok, st.q,
       |    (st.q AND st.doc_id = k.keeper) AS d,
       |    (st.q AND st.doc_id = k.keeper AND
       |     ('0x' || substr(md5(CAST(st.doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 <
       |       CASE st.source WHEN 'en' THEN 100 WHEN 'fr' THEN 50 WHEN 'es' THEN 25
       |                     WHEN 'de' THEN 10 WHEN 'zh' THEN 75 ELSE 100 END) AS m
       |  FROM st LEFT JOIN keep k ON st.comp = k.comp)""".stripMargin
  }

  /** Quality-score oracle — shared verbatim by the quality_score row and
    * the quality_unpivot melt. */
  private lazy val qualityScoreOracle: String =
    s"""SELECT doc_id, n_words, n_chars_m, n_punct, n_stopwords,
       |  floor(CAST(n_chars_m AS DOUBLE) / CAST(n_words AS DOUBLE) * 1e6 + 0.5) / 1e6 AS avg_word_len,
       |  floor(CAST(n_stopwords AS DOUBLE) / CAST(n_words AS DOUBLE) * 1e6 + 0.5) / 1e6 AS stopword_ratio,
       |  ${qualityScoreExprSql("quality_score")}
       |FROM (
       |  $qualityCountsSql)""".stripMargin

  /** Stopword-score language ID — shared verbatim by the langid row and the
    * classifier_eval prediction CTE. */
  private val langidOracle: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS s_en,
      |  CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','y','que','en','un'))) AS BIGINT) AS s_es,
      |  CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et','que','en','un'))) AS BIGINT) AS s_fr,
      |  CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','zu','in','ist'))) AS BIGINT) AS s_de,
      |  CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
      |       WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
      |       WHEN s_fr >= s_de THEN 'fr'
      |       ELSE 'de' END AS predicted_lang
      |FROM documents""".stripMargin

  /** Shared by langid_profiled and label_consensus (the profiled labeler
    * is one of the consensus voters — one definition so they cannot
    * drift). */
  private val langidProfiledOracle: String = {
    val profiles = graft.text.TextFeatures.defaultProfiles
    val scoreCols = profiles.map { case (code, stops) =>
      s"  CAST(len(list_filter(string_split(text,' '), w -> w IN (${
        stops.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS s_$code"
    }.mkString(",\n")
    val structs = profiles.zipWithIndex.map { case ((code, _), i) =>
      s"{'score': s_$code, 'prio': ${-i}, 'lang': '$code'}"
    }.mkString(", ")
    s"""SELECT doc_id, ${profiles.map(p => "s_" + p._1).mkString(", ")},
       |  (list_max([$structs])).lang AS predicted_lang
       |FROM (SELECT doc_id,
       |$scoreCols
       |FROM documents)""".stripMargin
  }

  /** Shared by holt_linear and forecast_accuracy: the two-accumulator
    * Holt recursion as CTEs ending in an UNCLOSED `holt` clause —
    * continue with `)` (standalone) or `),<more CTEs>` (composition). */
  private val holtOracleCtes: String =
    """WITH RECURSIVE base AS (
      |  SELECT user_id, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
      |r AS (
      |  SELECT user_id, event_id, value, rn, value AS l,
      |    CAST(0.0 AS DOUBLE) AS tr
      |  FROM base WHERE rn = 1
      |  UNION ALL
      |  SELECT b.user_id, b.event_id, b.value, b.rn,
      |    0.5 * b.value + 0.5 * (r.l + r.tr),
      |    0.25 * ((0.5 * b.value + 0.5 * (r.l + r.tr)) - r.l) + 0.75 * r.tr
      |  FROM base b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1),
      |holt AS (
      |  SELECT user_id, event_id, value,
      |    floor(l * 1000000.0 + 0.5) / 1000000.0 AS level,
      |    floor(tr * 1000000.0 + 0.5) / 1000000.0 AS trend,
      |    floor((l + tr) * 1000000.0 + 0.5) / 1000000.0 AS forecast
      |  FROM r""".stripMargin

  /** Shared by asof_join and asof_join_native: both implementations are
    * gated against the identical oracle. */
  private val asofOracle: String =
    """SELECT l.event_id, l.user_id, l.ts, l.value,
      |  r.ts AS click_ts, r.value AS click_value
      |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') l
      |ASOF LEFT JOIN (
      |  SELECT user_id, ts, value FROM (
      |    SELECT user_id, ts, value,
      |      ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_type = 'click')
      |  WHERE rn = 1) r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin

  /** DuckDB-runnable oracle SQL per query key (same tables, same aliases). */
  def oracleSql: Map[String, String] = Map(
    "snapshot_latest" ->
      """SELECT user_id, event_id, event_type, value, ts FROM (
        |  SELECT user_id, event_id, event_type, value, ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,
    "active_records" ->
      """SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, user_id, event_type, value FROM events e
        |WHERE event_type = 'signup'
        |  AND NOT EXISTS (SELECT 1 FROM events p WHERE p.event_type = 'purchase' AND p.user_id = e.user_id)""".stripMargin,
    "time_range_filter" ->
      """SELECT event_id, user_id, event_type, ts FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts <= TIMESTAMP '2024-01-21 00:00:00'""".stripMargin,
    "exclude_participants" ->
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM events x
        |                  WHERE x.event_type = 'error' AND x.value > 320 AND x.user_id = e.user_id)
        |GROUP BY event_type""".stripMargin,
    "rqa_participants_only" ->
      """SELECT user_id, COUNT(*) AS n_events FROM events e
        |WHERE EXISTS (SELECT 1 FROM events p WHERE p.event_type = 'purchase' AND p.user_id = e.user_id)
        |GROUP BY user_id""".stripMargin,
    "participants_column_view" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click_n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click_val,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view_n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS view_val,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_val,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup_n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup_val,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error_n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS error_val
        |FROM events GROUP BY user_id""".stripMargin,
    "fold_concat_texts" ->
      """SELECT user_id, string_agg(COALESCE(props, ''), ';' ORDER BY ts, event_id) AS folded_text, COUNT(*) AS n
        |FROM events WHERE event_type = 'purchase' GROUP BY user_id""".stripMargin,
    "relabel_move_datasets" ->
      """SELECT CASE WHEN CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) >= 50
        |            THEN 'ws_' || event_type ELSE event_type END AS event_type,
        |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin,
    "impute_missing_code" ->
      """SELECT code, COUNT(*) AS n_users FROM (
        |  SELECT COALESCE(CAST(d.demog_k AS VARCHAR), 'TRUE_MISSING') AS code
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  LEFT JOIN (SELECT user_id, MAX(CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT)) AS demog_k
        |             FROM events WHERE event_type = 'signup' GROUP BY user_id) d
        |    ON u.user_id = d.user_id)
        |GROUP BY code""".stripMargin,
    "age_banding" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 1000 THEN 'low'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END AS band,
        |  COUNT(*) AS n, COUNT(DISTINCT c_nationkey) AS n_nations
        |FROM customer GROUP BY 1""".stripMargin,
    "location_hierarchy" ->
      """SELECT r_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct_sum
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "participation_by_location" ->
      """SELECT r_name AS region, o_orderpriority AS dataset,
        |  COUNT(DISTINCT c_custkey) AS n_participants, COUNT(*) AS n_messages
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,
    "consent_withdrawn" ->
      """SELECT consent_withdrawn, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users FROM (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'error' AND value > 250 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id) = 1 AS consent_withdrawn
        |  FROM events)
        |GROUP BY consent_withdrawn""".stripMargin,
    "operator_attribution" ->
      """SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), ';') AS operators
        |FROM events GROUP BY user_id""".stripMargin,
    "engagement_stats" ->
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events GROUP BY event_type""".stripMargin,
    "weekly_adverts" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
        |  COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "episode_new_vs_repeat" ->
      """SELECT week, COUNT(*) AS n_users,
        |  CAST(SUM(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        |  COUNT(*) - CAST(SUM(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS BIGINT) AS repeat_users
        |FROM (
        |  SELECT k, week, MIN(week) OVER (PARTITION BY k) AS first_week FROM (
        |    SELECT DISTINCT user_id AS k, CAST(date_trunc('week', ts) AS DATE) AS week FROM events))
        |GROUP BY week""".stripMargin,
    "funnel_conversion" ->
      """SELECT n_entered, n_converted,
        |  floor((CAST(n_converted AS DOUBLE) / CAST(n_entered AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS conv_rate
        |FROM (
        |  SELECT COUNT(*) AS n_entered,
        |    CAST(SUM(CASE WHEN t_to IS NOT NULL AND t_to > t_from THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |  FROM (
        |    SELECT user_id,
        |      MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_from,
        |      MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS t_to
        |    FROM events GROUP BY user_id)
        |  WHERE t_from IS NOT NULL)""".stripMargin,
    "retention_cohorts" ->
      """SELECT cohort_week, CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
        |  COUNT(*) AS n_users
        |FROM (
        |  SELECT k, week, MIN(week) OVER (PARTITION BY k) AS cohort_week FROM (
        |    SELECT DISTINCT user_id AS k, CAST(date_trunc('week', ts) AS DATE) AS week FROM events))
        |GROUP BY 1, 2""".stripMargin,
    "sessionize" ->
      """SELECT user_id, CAST(MAX(session_id) + 1 AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM (
        |  SELECT user_id,
        |    SUM(CASE WHEN prev_ts IS NULL THEN 0
        |             WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (SELECT user_id, ts, event_id,
        |          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events))
        |GROUP BY user_id""".stripMargin,
    "pseudonymize" ->
      """SELECT sha256(CAST(user_id AS VARCHAR)) AS uid_hash, COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "incremental_watermark" ->
      """SELECT event_type, COUNT(*) AS n, MAX(ts) AS max_ts FROM events
        |WHERE ts > TIMESTAMP '2024-01-25 00:00:00' GROUP BY event_type""".stripMargin,
    "tumbling_window_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events GROUP BY 1, 2""".stripMargin,
    "sliding_window_agg" ->
      """SELECT win_start, event_type, COUNT(*) AS n FROM (
        |  SELECT date_trunc('hour', ts) AS win_start, event_type FROM events
        |  UNION ALL
        |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type FROM events)
        |GROUP BY 1, 2""".stripMargin,
    "theme_distribution" ->
      """SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars_sum
        |FROM documents GROUP BY lang, source""".stripMargin,
    "demog_crosstab" ->
      """SELECT event_type, CASE WHEN value < 10 THEN 'small'
        |                        WHEN value < 100 THEN 'mid'
        |                        ELSE 'large' END AS value_band,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "messages_column_view" ->
      """SELECT e.event_id, e.user_id, e.value,
        |  COALESCE(d.signup_n, 0) AS signup_n, d.first_signup_ts
        |FROM (SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase') e
        |LEFT JOIN (SELECT user_id, COUNT(*) AS signup_n, MIN(ts) AS first_signup_ts
        |           FROM events WHERE event_type = 'signup' GROUP BY user_id) d
        |  ON e.user_id = d.user_id""".stripMargin,
    "clean_responses" ->
      """SELECT CASE WHEN cleaned IS NULL THEN 'INVALID'
        |            WHEN cleaned < 20 THEN '10s'
        |            WHEN cleaned < 40 THEN '20-39'
        |            WHEN cleaned < 60 THEN '40-59'
        |            ELSE '60+' END AS age_band,
        |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN a IS NOT NULL AND a >= 10 AND a <= 99 THEN a END AS cleaned
        |  FROM (SELECT user_id,
        |    CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9
        |              THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) AS a
        |        FROM events))
        |GROUP BY 1""".stripMargin,
    "membership_tagging" ->
      """SELECT COALESCE(c.c_mktsegment, 'NON_MEMBER') AS membership_group,
        |  COUNT(*) AS n, COUNT(DISTINCT e.user_id) AS n_users
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey - 1
        |GROUP BY 1""".stripMargin,
    "advert_nonrelevant_uuids" ->
      """SELECT user_id, MAX(value) AS max_value, COUNT(*) AS n_answers
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id HAVING MAX(value) < 50""".stripMargin,
    "asof_join_native" ->
asofOracle,
    "asof_join" ->
asofOracle,
    // same carried-match shape; DuckDB lacks ASOF tolerance, so the oracle
    // nulls out over-age matches over the plain as-of result — exactly the
    // engine's emission gate
    "asof_tolerance" ->
      s"""SELECT event_id, user_id, ts, value,
         |  CASE WHEN click_ts >= ts - INTERVAL 600 SECOND THEN click_ts END AS click_ts,
         |  CASE WHEN click_ts >= ts - INTERVAL 600 SECOND THEN click_value END AS click_value
         |FROM ($asofOracle)""".stripMargin,
    // DuckDB ASOF accepts the flipped inequality natively; right side
    // deduped to latest-per-(key, ts) exactly like the backward oracle
    "asof_forward" ->
      """SELECT l.event_id, l.user_id, l.ts, l.value,
        |  r.ts AS click_ts, r.value AS click_value
        |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, value FROM (
        |    SELECT user_id, ts, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'click')
        |  WHERE rn = 1) r
        |  ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin,
    // split convention pinned (spec'd): Spark session_window merges a
    // touching window too — an event at EXACTLY prev+gap continues the
    // session, one past it splits (same inclusive boundary as sessionize)
    "session_window_agg" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events WHERE ts IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, MIN(ts) AS win_start, MAX(ts) + INTERVAL 30 MINUTE AS win_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "funnel_within" ->
      """WITH f AS (SELECT user_id, MIN(ts) AS t0 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT f.user_id,
        |        EXISTS (SELECT 1 FROM events e WHERE e.event_type = 'purchase'
        |                AND e.user_id = f.user_id AND e.ts > f.t0
        |                AND e.ts <= f.t0 + INTERVAL 2 DAY) AS conv
        |      FROM f)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_entered,
        |  CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |  CASE WHEN COUNT(*) <> 0 THEN
        |    floor((CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS DOUBLE)
        |           / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |  END AS conv_rate
        |FROM c""".stripMargin,
    // theta sketch exact regime: the estimate IS the distinct count
    "sketch_distinct_users" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
        |FROM events GROUP BY 1""".stripMargin,
    "value_ntiles" ->
      """SELECT event_type, CAST(decile AS INT) AS decile,
        |  CAST(COUNT(*) AS BIGINT) AS n, MIN(value) AS lo, MAX(value) AS hi
        |FROM (
        |  SELECT event_type, value, event_id,
        |    NTILE(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
        |  FROM events WHERE value IS NOT NULL)
        |GROUP BY 1, 2""".stripMargin,
    // identical semantics to value_ntiles — the distributed-rank path must
    // reproduce the window NTILE exactly
    "value_ntiles_dist" ->
      """SELECT CAST(event_type AS VARCHAR) AS group_key, CAST(decile AS INT) AS tile,
        |  CAST(COUNT(*) AS BIGINT) AS n, MIN(value) AS lo, MAX(value) AS hi
        |FROM (
        |  SELECT event_type, value, event_id,
        |    NTILE(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
        |  FROM events WHERE value IS NOT NULL)
        |GROUP BY 1, 2""".stripMargin,
    // nearest = the closer of the backward and forward oracles, ties to
    // backward — both sides are the SAME shared/flipped ASOF oracles
    "asof_nearest" ->
      s"""WITH b AS ($asofOracle),
         |f AS (
         |SELECT l.event_id, l.user_id, l.ts, l.value,
         |  r.ts AS click_ts, r.value AS click_value
         |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') l
         |ASOF LEFT JOIN (
         |  SELECT user_id, ts, value FROM (
         |    SELECT user_id, ts, value,
         |      ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
         |    FROM events WHERE event_type = 'click')
         |  WHERE rn = 1) r
         |  ON l.user_id = r.user_id AND l.ts <= r.ts)
         |SELECT b.event_id, b.user_id, b.ts, b.value,
         |  CASE WHEN f.click_ts IS NULL THEN b.click_ts
         |       WHEN b.click_ts IS NULL THEN f.click_ts
         |       WHEN b.ts - b.click_ts <= f.click_ts - f.ts THEN b.click_ts
         |       ELSE f.click_ts END AS click_ts,
         |  CASE WHEN f.click_ts IS NULL THEN b.click_value
         |       WHEN b.click_ts IS NULL THEN f.click_value
         |       WHEN b.ts - b.click_ts <= f.click_ts - f.ts THEN b.click_value
         |       ELSE f.click_value END AS click_value
         |FROM b JOIN f ON b.event_id = f.event_id""".stripMargin,
    // per-node triangle attribution: each id-ordered triangle unnests to
    // its three corners; coefficient NULL below degree 2
    "clustering_coeff" ->
      s"""WITH e0 AS (
         |  SELECT DISTINCT LEAST(user_id, CAST($propsIntSql % 150 AS BIGINT)) AS a,
         |    GREATEST(user_id, CAST($propsIntSql % 150 AS BIGINT)) AS b
         |  FROM events
         |  WHERE $propsIntSql IS NOT NULL AND user_id IS NOT NULL
         |    AND user_id <> CAST($propsIntSql % 150 AS BIGINT)),
         |tri AS (SELECT x.a AS a, x.b AS b, y.b AS c
         |        FROM e0 x JOIN e0 y ON y.a = x.b JOIN e0 z ON z.a = x.a AND z.b = y.b),
         |pern AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
         |         FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY 1),
         |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
         |        FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1)
         |SELECT deg.node, deg.deg, COALESCE(pern.n_tri, 0) AS n_tri,
         |  CASE WHEN deg.deg >= 2 THEN
         |    floor((2.0 * CAST(COALESCE(pern.n_tri, 0) AS DOUBLE)
         |           / CAST(deg.deg * (deg.deg - 1) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         |  END AS coeff
         |FROM deg LEFT JOIN pern ON deg.node = pern.node""".stripMargin,
    // the oracle counts triangles with the simple id-ordered 3-way join —
    // orientation scheme changes the WORK, never the count
    "triangle_count" ->
      s"""WITH e0 AS (
         |  SELECT DISTINCT LEAST(user_id, CAST($propsIntSql % 150 AS BIGINT)) AS a,
         |    GREATEST(user_id, CAST($propsIntSql % 150 AS BIGINT)) AS b
         |  FROM events
         |  WHERE $propsIntSql IS NOT NULL AND user_id IS NOT NULL
         |    AND user_id <> CAST($propsIntSql % 150 AS BIGINT)),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM
         |        (SELECT a AS v FROM e0 UNION SELECT b FROM e0)),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e0),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
         |      FROM e0 x JOIN e0 y ON x.b = y.a JOIN e0 z ON z.a = x.a AND z.b = y.b)
         |SELECT n_nodes, n_edges, n_triangles FROM n, m, t""".stripMargin,
    // both orientations of each canonical edge; exact DECIMAL degree
    // moments; the corr_matrix IEEE shape
    "degree_assortativity" ->
      s"""WITH e0 AS (
         |  SELECT DISTINCT LEAST(user_id, CAST($propsIntSql % 150 AS BIGINT)) AS a,
         |    GREATEST(user_id, CAST($propsIntSql % 150 AS BIGINT)) AS b
         |  FROM events
         |  WHERE $propsIntSql IS NOT NULL AND user_id IS NOT NULL
         |    AND user_id <> CAST($propsIntSql % 150 AS BIGINT)),
         |dg AS (
         |  SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM
         |    (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
         |dir AS (
         |  SELECT a AS x, b AS y FROM e0 UNION ALL SELECT b, a FROM e0),
         |p AS (
         |  SELECT CAST(dx.deg AS DECIMAL(19,0)) AS qx,
         |    CAST(dy.deg AS DECIMAL(19,0)) AS qy
         |  FROM dir JOIN dg dx ON dir.x = dx.node JOIN dg dy ON dir.y = dy.node),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    SUM(qx) AS sx, SUM(qy) AS sy,
         |    SUM(qx * qx) AS sxx, SUM(qy * qy) AS syy, SUM(qx * qy) AS sxy
         |  FROM p),
         |cnt AS (
         |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dg) AS n_nodes,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges),
         |v AS (
         |  SELECT n_nodes, n_edges, n,
         |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
         |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
         |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov
         |  FROM cnt, m)
         |SELECT n_nodes, n_edges,
         |  CASE WHEN n >= 2 AND vx > 0.0 AND vy > 0.0
         |    THEN floor((cov / (sqrt(vx) * sqrt(vy))) * 1000000.0 + 0.5) / 1000000.0
         |  END AS assortativity
         |FROM v""".stripMargin,
    "l_diversity" ->
      """WITH g AS (
        |  SELECT event_type, date_trunc('week', ts) AS wk, CAST(user_id % 7 AS INT) AS band,
        |    CAST(COUNT(DISTINCT CAST(floor(value / 25) AS INT)) AS BIGINT) AS l,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |  CAST(SUM(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
        |  MIN(l) AS min_l
        |FROM g""".stripMargin,
    // Spark percentile ≡ DuckDB quantile_cont (the value_quantiles
    // mapping); means via the explicit 6-decimal floor quantization —
    // interpolated cutpoints have arbitrary decimals, so a bare
    // decimal cast would round per-dialect
    "winsorize_stats" ->
      """WITH rows_ AS (SELECT event_type AS g, value AS v FROM events WHERE value IS NOT NULL),
        |cuts AS (SELECT g,
        |           floor(quantile_cont(v, 0.05) * 1000000.0 + 0.5) / 1000000.0 AS lo,
        |           floor(quantile_cont(v, 0.95) * 1000000.0 + 0.5) / 1000000.0 AS hi
        |         FROM rows_ GROUP BY 1),
        |j AS (SELECT r.g, r.v, LEAST(GREATEST(r.v, c.lo), c.hi) AS w, c.lo, c.hi
        |      FROM rows_ r JOIN cuts c ON r.g = c.g)
        |SELECT g AS group_key, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
        |  CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
        |  floor((CAST(SUM(CAST(floor(v * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS mean_raw,
        |  floor((CAST(SUM(CAST(floor(w * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS mean_winsorized
        |FROM j GROUP BY 1""".stripMargin,
    "rolling_mean" ->
      """SELECT user_id, ts, event_id, value,
        |  floor((CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |         / CAST(COUNT(value) OVER w AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS roll_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
    "feature_lags" ->
      """SELECT user_id, ts, event_id, value,
        |  LAG(value, 1) OVER w AS lag_1,
        |  LAG(value, 2) OVER w AS lag_2,
        |  LAG(value, 3) OVER w AS lag_3,
        |  CAST(floor((CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS BIGINT)
        |              - CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', LAG(ts, 1) OVER w) AS BIGINT))
        |             / 1000000.0) AS BIGINT) AS dt_sec,
        |  floor((CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER wr AS DOUBLE)
        |         / CAST(COUNT(value) OVER wr AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS roll_mean_3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  wr AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
    "resample_hourly" ->
      """WITH ev AS (SELECT * FROM events WHERE ts IS NOT NULL),
        |r AS (SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM ev),
        |hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM r),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |c AS (SELECT date_trunc('hour', ts) AS hour, event_type,
        |        CAST(COUNT(*) AS BIGINT) AS n_raw
        |      FROM ev GROUP BY 1, 2)
        |SELECT h.hour, t.event_type, COALESCE(c.n_raw, 0) AS n
        |FROM hours h CROSS JOIN types t
        |LEFT JOIN c ON c.hour = h.hour AND c.event_type = t.event_type""".stripMargin,
    // ordered EMD over the global distinct-value axis: exact-long
    // cumulatives, fixed IEEE divisions, q6 terms DECIMAL-summed, one
    // division by (m-1) at the end
    "t_closeness" ->
      """WITH r AS (
        |  SELECT event_type AS g, value AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |gv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cq FROM r GROUP BY 1),
        |gr AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng FROM r GROUP BY 1),
        |tt AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(cq) AS BIGINT) AS nn
        |  FROM gv HAVING COUNT(*) >= 2),
        |gc AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM r GROUP BY 1, 2),
        |sp AS (
        |  SELECT gr.g, gr.ng, gv.v, gv.cq, COALESCE(gc.c, 0) AS c
        |  FROM gv CROSS JOIN gr
        |  LEFT JOIN gc ON gc.g = gr.g AND gc.v = gv.v),
        |cu AS (
        |  SELECT g, ng, c, cq,
        |    SUM(c) OVER (PARTITION BY g ORDER BY v) AS cumc,
        |    SUM(cq) OVER (PARTITION BY g ORDER BY v) AS cumq
        |  FROM sp),
        |te AS (
        |  SELECT g, ng, m,
        |    CAST(floor(ABS(CAST(cumc AS DOUBLE) / CAST(ng AS DOUBLE)
        |                   - CAST(cumq AS DOUBLE) / CAST(nn AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6)) AS term
        |  FROM cu CROSS JOIN tt),
        |f AS (
        |  SELECT g AS group_key, MAX(ng) AS n,
        |    floor((CAST(SUM(term) AS DOUBLE) / CAST(MAX(m) - 1 AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 AS t_emd
        |  FROM te GROUP BY 1)
        |SELECT group_key, n, t_emd, t_emd > 0.2 AS violating FROM f""".stripMargin,
    "k_anonymity" ->
      """WITH g AS (
        |  SELECT event_type, date_trunc('week', ts) AS wk,
        |    CAST(user_id % 7 AS INT) AS band, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
        |  MIN(n) AS min_group_size
        |FROM g""".stripMargin,
    // 5 unrolled iterations of the SAME quantized fixpoint the engine runs:
    // r6 contributions, DECIMAL sums, r6 re-round per iteration — every
    // literal (0.75, 0.25, 1e6) binary-exact so DECIMAL-vs-double literal
    // parsing cannot diverge
    "pagerank" -> {
      val prelude =
        s"""WITH e AS (
           |  SELECT DISTINCT user_id AS src, CAST($propsIntSql % 150 AS BIGINT) AS dst
           |  FROM events WHERE $propsIntSql IS NOT NULL AND user_id IS NOT NULL),
           |odeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS o FROM e GROUP BY 1),
           |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
           |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
           |p0 AS (SELECT node, floor((1.0 / n) * 1000000.0 + 0.5) / 1000000.0 AS rank
           |       FROM nodes CROSS JOIN nn)""".stripMargin
      val iterCtes = (1 to 5).map { i =>
        s"""p$i AS (
           |  SELECT nodes.node,
           |    floor(((1.0 - 0.75) / n + 0.75 * COALESCE(CAST(s.sm AS DOUBLE), 0.0)) * 1000000.0 + 0.5) / 1000000.0 AS rank
           |  FROM nodes CROSS JOIN nn LEFT JOIN (
           |    SELECT e.dst AS node,
           |      SUM(CAST(floor((p.rank / CAST(o.o AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6))) AS sm
           |    FROM p${i - 1} p JOIN odeg o ON p.node = o.src JOIN e ON e.src = o.src
           |    GROUP BY 1) s ON s.node = nodes.node)""".stripMargin
      }
      prelude + ",\n" + iterCtes.mkString(",\n") + "\nSELECT node, rank FROM p5"
    },
    "event_paths" ->
      """WITH seq AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER w AS step2,
        |    lead(event_type, 2) OVER w AS step3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n_paths
        |FROM seq WHERE step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, step1, step2, step3 LIMIT 20""".stripMargin,
    "coder_agreement" ->
      s"""WITH j AS (
         |  SELECT 'c' || CAST($propsIntSql % 4 AS VARCHAR) AS a,
         |    'c' || CAST(CASE WHEN value > 75 THEN ($propsIntSql + 1) % 4
         |                     ELSE $propsIntSql % 4 END AS VARCHAR) AS b
         |  FROM events
         |  WHERE $propsIntSql IS NOT NULL
         |    AND (CASE WHEN value > 75 THEN ($propsIntSql + 1) % 4
         |              ELSE $propsIntSql % 4 END) IS NOT NULL),
         |cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM j GROUP BY 1, 2),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_items,
         |          CAST(SUM(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT) AS agree
         |        FROM cells),
         |ma AS (SELECT a AS cat, CAST(SUM(n) AS BIGINT) AS na FROM cells GROUP BY 1),
         |mb AS (SELECT b AS cat, CAST(SUM(n) AS BIGINT) AS nb FROM cells GROUP BY 1),
         |cr AS (SELECT CAST(SUM(ma.na * mb.nb) AS BIGINT) AS crs
         |       FROM ma JOIN mb ON ma.cat = mb.cat)
         |SELECT n_items,
         |  floor((CAST(agree AS DOUBLE) / CAST(n_items AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS po,
         |  floor((CAST(crs AS DOUBLE) / CAST(n_items * n_items AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS pe,
         |  CASE WHEN CAST(crs AS DOUBLE) / CAST(n_items * n_items AS DOUBLE) < 1.0 THEN
         |    floor(((CAST(agree AS DOUBLE) / CAST(n_items AS DOUBLE)
         |            - CAST(crs AS DOUBLE) / CAST(n_items * n_items AS DOUBLE))
         |           / (1.0 - CAST(crs AS DOUBLE) / CAST(n_items * n_items AS DOUBLE)))
         |          * 1000000.0 + 0.5) / 1000000.0 END AS kappa
         |FROM tot, cr""".stripMargin,
    "regression_ols" ->
      """SELECT event_type, n,
        |  CASE WHEN abs(n * sxx - sx * sx) > 1e-9 * greatest(abs(n * sxx), abs(sx * sx))
        |       THEN floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1000000.0 + 0.5) / 1000000.0 END AS slope,
        |  CASE WHEN abs(n * sxx - sx * sx) > 1e-9 * greatest(abs(n * sxx), abs(sx * sx))
        |       THEN floor(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) * 1000000.0 + 0.5) / 1000000.0 END AS intercept
        |FROM (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(xd) AS DOUBLE) AS sx, CAST(SUM(yd) AS DOUBLE) AS sy,
        |    CAST(SUM(xd * xd) AS DOUBLE) AS sxx, CAST(SUM(xd * yd) AS DOUBLE) AS sxy
        |  FROM (SELECT event_type,
        |          CAST(CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) AS DECIMAL(18,2)) AS xd,
        |          CAST(value AS DECIMAL(18,2)) AS yd
        |        FROM events
        |        WHERE CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) IS NOT NULL AND value IS NOT NULL)
        |  GROUP BY event_type)""".stripMargin,
    "regression_ols2" ->
      """SELECT event_type, n,
        |  CASE WHEN abs(det) > 1e-9 * greatest(abs(s11 * s22), abs(s12 * s12))
        |       THEN floor(((s22 * s1y - s12 * s2y) / det) * 1000000.0 + 0.5) / 1000000.0 END AS b1,
        |  CASE WHEN abs(det) > 1e-9 * greatest(abs(s11 * s22), abs(s12 * s12))
        |       THEN floor(((s11 * s2y - s12 * s1y) / det) * 1000000.0 + 0.5) / 1000000.0 END AS b2,
        |  CASE WHEN abs(det) > 1e-9 * greatest(abs(s11 * s22), abs(s12 * s12))
        |       THEN floor(((sy - ((s22 * s1y - s12 * s2y) / det) * sx1
        |                      - ((s11 * s2y - s12 * s1y) / det) * sx2) / n) * 1000000.0 + 0.5) / 1000000.0 END AS b0
        |FROM (
        |  SELECT *, s11 * s22 - s12 * s12 AS det FROM (
        |    SELECT *,
        |      sx1x1 - sx1 * sx1 / n AS s11,
        |      sx2x2 - sx2 * sx2 / n AS s22,
        |      sx1x2 - sx1 * sx2 / n AS s12,
        |      sx1y - sx1 * sy / n AS s1y,
        |      sx2y - sx2 * sy / n AS s2y
        |    FROM (
        |      SELECT event_type, COUNT(*) AS n,
        |        CAST(SUM(x1d) AS DOUBLE) AS sx1, CAST(SUM(x2d) AS DOUBLE) AS sx2,
        |        CAST(SUM(yd) AS DOUBLE) AS sy,
        |        CAST(SUM(x1d * x1d) AS DOUBLE) AS sx1x1,
        |        CAST(SUM(x2d * x2d) AS DOUBLE) AS sx2x2,
        |        CAST(SUM(x1d * x2d) AS DOUBLE) AS sx1x2,
        |        CAST(SUM(x1d * yd) AS DOUBLE) AS sx1y,
        |        CAST(SUM(x2d * yd) AS DOUBLE) AS sx2y
        |      FROM (
        |        SELECT event_type,
        |          CAST(CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) AS DECIMAL(18,2)) AS x1d,
        |          CAST(EXTRACT(HOUR FROM ts) AS DECIMAL(18,2)) AS x2d,
        |          CAST(value AS DECIMAL(18,2)) AS yd
        |        FROM events
        |        WHERE CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) IS NOT NULL AND value IS NOT NULL)
        |      GROUP BY event_type)))""".stripMargin,
    // mirrors olsImputedByGroup's closed-form imputed moments with the
    // SAME IEEE expression tree (m, then sx+nmiss*m etc.) for bit parity
    "regression_ols_imputed" ->
      """SELECT event_type, n, n_obs,
        |  CASE WHEN n_obs > 0 AND abs(n * sxxall - sxall * sxall)
        |            > 1e-9 * greatest(abs(n * sxxall), abs(sxall * sxall))
        |       THEN floor(((n * sxyall - sxall * sy) / (n * sxxall - sxall * sxall)) * 1000000.0 + 0.5) / 1000000.0 END AS slope,
        |  CASE WHEN n_obs > 0 AND abs(n * sxxall - sxall * sxall)
        |            > 1e-9 * greatest(abs(n * sxxall), abs(sxall * sxall))
        |       THEN floor(((sy - ((n * sxyall - sxall * sy) / (n * sxxall - sxall * sxall)) * sxall) / n) * 1000000.0 + 0.5) / 1000000.0 END AS intercept
        |FROM (
        |  SELECT event_type, n, n_obs, sy,
        |    sx + nmiss * m AS sxall,
        |    sxx + nmiss * m * m AS sxxall,
        |    sxy + m * COALESCE(sy_miss, 0) AS sxyall
        |  FROM (
        |    SELECT *, CAST(n - n_obs AS DOUBLE) AS nmiss,
        |      sx / (CASE WHEN n_obs > 0 THEN CAST(n_obs AS DOUBLE) END) AS m
        |    FROM (
        |      SELECT event_type, COUNT(*) AS n, COUNT(xd) AS n_obs,
        |        CAST(SUM(xd) AS DOUBLE) AS sx,
        |        CAST(SUM(xd * xd) AS DOUBLE) AS sxx,
        |        CAST(SUM(xd * yd) AS DOUBLE) AS sxy,
        |        CAST(SUM(yd) AS DOUBLE) AS sy,
        |        CAST(SUM(CASE WHEN xd IS NULL THEN yd END) AS DOUBLE) AS sy_miss
        |      FROM (
        |        SELECT event_type,
        |          CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 20
        |               THEN NULL
        |               ELSE CAST(CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) AS DECIMAL(18,2)) END AS xd,
        |          CAST(value AS DECIMAL(18,2)) AS yd
        |        FROM events WHERE value IS NOT NULL)
        |      GROUP BY event_type)))""".stripMargin,
    // generated twins: the SAME step program that builds the Spark plans is
    // rendered to DuckDB CTEs (Glm.*OracleSql), so the two engines execute
    // identical expression trees — only the row-prep dialect differs
    "regression_ols_multi" ->
      graft.analysis.Glm.olsMultiOracleSql(
        demogRowsSql(Seq("CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)"), "value"),
        "event_type", 6,
        Seq("b0", "b_gender", "b_disability", "b_age1", "b_age2", "b_hour")),
    "regression_logit" ->
      graft.analysis.Glm.logitOracleSql(
        "SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS __x1, " +
          s"$logitYSql AS __y FROM events",
        "event_type", 2, Seq("b0", "b_hour")),
    "regression_huber" ->
      graft.analysis.Glm.huberOracleSql(
        "SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS __x1, " +
          "value AS __y FROM events",
        "event_type", 2, Seq("b0", "b_hour"), delta = 150.0),
    "regression_logit_multi" ->
      graft.analysis.Glm.logitOracleSql(
        demogRowsSql(Seq.empty, logitYSql),
        "event_type", 5,
        Seq("b0", "b_gender", "b_disability", "b_age1", "b_age2")),
    "regression_mi_pooled" ->
      graft.analysis.Glm.miPooledOracleSql(
        s"SELECT event_type, event_id AS __id, " +
          s"CASE WHEN ${graft.analysis.Glm.duckPctSql("event_id", 1)} < 20 THEN NULL " +
          s"ELSE CAST(__k % 97 AS DECIMAL(18,2)) END AS __xd, " +
          s"CAST(value AS DECIMAL(18,2)) AS __yd " +
          s"FROM (SELECT event_type, event_id, value, $propsIntSql AS __k FROM events)",
        "event_type", draws = 5, firstOffset = 2),
    "regression_mi_logit" ->
      graft.analysis.Glm.miLogitPooledOracleSql(
        s"SELECT event_type, event_id AS __id, " +
          s"CASE WHEN ${graft.analysis.Glm.duckPctSql("event_id", 1)} < 20 THEN NULL " +
          s"ELSE CAST(__k % 97 AS DECIMAL(18,2)) END AS __xd, " +
          s"$logitYSql AS __y " +
          s"FROM (SELECT event_type, event_id, value, $propsIntSql AS __k FROM events)",
        "event_type", draws = 3, firstOffset = 2),
    "value_quantiles" ->
      """SELECT event_type, floor((quantile_cont(value, 0.5)) * 1000000.0 + 0.5) / 1000000.0 AS p50,
        |  floor((quantile_cont(value, 0.9)) * 1000000.0 + 0.5) / 1000000.0 AS p90
        |FROM events GROUP BY event_type""".stripMargin,
    "value_quantiles_sketch" ->
      // the sketch runs in its exact regime at test scale (capacity >>
      // distinct token counts), so the nearest-rank (lower) quantile with
      // the IDENTICAL integer rank formula — max(1, (q‰*n+999) div 1000)
      // — reproduces it; no IEEE 0.95*n knife edges on either side
      """WITH t AS (
        |  SELECT source, CAST(len(string_split(text, ' ')) AS DOUBLE) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (
        |  SELECT source, v,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY v) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM t)
        |SELECT source,
        |  MAX(CASE WHEN rn = GREATEST(1, (250 * n + 999) // 1000) THEN v END) AS p25,
        |  MAX(CASE WHEN rn = GREATEST(1, (500 * n + 999) // 1000) THEN v END) AS p50,
        |  MAX(CASE WHEN rn = GREATEST(1, (750 * n + 999) // 1000) THEN v END) AS p75,
        |  MAX(CASE WHEN rn = GREATEST(1, (950 * n + 999) // 1000) THEN v END) AS p95
        |FROM r GROUP BY source""".stripMargin,
    "normalize_scheme_versions" ->
      """SELECT base_scheme, COUNT(*) AS n_latest,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM (
        |  SELECT base_scheme, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, base_scheme ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM (
        |    SELECT user_id, ts, event_id, value,
        |      regexp_replace(scheme, '-[0-9]+$', '') AS base_scheme
        |    FROM (
        |      SELECT user_id, ts, event_id, value,
        |        'sch' || CAST(k % 5 AS VARCHAR) || (CASE WHEN k % 7 = 0 THEN '-1' ELSE '' END) AS scheme
        |      FROM (SELECT user_id, ts, event_id, value,
        |              CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) AS k
        |            FROM events))))
        |WHERE rn = 1 GROUP BY base_scheme""".stripMargin,
    "latest_label_per_scheme" ->
      """SELECT user_id,
        |  MAX(CASE WHEN event_type = 'click' THEN value END) AS click_code,
        |  MAX(CASE WHEN event_type = 'view' THEN value END) AS view_code,
        |  MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchase_code,
        |  MAX(CASE WHEN event_type = 'signup' THEN value END) AS signup_code,
        |  MAX(CASE WHEN event_type = 'error' THEN value END) AS error_code
        |FROM (
        |  SELECT user_id, event_type, value FROM (
        |    SELECT user_id, event_type, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events)
        |  WHERE rn = 1)
        |GROUP BY user_id""".stripMargin,
    "demog_conflicts" ->
      """SELECT event_type,
        |  COUNT(*) FILTER (WHERE nd > 1) AS n_conflicted,
        |  COUNT(*) FILTER (WHERE nd <= 1) AS n_consistent
        |FROM (
        |  SELECT user_id, event_type,
        |    COUNT(DISTINCT CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT)) AS nd
        |  FROM events GROUP BY user_id, event_type)
        |GROUP BY event_type""".stripMargin,
    "repeat_participations" ->
      """SELECT n_episodes, COUNT(*) AS n_participants FROM (
        |  SELECT user_id, COUNT(*) AS n_episodes FROM (
        |    SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events)
        |  GROUP BY user_id)
        |GROUP BY n_episodes""".stripMargin,
    "dedup_components" ->
      s"""$componentCtes
         |SELECT doc_id, component FROM comps""".stripMargin,
    "dedup_keep_best" ->
      s"""$componentCtes,
         |qual AS (
         |  SELECT doc_id, ${qualityScoreExprSql("qscore")}
         |  FROM (
         |    $qualityCountsSql))
         |SELECT component,
         |  CAST(-((max({'q': qscore, 'nid': -doc_id})).nid) AS BIGINT) AS keeper_id,
         |  CAST(count(*) AS BIGINT) AS n_members
         |FROM comps JOIN qual USING (doc_id)
         |GROUP BY component""".stripMargin,
    "quality_filter" ->
      s"""SELECT decision, COUNT(*) AS n_docs FROM (
         |${gopherDecisionSql("", "")})
         |GROUP BY decision""".stripMargin,
    "corpus_report" -> {
      val inner = s"source, lang, $sqlTokCount AS n_tok,"
      val outer = "source, lang, n_tok,"
      s"""SELECT source, n_docs, n_tokens, n_kept, n_langs,
         |  floor((CAST(n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS keep_rate
         |FROM (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |    CAST(SUM(CASE WHEN decision = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
         |  FROM (
         |${gopherDecisionSql(inner, outer)})
         |  GROUP BY source)""".stripMargin
    },
    "vocab_build" ->
      s"""WITH $vocabCte
         |SELECT token, freq, token_id FROM v""".stripMargin,
    "encode_docs" ->
      s"""WITH $vocabCte,
         |toks AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS ts FROM documents),
         |ex AS (
         |  SELECT doc_id, i - 1 AS pos, ts[i] AS token
         |  FROM toks, unnest(generate_series(1, len(ts))) AS g(i))
         |SELECT e.doc_id, CAST(e.pos AS INT) AS pos, COALESCE(v.token_id, 0) AS token_id
         |FROM ex e LEFT JOIN v ON e.token = v.token""".stripMargin,
    "bpe_pair_counts" ->
      // the topWords cap mirrors the Spark side's wordFreqs limit — today's
      // corpus has 31 word types so it never binds, but the contract must
      // not silently diverge if the testdata's vocabulary ever grows
      """WITH wf AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS word FROM documents)
        |  GROUP BY word
        |  ORDER BY freq DESC, word ASC LIMIT 100000),
        |pairs AS (
        |  SELECT substr(word, i, 1) AS left_sym, substr(word, i + 1, 1) AS right_sym, freq
        |  FROM wf, unnest(generate_series(1, len(word) - 1)) AS t(i))
        |SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS pair_count
        |FROM pairs GROUP BY left_sym, right_sym""".stripMargin,
    "chunk_docs" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id, CAST(i AS INT) AS chunk_id,
        |  CAST(len(w[i*24+1:i*24+32]) AS BIGINT) AS n_tokens,
        |  array_to_string(w[i*24+1:i*24+32], ' ') AS chunk
        |FROM ws, unnest(generate_series(0, (greatest(0, len(w) - 32) + 23) // 24)) AS g(i)""".stripMargin,
    "curation_funnel" -> {
      val inner = s"doc_id, lang AS source, $sqlTokCount AS n_tok,"
      val outer = "doc_id, source, n_tok, text,"
      s"""WITH base AS (
         |${gopherDecisionSql(inner, outer)}),
         |f AS (SELECT doc_id, source, n_tok, text, decision = 'kept' AS q FROM base),
         |firsts AS (SELECT text, MIN(doc_id) AS first_id FROM f WHERE q GROUP BY text),
         |staged AS (
         |  SELECT f.doc_id, f.source, f.n_tok, f.q,
         |    (f.q AND f.doc_id = firsts.first_id) AS d,
         |    (f.q AND f.doc_id = firsts.first_id AND
         |     ('0x' || substr(md5(CAST(f.doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 <
         |       CASE f.source WHEN 'en' THEN 100 WHEN 'fr' THEN 50 WHEN 'es' THEN 25
         |                     WHEN 'de' THEN 10 WHEN 'zh' THEN 75 ELSE 100 END) AS m
         |  FROM f LEFT JOIN firsts ON f.text = firsts.text)
         |SELECT stage, stage_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         |FROM (
         |  SELECT 0 AS stage, 'ingested' AS stage_name, n_tok FROM staged
         |  UNION ALL SELECT 1, 'quality_filter', n_tok FROM staged WHERE q
         |  UNION ALL SELECT 2, 'exact_dedup', n_tok FROM staged WHERE d
         |  UNION ALL SELECT 3, 'mixture', n_tok FROM staged WHERE m)
         |GROUP BY stage, stage_name""".stripMargin
    },
    // composes the SHARED recursive-component prologue, the Gopher
    // decision, the keep-best struct-max rule, and the mixture coin —
    // every piece verbatim from its standalone oracle, so the composed
    // report cannot drift from the operators it composes
    "curation_funnel_fuzzy" ->
      s"""$fuzzyCurationCtes
         |SELECT stage, stage_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         |FROM (
         |  SELECT 0 AS stage, 'ingested' AS stage_name, n_tok FROM staged
         |  UNION ALL SELECT 1, 'quality_filter', n_tok FROM staged WHERE q
         |  UNION ALL SELECT 2, 'neardup_dedup', n_tok FROM staged WHERE d
         |  UNION ALL SELECT 3, 'mixture', n_tok FROM staged WHERE m)
         |GROUP BY stage, stage_name""".stripMargin,
    "curation_export_fuzzy" ->
      s"""$fuzzyCurationCtes
         |SELECT doc_id, source, n_tok FROM staged WHERE m""".stripMargin,
    "configured_curation_export" ->
      s"""$fuzzyCurationCtes
         |SELECT doc_id, source, n_tok,
         |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 4))::BIGINT % 100 < 90
         |       THEN 'train'
         |       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 4))::BIGINT % 100 < 95
         |       THEN 'val' ELSE 'test' END AS split,
         |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4))::BIGINT % 8 AS shard
         |FROM staged WHERE m""".stripMargin,
    "dup_span_stats" ->
      """WITH lw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (
        |  SELECT doc_id, array_to_string(w[i*8+1:i*8+16], ' ') AS chunk,
        |    len(w[i*8+1:i*8+16]) AS n
        |  FROM lw, unnest(generate_series(0, (greatest(0, len(w) - 16) + 7) // 8)) AS g(i)),
        |spans AS (SELECT doc_id, chunk FROM ch WHERE n = 16),
        |fr AS (SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs FROM spans GROUP BY chunk),
        |st AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |    CAST(SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        |  FROM spans JOIN fr USING (chunk) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(st.n_spans, 0) AS n_spans, COALESCE(st.n_shared, 0) AS n_shared,
        |  CASE WHEN COALESCE(st.n_spans, 0) > 0
        |       THEN floor((CAST(st.n_shared AS DOUBLE) / CAST(st.n_spans AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 END AS shared_frac
        |FROM (SELECT doc_id FROM documents) d LEFT JOIN st ON d.doc_id = st.doc_id""".stripMargin,
    // brute-force shared-shingle formulation over ALL pairs (a < b): the
    // engine's prefix-filtered candidates must reproduce it exactly —
    // equality here is the prefix rule's zero-false-negative proof
    "dedup_prefix_filter" ->
      """WITH shl AS (
        |  SELECT doc_id, list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                                 for i in generate_series(1, len(w)-2) ]) AS shingles
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |sets AS (SELECT doc_id, len(shingles) AS sz, s FROM shl, unnest(shingles) AS t(s)),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    MAX(a.sz) AS sz_a, MAX(b.sz) AS sz_b, CAST(COUNT(*) AS BIGINT) AS i
        |  FROM sets a JOIN sets b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, floor((j) * 1000000.0 + 0.5) / 1000000.0 AS jaccard FROM (
        |  SELECT doc_a, doc_b,
        |    CAST(i AS DOUBLE) / CAST(sz_a + sz_b - i AS DOUBLE) AS j
        |  FROM inter)
        |WHERE j >= 0.4""".stripMargin,
    "token_entropy" ->
      """WITH tf AS (
        |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
        |    FROM documents)
        |  GROUP BY 1, 2),
        |wn AS (SELECT doc_id, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM tf),
        |parts AS (
        |  SELECT doc_id, n,
        |    CAST(floor((-((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |                   * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0
        |      AS DECIMAL(18,6)) AS part
        |  FROM wn),
        |st AS (SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
        |         CAST(SUM(part) AS DOUBLE) AS entropy
        |       FROM parts GROUP BY 1)
        |SELECT d.doc_id, COALESCE(st.n_tokens, 0) AS n_tokens, st.entropy
        |FROM (SELECT doc_id FROM documents) d LEFT JOIN st ON d.doc_id = st.doc_id""".stripMargin,
    // tiebreak on the key's STRING form — the engine's single-pass argmax
    // (min of (-count, key-string) struct) defines the contract
    "key_skew_report" ->
      """WITH c AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS c
        |           FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |a AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |        SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS s2
        |      FROM c),
        |t AS (SELECT CAST(k AS VARCHAR) AS top_key, c AS top_cnt
        |      FROM c ORDER BY c DESC, CAST(k AS VARCHAR) ASC LIMIT 1)
        |SELECT n_rows, n_keys, top_key, top_cnt,
        |  floor((CAST(top_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS top_share,
        |  floor((CAST(s2 AS DOUBLE) / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS hhi
        |FROM a LEFT JOIN t ON TRUE""".stripMargin,
    // per-cell (O-E)^2/E terms r6-quantized then DECIMAL-summed (the
    // token-entropy discipline); E's cast-then-multiply shape matches the
    // engine's IEEE expression exactly
    "chi2_independence" ->
      """WITH cells AS (
        |  SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
        |t AS (
        |  SELECT a, b, c,
        |    CAST(c AS DOUBLE) AS o,
        |    (CAST(SUM(c) OVER wa AS DOUBLE) * CAST(SUM(c) OVER wb AS DOUBLE))
        |      / CAST(SUM(c) OVER () AS DOUBLE) AS e,
        |    CAST(SUM(c) OVER () AS BIGINT) AS nl
        |  FROM cells WINDOW wa AS (PARTITION BY a), wb AS (PARTITION BY b)),
        |g AS (
        |  SELECT MAX(nl) AS n,
        |    CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a, CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b,
        |    SUM(CAST(floor(((o - e) * (o - e) / e) * 1000000.0 + 0.5) / 1000000.0
        |        AS DECIMAL(28,6))) AS chi2d
        |  FROM t)
        |SELECT n, n_a, n_b, (n_a - 1) * (n_b - 1) AS dof,
        |  CAST(chi2d AS DOUBLE) AS chi2,
        |  CASE WHEN (n_a - 1) * (n_b - 1) > 0 THEN
        |    floor(sqrt(CAST(chi2d AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(least(n_a - 1, n_b - 1) AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS cramers_v
        |FROM g""".stripMargin,
    // marginal entropy terms count once per CLASS via the row_number gate,
    // mirroring the engine's single-window fold over the cells frame
    "mutual_information" ->
      """WITH cells AS (
        |  SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
        |t AS (
        |  SELECT a, b, c,
        |    CAST(c AS DOUBLE) AS cd,
        |    CAST(SUM(c) OVER wa AS DOUBLE) AS ra,
        |    CAST(SUM(c) OVER wb AS DOUBLE) AS cb,
        |    CAST(SUM(c) OVER () AS DOUBLE) AS nd,
        |    CAST(SUM(c) OVER () AS BIGINT) AS nl,
        |    ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) AS rna,
        |    ROW_NUMBER() OVER (PARTITION BY b ORDER BY a) AS rnb
        |  FROM cells WINDOW wa AS (PARTITION BY a), wb AS (PARTITION BY b)),
        |g AS (
        |  SELECT MAX(nl) AS n,
        |    CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a, CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b,
        |    CAST(SUM(CAST(floor(((cd / nd) * ln((cd * nd) / (ra * cb))) * 1000000.0 + 0.5)
        |        / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE) AS mi,
        |    CAST(SUM(CAST(CASE WHEN rna = 1 THEN
        |        floor((-((ra / nd) * ln(ra / nd))) * 1000000.0 + 0.5) / 1000000.0
        |      ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE) AS h_a,
        |    CAST(SUM(CAST(CASE WHEN rnb = 1 THEN
        |        floor((-((cb / nd) * ln(cb / nd))) * 1000000.0 + 0.5) / 1000000.0
        |      ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE) AS h_b
        |  FROM t)
        |SELECT n, n_a, n_b, mi, h_a, h_b,
        |  CASE WHEN h_a > 0 AND h_b > 0 THEN
        |    floor((mi / sqrt(h_a * h_b)) * 1000000.0 + 0.5) / 1000000.0 END AS nmi
        |FROM g""".stripMargin,
    // per-feature masked moments in one pass; variance/corr fixed IEEE
    // shapes off the exact sums (products widened past the int64 decimal
    // path); near_zero true for degenerate features
    "feature_screen" ->
      """WITH r AS (
    |  SELECT
    |    l_extendedprice AS vt, CAST(floor(l_extendedprice * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS q_t,
    |    l_discount AS v_di, CAST(floor(l_discount * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS q_di,
    |    l_quantity AS v_qt, CAST(floor(l_quantity * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS q_qt,
    |    l_tax AS v_tx, CAST(floor(l_tax * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS q_tx
    |  FROM lineitem),
    |m AS (
    |  SELECT CAST(COUNT(*) AS BIGINT) AS rows_,
    |    CAST(COUNT(*) FILTER (v_di IS NOT NULL AND vt IS NOT NULL) AS BIGINT) AS n_di,
    |    CAST(SUM(CASE WHEN v_di IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS miss_di,
    |    SUM(q_di) FILTER (v_di IS NOT NULL AND vt IS NOT NULL) AS sf_di,
    |    SUM(CAST(q_di AS DECIMAL(19,6)) * CAST(q_di AS DECIMAL(19,6))) FILTER (v_di IS NOT NULL AND vt IS NOT NULL) AS sff_di,
    |    SUM(q_t) FILTER (v_di IS NOT NULL AND vt IS NOT NULL) AS st_di,
    |    SUM(CAST(q_t AS DECIMAL(19,6)) * CAST(q_t AS DECIMAL(19,6))) FILTER (v_di IS NOT NULL AND vt IS NOT NULL) AS stt_di,
    |    SUM(CAST(q_di AS DECIMAL(19,6)) * CAST(q_t AS DECIMAL(19,6))) FILTER (v_di IS NOT NULL AND vt IS NOT NULL) AS sft_di,
    |    CAST(COUNT(*) FILTER (v_qt IS NOT NULL AND vt IS NOT NULL) AS BIGINT) AS n_qt,
    |    CAST(SUM(CASE WHEN v_qt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS miss_qt,
    |    SUM(q_qt) FILTER (v_qt IS NOT NULL AND vt IS NOT NULL) AS sf_qt,
    |    SUM(CAST(q_qt AS DECIMAL(19,6)) * CAST(q_qt AS DECIMAL(19,6))) FILTER (v_qt IS NOT NULL AND vt IS NOT NULL) AS sff_qt,
    |    SUM(q_t) FILTER (v_qt IS NOT NULL AND vt IS NOT NULL) AS st_qt,
    |    SUM(CAST(q_t AS DECIMAL(19,6)) * CAST(q_t AS DECIMAL(19,6))) FILTER (v_qt IS NOT NULL AND vt IS NOT NULL) AS stt_qt,
    |    SUM(CAST(q_qt AS DECIMAL(19,6)) * CAST(q_t AS DECIMAL(19,6))) FILTER (v_qt IS NOT NULL AND vt IS NOT NULL) AS sft_qt,
    |    CAST(COUNT(*) FILTER (v_tx IS NOT NULL AND vt IS NOT NULL) AS BIGINT) AS n_tx,
    |    CAST(SUM(CASE WHEN v_tx IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS miss_tx,
    |    SUM(q_tx) FILTER (v_tx IS NOT NULL AND vt IS NOT NULL) AS sf_tx,
    |    SUM(CAST(q_tx AS DECIMAL(19,6)) * CAST(q_tx AS DECIMAL(19,6))) FILTER (v_tx IS NOT NULL AND vt IS NOT NULL) AS sff_tx,
    |    SUM(q_t) FILTER (v_tx IS NOT NULL AND vt IS NOT NULL) AS st_tx,
    |    SUM(CAST(q_t AS DECIMAL(19,6)) * CAST(q_t AS DECIMAL(19,6))) FILTER (v_tx IS NOT NULL AND vt IS NOT NULL) AS stt_tx,
    |    SUM(CAST(q_tx AS DECIMAL(19,6)) * CAST(q_t AS DECIMAL(19,6))) FILTER (v_tx IS NOT NULL AND vt IS NOT NULL) AS sft_tx
    |  FROM r),
    |u AS (
    |  SELECT 'l_discount' AS feature, n_di AS n, miss_di AS n_missing, rows_,
    |    CAST(sf_di AS DOUBLE) AS sf, CAST(sff_di AS DOUBLE) AS sff,
    |    CAST(st_di AS DOUBLE) AS st, CAST(stt_di AS DOUBLE) AS stt,
    |    CAST(sft_di AS DOUBLE) AS sft FROM m
    |  UNION ALL SELECT 'l_quantity' AS feature, n_qt AS n, miss_qt AS n_missing, rows_,
    |    CAST(sf_qt AS DOUBLE) AS sf, CAST(sff_qt AS DOUBLE) AS sff,
    |    CAST(st_qt AS DOUBLE) AS st, CAST(stt_qt AS DOUBLE) AS stt,
    |    CAST(sft_qt AS DOUBLE) AS sft FROM m
    |  UNION ALL SELECT 'l_tax' AS feature, n_tx AS n, miss_tx AS n_missing, rows_,
    |    CAST(sf_tx AS DOUBLE) AS sf, CAST(sff_tx AS DOUBLE) AS sff,
    |    CAST(st_tx AS DOUBLE) AS st, CAST(stt_tx AS DOUBLE) AS stt,
    |    CAST(sft_tx AS DOUBLE) AS sft FROM m),
    |v AS (
    |  SELECT feature, n, n_missing, rows_, sff, sf, st, stt, sft,
    |    CAST(n AS DOUBLE) * sff - sf * sf AS vf,
    |    CAST(n AS DOUBLE) * stt - st * st AS vt2,
    |    CAST(n AS DOUBLE) * sft - sf * st AS cov,
    |    CASE WHEN n >= 2 THEN floor(((sff - sf * sf / CAST(n AS DOUBLE))
    |      / (CAST(n AS DOUBLE) - 1.0)) * 1000000.0 + 0.5) / 1000000.0 END AS variance
    |  FROM u)
    |SELECT feature, n, n_missing,
    |  floor((CAST(n_missing AS DOUBLE) / CAST(rows_ AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS missing_frac,
    |  variance,
    |  COALESCE(variance <= 0.0, TRUE) AS near_zero,
    |  CASE WHEN n >= 2 AND vf > 0.0 AND vt2 > 0.0
    |    THEN floor((cov / (sqrt(vf) * sqrt(vt2))) * 1000000.0 + 0.5) / 1000000.0
    |  END AS target_corr
    |FROM v""".stripMargin,
    // per-dim exact DECIMAL means, squared diffs q6 + DECIMAL-summed over
    // the dimension axis, one sqrt at the end
    "embedding_centroid_shift" ->
      """WITH e AS (
        |  SELECT label AS group_key, i AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |      AS DECIMAL(18,6)) AS q
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
        |  WHERE embedding[i] IS NOT NULL),
        |bg AS (
        |  SELECT group_key, pos, CAST(COUNT(*) AS BIGINT) AS n, SUM(q) AS s
        |  FROM e GROUP BY 1, 2),
        |gl AS (
        |  SELECT pos, CAST(COUNT(*) AS BIGINT) AS gn, SUM(q) AS gs
        |  FROM e GROUP BY 1),
        |j AS (
        |  SELECT bg.group_key, bg.n,
        |    CAST(floor((CAST(bg.s AS DOUBLE) / CAST(bg.n AS DOUBLE)
        |                - CAST(gl.gs AS DOUBLE) / CAST(gl.gn AS DOUBLE))
        |               * (CAST(bg.s AS DOUBLE) / CAST(bg.n AS DOUBLE)
        |                  - CAST(gl.gs AS DOUBLE) / CAST(gl.gn AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6)) AS term
        |  FROM bg JOIN gl USING (pos))
        |SELECT group_key, MAX(n) AS n_vecs,
        |  floor(sqrt(CAST(SUM(term) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS centroid_shift
        |FROM j GROUP BY 1""".stripMargin,
    // one exact-moment row (DECIMAL sums of 6dp-quantized values; the
    // cross moments are exact DECIMAL(37,12) products), six pair arms off
    // it, one fixed-shape IEEE corr expression per arm
    "corr_matrix" ->
      """WITH r AS (
        |  SELECT
        |    CAST(floor(l_discount * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS q_di,
        |    CAST(floor(l_extendedprice * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS q_ep,
        |    CAST(floor(l_quantity * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS q_qt,
        |    CAST(floor(l_tax * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS q_tx
        |  FROM lineitem
        |  WHERE l_discount IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_quantity IS NOT NULL AND l_tax IS NOT NULL),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(q_di) AS s_di, SUM(q_ep) AS s_ep, SUM(q_qt) AS s_qt, SUM(q_tx) AS s_tx,
        |    SUM(CAST(q_di AS DECIMAL(19,6)) * CAST(q_di AS DECIMAL(19,6))) AS ss_di, SUM(CAST(q_ep AS DECIMAL(19,6)) * CAST(q_ep AS DECIMAL(19,6))) AS ss_ep,
        |    SUM(CAST(q_qt AS DECIMAL(19,6)) * CAST(q_qt AS DECIMAL(19,6))) AS ss_qt, SUM(CAST(q_tx AS DECIMAL(19,6)) * CAST(q_tx AS DECIMAL(19,6))) AS ss_tx,
        |    SUM(CAST(q_di AS DECIMAL(19,6)) * CAST(q_ep AS DECIMAL(19,6))) AS sp_di_ep, SUM(CAST(q_di AS DECIMAL(19,6)) * CAST(q_qt AS DECIMAL(19,6))) AS sp_di_qt,
        |    SUM(CAST(q_di AS DECIMAL(19,6)) * CAST(q_tx AS DECIMAL(19,6))) AS sp_di_tx, SUM(CAST(q_ep AS DECIMAL(19,6)) * CAST(q_qt AS DECIMAL(19,6))) AS sp_ep_qt,
        |    SUM(CAST(q_ep AS DECIMAL(19,6)) * CAST(q_tx AS DECIMAL(19,6))) AS sp_ep_tx, SUM(CAST(q_qt AS DECIMAL(19,6)) * CAST(q_tx AS DECIMAL(19,6))) AS sp_qt_tx
        |  FROM r),
        |u AS (
        |  SELECT 'l_discount' AS col_a, 'l_extendedprice' AS col_b, n,
        |    CAST(s_di AS DOUBLE) AS sx, CAST(s_ep AS DOUBLE) AS sy,
        |    CAST(ss_di AS DOUBLE) AS sxx, CAST(ss_ep AS DOUBLE) AS syy,
        |    CAST(sp_di_ep AS DOUBLE) AS sxy FROM m
        |  UNION ALL SELECT 'l_discount', 'l_quantity', n,
        |    CAST(s_di AS DOUBLE), CAST(s_qt AS DOUBLE), CAST(ss_di AS DOUBLE),
        |    CAST(ss_qt AS DOUBLE), CAST(sp_di_qt AS DOUBLE) FROM m
        |  UNION ALL SELECT 'l_discount', 'l_tax', n,
        |    CAST(s_di AS DOUBLE), CAST(s_tx AS DOUBLE), CAST(ss_di AS DOUBLE),
        |    CAST(ss_tx AS DOUBLE), CAST(sp_di_tx AS DOUBLE) FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_quantity', n,
        |    CAST(s_ep AS DOUBLE), CAST(s_qt AS DOUBLE), CAST(ss_ep AS DOUBLE),
        |    CAST(ss_qt AS DOUBLE), CAST(sp_ep_qt AS DOUBLE) FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', n,
        |    CAST(s_ep AS DOUBLE), CAST(s_tx AS DOUBLE), CAST(ss_ep AS DOUBLE),
        |    CAST(ss_tx AS DOUBLE), CAST(sp_ep_tx AS DOUBLE) FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_tax', n,
        |    CAST(s_qt AS DOUBLE), CAST(s_tx AS DOUBLE), CAST(ss_qt AS DOUBLE),
        |    CAST(ss_tx AS DOUBLE), CAST(sp_qt_tx AS DOUBLE) FROM m),
        |v AS (
        |  SELECT col_a, col_b, n,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS vx,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS vy,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS cov
        |  FROM u)
        |SELECT col_a, col_b, n,
        |  CASE WHEN n >= 2 AND vx > 0.0 AND vy > 0.0
        |    THEN floor((cov / (sqrt(vx) * sqrt(vy))) * 1000000.0 + 0.5) / 1000000.0
        |  END AS corr
        |FROM v""".stripMargin,
    // frame-bound FIRST/LAST with IGNORE NULLS over the per-user stream;
    // revenue sums exact DECIMAL(18,2)
    "attribution_compare" ->
      """WITH t AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER w AS ft,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER w AS lt
        |  FROM events WHERE ts IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p AS (
        |  SELECT ft, lt, CAST(value AS DECIMAL(18,2)) AS q
        |  FROM t WHERE event_type = 'purchase' AND value IS NOT NULL),
        |f AS (
        |  SELECT ft AS channel, CAST(COUNT(*) AS BIGINT) AS n_first, SUM(q) AS rf
        |  FROM p WHERE ft IS NOT NULL GROUP BY 1),
        |l AS (
        |  SELECT lt AS channel, CAST(COUNT(*) AS BIGINT) AS n_last, SUM(q) AS rl
        |  FROM p WHERE lt IS NOT NULL GROUP BY 1)
        |SELECT COALESCE(f.channel, l.channel) AS channel,
        |  COALESCE(n_first, 0) AS n_first,
        |  floor(CAST(COALESCE(rf, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS revenue_first_touch,
        |  COALESCE(n_last, 0) AS n_last,
        |  floor(CAST(COALESCE(rl, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS revenue_last_touch
        |FROM f FULL OUTER JOIN l ON f.channel = l.channel""".stripMargin,
    // lift = n_both * n_users / (c_a * c_b) over exact longs
    "event_lift" ->
      """WITH pu AS (
        |  SELECT DISTINCT user_id AS u, event_type AS t FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |n AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS nu FROM pu),
        |tc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM pu GROUP BY 1),
        |p AS (
        |  SELECT a.t AS type_a, b.t AS type_b, CAST(COUNT(*) AS BIGINT) AS n_both
        |  FROM pu a JOIN pu b ON a.u = b.u AND a.t < b.t
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, p.n_both,
        |  floor(((CAST(p.n_both AS DOUBLE) * CAST(n.nu AS DOUBLE))
        |         / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS lift
        |FROM p
        |JOIN tc ca ON ca.t = p.type_a
        |JOIN tc cb ON cb.t = p.type_b
        |CROSS JOIN n""".stripMargin,
    // one conditional sum per rule over ONE pass; rule rows explode off
    // the single aggregated row
    "contract_check" ->
      """WITH m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN value IS NOT NULL AND value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |    CAST(SUM(CASE WHEN value IS NOT NULL AND value >= 1000.0 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |    CAST(SUM(CASE WHEN event_type NOT IN ('click','view','purchase','signup','error')
        |      OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |    CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v4,
        |    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v5,
        |    CAST(SUM(CASE WHEN ts IS NOT NULL AND year(ts) <> 2024 THEN 1 ELSE 0 END) AS BIGINT) AS v6
        |  FROM events)
        |SELECT u.rule, m.n AS n_rows, u.nv AS n_violations, u.nv = 0 AS pass
        |FROM m, (
        |  SELECT 'value_non_negative' AS rule, v1 AS nv FROM m
        |  UNION ALL SELECT 'value_below_1000', v2 FROM m
        |  UNION ALL SELECT 'event_type_in_domain', v3 FROM m
        |  UNION ALL SELECT 'ts_not_null', v4 FROM m
        |  UNION ALL SELECT 'user_id_not_null', v5 FROM m
        |  UNION ALL SELECT 'ts_in_2024', v6 FROM m) u""".stripMargin,
    // pre/post split as conditional-aggregation masks in ONE pass (no
    // self-join); distinct via the null-skipping conditional (the
    // multi-distinct class stays out on the Spark side via collect_set)
    "pit_features" ->
      """WITH r AS (
        |  SELECT user_id AS entity, ts, value AS v, event_type AS et
        |  FROM events WHERE ts IS NOT NULL),
        |a AS (
        |  SELECT entity,
        |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
        |    SUM(CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' AND v IS NOT NULL
        |      THEN CAST(floor(v * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6)) END) AS sv,
        |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' AND v IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nv,
        |    MAX(CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN ts END) AS last_ts,
        |    CAST(COUNT(DISTINCT CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00'
        |      THEN et END) AS BIGINT) AS n_types,
        |    MAX(CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-27 00:00:00'
        |      AND et = 'purchase' THEN TRUE ELSE FALSE END) AS label
        |  FROM r GROUP BY 1)
        |SELECT entity, n_events,
        |  CASE WHEN nv > 0
        |    THEN floor((CAST(sv AS DOUBLE) / CAST(nv AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |  END AS mean_value,
        |  CAST(floor((CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', TIMESTAMP '2024-01-20 00:00:00') AS BIGINT)
        |              - CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', last_ts) AS BIGINT))
        |             / 86400000000.0) AS BIGINT) AS days_since_last,
        |  n_types, label
        |FROM a WHERE n_events > 0""".stripMargin,
    // replay-the-log MERGE: union is the whole feed, del marks change-side
    // tombstones, one window keeps the newest row, deletes drop after
    "cdc_apply" ->
      """WITH allr AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    (ts >= TIMESTAMP '2024-01-15 00:00:00' AND event_type = 'error') AS del
        |  FROM events),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM allr)
        |SELECT user_id, ts, event_id, event_type, value
        |FROM r WHERE rn = 1 AND NOT del""".stripMargin,
    // island = start beyond the running max of prior ends; union length =
    // maxEnd - minStart per island; exact long micros throughout
    "interval_coverage" ->
      """WITH r AS (
        |  SELECT user_id AS e,
        |    CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS BIGINT) AS s,
        |    event_id AS tie
        |  FROM events WHERE ts IS NOT NULL),
        |x AS (
        |  SELECT e, s, tie, s + 1800000000 AS en,
        |    MAX(s + 1800000000) OVER (PARTITION BY e ORDER BY s, tie
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |  FROM r),
        |y AS (
        |  SELECT e, s, tie, en,
        |    CASE WHEN prevmax IS NULL OR s > prevmax THEN 1 ELSE 0 END AS nw
        |  FROM x),
        |z AS (
        |  SELECT e, s, en,
        |    SUM(nw) OVER (PARTITION BY e ORDER BY s, tie
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM y),
        |i AS (
        |  SELECT e, island, MIN(s) AS istart, MAX(en) AS iend
        |  FROM z GROUP BY 1, 2)
        |SELECT e AS entity, CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(floor(CAST(SUM(iend - istart) AS DOUBLE) / 1000000.0) AS BIGINT) AS covered_sec
        |FROM i GROUP BY 1""".stripMargin,
    "json_props_stats" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1""".stripMargin,
    // (Σ−y)/(n−1) on exact DECIMAL sums; singletons fall back to the
    // global mean; every ratio one fixed IEEE shape
    "target_encode_loo" ->
      """WITH r AS (
        |  SELECT event_id AS row_id, json_extract_string(props, '$.k') AS category,
        |    value AS y,
        |    CAST(floor(value * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS q
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL AND value IS NOT NULL),
        |c AS (
        |  SELECT category, CAST(COUNT(*) AS BIGINT) AS n, SUM(q) AS s
        |  FROM r GROUP BY 1),
        |g AS (
        |  SELECT CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS gmean FROM r)
        |SELECT row_id, category, y AS target,
        |  CASE WHEN n > 1
        |    THEN floor(((CAST(s AS DOUBLE) - CAST(q AS DOUBLE))
        |                / CAST(n - 1 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |    ELSE floor(gmean * 1000000.0 + 0.5) / 1000000.0 END AS te_loo
        |FROM r JOIN c USING (category) CROSS JOIN g""".stripMargin,
    "rare_category_collapse" ->
      """WITH e AS (
        |  SELECT json_extract_string(props, '$.k') AS cat FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |c AS (SELECT cat, COUNT(*) AS cn FROM e GROUP BY 1)
        |SELECT CASE WHEN cn >= 100 THEN e.cat ELSE '__other' END AS final_label,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM e JOIN c USING (cat) GROUP BY 1""".stripMargin,
    // gaps are exact long micros; moments exact DECIMAL sums; mean/cv one
    // fixed IEEE shape; the regular flag compares AFTER r6
    "bot_burstiness" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS BIGINT)
        |    - CAST(date_diff('microsecond', TIMESTAMP '1970-01-01',
        |        LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT) AS dt
        |  FROM events WHERE ts IS NOT NULL),
        |m AS (
        |  SELECT user_id AS entity, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |    SUM(CAST(dt AS DECIMAL(19,0))) AS s1,
        |    SUM(CAST(dt AS DECIMAL(19,0)) * CAST(dt AS DECIMAL(19,0))) AS s2
        |  FROM g WHERE dt IS NOT NULL GROUP BY 1),
        |f AS (
        |  SELECT entity, n_gaps,
        |    CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean,
        |    (CAST(s2 AS DOUBLE)
        |     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
        |    / CAST(n_gaps - 1 AS DOUBLE) AS var
        |  FROM m WHERE n_gaps >= 5 AND s1 > 0)
        |SELECT entity, n_gaps,
        |  floor((mean / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS mean_gap_sec,
        |  floor((sqrt(var) / mean) * 1000000.0 + 0.5) / 1000000.0 AS cv_gap,
        |  floor((sqrt(var) / mean) * 1000000.0 + 0.5) / 1000000.0 < 0.1 AS regular
        |FROM f""".stripMargin,
    "langid_profile_train" ->
      """WITH t AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
        |c AS (
        |  SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM t WHERE len(word) > 0 GROUP BY 1, 2)
        |SELECT lang, word, n, rank FROM (
        |  SELECT lang, word, n,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word ASC) AS rank
        |  FROM c)
        |WHERE rank <= 7""".stripMargin,
    // baseline deciles via the percentile ≡ quantile_cont parity; PSI
    // terms on 1e-6-clipped exact-ratio doubles, q6 then DECIMAL-summed
    "psi_drift" ->
      """WITH r AS (
        |  SELECT ts, value AS v FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL),
        |mid AS (
        |  SELECT (CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', MIN(ts)) AS BIGINT)
        |        + CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', MAX(ts)) AS BIGINT)) / 2 AS m
        |  FROM r),
        |tg AS (
        |  SELECT v,
        |    CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS BIGINT) >= m AS cur
        |  FROM r, mid),
        |e AS (
        |  SELECT floor(quantile_cont(v, 0.1) * 1000000.0 + 0.5) / 1000000.0 AS e1,
        |    floor(quantile_cont(v, 0.2) * 1000000.0 + 0.5) / 1000000.0 AS e2,
        |    floor(quantile_cont(v, 0.3) * 1000000.0 + 0.5) / 1000000.0 AS e3,
        |    floor(quantile_cont(v, 0.4) * 1000000.0 + 0.5) / 1000000.0 AS e4,
        |    floor(quantile_cont(v, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS e5,
        |    floor(quantile_cont(v, 0.6) * 1000000.0 + 0.5) / 1000000.0 AS e6,
        |    floor(quantile_cont(v, 0.7) * 1000000.0 + 0.5) / 1000000.0 AS e7,
        |    floor(quantile_cont(v, 0.8) * 1000000.0 + 0.5) / 1000000.0 AS e8,
        |    floor(quantile_cont(v, 0.9) * 1000000.0 + 0.5) / 1000000.0 AS e9
        |  FROM tg WHERE NOT cur),
        |b AS (
        |  SELECT cur,
        |    (CASE WHEN v > e1 THEN 1 ELSE 0 END) + (CASE WHEN v > e2 THEN 1 ELSE 0 END)
        |  + (CASE WHEN v > e3 THEN 1 ELSE 0 END) + (CASE WHEN v > e4 THEN 1 ELSE 0 END)
        |  + (CASE WHEN v > e5 THEN 1 ELSE 0 END) + (CASE WHEN v > e6 THEN 1 ELSE 0 END)
        |  + (CASE WHEN v > e7 THEN 1 ELSE 0 END) + (CASE WHEN v > e8 THEN 1 ELSE 0 END)
        |  + (CASE WHEN v > e9 THEN 1 ELSE 0 END) AS bk
        |  FROM tg, e),
        |c AS (
        |  SELECT bk, SUM(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS c2
        |  FROM b GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(c1) AS BIGINT) AS n_base, CAST(SUM(c2) AS BIGINT) AS n_cur
        |  FROM c HAVING SUM(c1) > 0 AND SUM(c2) > 0),
        |g AS (
        |  SELECT n_base, n_cur,
        |    SUM(CAST(floor(((GREATEST(CAST(c1 AS DOUBLE) / CAST(n_base AS DOUBLE), 0.000001)
        |                     - GREATEST(CAST(c2 AS DOUBLE) / CAST(n_cur AS DOUBLE), 0.000001))
        |                    * ln(GREATEST(CAST(c1 AS DOUBLE) / CAST(n_base AS DOUBLE), 0.000001)
        |                         / GREATEST(CAST(c2 AS DOUBLE) / CAST(n_cur AS DOUBLE), 0.000001)))
        |                   * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS s
        |  FROM c CROSS JOIN t GROUP BY 1, 2)
        |SELECT n_base, n_cur,
        |  floor(CAST(s AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS psi,
        |  floor(CAST(s AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 > 0.2 AS shifted
        |FROM g""".stripMargin,
    // the same md5 coins, conditional DECIMAL sums and nearest-rank
    // list indices as the engine's one-pass fold
    "bootstrap_ci" -> {
      val reps = 32
      def coin(r: Int) =
        s"(('0x' || substr(md5(id || ':$r'), 1, 4))::BIGINT % 100 < 63)"
      val arms = (0 until reps).map { r =>
        s"""    |    CAST(SUM(CASE WHEN ${coin(r)} THEN 1 ELSE 0 END) AS BIGINT) AS n$r,
           |    |    SUM(CASE WHEN ${coin(r)} THEN q END) AS s$r"""
          .stripMargin('|').linesIterator.mkString("\n")
      }.mkString(",\n")
      val means = (0 until reps).map { r =>
        s"CASE WHEN n$r > 0 THEN CAST(s$r AS DOUBLE) / CAST(n$r AS DOUBLE) " +
          s"ELSE CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END"
      }.mkString(", ")
      s"""WITH r AS (
         |  SELECT CAST(event_id AS VARCHAR) AS id, value AS v,
         |    CAST(floor(value * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS q
         |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(q) AS s,
         |$arms
         |  FROM r),
         |x AS (SELECT n, s, list_sort([$means]) AS arr FROM m WHERE n > 0)
         |SELECT n,
         |  floor((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS mean,
         |  floor(arr[2] * 1000000.0 + 0.5) / 1000000.0 AS ci_lo,
         |  floor(arr[31] * 1000000.0 + 0.5) / 1000000.0 AS ci_hi
         |FROM x""".stripMargin
    },
    // pure closed-form S-curve arithmetic on a literal grid, fixed IEEE
    // pow shapes on both engines
    "lsh_tuning_table" ->
      """WITH l AS (
        |  SELECT 2 AS bands, 8 AS rows_per_band
        |  UNION ALL SELECT 4, 4 UNION ALL SELECT 8, 2 UNION ALL SELECT 16, 1)
        |SELECT bands, rows_per_band,
        |  floor(pow(1.0 / CAST(bands AS DOUBLE), 1.0 / CAST(rows_per_band AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS s50,
        |  floor((1.0 - pow(1.0 - pow(0.5, CAST(rows_per_band AS DOUBLE)),
        |    CAST(bands AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS p_at_50,
        |  floor((1.0 - pow(1.0 - pow(0.7, CAST(rows_per_band AS DOUBLE)),
        |    CAST(bands AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS p_at_70,
        |  floor((1.0 - pow(1.0 - pow(0.9, CAST(rows_per_band AS DOUBLE)),
        |    CAST(bands AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS p_at_90
        |FROM l""".stripMargin,
    // exact-long ECDF prefixes (the engine's distributed two-phase scan
    // and this window cumulative see identical integers), one IEEE
    // division per distinct value, order-free max
    "ks_drift" ->
      """WITH r AS (
        |  SELECT value AS v, (event_type = 'purchase') AS b
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
        |c AS (
        |  SELECT v, SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN b THEN 1 ELSE 0 END) AS c2
        |  FROM r GROUP BY v),
        |t AS (
        |  SELECT CAST(SUM(c1) AS BIGINT) AS n_a, CAST(SUM(c2) AS BIGINT) AS n_b
        |  FROM c HAVING SUM(c1) > 0 AND SUM(c2) > 0),
        |g AS (
        |  SELECT CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS g1,
        |    CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS g2
        |  FROM c),
        |d AS (
        |  SELECT n_a, n_b,
        |    floor(MAX(ABS(CAST(g1 AS DOUBLE) / CAST(n_a AS DOUBLE)
        |                  - CAST(g2 AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0 AS d_stat,
        |    floor(MAX(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
        |                           / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))))
        |      * 1000000.0 + 0.5) / 1000000.0 AS d_crit_95
        |  FROM g CROSS JOIN t GROUP BY n_a, n_b)
        |SELECT n_a, n_b, d_stat, d_crit_95, d_stat > d_crit_95 AS drift
        |FROM d""".stripMargin,
    // moments are DECIMAL sums of 6dp-quantized values, so mean/std are
    // single IEEE expressions over identical inputs on both engines
    "zscore_outliers" ->
      """WITH r AS (
        |  SELECT event_type AS group_key, event_id AS row_id, value AS v,
        |    CAST(floor(value * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS q
        |  FROM events WHERE value IS NOT NULL),
        |m AS (
        |  SELECT group_key, CAST(COUNT(*) AS BIGINT) AS n, SUM(q) AS s1, SUM(q * q) AS s2
        |  FROM r GROUP BY 1),
        |z AS (
        |  SELECT r.group_key, r.row_id, r.v, r.q,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    sqrt((CAST(s2 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |         / CAST(n - 1 AS DOUBLE)) AS std
        |  FROM r JOIN m USING (group_key) WHERE n >= 2),
        |f AS (
        |  SELECT group_key, row_id, v, mean,
        |    floor(((CAST(q AS DOUBLE) - mean) / std) * 1000000.0 + 0.5) / 1000000.0 AS z
        |  FROM z WHERE std > 0)
        |SELECT group_key, row_id, v AS value,
        |  floor(mean * 1000000.0 + 0.5) / 1000000.0 AS group_mean, z
        |FROM f WHERE abs(z) >= 3.0""".stripMargin,
    // numerator is a DECIMAL sum of rank-weighted values; one IEEE
    // division at the end
    "gini_concentration" ->
      """WITH r AS (
        |  SELECT source AS group_key, doc_id AS id,
        |    CAST(floor(CAST(n_chars AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |      AS DECIMAL(18,6)) AS q
        |  FROM documents WHERE n_chars IS NOT NULL),
        |w AS (
        |  SELECT group_key, q,
        |    ROW_NUMBER() OVER (PARTITION BY group_key ORDER BY q, id) AS i,
        |    CAST(COUNT(*) OVER (PARTITION BY group_key) AS BIGINT) AS n
        |  FROM r),
        |g AS (
        |  SELECT group_key, MAX(n) AS n, SUM(q) AS sx,
        |    SUM(CAST(2 * i - n - 1 AS DECIMAL(19,0)) * q) AS num
        |  FROM w GROUP BY 1)
        |SELECT group_key, n, CAST(sx AS DOUBLE) AS total,
        |  CASE WHEN sx > 0 THEN
        |    floor((CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS gini
        |FROM g""".stripMargin,
    // money sums are DECIMAL of 6dp-quantized values; DuckDB's null order
    // is pinned NULLS FIRST on the money tile to match Spark's asc default
    "rfm_segments" ->
      """WITH pu AS (
        |  SELECT user_id, MAX(ts) AS last_ts,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS freq,
        |    SUM(CAST(CASE WHEN event_type = 'purchase'
        |          THEN floor(value * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END
        |        AS DECIMAL(28,6))) AS money
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT user_id, freq, money,
        |    date_diff('day', CAST(last_ts AS DATE), CAST(MAX(last_ts) OVER () AS DATE)) AS rdays
        |  FROM pu),
        |tiles AS (
        |  SELECT money,
        |    CAST(NTILE(5) OVER (ORDER BY rdays DESC, user_id) AS INT) AS r_tile,
        |    CAST(NTILE(5) OVER (ORDER BY freq ASC, user_id) AS INT) AS f_tile,
        |    CAST(NTILE(5) OVER (ORDER BY money ASC NULLS FIRST, user_id) AS INT) AS m_tile
        |  FROM r)
        |SELECT r_tile, f_tile, m_tile, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  floor((CAST(SUM(money) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS avg_monetary
        |FROM tiles GROUP BY 1, 2, 3""".stripMargin,
    // the distributed-rank formulation must reproduce the window NTILE
    // exactly — SAME oracle as rfm_segments
    "rfm_segments_dist" ->
      """WITH pu AS (
        |  SELECT user_id, MAX(ts) AS last_ts,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS freq,
        |    SUM(CAST(CASE WHEN event_type = 'purchase'
        |          THEN floor(value * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END
        |        AS DECIMAL(28,6))) AS money
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT user_id, freq, money,
        |    date_diff('day', CAST(last_ts AS DATE), CAST(MAX(last_ts) OVER () AS DATE)) AS rdays
        |  FROM pu),
        |tiles AS (
        |  SELECT money,
        |    CAST(NTILE(5) OVER (ORDER BY rdays DESC, user_id) AS INT) AS r_tile,
        |    CAST(NTILE(5) OVER (ORDER BY freq ASC, user_id) AS INT) AS f_tile,
        |    CAST(NTILE(5) OVER (ORDER BY money ASC NULLS FIRST, user_id) AS INT) AS m_tile
        |  FROM r)
        |SELECT r_tile, f_tile, m_tile, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  floor((CAST(SUM(money) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS avg_monetary
        |FROM tiles GROUP BY 1, 2, 3""".stripMargin,
    // lag-collapse then lead over the same (entity, ts, tie) total order
    "scd2_intervals" ->
      """WITH s AS (
        |  SELECT user_id AS entity_id, ts AS valid_from, event_type AS state, event_id AS tie,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |k AS (SELECT entity_id, valid_from, state, tie FROM s
        |      WHERE prev IS NULL OR prev <> state)
        |SELECT entity_id, state, valid_from,
        |  LEAD(valid_from) OVER w AS valid_to,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS version,
        |  (LEAD(valid_from) OVER w IS NULL) AS is_current
        |FROM k WINDOW w AS (PARTITION BY entity_id ORDER BY valid_from, tie)""".stripMargin,
    // 1-based list indexing pairs t[i] with t[i+1] — same adjacent pairs
    // as the engine's 0-based transform; ln runs once per surviving pair
    "bigram_pmi" ->
      """WITH toks AS (SELECT regexp_extract_all(text, '[a-z0-9]+') AS t FROM documents),
        |uni AS (
        |  SELECT u AS token, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(t) AS u FROM toks) GROUP BY 1),
        |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
        |pr AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
        |  WHERE len(t) >= 2),
        |pairs AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair FROM pr GROUP BY 1, 2),
        |bt AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS b FROM pairs)
        |SELECT w1, w2, n_pair,
        |  floor(ln((CAST(n_pair AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |           / (CAST(b AS DOUBLE) * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS pmi
        |FROM pairs JOIN uni u1 ON u1.token = pairs.w1
        |           JOIN uni u2 ON u2.token = pairs.w2, nt, bt
        |WHERE n_pair >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,
    // DuckDB's jaro_winkler_similarity IS the reference convention the
    // native expression pins (RapidFuzz: boost only when jaro > 0.7,
    // prefix cap 4); both sides r6-round BEFORE the 0.9 threshold
    // both linkage oracles carry the kernel's TWO blocking passes (16-char
    // prefix UNION sorted-token key of the 64-char probe — round 14) and
    // the per-pass hot-block occupancy guard (blocks > 1000 members
    // dropped — the banded-simhash discipline); the guard never binds on
    // the gate data (max occupancy 14 at the 100x replica), so results
    // are unchanged by it at every tested SF. UNION (not UNION ALL) is
    // the cross-pass pair dedup, matching the kernel's .distinct()
    "record_linkage_jw" ->
      """WITH b1 AS (
        |  SELECT * FROM (
        |    SELECT doc_id, substr(text, 1, 16) AS blk, substr(text, 1, 64) AS probe,
        |      COUNT(*) OVER (PARTITION BY substr(text, 1, 16)) AS occ
        |    FROM documents)
        |  WHERE occ <= 1000),
        |b2 AS (
        |  SELECT * FROM (
        |    SELECT doc_id,
        |      array_to_string(list_sort(string_split(substr(text, 1, 64), ' ')), ' ') AS blk,
        |      substr(text, 1, 64) AS probe,
        |      COUNT(*) OVER (PARTITION BY
        |        array_to_string(list_sort(string_split(substr(text, 1, 64), ' ')), ' ')) AS occ
        |    FROM documents)
        |  WHERE occ <= 1000),
        |cand AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.probe AS pa, y.probe AS pb
        |  FROM b1 x JOIN b1 y ON x.blk = y.blk AND x.doc_id < y.doc_id
        |  UNION
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.probe AS pa, y.probe AS pb
        |  FROM b2 x JOIN b2 y ON x.blk = y.blk AND x.doc_id < y.doc_id)
        |SELECT doc_a, doc_b,
        |  floor(jaro_winkler_similarity(pa, pb) * 1000000.0 + 0.5)
        |    / 1000000.0 AS jw
        |FROM cand
        |WHERE floor(jaro_winkler_similarity(pa, pb) * 1000000.0 + 0.5)
        |    / 1000000.0 >= 0.9""".stripMargin,
    "record_linkage_dl" ->
      """WITH b1 AS (
        |  SELECT * FROM (
        |    SELECT doc_id, substr(text, 1, 16) AS blk, substr(text, 1, 64) AS probe,
        |      COUNT(*) OVER (PARTITION BY substr(text, 1, 16)) AS occ
        |    FROM documents)
        |  WHERE occ <= 1000),
        |b2 AS (
        |  SELECT * FROM (
        |    SELECT doc_id,
        |      array_to_string(list_sort(string_split(substr(text, 1, 64), ' ')), ' ') AS blk,
        |      substr(text, 1, 64) AS probe,
        |      COUNT(*) OVER (PARTITION BY
        |        array_to_string(list_sort(string_split(substr(text, 1, 64), ' ')), ' ')) AS occ
        |    FROM documents)
        |  WHERE occ <= 1000),
        |cand AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.probe AS pa, y.probe AS pb
        |  FROM b1 x JOIN b1 y ON x.blk = y.blk AND x.doc_id < y.doc_id
        |    AND abs(length(x.probe) - length(y.probe)) <= 8
        |  UNION
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.probe AS pa, y.probe AS pb
        |  FROM b2 x JOIN b2 y ON x.blk = y.blk AND x.doc_id < y.doc_id
        |    AND abs(length(x.probe) - length(y.probe)) <= 8)
        |SELECT doc_a, doc_b,
        |  CAST(damerau_levenshtein(pa, pb) AS INT) AS dl
        |FROM cand
        |WHERE damerau_levenshtein(pa, pb) <= 8""".stripMargin,
    // the cap-accounting companion (round 14): per blocking pass, blocks/
    // rows the occupancy guard drops — zero on gate data, nonzero = the
    // cap is changing answers (the no-silent-caps contract)
    "linkage_block_report" ->
      """WITH p1 AS (
        |  SELECT substr(text, 1, 16) AS blk, COUNT(*) AS occ
        |  FROM documents GROUP BY 1),
        |p2 AS (
        |  SELECT array_to_string(list_sort(string_split(substr(text, 1, 64), ' ')), ' ') AS blk,
        |    COUNT(*) AS occ
        |  FROM documents GROUP BY 1)
        |SELECT 'prefix' AS block_kind, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |  CAST(MAX(occ) AS BIGINT) AS max_occupancy,
        |  CAST(SUM(CASE WHEN occ > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS blocks_dropped,
        |  CAST(SUM(CASE WHEN occ > 1000 THEN occ ELSE 0 END) AS BIGINT) AS rows_dropped
        |FROM p1
        |UNION ALL
        |SELECT 'sorted_tokens' AS block_kind, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |  CAST(MAX(occ) AS BIGINT) AS max_occupancy,
        |  CAST(SUM(CASE WHEN occ > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS blocks_dropped,
        |  CAST(SUM(CASE WHEN occ > 1000 THEN occ ELSE 0 END) AS BIGINT) AS rows_dropped
        |FROM p2""".stripMargin,
    "markov_transitions" ->
      """WITH s AS (
        |  SELECT event_type AS from_state,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_state
        |  FROM events),
        |c AS (
        |  SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM s WHERE to_state IS NOT NULL GROUP BY 1, 2)
        |SELECT from_state, to_state, n,
        |  floor((CAST(n AS DOUBLE)
        |         / CAST(SUM(n) OVER (PARTITION BY from_state) AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS p
        |FROM c""".stripMargin,
    // survival accumulates in log space: r6'd ln(1 - d/n) terms summed as
    // DECIMAL over the ordered bounded time axis; exp only at output
    "kaplan_meier" ->
      """WITH pu AS (
        |  SELECT user_id, MIN(ts) AS f, MAX(ts) AS l FROM events
        |  WHERE ts IS NOT NULL GROUP BY 1),
        |lt AS (
        |  SELECT date_diff('day', CAST(f AS DATE), CAST(l AS DATE)) AS t_days,
        |    (l < MAX(l) OVER () - INTERVAL 1 DAY) AS ev
        |  FROM pu),
        |bt AS (
        |  SELECT t_days,
        |    CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
        |    CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS n_censored
        |  FROM lt GROUP BY 1),
        |rk AS (
        |  SELECT *,
        |    CAST(SUM(n_events + n_censored) OVER () AS BIGINT)
        |      - CAST(COALESCE(SUM(n_events + n_censored) OVER
        |          (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS n_risk
        |  FROM bt),
        |ac AS (
        |  SELECT *,
        |    MAX(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END) OVER
        |      (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead,
        |    SUM(CAST(CASE WHEN n_events < n_risk THEN
        |          floor(ln(1.0 - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |            * 1000000.0 + 0.5) / 1000000.0
        |        ELSE 0.0 END AS DECIMAL(28,6))) OVER
        |      (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS logs
        |  FROM rk)
        |SELECT t_days, n_risk, n_events, n_censored,
        |  CASE WHEN dead = 0 THEN CAST(logs AS DOUBLE) END AS log_survival,
        |  CASE WHEN dead = 0 THEN
        |    floor(exp(CAST(logs AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |  ELSE 0.0 END AS survival
        |FROM ac WHERE n_events > 0""".stripMargin,
    "ab_test_zscore" ->
      """WITH pu AS (
        |  SELECT user_id, MAX(user_id % 2 = 0) AS va,
        |    MAX(event_type = 'purchase') AS conv
        |  FROM events GROUP BY 1),
        |f AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN va THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN va AND conv THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(SUM(CASE WHEN NOT va THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN (NOT va) AND conv THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM pu)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  CASE WHEN n_a > 0 THEN
        |    floor((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) * 1000000.0 + 0.5)
        |      / 1000000.0 END AS rate_a,
        |  CASE WHEN n_b > 0 THEN
        |    floor((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)) * 1000000.0 + 0.5)
        |      / 1000000.0 END AS rate_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
        |        AND conv_a + conv_b < n_a + n_b THEN
        |    floor(((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |            - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |           / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |                  * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS z
        |FROM f""".stripMargin,
    // digit spine 1-9 left-joins the counts so absent digits still
    // contribute their (0 - E)^2/E term; string-based digit extraction
    // (log10/floor mis-digits on FP knife edges)
    "benford_digits" ->
      """WITH c AS (
        |  SELECT CAST(NULLIF(regexp_extract(CAST(value AS VARCHAR), '[1-9]'), '')
        |      AS INT) AS digit,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events
        |  WHERE value > 0.0
        |    AND NULLIF(regexp_extract(CAST(value AS VARCHAR), '[1-9]'), '') IS NOT NULL
        |  GROUP BY 1),
        |sp AS (SELECT unnest(generate_series(1, 9)) AS digit),
        |j AS (
        |  SELECT sp.digit, COALESCE(c.cnt, 0) AS n_obs FROM sp LEFT JOIN c USING (digit)),
        |t AS (
        |  SELECT digit, n_obs,
        |    CAST(SUM(n_obs) OVER () AS BIGINT) AS n,
        |    ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) AS pexp
        |  FROM j),
        |u AS (
        |  SELECT *,
        |    CAST(n AS DOUBLE) * pexp AS e
        |  FROM t),
        |v AS (
        |  SELECT *,
        |    CAST(SUM(CAST(floor(((CAST(n_obs AS DOUBLE) - e) * (CAST(n_obs AS DOUBLE) - e) / e)
        |          * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) OVER () AS DOUBLE) AS chi2
        |  FROM u)
        |SELECT digit, n_obs,
        |  floor((CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS p_obs,
        |  floor(pexp * 1000000.0 + 0.5) / 1000000.0 AS p_expected,
        |  chi2
        |FROM v""".stripMargin,
    // the SAME recursion the engine folds (alpha/1-alpha binary-exact at
    // 0.25/0.75, so both engines replay identical IEEE steps)
    "ewma_smooth" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |r AS (
        |  SELECT user_id, event_id, value, rn, value AS s FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.event_id, b.value, b.rn, 0.25 * b.value + 0.75 * r.s
        |  FROM base b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1)
        |SELECT user_id, event_id, value,
        |  floor(s * 1000000.0 + 0.5) / 1000000.0 AS ewma
        |FROM r""".stripMargin,
    // two-accumulator recursion, same fixed IEEE operation tree as the
    // engine's fold (the trend term re-evaluates the level expression —
    // identical bits to the engine's reuse of the just-computed level)
    "holt_linear" -> s"$holtOracleCtes)\nSELECT user_id, event_id, value, level, trend, forecast FROM holt",
    // residual-quantile interval half-width + realized coverage, off the
    // same shared recursion and quantile_cont parity
    "forecast_interval" ->
      s"""$holtOracleCtes),
         |j AS (
         |  SELECT h.user_id, h.event_id, h.value, h.forecast, e.ts
         |  FROM holt h JOIN events e ON h.event_id = e.event_id),
         |x AS (
         |  SELECT user_id, value,
         |    LAG(forecast, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pf
         |  FROM j),
         |t AS (SELECT value - pf AS err FROM x WHERE pf IS NOT NULL),
         |q AS (SELECT floor(quantile_cont(ABS(err), 0.9) * 1000000.0 + 0.5) / 1000000.0 AS q90 FROM t)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_evals,
         |  floor(MAX(q90) * 1000000.0 + 0.5) / 1000000.0 AS q90_abs_err,
         |  floor((CAST(SUM(CASE WHEN ABS(err) <= q90 THEN 1 ELSE 0 END) AS DOUBLE)
         |         / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS coverage
         |FROM t CROSS JOIN q""".stripMargin,
    // backtest of the one-step forecast: err_t = value_t − forecast_{t−1}
    // per user stream; MAE + signed bias over q6'd DECIMAL-summed terms
    "forecast_accuracy" ->
      s"""$holtOracleCtes),
         |j AS (
         |  SELECT h.user_id, h.event_id, h.value, h.forecast, e.ts
         |  FROM holt h JOIN events e ON h.event_id = e.event_id),
         |x AS (
         |  SELECT user_id, value,
         |    LAG(forecast, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pf
         |  FROM j),
         |t AS (
         |  SELECT value - pf AS err FROM x WHERE pf IS NOT NULL)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_evals,
         |  floor((CAST(SUM(CAST(floor(ABS(err) * 1000000.0 + 0.5) / 1000000.0
         |      AS DECIMAL(28,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
         |    * 1000000.0 + 0.5) / 1000000.0 AS mae,
         |  floor((CAST(SUM(CAST(floor(err * 1000000.0 + 0.5) / 1000000.0
         |      AS DECIMAL(28,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
         |    * 1000000.0 + 0.5) / 1000000.0 AS bias
         |FROM t""".stripMargin,
    // the alarm compares the RAW statistic (rounding only at output),
    // exactly like the engine's fold
    "cusum_drift" ->
      """WITH RECURSIVE base AS (
        |  SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |r AS (
        |  SELECT user_id, event_id, value, rn,
        |    greatest(0.0, 0.0 + value - 150.0) AS s
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.event_id, b.value, b.rn,
        |    greatest(0.0, r.s + b.value - 150.0)
        |  FROM base b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1)
        |SELECT user_id, event_id, value,
        |  floor(s * 1000000.0 + 0.5) / 1000000.0 AS cusum,
        |  s >= 500.0 AS alarm
        |FROM r""".stripMargin,
    "mad_outliers" ->
      """WITH rows_ AS (
        |  SELECT event_type AS group_key, event_id AS row_id, value AS v
        |  FROM events WHERE value IS NOT NULL),
        |med AS (SELECT group_key,
        |          floor(quantile_cont(v, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS m
        |        FROM rows_ GROUP BY 1),
        |dev AS (SELECT r.group_key, r.row_id, r.v, med.m, abs(r.v - med.m) AS d
        |        FROM rows_ r JOIN med USING (group_key)),
        |mad AS (SELECT group_key,
        |          floor(quantile_cont(d, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS md
        |        FROM dev GROUP BY 1),
        |sc AS (
        |  SELECT dev.group_key, dev.row_id, dev.v, dev.m,
        |    floor(((dev.v - dev.m) / (1.4826 * mad.md)) * 1000000.0 + 0.5) / 1000000.0 AS score
        |  FROM dev JOIN mad USING (group_key) WHERE mad.md > 0.0)
        |SELECT group_key, row_id, v AS value,
        |  floor(m * 1000000.0 + 0.5) / 1000000.0 AS group_median, score
        |FROM sc WHERE abs(score) >= 3.5""".stripMargin,
    "conversion_lag" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS f,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1)
        |SELECT LEAST(date_diff('microsecond', f, t) // 3600000000, 168) AS lag_hours,
        |  CAST(COUNT(*) AS BIGINT) AS n_conversions
        |FROM pu WHERE f IS NOT NULL AND t IS NOT NULL AND t >= f
        |GROUP BY 1""".stripMargin,
    // integer moments: counts' sums never touch a double until mean/std
    // Spark percentile ≡ DuckDB quantile_cont; hour() is UTC on both
    "hourly_percentiles" ->
      """SELECT event_type, CAST(hour(ts) AS INT) AS hour_of_day,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  floor(quantile_cont(value, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS p50,
        |  floor(quantile_cont(value, 0.95) * 1000000.0 + 0.5) / 1000000.0 AS p95
        |FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    // same spine as traffic_anomalies; deviation products q6'd then
    // DECIMAL-summed, one IEEE division per (stream, lag)
    "acf_hourly" ->
      """WITH ev AS (SELECT ts, event_type FROM events WHERE ts IS NOT NULL),
        |r AS (SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM ev),
        |hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM r),
        |types AS (SELECT DISTINCT event_type AS stream FROM ev),
        |c AS (SELECT date_trunc('hour', ts) AS hour, event_type AS stream,
        |        CAST(COUNT(*) AS BIGINT) AS nr
        |      FROM ev GROUP BY 1, 2),
        |series AS (
        |  SELECT t.stream, h.hour, COALESCE(c.nr, 0) AS n
        |  FROM hours h CROSS JOIN types t
        |  LEFT JOIN c ON c.hour = h.hour AND c.stream = t.stream),
        |m AS (
        |  SELECT stream, CAST(COUNT(*) AS BIGINT) AS hcount,
        |    SUM(CAST(n AS DECIMAL(28,0))) AS s1
        |  FROM series GROUP BY 1),
        |dv AS (
        |  SELECT s.stream, s.hour,
        |    CAST(s.n AS DOUBLE) - CAST(m.s1 AS DOUBLE) / CAST(m.hcount AS DOUBLE) AS d
        |  FROM series s JOIN m USING (stream)),
        |lg AS (
        |  SELECT stream, d,
        |    LAG(d, 1) OVER w AS dl1, LAG(d, 2) OVER w AS dl2,
        |    LAG(d, 3) OVER w AS dl3, LAG(d, 6) OVER w AS dl6,
        |    LAG(d, 12) OVER w AS dl12, LAG(d, 24) OVER w AS dl24
        |  FROM dv WINDOW w AS (PARTITION BY stream ORDER BY hour)),
        |f AS (
        |  SELECT stream,
        |    SUM(CAST(floor(d * d * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS den,
        |    SUM(CAST(CASE WHEN dl1 IS NOT NULL THEN floor(d * dl1 * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END AS DECIMAL(28,6))) AS n1,
        |    SUM(CAST(CASE WHEN dl2 IS NOT NULL THEN floor(d * dl2 * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END AS DECIMAL(28,6))) AS n2,
        |    SUM(CAST(CASE WHEN dl3 IS NOT NULL THEN floor(d * dl3 * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END AS DECIMAL(28,6))) AS n3,
        |    SUM(CAST(CASE WHEN dl6 IS NOT NULL THEN floor(d * dl6 * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END AS DECIMAL(28,6))) AS n6,
        |    SUM(CAST(CASE WHEN dl12 IS NOT NULL THEN floor(d * dl12 * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END AS DECIMAL(28,6))) AS n12,
        |    SUM(CAST(CASE WHEN dl24 IS NOT NULL THEN floor(d * dl24 * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END AS DECIMAL(28,6))) AS n24
        |  FROM lg GROUP BY 1),
        |u AS (
        |  SELECT stream, 1 AS lag, CAST(n1 AS DOUBLE) AS num, CAST(den AS DOUBLE) AS dd FROM f
        |  UNION ALL SELECT stream, 2, CAST(n2 AS DOUBLE), CAST(den AS DOUBLE) FROM f
        |  UNION ALL SELECT stream, 3, CAST(n3 AS DOUBLE), CAST(den AS DOUBLE) FROM f
        |  UNION ALL SELECT stream, 6, CAST(n6 AS DOUBLE), CAST(den AS DOUBLE) FROM f
        |  UNION ALL SELECT stream, 12, CAST(n12 AS DOUBLE), CAST(den AS DOUBLE) FROM f
        |  UNION ALL SELECT stream, 24, CAST(n24 AS DOUBLE), CAST(den AS DOUBLE) FROM f)
        |SELECT stream, lag,
        |  CASE WHEN dd > 0.0
        |    THEN floor((num / dd) * 1000000.0 + 0.5) / 1000000.0 END AS acf
        |FROM u""".stripMargin,
    "traffic_anomalies" ->
      """WITH ev AS (SELECT ts, event_type FROM events WHERE ts IS NOT NULL),
        |r AS (SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM ev),
        |hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM r),
        |types AS (SELECT DISTINCT event_type AS stream FROM ev),
        |c AS (SELECT date_trunc('hour', ts) AS hour, event_type AS stream,
        |        CAST(COUNT(*) AS BIGINT) AS nr
        |      FROM ev GROUP BY 1, 2),
        |series AS (
        |  SELECT t.stream, h.hour, COALESCE(c.nr, 0) AS n
        |  FROM hours h CROSS JOIN types t
        |  LEFT JOIN c ON c.hour = h.hour AND c.stream = t.stream),
        |m AS (
        |  SELECT stream, CAST(COUNT(*) AS BIGINT) AS hcount,
        |    SUM(CAST(n AS DECIMAL(28,0))) AS s1,
        |    SUM(CAST(n * n AS DECIMAL(38,0))) AS s2
        |  FROM series GROUP BY 1),
        |z AS (
        |  SELECT s.stream, s.hour, s.n,
        |    CAST(s1 AS DOUBLE) / CAST(hcount AS DOUBLE) AS mean,
        |    sqrt((CAST(s2 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(hcount AS DOUBLE))
        |         / CAST(hcount - 1 AS DOUBLE)) AS std
        |  FROM series s JOIN m USING (stream) WHERE hcount >= 2),
        |f AS (
        |  SELECT stream, hour, n, mean,
        |    floor(((CAST(n AS DOUBLE) - mean) / std) * 1000000.0 + 0.5) / 1000000.0 AS z
        |  FROM z WHERE std > 0)
        |SELECT stream, hour, n,
        |  floor(mean * 1000000.0 + 0.5) / 1000000.0 AS hourly_mean, z
        |FROM f WHERE abs(z) >= 3.0""".stripMargin,
    // traffic_anomalies' spine with (stream, hour-of-day) profile moments
    "seasonal_anomalies" ->
      """WITH ev AS (SELECT ts, event_type FROM events WHERE ts IS NOT NULL),
        |r AS (SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM ev),
        |hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM r),
        |types AS (SELECT DISTINCT event_type AS stream FROM ev),
        |c AS (SELECT date_trunc('hour', ts) AS hour, event_type AS stream,
        |        CAST(COUNT(*) AS BIGINT) AS nr
        |      FROM ev GROUP BY 1, 2),
        |series AS (
        |  SELECT t.stream, h.hour, COALESCE(c.nr, 0) AS n,
        |    CAST(hour(h.hour) AS INT) AS hod
        |  FROM hours h CROSS JOIN types t
        |  LEFT JOIN c ON c.hour = h.hour AND c.stream = t.stream),
        |m AS (
        |  SELECT stream, hod, CAST(COUNT(*) AS BIGINT) AS hcount,
        |    SUM(CAST(n AS DECIMAL(28,0))) AS s1,
        |    SUM(CAST(n * n AS DECIMAL(38,0))) AS s2
        |  FROM series GROUP BY 1, 2),
        |z AS (
        |  SELECT s.stream, s.hour, s.hod, s.n,
        |    CAST(s1 AS DOUBLE) / CAST(hcount AS DOUBLE) AS mean,
        |    sqrt((CAST(s2 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(hcount AS DOUBLE))
        |         / CAST(hcount - 1 AS DOUBLE)) AS std
        |  FROM series s JOIN m USING (stream, hod) WHERE hcount >= 2),
        |f AS (
        |  SELECT stream, hour, hod, n, mean,
        |    floor(((CAST(n AS DOUBLE) - mean) / std) * 1000000.0 + 0.5) / 1000000.0 AS z
        |  FROM z WHERE std > 0)
        |SELECT stream, hour, hod, n,
        |  floor(mean * 1000000.0 + 0.5) / 1000000.0 AS hod_mean, z
        |FROM f WHERE abs(z) >= 3.0""".stripMargin,
    // integer cross-multiplication detects the zero-effect case exactly
    "ab_test_power" ->
      """WITH pu AS (
        |  SELECT user_id, MAX(user_id % 2 = 0) AS va,
        |    MAX(event_type = 'purchase') AS conv
        |  FROM events GROUP BY 1),
        |f AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN va THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN va AND conv THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(SUM(CASE WHEN NOT va THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN (NOT va) AND conv THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM pu),
        |p AS (
        |  SELECT *,
        |    CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p1,
        |    CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p2,
        |    CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pbar
        |  FROM f),
        |q AS (
        |  SELECT *,
        |    1.959964 * sqrt(2.0 * pbar * (1.0 - pbar))
        |      + 0.841621 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)) AS num
        |  FROM p)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a > 0 THEN floor(p1 * 1000000.0 + 0.5) / 1000000.0 END AS rate_a,
        |  CASE WHEN n_b > 0 THEN floor(p2 * 1000000.0 + 0.5) / 1000000.0 END AS rate_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    floor((p1 - p2) * 1000000.0 + 0.5) / 1000000.0 END AS effect,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND conv_a * n_b <> conv_b * n_a THEN
        |    CAST(ceil((num * num) / ((p1 - p2) * (p1 - p2))) AS BIGINT)
        |  END AS n_required_per_arm
        |FROM q""".stripMargin,
    "column_profile" ->
      """SELECT 'event_id' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  floor((CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS null_frac,
        |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
        |FROM events
        |UNION ALL
        |SELECT 'ts' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  floor((CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS null_frac,
        |  CAST(COUNT(DISTINCT ts) AS BIGINT) AS n_distinct
        |FROM events
        |UNION ALL
        |SELECT 'user_id' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  floor((CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS null_frac,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
        |FROM events
        |UNION ALL
        |SELECT 'event_type' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  floor((CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS null_frac,
        |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct
        |FROM events
        |UNION ALL
        |SELECT 'value' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  floor((CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS null_frac,
        |  CAST(COUNT(DISTINCT value) AS BIGINT) AS n_distinct
        |FROM events
        |UNION ALL
        |SELECT 'props' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  floor((CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS null_frac,
        |  CAST(COUNT(DISTINCT props) AS BIGINT) AS n_distinct
        |FROM events""".stripMargin,
    "join_cardinality" ->
      """WITH lc AS (
        |  SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n_left
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |rc AS (
        |  SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n_right
        |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
        |p AS (
        |  SELECT lc.key, n_left, n_right,
        |    CAST(CAST(n_left AS DECIMAL(19,0)) * CAST(n_right AS DECIMAL(19,0))
        |      AS DECIMAL(38,0)) AS outd
        |  FROM lc JOIN rc USING (key)),
        |t AS (SELECT SUM(outd) AS total FROM p)
        |SELECT CAST(key AS VARCHAR) AS key, n_left, n_right,
        |  CAST(outd AS BIGINT) AS out_rows, CAST(total AS BIGINT) AS total_out,
        |  floor((CAST(outd AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS share_of_out
        |FROM p, t ORDER BY outd DESC, CAST(key AS VARCHAR) LIMIT 10""".stripMargin,
    "snapshot_diff" ->
      """WITH o AS (
        |  SELECT user_id, event_type FROM (
        |    SELECT user_id, event_type,
        |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00')
        |  WHERE rn = 1),
        |n AS (
        |  SELECT user_id, event_type FROM (
        |    SELECT user_id, event_type,
        |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events)
        |  WHERE rn = 1)
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT CASE WHEN o.user_id IS NULL THEN 'added'
        |              WHEN n.user_id IS NULL THEN 'removed'
        |              WHEN o.event_type IS NOT DISTINCT FROM n.event_type THEN 'unchanged'
        |              ELSE 'changed' END AS status
        |  FROM o FULL OUTER JOIN n ON o.user_id = n.user_id)
        |GROUP BY 1""".stripMargin,
    "stickiness_daily" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE ts IS NOT NULL),
        |r AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ev),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM r),
        |dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau FROM ev GROUP BY 1),
        |wc AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
        |      CAST(day AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM ev),
        |wau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau FROM wc GROUP BY 1)
        |SELECT s.day, COALESCE(dau.dau, 0) AS dau, COALESCE(wau.wau, 0) AS wau,
        |  CASE WHEN COALESCE(wau.wau, 0) > 0 THEN
        |    floor((CAST(COALESCE(dau.dau, 0) AS DOUBLE) / CAST(wau.wau AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS stickiness
        |FROM spine s LEFT JOIN dau USING (day) LEFT JOIN wau USING (day)""".stripMargin,
    "wilson_rates" ->
      """WITH f AS (
        |  SELECT event_type AS group_key, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN value > 300.0 THEN 1 ELSE 0 END) AS BIGINT) AS successes
        |  FROM events WHERE (value > 300.0) IS NOT NULL GROUP BY 1),
        |p AS (
        |  SELECT *,
        |    CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
        |    1.959964 * 1.959964 / CAST(n AS DOUBLE) AS z2n
        |  FROM f),
        |q AS (
        |  SELECT *,
        |    (ph + z2n / 2.0) / (1.0 + z2n) AS center,
        |    (1.959964 * sqrt(ph * (1.0 - ph) / CAST(n AS DOUBLE)
        |       + 1.959964 * 1.959964
        |         / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / (1.0 + z2n) AS half
        |  FROM p)
        |SELECT group_key, n, successes,
        |  floor(ph * 1000000.0 + 0.5) / 1000000.0 AS rate,
        |  floor((center - half) * 1000000.0 + 0.5) / 1000000.0 AS ci_lo,
        |  floor((center + half) * 1000000.0 + 0.5) / 1000000.0 AS ci_hi
        |FROM q""".stripMargin,
    "topk_movers" ->
      """WITH ev AS (SELECT ts, event_type AS stream FROM events WHERE ts IS NOT NULL),
        |mid AS (
        |  SELECT (CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', MIN(ts)) AS BIGINT)
        |        + CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', MAX(ts)) AS BIGINT)) / 2 AS m
        |  FROM ev),
        |c AS (
        |  SELECT stream,
        |    CAST(SUM(CASE WHEN CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS BIGINT) >= m THEN 0 ELSE 1 END) AS BIGINT) AS n_first,
        |    CAST(SUM(CASE WHEN CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS BIGINT) >= m THEN 1 ELSE 0 END) AS BIGINT) AS n_second
        |  FROM ev, mid GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_first) AS BIGINT) AS t1, CAST(SUM(n_second) AS BIGINT) AS t2 FROM c)
        |SELECT stream, n_first, n_second,
        |  floor((CAST(n_first AS DOUBLE) / CAST(t1 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS share_first,
        |  floor((CAST(n_second AS DOUBLE) / CAST(t2 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS share_second,
        |  floor((CAST(n_second AS DOUBLE) / CAST(t2 AS DOUBLE)
        |         - CAST(n_first AS DOUBLE) / CAST(t1 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS delta
        |FROM c, t
        |ORDER BY abs(floor((CAST(n_second AS DOUBLE) / CAST(t2 AS DOUBLE)
        |         - CAST(n_first AS DOUBLE) / CAST(t1 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) DESC, stream
        |LIMIT 5""".stripMargin,
    // the pairs CTE carries the same two-pass blocking + hot-block
    // occupancy guard as the record_linkage oracles (the composed flow
    // consumes the capped two-pass kernel)
    "linkage_entities" ->
      """WITH RECURSIVE b1 AS (
        |  SELECT * FROM (
        |    SELECT doc_id, substr(text, 1, 16) AS blk, substr(text, 1, 64) AS probe,
        |      COUNT(*) OVER (PARTITION BY substr(text, 1, 16)) AS occ
        |    FROM documents)
        |  WHERE occ <= 1000),
        |b2 AS (
        |  SELECT * FROM (
        |    SELECT doc_id,
        |      array_to_string(list_sort(string_split(substr(text, 1, 64), ' ')), ' ') AS blk,
        |      substr(text, 1, 64) AS probe,
        |      COUNT(*) OVER (PARTITION BY
        |        array_to_string(list_sort(string_split(substr(text, 1, 64), ' ')), ' ')) AS occ
        |    FROM documents)
        |  WHERE occ <= 1000),
        |cand AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.probe AS pa, y.probe AS pb
        |  FROM b1 x JOIN b1 y ON x.blk = y.blk AND x.doc_id < y.doc_id
        |  UNION
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.probe AS pa, y.probe AS pb
        |  FROM b2 x JOIN b2 y ON x.blk = y.blk AND x.doc_id < y.doc_id),
        |p AS (
        |  SELECT doc_a, doc_b
        |  FROM cand
        |  WHERE floor(jaro_winkler_similarity(pa, pb) * 1000000.0 + 0.5)
        |      / 1000000.0 >= 0.9),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
        |          UNION ALL SELECT doc_b AS src, doc_a AS dst FROM p),
        |reach(src, node) AS (
        |  SELECT src, src FROM edges GROUP BY src
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.node = e.src),
        |comps AS (
        |  SELECT src AS doc_id, CAST(MIN(node) AS BIGINT) AS entity_id
        |  FROM reach GROUP BY src)
        |SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT) AS max_doc
        |FROM comps GROUP BY 1""".stripMargin,
    // same chunker convention as dup_span_stats (window 16, stride 16);
    // partial trailing chunks are always kept, full chunks keep only their
    // first (doc_id, pos) occurrence
    "dedup_span_rewrite" ->
      """WITH lw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (
        |  SELECT doc_id, i AS pos, array_to_string(w[i*16+1:i*16+16], ' ') AS chunk,
        |    len(w[i*16+1:i*16+16]) AS n
        |  FROM lw, unnest(generate_series(0, (greatest(0, len(w) - 16) + 15) // 16)) AS g(i)),
        |r AS (SELECT doc_id, pos, chunk,
        |        (n <> 16) OR (ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id ASC, pos ASC) = 1) AS keep
        |      FROM ch)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        |  COALESCE(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY pos ASC), '') AS text_kept
        |FROM r GROUP BY doc_id""".stripMargin,
    "bm25_topk" ->
      """WITH t AS (
        |  SELECT doc_id, term FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE term <> ''),
        |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM t GROUP BY 1),
        |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl),
        |dft AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY 1),
        |q AS (SELECT term, df FROM dft ORDER BY df DESC, term ASC LIMIT 8),
        |tf AS (SELECT t.doc_id, t.term, q.df, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM t JOIN q ON t.term = q.term GROUP BY 1, 2, 3),
        |parts AS (
        |  SELECT tf.doc_id,
        |    CAST(floor((
        |      (floor(ln((((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)) + 0.5)
        |                  / (CAST(df AS DOUBLE) + 0.5) + 1.0)) * 1000000.0 + 0.5) / 1000000.0)
        |      * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
        |      / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + (0.75 * CAST(dl AS DOUBLE)) / avgdl))
        |    ) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS part
        |  FROM tf JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
        |scored AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
        |    floor(CAST(SUM(part) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS bm25
        |  FROM parts GROUP BY 1)
        |SELECT doc_id, n_terms_hit, bm25, rank FROM (
        |  SELECT doc_id, n_terms_hit, bm25,
        |    CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INT) AS rank
        |  FROM scored)
        |WHERE rank <= 20""".stripMargin,
    "tfidf_topterms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, token),
        |dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
        |s AS (
        |  SELECT doc_id, token,
        |    floor(CAST(tf AS DOUBLE) * ln(n.n / CAST(df AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS tfidf
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
        |SELECT doc_id, token, tfidf, rank FROM (
        |  SELECT doc_id, token, tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rank
        |  FROM s)
        |WHERE rank <= 3""".stripMargin,
    "repetition_stats" ->
      """SELECT doc_id, n_words,
        |  n_total AS n_shingles_total, n_distinct AS n_shingles_distinct,
        |  CASE WHEN n_total > 0
        |       THEN floor((1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_total AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |  END AS dup_shingle_frac,
        |  floor((CAST(top_tok AS DOUBLE) / CAST(n_words AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS top_token_frac
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(greatest(len(w) - 2, 0) AS BIGINT) AS n_total,
        |    CAST(len(list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                             for i in generate_series(1, len(w)-2) ])) AS BIGINT) AS n_distinct,
        |    CAST(list_max(list_transform(list_distinct(list_filter(w, x -> x <> '')), x -> len(list_filter(w, y -> y = x)))) AS BIGINT) AS top_tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))""".stripMargin,
    "topk_ngrams" ->
      """SELECT s AS ngram, COUNT(*) AS n_docs
        |FROM (
        |  SELECT doc_id, list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                                 for i in generate_series(1, len(w)-2) ]) AS shingles
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)) shl,
        |  unnest(shingles) AS t(s)
        |GROUP BY s
        |ORDER BY n_docs DESC, ngram ASC
        |LIMIT 20""".stripMargin,
    "traffic_heatmap" ->
      """SELECT CAST(date_part('dow', ts) + 1 AS INT) AS dow,
        |  CAST(date_part('hour', ts) AS INT) AS hour_of_day,
        |  COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,
    "quality_drift" -> {
      s"""WITH q AS (
         |  SELECT doc_id, ${qualityScoreExprSql("qscore")}
         |  FROM (
         |  $qualityCountsSql)),
         |t AS (
         |  SELECT d.source, d.doc_id % 2 = 0 AS old_cohort,
         |    CAST(q.qscore AS DECIMAL(18,6)) AS qd
         |  FROM documents d JOIN q USING (doc_id))
         |SELECT source,
         |  CAST(SUM(CASE WHEN old_cohort THEN qd END) AS DOUBLE)
         |    / CAST(SUM(CASE WHEN old_cohort THEN 1 ELSE 0 END) AS DOUBLE) AS mean_q_old,
         |  CAST(SUM(CASE WHEN NOT old_cohort THEN qd END) AS DOUBLE)
         |    / CAST(SUM(CASE WHEN NOT old_cohort THEN 1 ELSE 0 END) AS DOUBLE) AS mean_q_new,
         |  floor((CAST(SUM(CASE WHEN NOT old_cohort THEN qd END) AS DOUBLE)
         |      / CAST(SUM(CASE WHEN NOT old_cohort THEN 1 ELSE 0 END) AS DOUBLE)
         |    - CAST(SUM(CASE WHEN old_cohort THEN qd END) AS DOUBLE)
         |      / CAST(SUM(CASE WHEN old_cohort THEN 1 ELSE 0 END) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS drift
         |FROM t GROUP BY source""".stripMargin
    },
    "length_histogram" ->
      """SELECT source,
        |  CAST(floor(log2(CAST(len(string_split(text, ' ')) AS DOUBLE))) AS BIGINT) AS len_bucket,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "traffic_analysis" ->
      """WITH blocks AS (
        |  SELECT 'blk_' || strftime(bs, '%Y%m%d%H') AS block_label, bs AS block_start,
        |    bs + INTERVAL 6 HOUR AS block_end
        |  FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-08 00:00:00',
        |          TIMESTAMP '2024-01-22 00:00:00' - INTERVAL 6 HOUR, INTERVAL 6 HOUR)) AS bs))
        |SELECT block_label, block_start, event_type AS category, COUNT(*) AS n_messages
        |FROM events JOIN blocks ON ts >= block_start AND ts < block_end
        |GROUP BY 1, 2, 3""".stripMargin,
    "range_join_traffic" ->
      """WITH hours AS (
        |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n FROM events GROUP BY 1),
        |intervals AS (
        |  SELECT min(hour) AS start_hour, max(hour) + INTERVAL 1 HOUR AS end_hour
        |  FROM (SELECT hour, epoch(hour)::BIGINT - (row_number() OVER (ORDER BY hour)) * 3600 AS grp
        |        FROM hours WHERE n > (SELECT CAST(SUM(n) AS DOUBLE) / count(*) FROM hours))
        |  GROUP BY grp)
        |SELECT start_hour, end_hour, count(*) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM intervals JOIN events ON ts >= start_hour AND ts < end_hour
        |GROUP BY 1, 2""".stripMargin,
    "sample_messages" ->
      """SELECT code, message_id, text, sample_rank FROM (
        |  SELECT event_type AS code, event_id AS message_id, props AS text,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS sample_rank
        |  FROM events)
        |WHERE sample_rank <= 10""".stripMargin,
    "ws_cycle_relabel" ->
      s"""$wsStateCtes
         |SELECT CASE WHEN sync_event = 'ws_correction' THEN proposed
         |            WHEN sync_event = 'fix_ws_cycle' THEN previous[1]
         |            ELSE dataset END AS new_dataset,
         |  sync_event, COUNT(*) AS n
         |FROM ws_events GROUP BY 1, 2""".stripMargin,
    "sync_stats" ->
      s"""$wsStateCtes
         |SELECT dataset, sync_event, COUNT(*) AS n
         |FROM ws_events GROUP BY 1, 2""".stripMargin,
    "reverse_sync_contacts" ->
      """SELECT user_id AS participant,
        |  COALESCE(string_agg('"' || props || '" - engagement_db.' || event_type, '; ' ORDER BY ts, event_id)
        |    FILTER (WHERE event_type = 'click'), '') AS click_field,
        |  COALESCE(string_agg('"' || props || '" - engagement_db.' || event_type, '; ' ORDER BY ts, event_id)
        |    FILTER (WHERE event_type = 'view'), '') AS view_field,
        |  COALESCE(string_agg('"' || props || '" - engagement_db.' || event_type, '; ' ORDER BY ts, event_id)
        |    FILTER (WHERE event_type = 'purchase'), '') AS purchase_field,
        |  CASE WHEN MAX(CASE WHEN event_type = 'error' AND value > 250 THEN 1 ELSE 0 END) = 1
        |       THEN 'yes' ELSE '' END AS consent_withdrawn
        |FROM events GROUP BY user_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY 1""".stripMargin,
    "doc_fingerprint" ->
      """SELECT doc_id,
        |  NULLIF(array_to_string(list_sort(list_transform(list_distinct(shingles), s -> md5(s)))[1:4], ';'), '') AS fingerprint
        |FROM (
        |  SELECT doc_id, [ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                   for i in generate_series(1, len(w)-2) ] AS shingles
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""$minhashCtes
         |$candidatePairsSql""".stripMargin,
    "dedup_simhash" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, md5(tok) AS h FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |votes AS (
        |  SELECT doc_id, pos,
        |    SUM((((strpos('0123456789abcdef', substr(h, pos // 4 + 1, 1)) - 1)
        |          // (CASE pos % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) % 2) * 2 - 1) AS s
        |  FROM toks, unnest(generate_series(0, 31)) AS g(pos)
        |  GROUP BY doc_id, pos)
        |SELECT doc_id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY pos) AS simhash
        |FROM votes GROUP BY doc_id""".stripMargin,
    "dedup_simhash_pairs" -> simhashPairsOracleSql(32),
    "dedup_simhash64_pairs" -> simhashPairsOracleSql(64),
    // the bucket-cap accounting companion (round 15 — linkage_block_report
    // discipline for the OTHER enabled occupancy cap): same banded CTE as
    // the pairs oracle, folded to the one accounting row
    "simhash_block_report" -> simhashBucketReportOracleSql(64),
    "ngram_jaccard" ->
      s"""$pairOverlapCtes
         |SELECT doc_a, doc_b, floor((j) * 1000000.0 + 0.5) / 1000000.0 AS jaccard FROM (
         |  SELECT doc_a, doc_b,
         |    CAST(i AS DOUBLE) / CAST(sz_a + sz_b - i AS DOUBLE) AS j
         |  FROM inter)
         |WHERE j >= 0.05""".stripMargin,
    "dedup_minhash_verified" ->
      s"""$minhashCtes,
         |$verifiedPairsCte
         |SELECT doc_a, doc_b, floor((j) * 1000000.0 + 0.5) / 1000000.0 AS jaccard FROM vpairs""".stripMargin,
    "neardup_rate_report" ->
      s"""$minhashCtes,
         |$verifiedPairsCte,
         |dup AS (SELECT DISTINCT doc_id FROM (
         |  SELECT doc_a AS doc_id FROM vpairs UNION ALL SELECT doc_b FROM vpairs))
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
         |  floor((CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS neardup_rate
         |FROM documents LEFT JOIN dup USING (doc_id)
         |GROUP BY source""".stripMargin,
    "dedup_fuzzy_edit" ->
      s"""$minhashCtes,
         |pairs AS (
         |  $candidatePairsSql)
         |SELECT doc_a, doc_b, floor((raw_sim) * 1000000.0 + 0.5) / 1000000.0 AS edit_sim FROM (
         |  SELECT doc_a, doc_b,
         |    1.0 - CAST(levenshtein(ta.text, tb.text) AS DOUBLE)
         |      / CAST(greatest(len(ta.text), len(tb.text)) AS DOUBLE) AS raw_sim
         |  FROM pairs JOIN documents ta ON pairs.doc_a = ta.doc_id
         |             JOIN documents tb ON pairs.doc_b = tb.doc_id)
         |WHERE raw_sim >= 0.4""".stripMargin,
    "dedup_containment" ->
      s"""$pairOverlapCtes
         |SELECT doc_a, doc_b, floor((c) * 1000000.0 + 0.5) / 1000000.0 AS containment FROM (
         |  SELECT doc_a, doc_b,
         |    CAST(i AS DOUBLE) / CAST(least(sz_a, sz_b) AS DOUBLE) AS c
         |  FROM inter)
         |WHERE c >= 0.5""".stripMargin,
    "dedup_incremental" ->
      s"""$minhashCtes,
         |pairs AS (
         |  SELECT DISTINCT n.doc_id AS new_doc, i.doc_id AS index_doc
         |  FROM banded n JOIN banded i
         |    ON n.band = i.band AND n.bk = i.bk
         |  WHERE n.doc_id % 7 = 0 AND i.doc_id % 7 <> 0)
         |SELECT new_doc, index_doc, floor((j) * 1000000.0 + 0.5) / 1000000.0 AS jaccard FROM (
         |  SELECT new_doc, index_doc,
         |    ${jaccardSql("sa", "sb")} AS j
         |  FROM pairs JOIN shl sa ON pairs.new_doc = sa.doc_id
         |             JOIN shl sb ON pairs.index_doc = sb.doc_id)
         |WHERE j >= 0.5""".stripMargin,
    "minhash_jaccard_est" -> {
      val matchTerms = (0 until 16)
        .map(p => s"(CASE WHEN sa.s$p = sb.s$p THEN 1 ELSE 0 END)").mkString(" + ")
      s"""$minhashCtes,
         |pairs AS (
         |  $candidatePairsSql)
         |SELECT doc_a, doc_b,
         |  floor((CAST($matchTerms AS DOUBLE) / CAST(16 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS est_jaccard
         |FROM pairs JOIN sig sa ON pairs.doc_a = sa.doc_id
         |           JOIN sig sb ON pairs.doc_b = sb.doc_id""".stripMargin
    },
    "cross_source_leakage" ->
      """WITH lw AS (SELECT source, string_split(text, ' ') AS w FROM documents),
        |ch AS (
        |  SELECT source, w[i*8+1:i*8+16] AS ws
        |  FROM lw, unnest(generate_series(0, (greatest(0, len(w) - 16) + 7) // 8)) AS g(i)),
        |hs AS (
        |  SELECT DISTINCT md5(array_to_string(ws, ' ')) AS h, source AS src
        |  FROM ch WHERE len(ws) = 16)
        |SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS n_shared_spans
        |FROM hs a JOIN hs b ON a.h = b.h AND a.src < b.src
        |GROUP BY 1, 2""".stripMargin,
    "topk_values_agg" ->
      """WITH tv AS (
        |  SELECT event_type,
        |    list_sort(list(value) FILTER (WHERE value IS NOT NULL), 'DESC')[1:5] AS top_values
        |  FROM events GROUP BY event_type)
        |SELECT event_type, r AS rank, top_values[r] AS value
        |FROM tv, (VALUES (1), (2), (3), (4), (5)) AS v(r)
        |WHERE r <= len(top_values)""".stripMargin,
    "topk_values_sketch" ->
      // the sketch runs in its exact regime at test scale (capacity >>
      // vocabulary), so plain counting with the same (cnt desc, token asc)
      // tie-break reproduces it
      """SELECT source, CAST(rank AS INT) AS rank, token, cnt FROM (
        |  SELECT source, tok AS token, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, tok ASC) AS rank
        |  FROM (
        |    SELECT source, tok, COUNT(*) AS cnt
        |    FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
        |    WHERE tok <> ''
        |    GROUP BY source, tok))
        |WHERE rank <= 5""".stripMargin,
    "production_export" ->
      // NOT EXISTS, not a window flag: matches the Spark side's anti-join
      // NULL semantics (a NULL-keyed row never matches, so it is kept)
      """WITH kept AS (
        |  SELECT * FROM events e
        |  WHERE NOT EXISTS (SELECT 1 FROM events x
        |                    WHERE x.event_type = 'error' AND x.value > 250
        |                      AND x.user_id = e.user_id))
        |SELECT l.event_id AS message_id, l.user_id AS participant_uuid,
        |  l.ts AS "timestamp", l.value AS message_value, COALESCE(d.signup_n, 0) AS signup_n
        |FROM (SELECT event_id, user_id, ts, value FROM kept WHERE event_type = 'purchase') l
        |LEFT JOIN (SELECT user_id, COUNT(*) AS signup_n FROM kept
        |           WHERE event_type = 'signup' GROUP BY user_id) d
        |  ON l.user_id = d.user_id""".stripMargin,
    // computed straight from parquet: equality with the Spark side (which
    // reads its own CSV output back) is the export-integrity proof
    "dataset_export" ->
      // checksums accumulate as exact DECIMAL(38,0) and convert ONCE to
      // DOUBLE — the same identical-IEEE-conversion discipline every
      // regression row uses (no raw DECIMAL(38,0) ever leaves a query)
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(SUM(CAST(event_id AS DECIMAL(38,0))) AS DOUBLE) AS sum_event_id,
        |  CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) AS sum_value_q6,
        |  CAST(SUM(CAST(epoch_us(ts) AS DECIMAL(38,0))) AS DOUBLE) AS sum_ts_micros
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    // constant-row witness for the deferred-summary leaf (see the query's
    // comment): any engine computes the same three literals
    "deferred_leaf_witness" ->
      "SELECT CAST(42 AS BIGINT) AS k, 'deferred' AS label, CAST(1 AS DOUBLE) / CAST(3 AS DOUBLE) AS ratio",
    "engagement_pipeline" ->
      s"""$engagementFlowCtes,
         |stages AS (
         |  SELECT 0 AS stage, 'fetched' AS stage_name, ds0 AS dataset, user_id, 0 AS imputed FROM g
         |  UNION ALL SELECT 1, 'time_range', ds0, user_id, 0 FROM g WHERE f_time
         |  UNION ALL SELECT 2, 'test_participants_removed', ds0, user_id, 0
         |    FROM g WHERE f_time AND f_test
         |  UNION ALL SELECT 3, 'consent_withdrawn_removed', ds0, user_id, 0
         |    FROM g WHERE f_time AND f_test AND f_consent
         |  UNION ALL SELECT 4, 'ws_corrected', ds_ws, user_id, 0
         |    FROM g WHERE f_time AND f_test AND f_consent
         |  UNION ALL SELECT 5, 'codes_imputed', ds_ws, user_id, imputed
         |    FROM g WHERE f_time AND f_test AND f_consent)
         |SELECT stage, stage_name, dataset, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_participants,
         |  CAST(SUM(imputed) AS BIGINT) AS n_imputed
         |FROM stages GROUP BY 1, 2, 3""".stripMargin,
    "engagement_export" ->
      s"""$engagementFlowCtes
         |SELECT event_id AS message_id, user_id AS participant_uuid, ds_ws AS dataset,
         |  ts AS "timestamp", value AS message_value,
         |  COALESCE(CAST(k AS VARCHAR), 'TRUE_MISSING') AS code
         |FROM g WHERE f_time AND f_test AND f_consent""".stripMargin,
    "engagement_participants_export" ->
      s"""$engagementFlowCtes
         |SELECT user_id AS participant_uuid, ds_ws AS dataset,
         |  string_agg(COALESCE(CAST(k AS VARCHAR), 'TRUE_MISSING'), ';'
         |    ORDER BY ts, event_id) AS codes,
         |  CAST(COUNT(*) AS BIGINT) AS n_messages
         |FROM g WHERE f_time AND f_test AND f_consent
         |GROUP BY 1, 2""".stripMargin,
    "configured_pipeline_view" ->
      """WITH scoped AS (
        |  SELECT * FROM events
        |  WHERE event_type IN ('purchase', 'view', 'click', 'signup')
        |    AND (event_type NOT IN ('purchase', 'view', 'click')
        |         OR (ts >= TIMESTAMP '2024-01-08 00:00:00'
        |             AND ts <= TIMESTAMP '2024-01-21 00:00:00'))
        |    AND NOT EXISTS (SELECT 1 FROM events x
        |                    WHERE x.event_type = 'error' AND x.value > 320
        |                      AND x.user_id = events.user_id))
        |SELECT user_id,
        |  COALESCE(string_agg(CASE WHEN event_type IN ('purchase', 'view') THEN COALESCE(props, '') END,
        |    ';' ORDER BY ts, event_id), '') AS activity_raw,
        |  COALESCE(string_agg(CASE WHEN event_type = 'click' THEN COALESCE(props, '') END,
        |    ';' ORDER BY ts, event_id), '') AS click_raw,
        |  COALESCE(string_agg(CASE WHEN event_type = 'signup' THEN COALESCE(props, '') END,
        |    ';' ORDER BY ts, event_id), '') AS age_raw,
        |  CASE
        |    WHEN MAX(CASE WHEN event_type = 'signup'
        |             THEN CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) END)
        |         BETWEEN 65 AND 120 THEN 'elder'
        |    WHEN MAX(CASE WHEN event_type = 'signup'
        |             THEN CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) END)
        |         BETWEEN 36 AND 64 THEN 'adult'
        |    WHEN MAX(CASE WHEN event_type = 'signup'
        |             THEN CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) END)
        |         BETWEEN 18 AND 35 THEN 'youth'
        |    WHEN MAX(CASE WHEN event_type = 'signup'
        |             THEN CAST(CASE WHEN length(NULLIF(regexp_extract(props, '[0-9]+', 0), '')) <= 9 THEN NULLIF(regexp_extract(props, '[0-9]+', 0), '') END AS INT) END)
        |         BETWEEN 0 AND 17 THEN 'child'
        |  END AS age_category
        |FROM scoped GROUP BY user_id""".stripMargin,
    "langid" -> langidOracle,
    // classes = gold ∪ predicted; precision/recall NULL on an empty
    // denominator, f1 in its 2·tp/(n_gold+n_pred) form (the prediction CTE
    // is the SHARED langid oracle, so the two rows cannot drift apart)
    "classifier_eval" ->
      s"""WITH pred AS (
         |$langidOracle),
         |j AS (SELECT d.lang AS gold, p.predicted_lang AS pred
         |      FROM documents d JOIN pred p USING (doc_id)
         |      WHERE d.lang IS NOT NULL AND p.predicted_lang IS NOT NULL),
         |g AS (SELECT gold AS lang, CAST(COUNT(*) AS BIGINT) AS n_gold,
         |        CAST(SUM(CASE WHEN gold = pred THEN 1 ELSE 0 END) AS BIGINT) AS tp
         |      FROM j GROUP BY 1),
         |p AS (SELECT pred AS lang, CAST(COUNT(*) AS BIGINT) AS n_pred FROM j GROUP BY 1)
         |SELECT COALESCE(g.lang, p.lang) AS lang,
         |  COALESCE(n_gold, 0) AS n_gold, COALESCE(n_pred, 0) AS n_pred,
         |  COALESCE(tp, 0) AS tp,
         |  CASE WHEN COALESCE(n_pred, 0) > 0 THEN
         |    floor((CAST(COALESCE(tp, 0) AS DOUBLE) / CAST(n_pred AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         |  END AS "precision",
         |  CASE WHEN COALESCE(n_gold, 0) > 0 THEN
         |    floor((CAST(COALESCE(tp, 0) AS DOUBLE) / CAST(n_gold AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         |  END AS recall,
         |  floor((2.0 * CAST(COALESCE(tp, 0) AS DOUBLE)
         |         / CAST(COALESCE(n_gold, 0) + COALESCE(n_pred, 0) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS f1
         |FROM g FULL OUTER JOIN p ON g.lang = p.lang""".stripMargin,
    "corpus_report_cube" ->
      s"""SELECT source, lang, CAST(GROUPING(source, lang) AS BIGINT) AS gid,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         |FROM (SELECT source, lang, $sqlTokCount AS n_tok FROM documents)
         |GROUP BY CUBE(source, lang)""".stripMargin,
    // Generated from the SAME profile table as the Spark side, so adding a
    // language can never drift the two formulations apart. DuckDB list_max
    // over structs is field-order lexicographic, matching Spark array_max.
    "langid_profiled" -> langidProfiledOracle,
    // the voter CTEs are the SHARED langid oracles; the alpha algebra is
    // exact integers until one IEEE division
    "krippendorff_alpha" ->
      s"""WITH h AS (
         |$langidOracle),
         |p AS (
         |$langidProfiledOracle),
         |v AS (
         |  SELECT d.doc_id AS u, d.lang AS l FROM documents d
         |  UNION ALL SELECT h.doc_id, h.predicted_lang FROM h
         |  UNION ALL SELECT p.doc_id, p.predicted_lang FROM p),
         |ul AS (
         |  SELECT u, l, CAST(COUNT(*) AS BIGINT) AS c FROM v
         |  WHERE u IS NOT NULL AND l IS NOT NULL GROUP BY 1, 2),
         |pu AS (
         |  SELECT u, CAST(SUM(c) AS BIGINT) AS m, CAST(SUM(c * c) AS BIGINT) AS ss
         |  FROM ul GROUP BY 1),
         |lm AS (SELECT l, CAST(SUM(c) AS BIGINT) AS nl FROM ul GROUP BY 1),
         |f AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_units, MIN(m) AS mmin,
         |    CAST(SUM(m * m - ss) AS BIGINT) AS o2, CAST(SUM(m) AS BIGINT) AS n
         |  FROM pu),
         |g AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_labels,
         |    CAST(SUM(nl * nl) AS BIGINT) AS snl2
         |  FROM lm)
         |SELECT n_units, n_labels,
         |  CASE WHEN n * n - snl2 > 0 AND mmin >= 2
         |    THEN floor((1.0 - CAST((n - 1) * o2 AS DOUBLE)
         |                      / CAST((mmin - 1) * (n * n - snl2) AS DOUBLE))
         |      * 1000000.0 + 0.5) / 1000000.0
         |  END AS alpha
         |FROM f, g""".stripMargin,
    // the prediction CTE is the SHARED langid oracle (classifier_eval's
    // discipline applied to the raw matrix)
    "langid_confusion" ->
      s"""WITH pred AS (
         |$langidOracle)
         |SELECT d.lang AS gold, p.predicted_lang AS predicted,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM documents d JOIN pred p USING (doc_id)
         |WHERE d.lang IS NOT NULL AND p.predicted_lang IS NOT NULL
         |GROUP BY 1, 2""".stripMargin,
    // both labeler CTEs are the SHARED langid oracles, so the vote cannot
    // drift from the labelers it audits
    "label_consensus" ->
      s"""WITH h AS (
         |$langidOracle),
         |p AS (
         |$langidProfiledOracle),
         |v AS (
         |  SELECT d.doc_id, d.lang AS a, h.predicted_lang AS b, p.predicted_lang AS c
         |  FROM documents d JOIN h USING (doc_id) JOIN p USING (doc_id)),
         |s AS (
         |  SELECT CASE WHEN b = c AND a <> b THEN b ELSE a END AS consensus,
         |    CASE WHEN a = b AND a = c THEN 3
         |         WHEN a = b OR a = c OR b = c THEN 2
         |         ELSE 1 END AS n_agree
         |  FROM v)
         |SELECT consensus, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN n_agree = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_unanimous,
         |  CAST(SUM(CASE WHEN n_agree = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_majority,
         |  CAST(SUM(CASE WHEN n_agree = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_disputed
         |FROM s GROUP BY 1""".stripMargin,
    // mirrors LangModel.bigramScore's IEEE tree: (cbg + 1.0)/(cw + 1.0*v),
    // -ln, floor-based half-up rounding (engine round() disagrees on
    // half-way quotients), exact DECIMAL(18,6) accumulation per doc
    "lm_bigram_score" ->
      s"""$lmBigramOracleCtes
         |SELECT doc_id, n_bigrams, lm_nll FROM lmv""".stripMargin,
    "ccnet_buckets" ->
      s"""$lmBigramOracleCtes,
         |srcs AS (SELECT doc_id, source AS slice FROM documents),
         |cuts AS (
         |  SELECT slice,
         |    floor(quantile_cont(lm_nll, 0.3) * 1000000.0 + 0.5) / 1000000.0 AS c1,
         |    floor(quantile_cont(lm_nll, 0.7) * 1000000.0 + 0.5) / 1000000.0 AS c2
         |  FROM lmv JOIN srcs USING (doc_id)
         |  WHERE lm_nll IS NOT NULL GROUP BY slice)
         |SELECT doc_id, slice, lm_nll AS score,
         |  CASE WHEN lm_nll IS NULL THEN 'unscored'
         |       WHEN lm_nll <= c1 THEN 'head'
         |       WHEN lm_nll <= c2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM lmv JOIN srcs USING (doc_id) LEFT JOIN cuts USING (slice)""".stripMargin,
    "token_budget_fill" ->
      s"""WITH q AS (
         |  SELECT doc_id, ${qualityScoreExprSql("quality")}
         |  FROM (
         |  $qualityCountsSql)),
         |t AS (
         |  SELECT d.doc_id, d.source AS slice,
         |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok, q.quality
         |  FROM documents d JOIN q USING (doc_id))
         |SELECT doc_id, slice, n_tok, quality,
         |  CAST(SUM(n_tok) OVER w AS BIGINT) AS cum_tok,
         |  (SUM(n_tok) OVER w) <= 600 AS kept
         |FROM t
         |WINDOW w AS (PARTITION BY slice ORDER BY quality DESC, doc_id ASC
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "lm_trigram_score" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |voc AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
        |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM base)),
        |ctxs AS (
        |  SELECT doc_id, unnest([ w[i] || ' ' || w[i+1]
        |                          for i in generate_series(1, len(w)-1) ]) AS ctx
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)),
        |cc AS (SELECT ctx, count(*) AS cctx FROM ctxs GROUP BY ctx),
        |ngrams AS (
        |  SELECT doc_id, unnest([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                          for i in generate_series(1, len(w)-2) ]) AS ng
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)),
        |nc AS (SELECT ng, count(*) AS cng FROM ngrams GROUP BY ng),
        |scored AS (
        |  SELECT doc_id, count(*) AS n_ngrams,
        |    SUM(CAST(floor(-ln((cng + 1.0) / (cctx + 1.0 * v)) * 1000000.0 + 0.5) / 1000000.0
        |             AS DECIMAL(18,6))) AS nll_sum
        |  FROM ngrams JOIN nc USING (ng)
        |  JOIN cc ON array_to_string(string_split(ng, ' ')[1:2], ' ') = cc.ctx
        |  CROSS JOIN voc
        |  GROUP BY doc_id)
        |SELECT base.doc_id, CAST(COALESCE(n_ngrams, 0) AS BIGINT) AS n_ngrams,
        |  floor(CAST(nll_sum AS DOUBLE) /
        |    (CASE WHEN n_ngrams > 0 THEN CAST(n_ngrams AS DOUBLE) END)
        |    * 1000000.0 + 0.5) / 1000000.0 AS lm_nll
        |FROM base LEFT JOIN scored USING (doc_id)""".stripMargin,
    "quality_score" -> qualityScoreOracle,
    // long form of the SAME oracle (shared val — the wide and melted rows
    // cannot drift apart); every value cast to double like the engine's
    // unpivot value column
    "quality_unpivot" ->
      s"""WITH q AS (
         |$qualityScoreOracle)
         |SELECT doc_id, metric, value FROM (
         |  SELECT doc_id, 'n_words' AS metric, CAST(n_words AS DOUBLE) AS value FROM q
         |  UNION ALL SELECT doc_id, 'n_chars_m', CAST(n_chars_m AS DOUBLE) FROM q
         |  UNION ALL SELECT doc_id, 'n_punct', CAST(n_punct AS DOUBLE) FROM q
         |  UNION ALL SELECT doc_id, 'n_stopwords', CAST(n_stopwords AS DOUBLE) FROM q
         |  UNION ALL SELECT doc_id, 'avg_word_len', avg_word_len FROM q
         |  UNION ALL SELECT doc_id, 'stopword_ratio', stopword_ratio FROM q
         |  UNION ALL SELECT doc_id, 'quality_score', quality_score FROM q)""".stripMargin,
    "token_count" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
         |  $sqlTokCount AS n_tok,
         |  $sqlTokCount AS n_re
         |FROM documents""".stripMargin,
    // exact-integer 2*cumW >= W pick; the RANGE-default window frame
    // gives ties a shared cumulative on both engines
    "weighted_median" ->
      s"""WITH r AS (
         |  SELECT source AS group_key, n_chars AS v, $sqlTokCount AS w
         |  FROM documents
         |  WHERE n_chars IS NOT NULL AND $sqlTokCount > 0),
         |c AS (
         |  SELECT group_key, v,
         |    CAST(SUM(w) OVER (PARTITION BY group_key ORDER BY v) AS BIGINT) AS cum,
         |    CAST(SUM(w) OVER (PARTITION BY group_key) AS BIGINT) AS tot
         |  FROM r)
         |SELECT group_key, MAX(tot) AS total_w, MIN(v) AS w_median
         |FROM c WHERE 2 * cum >= tot GROUP BY 1""".stripMargin,
    "tokenizer_fertility" ->
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
         |  CAST(SUM($sqlTokCount) AS BIGINT) AS n_tokens,
         |  floor((CAST(SUM($sqlTokCount) AS DOUBLE)
         |         / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE))
         |    * 1000000.0 + 0.5) / 1000000.0 AS fertility
         |FROM documents GROUP BY 1""".stripMargin,
    "ann_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
        |SELECT query_id, vec_id, cos_sim, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |    floor((list_dot_product(q.v, c.v)
        |      / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY floor((list_dot_product(q.v, c.v)
        |        / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 DESC,
        |        c.vec_id ASC) AS rank
        |  FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id <> c.vec_id)
        |WHERE rank <= 10""".stripMargin,
    // the ranked CTE is ann_topk's oracle verbatim; DCG/IDCG terms are
    // q6'd 1/log2(pos+1) DECIMAL sums, ndcg one IEEE division
    "ann_rank_eval" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |ranked AS (
        |  SELECT query_id, vec_id, rank FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |        ORDER BY floor((list_dot_product(q.v, c.v)
        |          / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 DESC,
        |          c.vec_id ASC) AS rank
        |    FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id <> c.vec_id)
        |  WHERE rank <= 10),
        |lab AS (SELECT vec_id AS id, label FROM embeddings),
        |cnt AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS nl FROM lab GROUP BY 1),
        |rof AS (
        |  SELECT l.id AS query_id, c.nl - 1 AS n_rel_corpus
        |  FROM lab l JOIN cnt c USING (label)),
        |rel AS (
        |  SELECT r.query_id, r.rank, (lq.label = lc.label) AS is_rel
        |  FROM ranked r
        |  JOIN lab lq ON r.query_id = lq.id
        |  JOIN lab lc ON r.vec_id = lc.id),
        |pq AS (
        |  SELECT query_id,
        |    CAST(SUM(CASE WHEN is_rel THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |    SUM(CAST(CASE WHEN is_rel
        |      THEN floor((1.0 / log2(CAST(rank AS DOUBLE) + 1.0)) * 1000000.0 + 0.5) / 1000000.0
        |      ELSE 0.0 END AS DECIMAL(28,6))) AS dcg,
        |    MIN(CASE WHEN is_rel THEN rank END) AS firstrel
        |  FROM rel GROUP BY 1),
        |ideal AS (
        |  SELECT query_id,
        |    SUM(CAST(floor((1.0 / log2(CAST(i AS DOUBLE) + 1.0)) * 1000000.0 + 0.5) / 1000000.0
        |      AS DECIMAL(28,6))) AS idcg
        |  FROM (SELECT query_id, unnest(generate_series(1, LEAST(10, n_rel_corpus))) AS i
        |        FROM rof WHERE n_rel_corpus >= 1) GROUP BY 1)
        |SELECT p.query_id, r.n_rel_corpus, p.hits,
        |  floor((CAST(p.hits AS DOUBLE) / 10.0) * 1000000.0 + 0.5) / 1000000.0 AS precision_at_k,
        |  CASE WHEN p.firstrel IS NOT NULL
        |    THEN floor((1.0 / CAST(p.firstrel AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |    ELSE 0.0 END AS mrr,
        |  CASE WHEN i.idcg IS NOT NULL
        |    THEN floor((CAST(p.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |  END AS ndcg
        |FROM pq p JOIN rof r USING (query_id) LEFT JOIN ideal i USING (query_id)""".stripMargin,
    // PQ refined search with a corpus-wide shortlist is exactly brute
    // force (PqSpec invariant), so it shares ann_topk's oracle
    "ann_pq_refined" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
        |SELECT query_id, vec_id, cos_sim, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |    floor((list_dot_product(q.v, c.v)
        |      / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY floor((list_dot_product(q.v, c.v)
        |        / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 DESC,
        |        c.vec_id ASC) AS rank
        |  FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id <> c.vec_id)
        |WHERE rank <= 10""".stripMargin,
    "hard_negatives" -> hardNegativesExactOracle,
    // the dispatcher row: at every gate SF the corpus is under the 100k
    // exact bound, so the dispatched plan IS the exact reference and this
    // oracle decides it; at the 100x replica the dispatch flips to LSH and
    // the sweep swaps in the hard_negatives_lsh oracle for that row
    "hard_negatives_dispatch" -> hardNegativesExactOracle,
    "ann_ivf_topk" -> ivfOracleSql(nprobe = 1),
    "ann_ivf_multiprobe" -> ivfOracleSql(nprobe = 3),
    "ann_lsh_topk" -> {
      s"""WITH e AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |b AS (SELECT id, v, $lshBucketExpr AS bucket FROM e),
         |q AS (SELECT * FROM b WHERE id < 8)
         |SELECT query_id, vec_id, cos_sim, rank FROM (
         |  SELECT q.id AS query_id, c.id AS vec_id,
         |    floor((list_dot_product(q.v, c.v)
         |      / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY q.id
         |      ORDER BY floor((list_dot_product(q.v, c.v)
         |        / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 DESC,
         |        c.id ASC) AS rank
         |  FROM q JOIN b c ON q.bucket = c.bucket AND q.id <> c.id)
         |WHERE rank <= 10""".stripMargin
    },
    "ann_recall_report" -> {
      s"""WITH e AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |b AS (SELECT id, v, $lshBucketExpr AS bucket FROM e),
         |q AS (SELECT * FROM b WHERE id < 8),
         |brute AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT q.id AS query_id, c.id AS vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.id
         |        ORDER BY floor((list_dot_product(q.v, c.v)
         |          / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 DESC,
         |          c.id ASC) AS rank
         |    FROM q JOIN e c ON q.id <> c.id)
         |  WHERE rank <= 10),
         |appr AS (
         |  SELECT query_id, vec_id, 1 AS hit FROM (
         |    SELECT q.id AS query_id, c.id AS vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.id
         |        ORDER BY floor((list_dot_product(q.v, c.v)
         |          / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 DESC,
         |          c.id ASC) AS rank
         |    FROM q JOIN b c ON q.bucket = c.bucket AND q.id <> c.id)
         |  WHERE rank <= 10)
         |SELECT br.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
         |  CAST(SUM(COALESCE(a.hit, 0)) AS BIGINT) AS n_hit,
         |  floor((CAST(SUM(COALESCE(a.hit, 0)) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 AS recall
         |FROM brute br LEFT JOIN appr a
         |  ON br.query_id = a.query_id AND br.vec_id = a.vec_id
         |GROUP BY br.query_id""".stripMargin
    },
    "ann_lsh_multiprobe" -> {
      s"""WITH e AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |b AS (SELECT id, v, $lshBucketExpr AS bucket FROM e),
         |q0 AS (SELECT * FROM b WHERE id < 8),
         |probes AS (
         |  SELECT id, v, bucket AS probe FROM q0
         |  UNION ALL
         |  SELECT id, v,
         |    substr(bucket, 1, i - 1)
         |      || (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END)
         |      || substr(bucket, i + 1) AS probe
         |  FROM q0, (VALUES (1), (2), (3), (4), (5), (6), (7), (8)) AS f(i)),
         |cand AS (
         |  SELECT DISTINCT q.id AS query_id, c.id AS vec_id,
         |    floor((list_dot_product(q.v, c.v)
         |      / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
         |  FROM probes q JOIN b c ON q.probe = c.bucket AND q.id <> c.id)
         |SELECT query_id, vec_id, cos_sim, rank FROM (
         |  SELECT query_id, vec_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
         |  FROM cand)
         |WHERE rank <= 10""".stripMargin
    },
    // the same multi-probe candidate CTEs with the near-dup tier excluded
    // BEFORE ranking — hard_negatives' bucketed scale sibling
    "hard_negatives_lsh" -> {
      s"""WITH e AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |b AS (SELECT id, v, $lshBucketExpr AS bucket FROM e),
         |q0 AS (SELECT * FROM b WHERE id % 50 = 0),
         |probes AS (
         |  SELECT id, v, bucket AS probe FROM q0
         |  UNION ALL
         |  SELECT id, v,
         |    substr(bucket, 1, i - 1)
         |      || (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END)
         |      || substr(bucket, i + 1) AS probe
         |  FROM q0, (VALUES (1), (2), (3), (4), (5), (6), (7), (8)) AS f(i)),
         |cand AS (
         |  SELECT DISTINCT q.id AS query_id, c.id AS vec_id,
         |    floor((list_dot_product(q.v, c.v)
         |      / NULLIF(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
         |  FROM probes q JOIN b c ON q.probe = c.bucket AND q.id <> c.id)
         |SELECT query_id, vec_id, cos_sim, rank FROM (
         |  SELECT query_id, vec_id, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
         |  FROM cand WHERE cos_sim < 0.25)
         |WHERE rank <= 5""".stripMargin
    },
    "embedding_neardup" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
        |SELECT vec_a, vec_b, cos_sim FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    floor((list_dot_product(a.v, b.v)
        |      / NULLIF(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
        |    AND (a.vec_id < b.vec_id OR b.vec_id % 50 <> 0)
        |  WHERE a.vec_id % 50 = 0)
        |WHERE cos_sim >= 0.25""".stripMargin,
    "multimodal_decode" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS n_bytes,
        |  CAST(ascii(substr(COALESCE(text, ''), 1, 1)) AS INT) AS first_cp,
        |  CAST(octet_length(encode(COALESCE(text, ''))) % 640 AS INT) AS fake_width,
        |  CAST((ascii(substr(COALESCE(text, ''), 1, 1)) * 7) % 480 AS INT) AS fake_height
        |FROM documents""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id AS media_id,
        |  CAST(nc AS BIGINT) AS n_frames_total,
        |  CAST((nc + 2) // 3 AS BIGINT) AS n_frames_sampled,
        |  CAST((nc + 2) // 3 * 32
        |       - (CASE WHEN nc > 0 AND (nc - 1) % 3 = 0 THEN nc * 32 - L ELSE 0 END) AS BIGINT) AS sampled_bytes
        |FROM (SELECT doc_id, octet_length(encode(COALESCE(text, ''))) AS L,
        |             (octet_length(encode(COALESCE(text, ''))) + 31) // 32 AS nc
        |      FROM documents)""".stripMargin,
    "multimodal_resize" ->
      """SELECT media_id, w AS src_width, h AS src_height,
        |  dw AS dst_width, dh AS dst_height,
        |  CAST(dw AS BIGINT) * dh * 3 AS out_bytes
        |FROM (
        |  SELECT media_id, w, h,
        |    CASE WHEN w <= 0 OR h <= 0 THEN 0
        |         WHEN w * 64 <= h * 64 THEN w * 64 // h
        |         ELSE 64 END AS dw,
        |    CASE WHEN w <= 0 OR h <= 0 THEN 0
        |         WHEN w * 64 <= h * 64 THEN 64
        |         ELSE h * 64 // w END AS dh
        |  FROM (SELECT doc_id AS media_id,
        |          CAST(octet_length(encode(COALESCE(text, ''))) % 640 AS INT) AS w,
        |          CAST((ascii(substr(COALESCE(text, ''), 1, 1)) * 7) % 480 AS INT) AS h
        |        FROM documents))""".stripMargin,
    "multimodal_features" ->
      """SELECT media_id, 8 AS feat_dim,
        |  CAST(ascii(substr(t,1,1)) + ascii(substr(t,2,1)) + ascii(substr(t,3,1))
        |     + ascii(substr(t,4,1)) + ascii(substr(t,5,1)) + ascii(substr(t,6,1))
        |     + ascii(substr(t,7,1)) + ascii(substr(t,8,1)) AS BIGINT) AS feat_sum
        |FROM (SELECT doc_id AS media_id, COALESCE(text, '') AS t FROM documents)""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AFRICA'
        |GROUP BY n_name""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q8_market_share" ->
      """SELECT o_year, total_revenue, nation_revenue,
        |  CASE WHEN total_revenue <> 0 THEN floor((nation_revenue / total_revenue) * 1000000.0 + 0.5) / 1000000.0 END AS mkt_share
        |FROM (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
        |    CAST(SUM(CASE WHEN sn.n_name = 'NATION_0'
        |                  THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_revenue
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type LIKE 'STANDARD%'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AFRICA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  GROUP BY o_year)""".stripMargin,
    "q14_promo_effect" ->
      """SELECT total_revenue, promo_revenue,
        |  CASE WHEN total_revenue <> 0 THEN floor((100.0 * promo_revenue / total_revenue) * 1000000.0 + 0.5) / 1000000.0 END AS promo_share
        |FROM (
        |  SELECT
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
        |    CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
        |                  THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00')""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name, revenue FROM (
        |  SELECT c_custkey, c_name, c_acctbal, n_name,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY c_custkey, c_name, c_acctbal, n_name)
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey ASC""".stripMargin,
    "q17_small_quantity" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN (SELECT l_partkey AS p_key,
        |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |          / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty
        |      FROM lineitem GROUP BY l_partkey) a
        |  ON l_partkey = p_key
        |WHERE l_quantity < 0.5 * avg_qty""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, o_orderkey, o_orderdate, sum_qty FROM (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 150) b
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,
    "q4_priority_checking" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
        |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        |WHERE sr.r_name = 'AFRICA' AND cr.r_name = 'AFRICA'
        |  AND sn.n_name <> cn.n_name
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |         - CAST(0.5 AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2""".stripMargin,
    "q11_important_value" ->
      """WITH supp AS (
        |  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_8'),
        |v AS (
        |  SELECT l_partkey AS partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS vdec
        |  FROM lineitem JOIN supp ON l_suppkey = s_suppkey
        |  GROUP BY 1),
        |t AS (SELECT SUM(vdec) AS total, COUNT(*) AS cnt FROM v)
        |SELECT partkey, CAST(vdec AS DOUBLE) AS value
        |FROM v, t WHERE vdec * cnt > total * 2""".stripMargin,
    "q16_supplier_diversity" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 5, 9, 15, 23, 31, 40, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH eligible AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |ps AS (
        |  SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_size IN (5, 15, 25, 35, 45) AND p_type = 'STANDARD'
        |    AND l_suppkey IN (SELECT s_suppkey FROM eligible)
        |  GROUP BY 1, 2),
        |rs AS (
        |  SELECT ps.*, e.s_name, e.s_acctbal, e.n_name
        |  FROM ps JOIN eligible e ON ps.l_suppkey = e.s_suppkey),
        |w AS (SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS min_cost FROM rs)
        |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
        |  CAST(cost AS DOUBLE) AS cost
        |FROM w WHERE cost = min_cost""".stripMargin,
    "q20_potential_promotion" ->
      """WITH ps AS (
        |  SELECT l_suppkey, l_partkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS avail,
        |    SUM(CASE WHEN year(l_shipdate) = 1997 THEN CAST(l_quantity AS DECIMAL(18,2))
        |             ELSE CAST(0 AS DECIMAL(18,2)) END) AS qy
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'blue%' GROUP BY 1, 2),
        |q AS (SELECT DISTINCT l_suppkey FROM ps WHERE qy > 0 AND avail > qy * 2)
        |SELECT s_suppkey, s_name, n_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |WHERE s_suppkey IN (SELECT l_suppkey FROM q)""".stripMargin,
    "q12_late_shipments" ->
      """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) > 365 THEN 'LATE'
        |            WHEN datediff('day', o_orderdate, l_shipdate) > 90 THEN 'SLOW'
        |            ELSE 'ONTIME' END AS ship_bucket,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 25)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 5 AND l_quantity <= 35)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity >= 20)""".stripMargin,
    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AFRICA'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 365 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 365 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name ASC LIMIT 20""".stripMargin,
    "q22_dormant_accounts" ->
      """SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_mktsegment""".stripMargin,
    "top_n_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rank_in_group FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_group
        |  FROM orders)
        |WHERE rank_in_group <= 3""".stripMargin,
    "decontaminate" ->
      """WITH shl AS (
        |  SELECT doc_id, list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                                 for i in generate_series(1, len(w)-2) ]) AS shingles
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |bsh AS (SELECT DISTINCT s FROM shl, unnest(shingles) AS t(s) WHERE doc_id % 50 = 0),
        |hits AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT doc_id, s FROM shl, unnest(shingles) AS t(s) WHERE doc_id % 50 <> 0) c
        |  JOIN bsh USING (s) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(h.n, 0) AS n_overlap, COALESCE(h.n, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
        |LEFT JOIN hits h USING (doc_id)""".stripMargin,
    "decontaminate_surgical" ->
      """WITH lw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |lines AS (
        |  SELECT doc_id, [ array_to_string(w[i*8+1:i*8+8], ' ')
        |                   for i in generate_series(0, (len(w)-1)//8) ] AS ls
        |  FROM lw),
        |ex AS (SELECT doc_id, i - 1 AS pos, ls[i] AS line
        |       FROM lines, unnest(generate_series(1, len(ls))) AS t(i)),
        |bench AS (SELECT DISTINCT line FROM ex WHERE doc_id % 50 = 0),
        |corp AS (SELECT doc_id, pos, line FROM ex WHERE doc_id % 50 <> 0)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  COALESCE(string_agg(CASE WHEN b.line IS NULL THEN corp.line END, chr(10) ORDER BY pos ASC), '')
        |    AS text_clean
        |FROM corp LEFT JOIN bench b ON corp.line = b.line
        |GROUP BY doc_id""".stripMargin,
    "line_dedup" ->
      """WITH lw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |lines AS (
        |  SELECT doc_id, [ array_to_string(w[i*8+1:i*8+8], ' ')
        |                   for i in generate_series(0, (len(w)-1)//8) ] AS ls
        |  FROM lw),
        |ex AS (SELECT doc_id, i - 1 AS pos, ls[i] AS line
        |       FROM lines, unnest(generate_series(1, len(ls))) AS t(i)),
        |r AS (SELECT doc_id, pos, line,
        |        ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id ASC, pos ASC) AS rn
        |      FROM ex)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY pos ASC), '') AS text_kept
        |FROM r GROUP BY doc_id""".stripMargin,
    // same injection + precedence-chained counts as pii_redact, folded to
    // the per-source export-safety report
    "pii_scan_report" ->
      """WITH raw AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
        |        || '@mail.example or call +2547'
        |        || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0')
        |      ELSE text END AS t
        |  FROM documents),
        |staged AS (
        |  SELECT source, t,
        |    regexp_replace(t, '[Hh][Tt][Tt][Pp][Ss]?://[^\s]+', '<URL>', 'g') AS um
        |  FROM raw),
        |cnt AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(t, '[Hh][Tt][Tt][Pp][Ss]?://[^\s]+')) AS BIGINT) AS u,
        |    CAST(len(regexp_extract_all(um, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS e,
        |    CAST(len(regexp_extract_all(
        |      regexp_replace(um, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+[0-9]{7,}')) AS BIGINT) AS p
        |  FROM staged)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN u + e + p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
        |  CAST(SUM(u) AS BIGINT) AS n_urls,
        |  CAST(SUM(e) AS BIGINT) AS n_emails,
        |  CAST(SUM(p) AS BIGINT) AS n_phones,
        |  floor((CAST(SUM(CASE WHEN u + e + p > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS pii_rate
        |FROM cnt GROUP BY 1""".stripMargin,
    "pii_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[Hh][Tt][Tt][Pp][Ss]?://[^\s]+')) AS BIGINT) AS n_urls,
        |  CAST(len(regexp_extract_all(um, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(em, '\+[0-9]{7,}')) AS BIGINT) AS n_phones,
        |  regexp_replace(em, '\+[0-9]{7,}', '<PHONE>', 'g') AS redacted
        |FROM (
        |  SELECT doc_id, t,
        |    regexp_replace(t, '[Hh][Tt][Tt][Pp][Ss]?://[^\s]+', '<URL>', 'g') AS um,
        |    regexp_replace(regexp_replace(t, '[Hh][Tt][Tt][Pp][Ss]?://[^\s]+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS em
        |  FROM (
        |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example see https://ex.ample/d/' || CAST(doc_id AS VARCHAR)
        |    || ' tel +2547' || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0') AS t
        |  FROM documents))""".stripMargin,
    "semdedup" ->
      """WITH e AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |cent AS (SELECT id AS cid, v AS cvec FROM e WHERE id < 8),
        |assign AS (
        |  SELECT e.id, e.v, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
        |      floor((list_dot_product(e.v, e.v) - 2.0 * list_dot_product(e.v, cent.cvec)
        |            + list_dot_product(cent.cvec, cent.cvec)) * 1000000.0 + 0.5) / 1000000.0 ASC, cent.cid ASC) AS rn
        |  FROM e CROSS JOIN cent),
        |cl AS (SELECT id, v, cid AS cluster FROM assign WHERE rn = 1),
        |dropped AS (
        |  SELECT DISTINCT a.id FROM cl a JOIN cl b ON a.cluster = b.cluster AND b.id < a.id
        |  WHERE floor((list_dot_product(a.v, b.v)
        |    / NULLIF(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0)) * 1000000.0 + 0.5) / 1000000.0 >= 0.3)
        |SELECT cl.id AS vec_id, cl.cluster, d.id IS NULL AS keep
        |FROM cl LEFT JOIN dropped d ON cl.id = d.id""".stripMargin,
    "embedding_dim_stats" ->
      // float -> double widening is exact; per-element half-up 6-decimal
      // quantization then DECIMAL sums keep the reduction order-independent
      // (the same portable floor arithmetic as the LM scores)
      """WITH ex AS (
        |  SELECT CAST(i - 1 AS INT) AS dim,
        |    floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) / 1e6 AS xr
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
        |a AS (
        |  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(xr AS DECIMAL(38,6))) AS s,
        |    SUM(CAST(xr * xr AS DECIMAL(38,12))) AS sq,
        |    MIN(xr) AS min_x, MAX(xr) AS max_x
        |  FROM ex GROUP BY dim)
        |SELECT dim, n,
        |  floor(CAST(s AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS mean_x,
        |  floor((CAST(sq AS DOUBLE) / n
        |         - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) * 1e6 + 0.5) / 1e6 AS var_x,
        |  min_x, max_x
        |FROM a""".stripMargin,
    // the engine folds these moments in ONE bounded-buffer pass; the oracle
    // replays them with the self-join formulation — identical integer sums
    // (6-decimal quantized products), identical IEEE division sequence
    "embedding_covariance" ->
      """WITH x AS (
        |  SELECT vec_id, CAST(i - 1 AS INT) AS i, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)),
        |m AS (
        |  SELECT i, CAST(SUM(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sv,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM x GROUP BY 1),
        |p AS (
        |  SELECT a.i AS i, b.i AS j,
        |    CAST(SUM(CAST(floor(a.v * b.v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sp
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2)
        |SELECT p.i, p.j,
        |  floor((CAST(sp AS DOUBLE) / 1000000.0 / CAST(mi.n AS DOUBLE)
        |    - (CAST(mi.sv AS DOUBLE) / 1000000.0 / CAST(mi.n AS DOUBLE))
        |      * (CAST(mj.sv AS DOUBLE) / 1000000.0 / CAST(mj.n AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS cov
        |FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j""".stripMargin,
    "seq_packing" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    $sqlTokCount AS n_tok,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4))::BIGINT % 8 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT shard, doc_id, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS strt
        |  FROM t)
        |SELECT shard, CAST(strt // 512 AS BIGINT) AS chunk_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1, 2""".stripMargin,
    "data_mixture" ->
      """WITH t AS (
        |  SELECT lang AS source,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS pct,
        |    CASE lang WHEN 'en' THEN 100 WHEN 'fr' THEN 50 WHEN 'es' THEN 25
        |              WHEN 'de' THEN 10 WHEN 'zh' THEN 75 ELSE 100 END AS w
        |  FROM documents)
        |SELECT source, n_total, n_kept,
        |  floor((CAST(n_kept AS DOUBLE) / CAST(n_total AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS rate
        |FROM (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total,
        |    CAST(SUM(CASE WHEN pct < w THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |  FROM t GROUP BY source)""".stripMargin,
    "mixture_temperature" ->
      """WITH c AS (SELECT lang AS source, CAST(COUNT(*) AS BIGINT) AS n_total
        |           FROM documents GROUP BY 1),
        |tot AS (SELECT SUM(n_total) AS n_all FROM c),
        |w AS (SELECT source, n_total,
        |        pow(CAST(n_total AS DOUBLE) / CAST(n_all AS DOUBLE), (0.5 - 1.0)) AS w
        |      FROM c CROSS JOIN tot),
        |r AS (SELECT source, n_total,
        |        floor((w / (SELECT MAX(w) FROM w)) * 1000000.0 + 0.5) / 1000000.0 AS rate
        |      FROM w),
        |h AS (SELECT lang AS source,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS hh
        |      FROM documents)
        |SELECT r.source, n_total, rate,
        |  CAST(SUM(CASE WHEN CAST(hh AS DOUBLE) < rate * 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM h JOIN r ON h.source = r.source
        |GROUP BY 1, 2, 3""".stripMargin,
    "training_pipeline" ->
      s"""WITH $trainingFlowCtes
         |$trainingFunnelSelect""".stripMargin,
    "training_export" ->
      s"""WITH $trainingFlowCtes
         |SELECT doc_id, source, n_tok FROM staged WHERE m""".stripMargin,
    "training_incremental" ->
      s"""WITH $trainingIngestCtes
         |$trainingFunnelSelect""".stripMargin,
    "dataset_split" ->
      """SELECT doc_id,
        |  CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 4))::BIGINT % 100 AS h
        |  FROM documents)""".stripMargin,
    "cv_folds" ->
      """WITH f AS (
        |  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 4))::BIGINT % 5 AS fold,
        |    lang
        |  FROM documents),
        |c AS (SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1, 2),
        |t AS (SELECT fold, CAST(SUM(n) AS BIGINT) AS fold_total FROM c GROUP BY 1)
        |SELECT c.fold, c.lang, c.n, t.fold_total,
        |  floor((CAST(c.n AS DOUBLE) / CAST(t.fold_total AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS share
        |FROM c JOIN t USING (fold)""".stripMargin,
    "shuffle_order" ->
      """SELECT doc_id, shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord ASC, doc_id ASC) AS INT) AS pos
        |FROM (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4))::BIGINT % 8 AS shard,
        |    md5('epoch0' || ':' || CAST(doc_id AS VARCHAR)) AS ord
        |  FROM documents)""".stripMargin,
    "sample_stratified" ->
      """SELECT source, CAST(rn AS INT) AS "rank", doc_id FROM (
        |  SELECT source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5('sample:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10""".stripMargin,
    "contamination_score" ->
      """WITH shl AS (
        |  SELECT doc_id, list_distinct([ w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                                 for i in generate_series(1, len(w)-2) ]) AS shingles
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |bsh AS (SELECT DISTINCT s FROM shl, unnest(shingles) AS t(s) WHERE doc_id % 50 = 0),
        |hits AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT doc_id, s FROM shl, unnest(shingles) AS t(s) WHERE doc_id % 50 <> 0) c
        |  JOIN bsh USING (s) GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.sz AS BIGINT) AS n_shingles,
        |  COALESCE(h.n, 0) AS n_overlap,
        |  CASE WHEN d.sz > 0
        |       THEN floor((CAST(COALESCE(h.n, 0) AS DOUBLE) / CAST(d.sz AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |  END AS contamination
        |FROM (SELECT doc_id, len(shingles) AS sz FROM shl WHERE doc_id % 50 <> 0) d
        |LEFT JOIN hits h USING (doc_id)""".stripMargin
  )
}
