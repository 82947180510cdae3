package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier / coder evaluation over labeled rows.
  *
  * The reference is a human-labeling pipeline (Coda code schemes applied to
  * messages — engagement_db_coda_sync/lib.py:119's label merge is where two
  * opinions about the same message meet), and the engine ships an automatic
  * classifier (langid). Both need the same closing loop: score predictions
  * against gold labels, and measure how much two labelers agree. Everything
  * here aggregates to class-cardinality frames immediately — the only
  * corpus-sized pass is the first groupBy (map-side combinable), so 100 TB
  * of predictions costs one shuffle of |classes|² partial rows.
  */
object Eval {

  private val r6 = graft.util.Portable.round6 _

  /** Half-up 6-decimal quantization (the portable floor arithmetic) —
    * applied per value BEFORE a decimal sum so the reduction is exact and
    * dialect-replayable. */
  private def q6(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** Per-class precision / recall / F1 of a prediction column against a
    * gold column. Rows with a null on either side are excluded (a null
    * prediction is an abstention, not a class). Classes are the union of
    * gold and predicted labels, so a class the model never predicts (or
    * invents) still gets a row.
    *
    * ONE corpus pass: each row explodes into its gold-role and pred-role
    * views and a single groupBy(class) folds n_gold / n_pred / tp as
    * conditional sums — no confusion intermediate for Catalyst to
    * re-execute per marginal branch, no class join at all (an earlier
    * two-branch formulation scanned the corpus twice; plan-audited).
    *
    * Output: lang, n_gold, n_pred, tp, precision, recall, f1 — precision
    * and recall are NULL when their denominator is empty; f1 uses the
    * 2·tp/(n_gold+n_pred) form, defined whenever the class exists at all.
    */
  def classifierReport(df: DataFrame, gold: Column, pred: Column): DataFrame = {
    df.select(gold.as("__gold"), pred.as("__pred"))
      .filter(col("__gold").isNotNull && col("__pred").isNotNull)
      .select(
        explode(array(
          struct(col("__gold").as("lang"), lit("g").as("role"),
            (col("__gold") === col("__pred")).as("m")),
          struct(col("__pred").as("lang"), lit("p").as("role"),
            (col("__gold") === col("__pred")).as("m")))).as("__e"))
      .select(col("__e.lang"), col("__e.role"), col("__e.m"))
      .groupBy(col("lang"))
      .agg(
        sum(when(col("role") === "g", 1L).otherwise(0L)).as("n_gold"),
        sum(when(col("role") === "p", 1L).otherwise(0L)).as("n_pred"),
        sum(when(col("role") === "g" && col("m"), 1L).otherwise(0L)).as("tp"))
      .withColumn("precision",
        when(col("n_pred") > 0, r6(col("tp").cast("double") / col("n_pred").cast("double"))))
      .withColumn("recall",
        when(col("n_gold") > 0, r6(col("tp").cast("double") / col("n_gold").cast("double"))))
      .withColumn("f1",
        r6(lit(2.0) * col("tp").cast("double")
          / (col("n_gold") + col("n_pred")).cast("double")))
  }

  /** Cohen's kappa between two label columns over the same items — the
    * standard inter-annotator agreement statistic for a double-coded
    * message sample. Items where either coder abstained (null) are
    * excluded, as in the published formulation.
    *
    * ONE corpus pass: rows explode into their two coder-role views, a
    * groupBy(category) folds both marginals plus the agreement count, and
    * one class-cardinality aggregation finishes (Σna, Σ agree-part,
    * Σ na·nb) — an earlier cells/marginals formulation re-executed the
    * corpus scan per branch (plan-audited). po and pe are single IEEE
    * divisions of exact longs, so both engines compute bit-identical
    * inputs to the rounding. kappa is NULL when pe = 1 (both coders
    * constant — agreement is undefined, not 0).
    *
    * Output (one row): n_items, po, pe, kappa (all ratios r6-rounded).
    */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val marg = df.select(a.as("__a"), b.as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .select(explode(array(
        struct(col("__a").as("cat"), lit("a").as("role"),
          (col("__a") === col("__b")).as("m")),
        struct(col("__b").as("cat"), lit("b").as("role"),
          (col("__a") === col("__b")).as("m")))).as("__e"))
      .select(col("__e.cat"), col("__e.role"), col("__e.m"))
      .groupBy(col("cat"))
      .agg(
        sum(when(col("role") === "a", 1L).otherwise(0L)).as("__na"),
        sum(when(col("role") === "b", 1L).otherwise(0L)).as("__nb"),
        sum(when(col("role") === "a" && col("m"), 1L).otherwise(0L)).as("__agree"))
    val totals = marg.agg(
      sum(col("__na")).as("n_items"),
      sum(col("__agree")).as("__agree"),
      // decimal before the multiply: per-category marginals are corpus-
      // scale counts, and a LongType na*nb overflows silently past ~3e9
      // items in one category (the traffic_anomalies discipline)
      sum(col("__na").cast("decimal(19,0)") * col("__nb").cast("decimal(19,0)"))
        .as("__cross"))
    val po = col("__agree").cast("double") / col("n_items").cast("double")
    // n² via decimal for the same reason; the quotient's IEEE value is
    // unchanged (both paths feed the division one exact integer)
    val pe = col("__cross").cast("double") /
      (col("n_items").cast("decimal(19,0)") * col("n_items").cast("decimal(19,0)"))
        .cast("double")
    totals.select(col("n_items"), r6(po).as("po"), r6(pe).as("pe"),
      when(pe < 1.0, r6((po - pe) / (lit(1.0) - pe))).as("kappa"))
  }

  /** Shuffle-key skew diagnosis — the report to run BEFORE picking join /
    * state-sharding keys at scale: row count, key cardinality, the hottest
    * key with its share, and the Herfindahl concentration index
    * (Σ share², = 1/n_keys when uniform, → 1 as one key dominates; > a few
    * × uniform means salting or AQE skew-join territory).
    *
    * One corpus pass to per-key counts (map-side combinable); scalars AND
    * the top-1 pick fold into a single aggregation over the
    * key-cardinality frame — the argmax is a min-of-struct
    * ((−count, key-as-string) lexicographic), not a sort branch, so the
    * corpus is scanned once, not once per output column. Ties break on
    * the key's STRING form (the cross-engine-total order; documented
    * contract). Σc² accumulates in DECIMAL so a billion-row hot key
    * cannot overflow the long sum.
    *
    * Output (one row): n_rows, n_keys, top_key, top_cnt, top_share, hhi.
    */
  def keySkewReport(df: DataFrame, key: Column): DataFrame = {
    val counts = df.select(key.as("__k")).filter(col("__k").isNotNull)
      .groupBy(col("__k")).agg(count(lit(1)).as("__c"))
    counts.agg(
      sum(col("__c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      sum(col("__c").cast("decimal(19,0)") * col("__c").cast("decimal(19,0)")).as("__s2"),
      min(struct((-col("__c")).as("nc"), col("__k").cast("string").as("k"))).as("__top"))
      .select(
        col("n_rows"), col("n_keys"),
        col("__top.k").as("top_key"), (-col("__top.nc")).as("top_cnt"),
        r6((-col("__top.nc")).cast("double") / col("n_rows").cast("double")).as("top_share"),
        r6(col("__s2").cast("double")
          / (col("n_rows").cast("double") * col("n_rows").cast("double"))).as("hhi"))
  }

  /** k-anonymity audit over a set of quasi-identifier columns — the
    * pre-export privacy gate for a pipeline handling real participants:
    * any QI combination shared by fewer than k rows re-identifies people,
    * so the export must generalize or suppress those groups first.
    *
    * One corpus pass to QI-combination counts (map-side combinable), one
    * tiny rollup. Output (one row): n_groups, n_violating (< k),
    * n_rows_at_risk, min_group_size.
    */
  def kAnonymityReport(df: DataFrame, qis: Seq[Column], k: Int): DataFrame = {
    require(qis.nonEmpty, "kAnonymityReport needs at least one quasi-identifier")
    require(k >= 2, s"kAnonymityReport needs k >= 2, got $k")
    df.select(qis.zipWithIndex.map { case (c, i) => c.as(s"__qi$i") }: _*)
      .groupBy(qis.indices.map(i => col(s"__qi$i")): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("n_rows_at_risk"),
        min(col("__n")).as("min_group_size"))
  }

  /** l-diversity audit — k-anonymity's sharper sibling: a QI group can be
    * large yet still leak if everyone in it shares the same SENSITIVE
    * value. Reports groups whose sensitive-attribute diversity is below l.
    *
    * One corpus pass to (QI combo → distinct-sensitive, rows) — the
    * distinct is per group key, shuffling (QI, sensitive) once — then a
    * one-row rollup: n_groups, n_below, n_rows_at_risk, min_l.
    */
  def lDiversityReport(df: DataFrame, qis: Seq[Column], sensitive: Column,
                       l: Int): DataFrame = {
    require(qis.nonEmpty, "lDiversityReport needs at least one quasi-identifier")
    require(l >= 2, s"lDiversityReport needs l >= 2, got $l")
    df.select(qis.zipWithIndex.map { case (c, i) => c.as(s"__qi$i") } :+
        sensitive.as("__s"): _*)
      .groupBy(qis.indices.map(i => col(s"__qi$i")): _*)
      .agg(countDistinct(col("__s")).as("__l"), count(lit(1)).as("__n"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("__l") < l, 1L).otherwise(0L)).as("n_below"),
        sum(when(col("__l") < l, col("__n")).otherwise(0L)).as("n_rows_at_risk"),
        min(col("__l")).as("min_l"))
  }

  /** Krippendorff's alpha (nominal data) — the multi-coder reliability
    * generalization of Cohen's kappa: any number of coders per unit,
    * chance-corrected against the pooled label distribution. For units
    * that all carry the same coder count m, the coincidence algebra
    * collapses to INTEGERS: per-unit off-diagonal pair mass is
    * m² − Σ_l n_ul², the expected mass is n² − Σ_l n_l², and
    * α = 1 − (n−1)·ΣO2 / (2·(n²−Σn_l²))... computed here in its exact
    * integer form with ONE IEEE division at the end (no per-cell
    * fractions to round). Input: one row per (unit, coder label vote),
    * labels non-null. Output (one row): n_units, n_labels, alpha (NULL
    * when the expected disagreement is zero — a single-label corpus has
    * no reliability to measure).
    *
    * Scale shape: one exchange to (unit, label) counts, a unit-level
    * fold, and label marginals off the same counts frame; everything
    * after is scalar arithmetic.
    */
  def krippendorffAlpha(df: DataFrame, unit: Column, vote: Column): DataFrame = {
    val rows = df.select(unit.as("__u"), vote.as("__l"))
      .filter(col("__u").isNotNull && col("__l").isNotNull)
    val ul = rows.groupBy(col("__u"), col("__l")).agg(count(lit(1)).as("__c"))
    // per-unit: m_u and Σ n_ul² -> off-diagonal pair mass m² − Σn²,
    // weighted by 1/(m_u − 1) exactly via the common-m contract below
    val perUnit = ul.groupBy(col("__u")).agg(
      sum(col("__c")).as("__m"),
      sum(col("__c") * col("__c")).as("__ss"))
    // exact-integer collapse requires a COMMON coder count (the 3-voter
    // ensemble's case); reject ragged panels loudly rather than silently
    // approximating the per-unit 1/(m_u−1) weights
    val labelMarg = ul.groupBy(col("__l")).agg(sum(col("__c")).as("__nl"))
    def d(c: Column) = c.cast("double")
    // DECIMAL before every count-by-count multiply (the traffic_anomalies
    // discipline): __nl is a per-label CORPUS total and __n the grand
    // total, so nl², n² overflow a silent LongType product past ~3e9
    // votes — exactly the scale this operator exists for. Per-unit
    // m²−ss stays long (m is the coder count, single digits).
    def dec(c: Column) = c.cast("decimal(19,0)")
    val folded = perUnit.agg(
      count(lit(1)).as("n_units"),
      min(col("__m")).as("__mMin"), max(col("__m")).as("__mMax"),
      sum(col("__m") * col("__m") - col("__ss")).as("__o2"),
      sum(col("__m")).as("__n"))
    val marg = labelMarg.agg(count(lit(1)).as("n_labels"),
      sum(dec(col("__nl")) * dec(col("__nl"))).as("__snl2"))
    val de = dec(col("__n")) * dec(col("__n")) - col("__snl2")
    val alpha = graft.util.Portable.round6(lit(1.0) -
      d(dec(col("__n") - 1) * dec(col("__o2"))) / d(dec(col("__mMin") - 1) * de))
    folded.crossJoin(broadcast(marg))
      .select(col("n_units"), col("n_labels"),
        when(col("__mMin") =!= col("__mMax"),
          raise_error(lit("krippendorffAlpha: ragged coder counts — the " +
            "exact integer form needs a common m per unit")).cast("double"))
          .when(de > 0 && col("__mMin") >= 2, alpha)
          .as("alpha"))
  }

  /** t-closeness audit — the third leg of the privacy trio: a QI group
    * can be k-anonymous AND l-diverse yet still leak if its sensitive
    * DISTRIBUTION differs sharply from the table's (seeing the group
    * tells you the value range). Per QI group, the ordered Earth Mover's
    * Distance between the group's and the global sensitive distribution:
    * EMD = Σᵢ|cumP(vᵢ) − cumQ(vᵢ)| / (m−1) over the m global distinct
    * values (Li et al.'s numerical-attribute formula).
    *
    * Scale shape: the spine is (groups × distinct values) with the
    * group side broadcast (G is small by definition of a QI audit; m
    * rides partitioned windows, never a single partition). Cumulatives
    * are exact-long counts through fixed IEEE divisions; |·| terms q6 →
    * DECIMAL sum per group; one division by (m−1) at the end, r6.
    * Output per group: group_key, n, t_emd, violating (t_emd > t after
    * r6). Degenerate domains (m < 2) yield zero rows.
    */
  def tClosenessReport(df: DataFrame, qi: Column, sensitive: Column,
                       t: Double): DataFrame = {
    require(t > 0.0 && t < 1.0, s"tClosenessReport needs t in (0, 1), got $t")
    val rows = df.select(qi.as("group_key"), sensitive.cast("double").as("__v"))
      .filter(col("group_key").isNotNull && col("__v").isNotNull)
    val gv = rows.groupBy(col("__v")).agg(count(lit(1)).as("__cq"))
    val groups = rows.groupBy(col("group_key")).agg(count(lit(1)).as("__ng"))
    val totals = broadcast(gv.agg(
      count(lit(1)).as("__m"), sum(col("__cq")).as("__N"))
      .filter(col("__m") >= 2))
    val gcounts = rows.groupBy(col("group_key"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("group_key")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def d(c: Column) = c.cast("double")
    gv.crossJoin(broadcast(groups))
      .join(gcounts, Seq("group_key", "__v"), "left")
      .na.fill(0L, Seq("__c"))
      .crossJoin(totals)
      .withColumn("__cumC", sum(col("__c")).over(w))
      .withColumn("__cumQ", sum(col("__cq")).over(w))
      .withColumn("__term",
        q6(abs(d(col("__cumC")) / d(col("__ng")) - d(col("__cumQ")) / d(col("__N"))))
          .cast("decimal(28,6)"))
      .groupBy(col("group_key"))
      .agg(max(col("__ng")).as("n"), max(col("__m")).as("__mm"),
        sum(col("__term")).as("__emd"))
      .select(col("group_key"), col("n"),
        r6(d(col("__emd")) / d(col("__mm") - 1)).as("t_emd"))
      .withColumn("violating", col("t_emd") > t)
  }

  /** Winsorization report: per group, clamp the value column at its own
    * exact [pLo, pHi] percentiles and report how much the tails moved the
    * mean — the outlier-robust cleaning decision (clamp vs drop) made
    * auditable before it ships.
    *
    * The ccnet-buckets shape: cutpoints are ONE exact-percentile
    * aggregation (group-cardinality rows, broadcast back), the clamped
    * re-aggregation is map-side combinable; two corpus passes by
    * necessity (the clamp depends on the group's own distribution).
    * Means: 6-decimal-quantized values summed as DECIMAL then divided
    * once and r6-rounded — an interpolated cutpoint has arbitrary
    * decimals, so a bare decimal(18,2) cast would round it differently
    * per dialect; the explicit floor quantization is the portable path.
    */
  def winsorizeStats(df: DataFrame, group: Column, value: Column,
                     pLo: Double, pHi: Double): DataFrame = {
    require(pLo > 0.0 && pHi < 1.0 && pLo < pHi,
      s"winsorizeStats needs 0 < pLo < pHi < 1, got $pLo/$pHi")
    val rows = df.select(group.as("__g"), value.as("__v")).filter(col("__v").isNotNull)
    // cutpoints are 6dp-QUANTIZED before the clamp/count compare: engines
    // interpolate percentiles with different IEEE op orders (a+f·(b−a) vs
    // a·(1−f)+b·f), and when a REPEATED data value sits exactly at the
    // percentile rank the 1-ulp difference flips `v < lo` for the whole
    // run of equal values (surfaced by the sf1 replication probe: 50
    // copies of one value sat on the p05 cutpoint and the strict-below
    // count diverged by exactly 50). Quantization is the portable
    // contract; a 6dp cutpoint cannot sit between two data values closer
    // than a micro-unit apart. RESIDUAL boundary case (documented, not
    // eliminated): a raw percentile within an ulp of an EXACT 0.5-micro-
    // unit boundary (x.xxxxxx5) can still floor differently per engine —
    // astronomically unlikely on measured data, and any dataset that
    // manufactures it should pin cutpoints explicitly. Quantization also
    // coarsens the REPORTED lo/hi/med/MAD values to 6dp — a deliberate
    // output-contract choice (r6 convention) shared by winsorizeStats,
    // madOutliers and psi.
    val cuts = rows.groupBy(col("__g")).agg(
      q6(expr(s"percentile(__v, ${pLo}D)")).as("__lo"),
      q6(expr(s"percentile(__v, ${pHi}D)")).as("__hi"))
    rows.join(broadcast(cuts), Seq("__g"))
      .withColumn("__w", least(greatest(col("__v"), col("__lo")), col("__hi")))
      .groupBy(col("__g"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__v") < col("__lo"), 1L).otherwise(0L)).as("n_clamped_lo"),
        sum(when(col("__v") > col("__hi"), 1L).otherwise(0L)).as("n_clamped_hi"),
        r6(sum(q6(col("__v")).cast("decimal(28,6)")).cast("double")
          / count(lit(1)).cast("double")).as("mean_raw"),
        r6(sum(q6(col("__w")).cast("decimal(28,6)")).cast("double")
          / count(lit(1)).cast("double")).as("mean_winsorized"))
      .withColumnRenamed("__g", "group_key")
  }

  /** Top-k length-3 step sequences (paths) across per-user event streams,
    * ordered by (ts, tiebreak) within each user. The funnel's exploratory
    * sibling: instead of checking one hypothesised order, surface the
    * orders that actually happen.
    *
    * One shuffle on the user key feeds a single Window node evaluating
    * both leads; the trigram count is map-side combinable and the top-k is
    * TakeOrderedAndProject — no global sort at any width.
    */
  def topPaths(df: DataFrame, user: Column, ts: Column, tiebreak: Column,
               step: Column, k: Int): DataFrame = {
    require(k >= 1, s"topPaths needs k >= 1, got $k")
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tie"))
    df.select(user.as("__u"), ts.as("__ts"), tiebreak.as("__tie"), step.as("step1"))
      .withColumn("step2", lead(col("step1"), 1).over(w))
      .withColumn("step3", lead(col("step1"), 2).over(w))
      .filter(col("step3").isNotNull)
      .groupBy(col("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
  }
}
