package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Closed-form regression over groups.
  *
  * Reference semantics: the analysis pipeline runs per-dataset regressions
  * over coded demographics (reference:
  * src/engagement_db_to_analysis/regression_analysis/
  * complete_case_regression_analysis.py:1,
  * multiple_imputation_regression_analysis.py:1). Spark-first realization:
  * simple OLS reduces to five exact sums per group — a single
  * map-side-combinable aggregation, embarrassingly parallel at any scale,
  * no iterative solver.
  *
  * Numeric discipline: moments are accumulated as exact DECIMAL (order
  * independent), converted to double once, then the closed form is evaluated
  * in a fixed IEEE order — bit-reproducible against the SQL oracle.
  */
object Regression {
  // oracle-compared 6-decimal rounding uses the portable floor arithmetic
  // (Portable.round6): engine round() implementations disagree on
  // knife-edge quotients, and both sides of the oracle contract must run
  // the identical IEEE op sequence
  private val r6 = graft.util.Portable.round6 _


  /** Per-group simple OLS of y on x: slope, intercept, n.
    * Complete-case: rows with null x or y are dropped first (the reference's
    * complete-case strategy).
    */
  def olsByGroup(df: DataFrame, groupCols: Seq[Column], x: Column, y: Column): DataFrame = {
    val cc = df.filter(x.isNotNull && y.isNotNull)
    val xd = x.cast(DecimalType(18, 2))
    val yd = y.cast(DecimalType(18, 2))
    val agg = cc.groupBy(groupCols: _*).agg(
      count(lit(1)).as("n"),
      sum(xd).cast("double").as("sx"),
      sum(yd).cast("double").as("sy"),
      sum(xd * xd).cast("double").as("sxx"),
      sum(xd * yd).cast("double").as("sxy"))
    // degenerate-design guard (constant x / n=1): the exact-decimal sums can
    // leave a ~1e-18 residue once cast to double, so test the denominator
    // RELATIVE to its terms, not against literal zero; emit NULL like SQL
    // engines do on 0/0
    val denom = col("n") * col("sxx") - col("sx") * col("sx")
    val ok = abs(denom) > lit(1e-9) * greatest(abs(col("n") * col("sxx")), abs(col("sx") * col("sx")))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / denom
    agg
      .withColumn("slope", when(ok, r6(slope)))
      .withColumn("intercept",
        when(ok, r6((col("sy") - slope * col("sx")) / col("n"))))
      .drop("sx", "sy", "sxx", "sxy")
  }

  /** Per-group OLS of y on x where missing x is MEAN-IMPUTED within the
    * group — the deterministic Spark analogue of the reference's
    * imputation-then-regress family (multiple_imputation_regression_
    * analysis.py:1 runs R mice + glm; random chained-equation draws can't
    * be oracle-gated, group-mean imputation can). Contrast olsByGroup,
    * which is the complete-case strategy (drop incomplete rows).
    *
    * The imputed dataset is never materialized: with m = mean(observed x),
    * the imputed moments fold in closed form from one conditional
    * aggregation pass —
    *   Σx' = Σx + n_miss·m,  Σx'² = Σx² + n_miss·m²,  Σx'y = Σxy + m·Σ_miss y
    * — so imputation costs zero extra scans, joins, or shuffles at any
    * scale. Rows with null y are dropped (y is the response; only
    * predictors are imputed).
    */
  def olsImputedByGroup(df: DataFrame, groupCols: Seq[Column], x: Column, y: Column): DataFrame = {
    val withY = df.filter(y.isNotNull)
    val xd = x.cast(DecimalType(18, 2))
    val yd = y.cast(DecimalType(18, 2))
    val agg = withY.groupBy(groupCols: _*).agg(
      count(lit(1)).as("n"),
      count(x).as("n_obs"),
      sum(xd).cast("double").as("sx"),
      sum(xd * xd).cast("double").as("sxx"),
      sum(xd * yd).cast("double").as("sxy"),
      sum(yd).cast("double").as("sy"),
      sum(when(x.isNull, yd)).cast("double").as("sy_miss"))
    val nMiss = (col("n") - col("n_obs")).cast("double")
    // null divisor (not 0) when nothing was observed: ANSI double division
    // by zero throws, x/NULL propagates NULL into the guard instead
    val m = col("sx") / when(col("n_obs") > 0, col("n_obs").cast("double"))
    val sxAll = col("sx") + nMiss * m
    val sxxAll = col("sxx") + nMiss * m * m
    val sxyAll = col("sxy") + m * coalesce(col("sy_miss"), lit(0.0))
    val denom = col("n") * sxxAll - sxAll * sxAll
    // relative degenerate-design guard (see olsByGroup); n_obs = 0 means no
    // mean exists to impute with — the whole group is NULL
    val ok = col("n_obs") > 0 &&
      abs(denom) > lit(1e-9) * greatest(abs(col("n") * sxxAll), abs(sxAll * sxAll))
    val slope = (col("n") * sxyAll - sxAll * col("sy")) / denom
    agg
      .withColumn("slope", when(ok, r6(slope)))
      .withColumn("intercept", when(ok, r6((col("sy") - slope * sxAll) / col("n"))))
      .drop("sx", "sxx", "sxy", "sy", "sy_miss")
  }

  /** Per-group bivariate OLS (y on x1, x2 with intercept) via centered
    * second moments and Cramer's rule — still one exact-decimal aggregation
    * pass, no iterative solver. Degenerate designs (collinear/constant
    * regressors) yield NULL coefficients.
    */
  def ols2ByGroup(df: DataFrame, groupCols: Seq[Column], x1: Column, x2: Column, y: Column): DataFrame = {
    val cc = df.filter(x1.isNotNull && x2.isNotNull && y.isNotNull)
    def d(c: Column) = c.cast(DecimalType(18, 2))
    val agg = cc.groupBy(groupCols: _*).agg(
      count(lit(1)).as("n"),
      sum(d(x1)).cast("double").as("sx1"), sum(d(x2)).cast("double").as("sx2"),
      sum(d(y)).cast("double").as("sy"),
      sum(d(x1) * d(x1)).cast("double").as("sx1x1"),
      sum(d(x2) * d(x2)).cast("double").as("sx2x2"),
      sum(d(x1) * d(x2)).cast("double").as("sx1x2"),
      sum(d(x1) * d(y)).cast("double").as("sx1y"),
      sum(d(x2) * d(y)).cast("double").as("sx2y"))
    val n = col("n")
    val s11 = col("sx1x1") - col("sx1") * col("sx1") / n
    val s22 = col("sx2x2") - col("sx2") * col("sx2") / n
    val s12 = col("sx1x2") - col("sx1") * col("sx2") / n
    val s1y = col("sx1y") - col("sx1") * col("sy") / n
    val s2y = col("sx2y") - col("sx2") * col("sy") / n
    val det = s11 * s22 - s12 * s12
    // relative guard: see olsByGroup — collinear designs leave float residue
    val ok = abs(det) > lit(1e-9) * greatest(abs(s11 * s22), abs(s12 * s12))
    val b1 = (s22 * s1y - s12 * s2y) / det
    val b2 = (s11 * s2y - s12 * s1y) / det
    agg
      .withColumn("b1", when(ok, r6(b1)))
      .withColumn("b2", when(ok, r6(b2)))
      .withColumn("b0", when(ok,
        r6((col("sy") - b1 * col("sx1") - b2 * col("sx2")) / n)))
      .drop("sx1", "sx2", "sy", "sx1x1", "sx2x2", "sx1x2", "sx1y", "sx2y")
  }
}
