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
    // guard the degenerate denominator (constant x / n=1): emit NULL like
    // SQL engines do on 0/0, not NaN/Infinity
    val denom = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / denom
    agg
      .withColumn("slope", when(denom =!= 0.0, round(slope, 6)))
      .withColumn("intercept",
        when(denom =!= 0.0, round((col("sy") - slope * col("sx")) / col("n"), 6)))
      .drop("sx", "sy", "sxx", "sxy")
  }
}
