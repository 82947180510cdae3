package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Code-imputation operators.
  *
  * Reference semantics: impute_codes_by_message /
  * impute_codes_by_column_traced_data (reference:
  * src/engagement_db_to_analysis/code_imputation_functions.py:527,844) —
  * age banding (:265), location hierarchy lookups (:349), TRUE_MISSING /
  * NC codes for absent or empty responses (:229,555), consent-withdrawn
  * propagation to every row of a participant (:684,711), and WS-correction
  * dataset re-assignment (:161).
  *
  * All are expression-level (codegen'd, zero shuffle) except flag
  * propagation, which is a single window over the entity key.
  */
object Imputation {

  /** Band a numeric column into labeled buckets: thresholds are upper bounds
    * (exclusive), labels has one more element than thresholds.
    * Reference: _impute_age_category (code_imputation_functions.py:265).
    */
  def band(c: Column, thresholds: Seq[Double], labels: Seq[String]): Column = {
    require(labels.length == thresholds.length + 1)
    // unsorted thresholds would silently misband every row (the fold's
    // first-match order only means "band" when the bounds ascend)
    require(thresholds == thresholds.sorted,
      s"thresholds must ascend, got ${thresholds.mkString(", ")}")
    val base: Column = lit(labels.last)
    val banded = thresholds.zip(labels).reverse.foldLeft(base) {
      case (acc, (t, l)) => when(c < lit(t), lit(l)).otherwise(acc)
    }
    // null stays null — a bare CaseWhen would fall through to the top bucket
    when(c.isNotNull, banded)
  }

  /** Propagate an entity-level condition to every row of the entity.
    * Reference: _impute_consent_withdrawn (code_imputation_functions.py:711)
    * — one participant STOP message marks all their rows.
    * One window shuffle on the key; no join, no second scan.
    */
  def propagateFlag(df: DataFrame, key: String, rowCondition: Column, flagName: String): DataFrame =
    df.withColumn(flagName,
      max(when(rowCondition, 1).otherwise(0)).over(Window.partitionBy(col(key))) === 1)

  /** WS-correction re-assignment: rows matching `moveCondition` are
    * re-labelled into a corrected dataset.
    * Reference: _impute_ws_coding_errors (code_imputation_functions.py:161),
    * _fix_ws_cycle (src/engagement_db_coda_sync/lib.py:293).
    */
  def relabel(df: DataFrame, labelCol: String, moveCondition: Column, prefix: String): DataFrame =
    df.withColumn(labelCol,
      when(moveCondition, concat(lit(prefix), col(labelCol))).otherwise(col(labelCol)))

  /** Missing-code imputation: substitute `missingCode` when `valueCol` is
    * null or empty. Reference: _impute_true_missing / _impute_nc_for_empty
    * (code_imputation_functions.py:555,229).
    */
  def imputeMissing(valueCol: Column, missingCode: String): Column =
    when(valueCol.isNull || valueCol === lit(""), lit(missingCode)).otherwise(valueCol)
}
