package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TracedData-style provenance: every reference record carries its full
  * append-only history of transformations (the core TracedData data model;
  * each update appends a HistoryEntryOrigin — see e.g.
  * src/engagement_db_coda_sync/lib.py:333 `HistoryEntryOrigin("Fix WS
  * Cycle", ...)`).
  *
  * Spark-first: a lineage COLUMN convention, `__history`
  * (array&lt;struct&lt;step,at&gt;&gt;), appended per transform. Pure
  * projection — zero shuffle, codegen'd concat; the history rides through
  * joins/windows like any other column and is dropped at export.
  */
object Provenance {

  val HistoryCol = "__history"

  /** Appends `step` (stamped `at`, default now) to the row's history,
    * creating the history column on first use. */
  def withProvenance(df: DataFrame, step: String, at: Column = current_timestamp()): DataFrame = {
    val entry = array(struct(lit(step).as("step"), at.as("at")))
    if (df.columns.contains(HistoryCol))
      df.withColumn(HistoryCol, concat(col(HistoryCol), entry))
    else
      df.withColumn(HistoryCol, entry)
  }

  /** The ordered step names of a row's history — resolved against `df`,
    * so a frame without provenance fails HERE, not at some distant
    * downstream use of an unresolved column. */
  def historySteps(df: DataFrame): Column =
    transform(df(HistoryCol), e => e.getField("step"))

  /** Export projection: history dropped. */
  def withoutProvenance(df: DataFrame): DataFrame = df.drop(HistoryCol)
}
