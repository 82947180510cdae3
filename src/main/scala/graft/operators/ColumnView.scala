package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Column-view conversions: reshape an entity's many rows into one wide row.
  *
  * Reference semantics: convert_to_participants_column_format /
  * convert_to_messages_column_format (reference:
  * src/engagement_db_to_analysis/column_view_conversion.py:290,354) — one row
  * per participant (or per RQA message) with per-dataset columns, raw texts
  * folded by ordered concatenation (FoldStrategies.concatenate) and label
  * sets folded deterministically.
  *
  * Spark realization: conditional aggregation over an explicit dataset
  * list (NOT `.pivot`, which plans two aggregate phases — see
  * participantView's doc) — a single shuffle on the entity key with
  * map-side partial aggregation and a stable output schema. Ordered folds
  * go through
  * array_sort(collect_list(struct(orderKeys..., payload))) which is
  * deterministic under any row arrival order (total order via unique keys).
  */
object ColumnView {

  /** One row per `key`; for each value of `typeCol` in `types`, a `{t}_n`
    * count and `{t}_val` exact sum of `valueCol` (DECIMAL-exact, emitted as
    * double).
    *
    * Conditional aggregation rather than `.pivot` — pivot plans two
    * aggregate phases (two shuffles); this is one shuffle on the entity key
    * with map-side partials, and empty cells match SQL FILTER semantics
    * (count 0, sum NULL).
    */
  def participantView(df: DataFrame, key: String, typeCol: String, types: Seq[String], valueCol: String): DataFrame = {
    require(types.nonEmpty, "participantView needs at least one type/dataset")
    val aggs = types.flatMap { t =>
      Seq(
        sum(when(col(typeCol) === t, 1).otherwise(0)).as(s"${t}_n"),
        sum(when(col(typeCol) === t, col(valueCol).cast(DecimalType(18, 2))))
          .cast("double").as(s"${t}_val"))
    }
    df.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Ordered text fold: per `key`, concatenate `textCol` with `sep` in
    * (orderCol1, orderCol2) order. The order keys must form a total order.
    * Null texts fold as empty entries (array_join would silently DROP a
    * null element, making folded_text disagree with `n` — the reference
    * renders every message).
    */
  def foldConcat(df: DataFrame, key: String, orderCol1: Column, orderCol2: Column, textCol: Column, sep: String): DataFrame =
    df.groupBy(col(key))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(orderCol1.as("o1"), orderCol2.as("o2"),
              coalesce(textCol, lit("")).as("t")))),
            x => x.getField("t")),
          sep).as("folded_text"),
        count(lit(1)).cast(LongType).as("n"))

  /** Per-entity sorted distinct attribute set, joined with `sep`.
    * Reference: channel-operator attribution per participant
    * (column_view_conversion.py:383).
    */
  def attributeSet(df: DataFrame, key: String, attr: Column, sep: String): DataFrame =
    df.groupBy(col(key))
      .agg(array_join(array_sort(collect_set(attr)), sep).as("operators"))

  /** "Message view": one row per fact row (RQA message) enriched with the
    * entity-level aggregate of its demographic rows. The demographic
    * aggregate is tiny relative to the fact table and joins on the already
    * partitioned entity key; Catalyst/AQE broadcast it when small.
    */
  def messageView(facts: DataFrame, demogs: DataFrame, key: String): DataFrame =
    facts.join(demogs, Seq(key), "left")
}
