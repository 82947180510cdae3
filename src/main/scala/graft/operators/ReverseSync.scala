package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reverse sync: engagement-db -> source-platform contact fields.
  *
  * The reference pushes, per participant, one contact field per configured
  * dataset group plus a consent-withdrawn field back to RapidPro (reference:
  * src/engagement_db_to_rapid_pro/engagement_db_to_rapid_pro.py:62
  * `_get_normal_contact_fields_for_participant`, :107
  * `_get_consent_withdrawn_field_for_participant`). In CONCATENATE_TEXTS
  * mode each field is the participant's messages in that dataset rendered
  * as `"text" - engagement_db.dataset` joined with "; "; with
  * allow_clearing_fields an empty dataset clears the field to "".
  *
  * Spark-first: one groupBy over the messages with per-dataset conditional
  * collect_list folds — a single shuffle regardless of how many contact
  * fields are configured. Ordering is deterministic (ts, id ascending) via
  * the array_sort(collect_list(struct(...))) idiom.
  */
object ReverseSync {

  /** One row per participant: `<ds>_field` per dataset in `datasets`
    * (concatenated texts, "" when the participant has none and clearing is
    * allowed, null when not), and `consent_withdrawn` = "yes" iff any of the
    * participant's rows satisfies `consentPred`, else ""/null per
    * `allowClearing`.
    */
  def contactFields(messages: DataFrame, user: Column, dataset: Column, text: Column,
                    ts: Column, id: Column, datasets: Seq[String], consentPred: Column,
                    allowClearing: Boolean = true): DataFrame = {
    // null text renders as an empty quoted entry instead of nulling the
    // whole rendered string (concat is null-propagating): the reference
    // renders EVERY message, and an all-null-text dataset must not be
    // mistaken for "no messages" and cleared
    val rendered = concat(lit("\""), coalesce(text, lit("")),
      lit("\" - engagement_db."), dataset)
    val empty = if (allowClearing) lit("") else lit(null: String)
    val fieldAggs = datasets.map { ds =>
      val folded = array_join(
        transform(
          array_sort(collect_list(when(dataset === ds,
            struct(ts.as("ts"), id.as("id"), rendered.as("txt"))))),
          x => x.getField("txt")),
        "; ")
      // collect_list skips the nulls from non-matching rows, so an empty
      // fold means "no messages in this dataset" -> clear (or leave null)
      when(length(folded) > 0, folded).otherwise(empty).as(s"${ds}_field")
    }
    val consent = when(max(when(consentPred, 1).otherwise(0)) === 1, "yes")
      .otherwise(empty).as("consent_withdrawn")
    // consent leads so an empty `datasets` list degrades to a
    // consent-only view instead of fieldAggs.head throwing
    messages.groupBy(user.as("participant"))
      .agg(consent, fieldAggs: _*)
  }
}
