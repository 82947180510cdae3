package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Response cleaners: the normalization layer the reference applies to raw
  * survey responses before coding.
  *
  * Reference semantics: core_data_modules CleaningUtils usage throughout the
  * analysis pipeline (e.g. make_label_from_cleaner_code in
  * src/engagement_db_to_analysis/column_view_conversion.py:296, age/location
  * cleaners invoked from code_imputation_functions.py:265,349). All pure
  * column expressions — codegen'd, shuffle-free, dialect-portable.
  */
object Cleaners {

  /** Lowercase, trim, collapse whitespace runs (all whitespace classes —
    * SMS/form payloads carry tabs and newlines, not just spaces). */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Strip everything but digits (phone-number style normalization). */
  def digitsOnly(c: Column): Column = regexp_replace(c, "[^0-9]", "")

  /** Clean an age response: first integer in the text, kept only within
    * plausible bounds [minAge, maxAge]; null otherwise.
    * Reference: age cleaning ahead of _impute_age_category
    * (code_imputation_functions.py:265).
    */
  def cleanAge(c: Column, minAge: Int = 10, maxAge: Int = 99): Column = {
    val n = nullif(regexp_extract(c, "[0-9]+", 0), lit("")).cast("int")
    when(n.isNotNull && n >= minAge && n <= maxAge, n)
  }

  /** Map yes/no response variants onto canonical codes; null when unmatched. */
  def cleanYesNo(c: Column): Column = {
    val t = normalizeText(c)
    when(t.isin("yes", "y", "yeah", "yep", "true", "1"), "yes")
      .when(t.isin("no", "n", "nope", "false", "0"), "no")
  }
}
