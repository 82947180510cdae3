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
  def cleanAge(c: Column, minAge: Int = 10, maxAge: Int = 99): Column =
    boundedAge(firstInt(c), minAge, maxAge)

  /** First integer in the text; null when absent (the nullif guard matters
    * under ANSI mode — CAST('' AS INT) throws). Project this ONCE, then
    * bound/band the resulting attribute: referencing the raw extraction from
    * several predicates re-evaluates the regex per reference.
    */
  def firstInt(c: Column): Column = {
    // length window: under ANSI (default on Spark 4) CAST of a >9-digit
    // run OR of the empty string to INT throws mid-job; a run that long
    // is never a plausible age or survey integer, so both clean to null
    // like any other non-answer. The 1..9 window replaces the earlier
    // nullif('') guard — one regexp evaluation fewer per reference, and
    // this expression is the hottest scalar in the contract (every
    // props-derived query evaluates it, some several times per row).
    val run = regexp_extract(c, "[0-9]+", 0)
    when(length(run).between(1, 9), run).cast("int")
  }

  /** Plausibility bounds over an already-extracted integer column. */
  def boundedAge(n: Column, minAge: Int = 10, maxAge: Int = 99): Column =
    when(n.isNotNull && n >= minAge && n <= maxAge, n)

  /** Number words for locale-aware age cleaning (the reference ships Somali
    * and Swahili demographic cleaners; these are the public numerals).
    * Tens-words only — composite forms fall back to digit extraction.
    */
  val somaliTens: Seq[(String, Int)] = Seq(
    "toban" -> 10, "labaatan" -> 20, "soddon" -> 30, "afartan" -> 40,
    "konton" -> 50, "lixdan" -> 60, "toddobaatan" -> 70, "siddeetan" -> 80,
    "sagaashan" -> 90)
  val swahiliTens: Seq[(String, Int)] = Seq(
    "kumi" -> 10, "ishirini" -> 20, "thelathini" -> 30, "arobaini" -> 40,
    "hamsini" -> 50, "sitini" -> 60, "sabini" -> 70, "themanini" -> 80,
    "tisini" -> 90)

  /** Age cleaning with locale number-word support: digits first, then the
    * FIRST table entry whose word appears in the normalized text — the
    * table is an ordered Seq precisely so a response containing two number
    * words resolves deterministically (a Map's iteration order would make
    * the winner depend on hashing). Bounds apply to both paths.
    */
  def cleanAgeLocalized(c: Column, words: Seq[(String, Int)],
                        minAge: Int = 10, maxAge: Int = 99): Column = {
    val fromDigits = cleanAge(c, minAge, maxAge)
    val toks = split(normalizeText(c), " ")
    val fromWords = words.foldLeft(lit(null).cast("int")) { case (acc, (w, v)) =>
      if (v >= minAge && v <= maxAge) coalesce(acc, when(array_contains(toks, w), v)) else acc
    }
    coalesce(fromDigits, fromWords)
  }

  /** Map yes/no response variants onto canonical codes; null when unmatched. */
  def cleanYesNo(c: Column): Column = {
    val t = normalizeText(c)
    when(t.isin("yes", "y", "yeah", "yep", "true", "1"), "yes")
      .when(t.isin("no", "n", "nope", "false", "0"), "no")
  }
}
