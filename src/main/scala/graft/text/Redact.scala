package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction ahead of training-data export: URLs, email
  * addresses, and international-format phone numbers are counted and masked
  * with typed placeholder tokens.
  *
  * Row-local (zero shuffle) and codegen'd — regexp_replace/regexp_count are
  * native Catalyst expressions. The patterns are restricted to the
  * dialect-portable subset (identical semantics in Java regex and RE2) so
  * any SQL engine reproduces the masking byte-for-byte.
  *
  * Replacement order matters: URLs first (their paths can contain '@' and
  * digit runs), then emails, then phones — each later pattern cannot match
  * inside an earlier placeholder.
  */
object Redact {

  val UrlRe = "https?://[^ ]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{7,15}"

  /** Masked text: URL -> <URL>, email -> <EMAIL>, phone -> <PHONE>. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Detection counts + masked text, computed in one projection. */
  def piiColumns(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(UrlRe)).cast("long").as("n_urls"),
    regexp_count(text, lit(EmailRe)).cast("long").as("n_emails"),
    regexp_count(text, lit(PhoneRe)).cast("long").as("n_phones"),
    redactPii(text).as("redacted"))
}
