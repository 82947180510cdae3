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

  // scheme matched case-insensitively via character classes ((?i) is not in
  // the portable subset); [^\s]+ stops at ANY whitespace — [^ ]+ would run
  // a URL across tabs/newlines and mask legitimate following text
  val UrlRe = "[Hh][Tt][Tt][Pp][Ss]?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // no upper bound: a 16+-digit run must mask WHOLE, not leave its tail
  // digits sitting next to the placeholder
  val PhoneRe = "\\+[0-9]{7,}"

  /** Masked text: URL -> <URL>, email -> <EMAIL>, phone -> <PHONE>. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Detection counts + masked text, computed in one projection. Each
    * count runs on the PREVIOUS stage's masked text — the same precedence
    * the replacement chain applies — so the counts always reconcile with
    * the placeholders in `redacted` (an email inside a URL path is
    * attributed to the URL, not double-reported).
    */
  def piiColumns(text: Column): Seq[Column] = {
    val urlMasked = regexp_replace(text, UrlRe, "<URL>")
    val emailMasked = regexp_replace(urlMasked, EmailRe, "<EMAIL>")
    Seq(
      regexp_count(text, lit(UrlRe)).cast("long").as("n_urls"),
      regexp_count(urlMasked, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(emailMasked, lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_replace(emailMasked, PhoneRe, "<PHONE>").as("redacted"))
  }
}
