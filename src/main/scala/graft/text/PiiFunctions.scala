package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation — the standard scrub
  * pass before corpus release (emails, phone numbers, IP addresses).
  *
  * The patterns deliberately stay inside the regex subset shared by Java
  * (`java.util.regex`, what Spark's codegen'd regexp_* use) and RE2 (DuckDB,
  * Go-based scrubbers): no backreferences, no lookaround — so detection counts
  * and redacted output are bit-identical across engines and the whole pass is
  * oracle-verifiable. Everything here is a map-side projection: zero shuffles,
  * scales linearly with corpus size.
  */
object PiiFunctions {

  /** RFC-5322-lite email: local part @ dotted domain with alpha TLD ≥2. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)*\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no octet-range check — scrubbers over-match on purpose). */
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** NANP-ish phone: optional +country, 3-3-4 groups with - or space. */
  val PhoneRe = "(\\+[0-9]{1,2} )?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"

  private val patterns: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>",
    Ipv4Re -> "<IP>",
    PhoneRe -> "<PHONE>")

  /** Number of non-overlapping matches of `re` in `text`. */
  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  def emailCount(text: Column): Column = countMatches(text, EmailRe)
  def ipv4Count(text: Column): Column = countMatches(text, Ipv4Re)
  def phoneCount(text: Column): Column = countMatches(text, PhoneRe)

  /** Replace every PII span with its type token. Phone runs LAST so a phone-like
    * digit run inside an already-redacted span can't double-fire; order is fixed
    * and documented because redaction output is part of the verified contract.
    */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (re, token)) => regexp_replace(c, re, token) }

  /** True iff the text contains any detectable PII (cheap pre-filter: lets a
    * pipeline route the (rare) dirty docs through redaction and leave the clean
    * majority untouched).
    */
  def containsPii(text: Column): Column =
    patterns.map { case (re, _) => text.rlike(re) }.reduce(_ || _)
}
