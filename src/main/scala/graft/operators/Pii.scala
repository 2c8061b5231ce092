package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora — the scrub step every published
  * corpus pipeline runs before exposing text to a model (emails, phone
  * numbers, IP addresses replaced by stable placeholder tokens).
  *
  * Everything is `regexp_replace` / `regexp_extract_all` column
  * expressions — whole-stage-codegen map work, no UDFs, no shuffle; at
  * corpus scale redaction rides the same scan as the rest of the row's
  * map pipeline. The patterns deliberately use only the regex subset with
  * identical semantics in Java (Spark) and RE2 (DuckDB oracle): character
  * classes, bounded repetition, non-capturing groups, ASCII `\b`.
  *
  * Redaction ORDER is load-bearing: emails first (their local parts can
  * contain digit runs a phone pattern would chew on), then IPs (dotted
  * digit quads a phone pattern can partially match), then phones. The
  * placeholder tokens contain no digits or `@`, so passes never cascade.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\d{3}[-.]\\d{3,4}(?:[-.]\\d{4})?"

  /** Redacted text: PII spans replaced by `[EMAIL]` / `[IP]` / `[PHONE]`. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Per-type match counts on the ORIGINAL text, counted in the same
    * order redaction applies (each pattern counts what its pass would
    * see): `(n_email, n_ip, n_phone)` columns. */
  def counts(text: Column): Seq[(String, Column)] = {
    val afterEmail = regexp_replace(text, EmailRe, "[EMAIL]")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "[IP]")
    Seq(
      "n_email" -> size(regexp_extract_all(text, lit(EmailRe), lit(0))),
      "n_ip" -> size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))),
      "n_phone" -> size(regexp_extract_all(afterIp, lit(PhoneRe), lit(0))))
  }
}
