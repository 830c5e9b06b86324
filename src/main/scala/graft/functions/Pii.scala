package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: replace email addresses,
  * IPv4 addresses and international-format phone numbers with typed
  * placeholder tokens (the RefinedWeb / BigScience ROOTS preprocessing
  * step — Penedo et al. 2023 §3.4 redact PII before training; Laurençon
  * et al. 2022 §4.2 likewise).
  *
  * All patterns are Java-regex / RE2 common ground (no lookaround, no
  * backreferences; `-` last inside classes) so a SQL engine computes the
  * byte-identical redaction, and everything here is plain
  * `regexp_replace`/`regexp_extract_all` — whole-stage-codegen'd, one
  * scan-fused span at 100 TB, no UDFs.
  *
  * The redaction is a fixed CHAIN (email → IPv4 → phone) and the match
  * counts are defined against the chain's intermediate strings (emails on
  * the raw text, IPv4 on the email-redacted text, phones on the
  * IPv4-redacted text): an email's host can contain a dotted quad and a
  * dotted quad's digits could otherwise feed a phone match, so counting on
  * the intermediates is the only order-independent-to-the-reader,
  * engine-reproducible definition. Placeholders contain no digits or `@`,
  * so a later stage can never re-match inside an earlier replacement.
  */
object Pii {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  /** Leading `+` required: keeps bare digit runs in prose (years, counts)
    * out of scope — the high-precision/agreed-recall trade every published
    * pipeline makes for phone numbers. */
  val PhonePattern = "\\+[0-9][0-9 -]{6,}[0-9]"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailPattern, EmailToken)
  def redactIpv4(text: Column): Column =
    regexp_replace(text, Ipv4Pattern, IpToken)
  def redactPhones(text: Column): Column =
    regexp_replace(text, PhonePattern, PhoneToken)

  /** The full chain; see the ordering contract in the object doc. */
  def scrub(text: Column): Column =
    redactPhones(redactIpv4(redactEmails(text)))

  def nEmails(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")
  def nIpv4(text: Column): Column =
    size(regexp_extract_all(redactEmails(text), lit(Ipv4Pattern), lit(0)))
      .cast("long")
  def nPhones(text: Column): Column =
    size(regexp_extract_all(redactIpv4(redactEmails(text)),
      lit(PhonePattern), lit(0))).cast("long")
}
