package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training corpora — the standard
  * pre-release scrub (emails, IP addresses; the pattern set is
  * extensible) applied as pure regexp Column expressions: one codegen
  * projection per document, no shuffle, no UDFs — embarrassingly
  * parallel at 100 TB exactly like [[TextAnalysis]].
  *
  * Pattern dialect note: every pattern here is written in the common
  * subset of Java regex (Spark) and RE2 (DuckDB oracle) — character
  * classes, bounded repetition, and `\b` word boundaries only; no
  * backreferences or lookaround — so the oracle replays the scrub
  * exactly (`regexp_replace(..., 'g')` for DuckDB's global flag;
  * Spark's regexp_replace is always global).
  */
object PiiScrub {

  /** Email addresses (pragmatic RFC-lite form). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (unvalidated octet range — scrubbing favors
    * recall; `\b` keeps digits inside longer tokens from matching). */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Count of pattern matches in `text` (non-overlapping, left-to-right
    * — both engines' regexp_extract_all semantics). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Redact every email then every IPv4 in `text` with typed tags.
    * EMAIL FIRST: an address's domain can contain a dotted quad
    * (`u@10.1.2.3.com` — alpha TLD, so it IS an email match), and the
    * email tag must consume it whole; the reverse order would tear the
    * address into `u@<IP>.com`, leaking the user part past the scrub. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      Ipv4Pattern, "<IP>")

  /** Per-document scrub report columns: match counts per category plus
    * the redacted text's md5 and length (compact cross-engine witness
    * that the replacement — not just the count — agrees). `n_ips`
    * counts against the email-redacted text, so a dotted quad inside an
    * address counts once as an email, never double as an IP — counts
    * sum to the number of redaction tags in the output. */
  def report(text: Column): Seq[(String, Column)] = {
    val emailScrubbed = regexp_replace(text, EmailPattern, "<EMAIL>")
    val scrubbed = regexp_replace(emailScrubbed, Ipv4Pattern, "<IP>")
    Seq(
      "n_emails" -> matchCount(text, EmailPattern),
      "n_ips" -> matchCount(emailScrubbed, Ipv4Pattern),
      "scrubbed_md5" -> md5(scrubbed.cast("binary")),
      "scrubbed_len" -> length(scrubbed).cast("long"))
  }
}
