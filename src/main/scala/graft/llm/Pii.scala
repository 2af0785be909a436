package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines.
  *
  * Scrubbing contact data (emails, phone numbers, IP addresses) is a
  * standard pre-training step (see e.g. the C4 and Dolma pipeline
  * descriptions). Both operators are pure column expressions — map-only,
  * whole-stage-codegen'd, no shuffle — so they fuse with the scan and
  * scale linearly to 100 TB.
  *
  * Pattern dialect: every regex here is valid AND equivalent in both
  * `java.util.regex` (Spark) and RE2 (DuckDB oracle, Go tooling) —
  * character classes, bounded repetition, and alternation only. No
  * lookaround, no backreferences: RE2 rejects them, and their absence
  * keeps matching linear-time, which also closes the ReDoS hole that a
  * catastrophic-backtracking email regex opens on adversarial documents
  * (a real concern when the input is a web crawl).
  */
object Pii {

  /** Local-part @ domain TLD(2+). Conservative: no quoted local parts,
    * no IP-literal domains — favors precision on crawl text. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4. `[0-9]{1,3}` over-matches (e.g. 999.1.1.1) but a
    * range-exact alternation triples the pattern for no training-data
    * benefit; redacting a malformed quad is harmless. */
  val ipv4Pattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** International-format phone: +CC-NNN-NNN-NNNN with -, space or .
    * separators. Requiring the leading `+` keeps false positives off
    * numeric ID columns that merely look phone-shaped. */
  val phonePattern = "\\+[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  val emailToken = "<EMAIL>"
  val ipToken = "<IP>"
  val phoneToken = "<PHONE>"

  /** Per-document PII match counts (emails / IPv4s / phones). */
  def detect(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    def n(p: String): Column = size(regexp_extract_all(t, lit(p), lit(0)))
    df.withColumn("n_emails", n(emailPattern))
      .withColumn("n_ipv4", n(ipv4Pattern))
      .withColumn("n_phones", n(phonePattern))
  }

  /** Replace every PII match with its class token. Email runs first so a
    * dotted-quad inside an email domain is redacted as part of the email,
    * not split by the IP pass. */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, emailPattern, emailToken)
    val i = regexp_replace(e, ipv4Pattern, ipToken)
    regexp_replace(i, phonePattern, phoneToken)
  }

  /** Detect + redact in one pass, with CASCADED counts: emails are counted
    * on the raw text, IPs on the email-redacted text, phones on the
    * email+IP-redacted text. This makes the counts agree with what the
    * redaction actually did — a dotted-quad inside an email domain is one
    * email, not an email plus an IP (unlike [[detect]], whose independent
    * counts are the right tool for corpus statistics). Class tokens
    * contain no digits or '@', so later passes never match inside them. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    def n(c: Column, p: String): Column =
      size(regexp_extract_all(c, lit(p), lit(0)))
    val e = regexp_replace(t, emailPattern, emailToken)
    val i = regexp_replace(e, ipv4Pattern, ipToken)
    df.withColumn("n_emails", n(t, emailPattern))
      .withColumn("n_ipv4", n(e, ipv4Pattern))
      .withColumn("n_phones", n(i, phonePattern))
      .withColumn(s"${textCol}_redacted",
        regexp_replace(i, phonePattern, phoneToken))
  }
}
