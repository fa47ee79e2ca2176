package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the scrub pass every
  * training-data pipeline runs before anything else touches the corpus.
  *
  * The patterns deliberately avoid lookaround, backreferences, and
  * anything else where java.util.regex (Spark) and RE2 (DuckDB oracle,
  * and most production scrubbers) disagree: character classes, bounded
  * repetition, and `\b` word boundaries behave identically in both, so
  * match spans — and therefore counts and redacted text — are
  * engine-reproducible. Everything here is a codegen'd projection: the
  * corpus scan stays narrow, no shuffle, no UDF.
  */
object Pii {

  /** RFC-loose email: local part, @, dotted domain, ≥2-alpha TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so longer digit runs don't match. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-ish phone: optional +, 3-3-4 digit groups, dash or space. */
  val PhoneRe = "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}"

  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Per-document PII counts + flag: `(idCol, n_emails, n_ips,
    * n_phones, has_pii)`. Counts are STAGED to match the redaction
    * order exactly (emails counted on the original text, IPs on the
    * email-redacted text, phones on the email+IP-redacted text), so
    * each count is precisely "spans that [[redact]] would replace with
    * that placeholder" — an overlapping span (a phone-shaped string
    * inside an email local part) is attributed to the kind that
    * consumes it, never double-counted. */
  def features(df: DataFrame, textCol: String, idCol: String): DataFrame =
    scrub(df, textCol, idCol).drop("redacted")

  /** Replace PII spans with typed placeholder tokens. The order is fixed
    * and semantic: emails first (an email's domain may contain a dotted
    * quad — redacting IPs first would tear the email in half), then IPs,
    * then phones. Placeholders contain no digits or `@`, so later passes
    * cannot re-match earlier redactions. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Features + redacted text in ONE narrow projection (no self-join —
    * the counts and the rewrite come from the same scan of the row).
    * Counts are staged against the redaction pipeline (see [[features]])
    * so `n_emails + n_ips + n_phones` always equals the number of
    * placeholder tokens present in `redacted`. */
  def scrub(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    df.select(col(idCol),
        countMatches(col(textCol), EmailRe).as("n_emails"),
        countMatches(afterEmail, Ipv4Re).as("n_ips"),
        countMatches(afterIp, PhoneRe).as("n_phones"),
        regexp_replace(afterIp, PhoneRe, "<PHONE>").as("redacted"))
      .withColumn("has_pii",
        col("n_emails") + col("n_ips") + col("n_phones") > 0)
  }
}
