package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the scrub pass a training-data pipeline runs before
  * anything leaves quarantine: emails, IPv4 addresses and phone-shaped
  * digit runs replaced with typed placeholder tokens, with per-document
  * match counts for audit.
  *
  * Pure per-row `regexp_replace`/`regexp_count` column work — codegen'd,
  * no shuffle, trivially scale-oblivious. The patterns deliberately stay
  * inside the regex subset Java's engine and RE2-style engines interpret
  * identically (character classes, bounded repetition, `\b`, no
  * lookaround), so the DuckDB oracle can run the very same expressions.
  */
object Redaction {

  /** Conservative cross-engine patterns (no lookaround, no backrefs). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b"

  /** Redact a text column: emails → `<EMAIL>`, then IPv4 → `<IP>`, then
    * phone-shaped runs → `<PHONE>` (ordered so an IP inside an email host
    * is already gone). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document redaction report over a text column: match counts per
    * category, whether anything changed, and the md5 of the redacted text
    * (compact, hash-comparable proof of the exact output). */
  def piiReport(documents: DataFrame, text: Column): DataFrame =
    documents.select(
      col("doc_id"),
      regexp_count(text, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(regexp_replace(text, EmailRe, "<EMAIL>"), lit(Ipv4Re))
        .cast("long").as("n_ips"),
      regexp_count(
        regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"),
        lit(PhoneRe)).cast("long").as("n_phones"),
      (redact(text) =!= text).as("changed"),
      md5(redact(text)).as("redacted_md5"))
      .orderBy(col("doc_id"))

  /** Fixture text with deterministic PII planted on every third document
    * (id-derived email + IP + phone). The corpus fixture carries no real
    * PII, so redacting it raw would pass vacuously — planting synthetic
    * PII in the QUERY (the oracle plants the identical strings) makes the
    * match/replace path provably fire, while the untouched rows exercise
    * the changed=false branch. */
  def withPlantedPii(documents: DataFrame): Column =
    when(pmod(col("doc_id"), lit(3)) === 0,
      concat(
        lit("contact user"), col("doc_id"), lit("@example.com at 10.0."),
        pmod(col("doc_id"), lit(256)), lit(".7 or 555-01"),
        pmod(col("doc_id"), lit(10)), lit("-4242 "), col("text")))
      .otherwise(col("text"))
}
