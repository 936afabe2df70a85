package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over the `documents` corpus — a standard
  * pre-training curation pass (emails / IPv4 addresses / phone numbers →
  * typed placeholder tokens) that must run as pure column expressions:
  * at 100 TB a per-row external scrubber call is the difference between a
  * scan and a service outage. Everything here is codegen'd regexp work
  * inside one WholeStageCodegen span, shuffle-free until the final output
  * sort.
  *
  * The regexes deliberately use only constructs with identical semantics
  * in Java regex (Spark) and RE2 (DuckDB oracle): character classes,
  * bounded repetition, word boundaries — no backrefs, no lookaround.
  *
  * The synthetic corpus carries no natural PII, so [[withPii]] seeds it
  * deterministically (doc_id-derived emails / IPs / phone numbers appended
  * to a residue-class of docs) — the oracle reproduces the seeding in SQL,
  * so the scrub semantics are pinned end-to-end by value, not just "zero
  * matches on clean text".
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Deterministic PII seeding: every doc_id % 7 == 0 gains an email,
    * % 11 == 0 an IPv4, % 13 == 0 a phone number (some docs several).
    */
  def withPii(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.withColumn("text", concat(col("text"),
      when(id % 7 === 0,
        concat(lit(" contact user"), id, lit("@example.com")))
        .otherwise(lit("")),
      when(id % 11 === 0,
        concat(lit(" from 10.0."), pmod(id, lit(200)), lit(".1")))
        .otherwise(lit("")),
      when(id % 13 === 0, lit(" call 555-123-4567")).otherwise(lit(""))))
  }

  private def scrubbed(t: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, lit(EmailRe), lit("[EMAIL]")),
        lit(Ipv4Re), lit("[IP]")),
      lit(PhoneRe), lit("[PHONE]"))

  /** Per-doc PII counts + the redacted text pinned by md5/length (the
    * hash keeps the oracle exact without hauling full text through the
    * compare). Replacement order is email → IPv4 → phone; the earlier
    * passes cannot manufacture matches for the later ones (placeholder
    * tokens contain no digits).
    *
    * Counts are RAW-TEXT detections, computed independently per pattern on
    * the original text, while redaction is sequential — so when one span
    * matches two patterns (e.g. "a@1.2.3.4.co": the IPv4 sits inside the
    * email), counts register BOTH but the scrubbed text carries only the
    * first-pass placeholder ([EMAIL], no [IP]). That is the intended
    * contract — counts answer "what PII was detected", the scrub answers
    * "what was removed" — and the oracle mirrors the same formulation.
    */
  def scrub(docs: DataFrame): DataFrame =
    Par.fanOut(docs)
      .select(col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ips"),
        regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"),
        scrubbed(col("text")).as("_s"))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        length(col("_s")).cast("long").as("scrubbed_len"),
        md5(col("_s")).as("scrubbed_md5"))
      .orderBy("doc_id")
}
