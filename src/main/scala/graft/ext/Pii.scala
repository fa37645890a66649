package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII detection + redaction — the anonymization stage every
  * web-scale training-data pipeline runs before publication (the
  * Dolma and FineWeb pipelines both ship exactly this: regex-class
  * scrubbing of email addresses, phone numbers, and IP addresses,
  * replacing each span with a typed token and recording per-document
  * counts for the data card).
  *
  * The operator surface is [[piiCounts]] / [[redactPii]] over ANY
  * string column. The registry queries run them over a deterministic
  * FIXTURE corpus ([[withSyntheticPii]]): the driver's `documents`
  * text carries no contact strings, so each doc gets a reproducible
  * footer derived from `doc_id` alone (emails on ids ≢ 0 mod 3, a
  * second one on ≡ 0 mod 7, a phone on even ids, an IPv4 on ids ≢ 0
  * mod 5) — counts vary 0–2 per type and the oracle replays the same
  * construction, so the gate exercises real match/miss variety
  * rather than a constant hit per row.
  *
  * Pattern discipline: the three regexes use only the
  * Java-regex ∩ RE2 common subset (character classes, bounded
  * repetition, ASCII `\b`) so Spark's codegen'd `regexp_replace` and
  * the DuckDB oracle agree byte-for-byte. Replacement order is
  * email → phone → IPv4: the email pattern is the only one whose
  * match can CONTAIN a substring the later patterns would match (a
  * digit-quad domain), so it must be consumed first; the `<EMAIL>` /
  * `<PHONE>` tokens themselves are digit-free and cannot create new
  * matches.
  *
  * Scale shape: counting + redaction is a pure per-row projection —
  * zero exchanges; the whole stage is one WholeStageCodegen span over
  * the scan (the registry form's `orderBy` exists only for the
  * oracle dump). The per-source summary adds the one
  * map-side-combinable groupBy on the tiny source domain. At 100 TB
  * this is scan-bound, embarrassingly parallel, and needs no skew or
  * shuffle treatment at all.
  */
object Pii {

  /** Redaction patterns — Java-regex ∩ RE2 common subset ONLY (no
    * lookaround, no possessive quantifiers, ASCII classes) so the
    * Spark plan and the DuckDB oracle match identically. */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePat = "\\b\\d{3}-\\d{4}\\b"
  val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-type match counts over any string column — INDEPENDENT
    * raw-text match counts, NOT redacted-token counts (round-13
    * ADVICE): each pattern counts against the ORIGINAL text, while
    * [[redactPii]] replaces sequentially, so a span consumed by an
    * earlier replacement (e.g. the IP-shaped domain tail of
    * `a@1.2.3.4` vanishing into `<EMAIL>`) still counts for its own
    * type here. This is the audit-friendly semantics — "how many
    * matches of each pattern did the raw text contain" — and the
    * gated fixture replays it verbatim in both engines; consumers
    * needing redacted-token counts should count tokens in the
    * redacted output instead. */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailPat)),
      regexp_count(text, lit(PhonePat)),
      regexp_count(text, lit(Ipv4Pat)))

  /** Replace every match with its typed token, email → phone → IPv4
    * (see object scaladoc for why this order is the safe one). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPat, "<EMAIL>"),
        PhonePat, "<PHONE>"),
      Ipv4Pat, "<IP>")

  /** Deterministic PII fixture: append a contact footer derived from
    * doc_id (replayed verbatim by the oracle SQL). */
  private[ext] def withSyntheticPii(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val email = when(id % 3 =!= 0,
      concat(lit(" contact user"), id.cast("string"), lit("@example.org")))
      .otherwise(lit(""))
    val alt = when(id % 7 === 0,
      concat(lit(" cc alt"), id.cast("string"), lit("@mail.example.com")))
      .otherwise(lit(""))
    val phone = when(id % 2 === 0,
      concat(lit(" call 555-"),
        lpad((id * 7919 % 10000).cast("string"), 4, "0")))
      .otherwise(lit(""))
    val ip = when(id % 5 =!= 0,
      concat(lit(" from 10."), (id * 13 % 256).cast("string"), lit("."),
        (id * 29 % 256).cast("string"), lit("."),
        (id % 256).cast("string")))
      .otherwise(lit(""))
    docs.withColumn("raw", concat(col("text"), email, alt, phone, ip))
  }

  /** Per-document counts + redacted text over the fixture corpus. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val raw = withSyntheticPii(Tables.documents(spark, dir))
    val (ne, np, ni) = piiCounts(col("raw"))
    raw.select(col("doc_id"), col("source"),
        ne.as("n_email"), np.as("n_phone"), ni.as("n_ip"),
        redactPii(col("raw")).as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** Per-source PII incidence report (the data-card rows). */
  def piiSummary(spark: SparkSession, dir: String): DataFrame = {
    val raw = withSyntheticPii(Tables.documents(spark, dir))
    val (ne, np, ni) = piiCounts(col("raw"))
    raw.select(col("source"), ne.as("ne"), np.as("np"), ni.as("ni"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("ne") + col("np") + col("ni") > 0, 1L).otherwise(0L))
          .as("docs_with_pii"),
        sum(col("ne").cast("long")).as("emails"),
        sum(col("np").cast("long")).as("phones"),
        sum(col("ni").cast("long")).as("ips"))
      .orderBy(col("source"))
  }

  // DuckDB replay: same fixture construction, same patterns; DuckDB
  // regexp_replace needs the explicit 'g' flag (Spark is global by
  // default), and counts come from len(regexp_extract_all(...)).
  private val rawSql =
    "text" +
      " || CASE WHEN doc_id % 3 <> 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.org' ELSE '' END" +
      " || CASE WHEN doc_id % 7 = 0 THEN ' cc alt' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END" +
      " || CASE WHEN doc_id % 2 = 0 THEN ' call 555-' || lpad(CAST(doc_id * 7919 % 10000 AS VARCHAR), 4, '0') ELSE '' END" +
      " || CASE WHEN doc_id % 5 <> 0 THEN ' from 10.' || CAST(doc_id * 13 % 256 AS VARCHAR) || '.' || CAST(doc_id * 29 % 256 AS VARCHAR) || '.' || CAST(doc_id % 256 AS VARCHAR) ELSE '' END"

  private val emailSqlPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneSqlPat = "\\b\\d{3}-\\d{4}\\b"
  private val ipSqlPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  val oracle: Map[String, String] = Map(
    "text_pii_redact" ->
      s"""SELECT doc_id, source, CAST(len(regexp_extract_all(raw, '$emailSqlPat')) AS INT) AS n_email, CAST(len(regexp_extract_all(raw, '$phoneSqlPat')) AS INT) AS n_phone, CAST(len(regexp_extract_all(raw, '$ipSqlPat')) AS INT) AS n_ip, regexp_replace(regexp_replace(regexp_replace(raw, '$emailSqlPat', '<EMAIL>', 'g'), '$phoneSqlPat', '<PHONE>', 'g'), '$ipSqlPat', '<IP>', 'g') AS redacted FROM (SELECT doc_id, source, $rawSql AS raw FROM documents) ORDER BY doc_id""",
    "text_pii_summary" ->
      s"""WITH c AS (SELECT source, len(regexp_extract_all(raw, '$emailSqlPat')) AS ne, len(regexp_extract_all(raw, '$phoneSqlPat')) AS np, len(regexp_extract_all(raw, '$ipSqlPat')) AS ni FROM (SELECT source, $rawSql AS raw FROM documents)) SELECT source, COUNT(*) AS docs, CAST(SUM(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii, CAST(SUM(ne) AS BIGINT) AS emails, CAST(SUM(np) AS BIGINT) AS phones, CAST(SUM(ni) AS BIGINT) AS ips FROM c GROUP BY source ORDER BY source""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pii_redact" -> piiRedact _,
    "text_pii_summary" -> piiSummary _)
}
