package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-pattern PII redaction — q79's scrub as a shared batch/stream
  * code object (the s82/s85/s93/s95/s96 convention: ONE function, so
  * the oracled batch answer and the ingest-time stream gate cannot
  * drift). Stateless by construction — a document's redaction depends
  * only on its own text — so the stream spelling needs no state store,
  * no watermark, and no output-mode constraint: redaction drops into
  * any `readStream → writeStream` topology as a projection, which is
  * where a production pipeline actually wants it — PII must be masked
  * BEFORE the raw document is persisted anywhere downstream (scrubbing
  * in a later batch sweep means the unredacted text already landed in
  * the lake; at-ingest scrubbing is the compliance posture, not just
  * the cheap one).
  *
  * Patterns (q79's contract, mirrored in its DuckDB oracle — which is
  * what keeps the STREAM honest too: s97 pins the streamed report
  * row-identical to the oracled q79 batch answer): emails, phone
  * numbers, SSN-shaped ID numbers — character classes + bounded
  * quantifiers + ASCII `\b` only, identical semantics in Java regex
  * (Spark, codegen'd) and RE2 (DuckDB). Mutually exclusive by
  * construction, so scrub order cannot change the result. */
object PiiScrubber {

  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\b\\d{3}[- ]\\d{3,4}[- ]\\d{4}\\b"
  private[graft] val IdRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** q79's deterministic plant: the synthetic corpus carries no PII, so
    * one instance class is appended per residue of `doc_id % 10`
    * (0 → email, 3 → phone, 6 → ID). The op under test is the
    * scrubber; the plants make its effect observable. */
  private[graft] def plant(text: Column, docId: Column): Column =
    when(docId % 10 === 0,
      concat(text, lit(" contact: user"), docId.cast("string"),
        lit("@example.com now")))
      .when(docId % 10 === 3,
        concat(text, lit(" call 555-867-5309 today")))
      .when(docId % 10 === 6,
        concat(text, lit(" ssn 123-45-6789 on file")))
      .otherwise(text)

  /** All three patterns replaced by their placeholders. */
  private[graft] def scrubExpr(raw: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(raw, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IdRe, "<ID>")

  /** Scrub a (doc_id, text, …) frame into q79's redaction report:
    * (doc_id, n_email, n_phone, n_id, n_raw, n_scrubbed, clean).
    * Per-pattern counts are measured on the raw (planted) text; `clean`
    * pins that NO pattern matches the final scrubbed text — the
    * property a redaction pass actually owes you. Row-local codegen'd
    * projection, no shuffle at any scale. */
  def scrub(docs: DataFrame): DataFrame = {
    val raw = plant(col("text"), col("doc_id"))
    val scrubbed = scrubExpr(raw)
    docs.select(
      col("doc_id"),
      regexp_count(raw, lit(EmailRe)).as("n_email"),
      regexp_count(raw, lit(PhoneRe)).as("n_phone"),
      regexp_count(raw, lit(IdRe)).as("n_id"),
      length(raw).as("n_raw"),
      length(scrubbed).as("n_scrubbed"),
      (!(scrubbed rlike EmailRe) && !(scrubbed rlike PhoneRe) &&
        !(scrubbed rlike IdRe)) as "clean")
  }
}
