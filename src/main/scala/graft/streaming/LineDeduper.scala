package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-document line dedup — the shared kernel behind the oracled
  * q109 batch rewrite and the s85 streaming ingest gate (the
  * batch-mirror pattern of s74/q66, s81/q49, s82/q103, s83/q104): a
  * continuously-ingesting training pipeline (the reference re-forwards
  * every row, `app.py:161-173`) must strip corpus-common chrome lines
  * (headers, footers, nav) from each admitted document, not re-admit
  * them forever.
  *
  * The corpus has no newline structure, so "lines" are the fixed
  * w-token grid; a line is chrome when it appears in ≥ cap distinct
  * documents of the REFERENCE corpus. The index build
  * ([[commonHead]]) is the only corpus-scale work — a two-phase df
  * aggregate over 16-byte (fingerprint, doc) pairs; the head it emits
  * is the Zipf HEAD (df ≥ cap ⇒ ≤ corpus-lines/cap values, in
  * practice the handful of chrome lines), asserted small and shipped
  * to executors inside [[graft.functions.SetKeepPositions]]'s
  * per-executor sorted probe table. The rewrite is then a PURE
  * row-local projection — no join, no aggregation, no state store —
  * so the streaming gate drops into any `readStream → writeStream`
  * path without changing its output mode or recovery story, exactly
  * like s82's decontamination gate. */
object LineDeduper {

  /** (doc_id, lines, lh): the w-token line grid of a (doc_id, text)
    * frame plus per-line xxhash64 fingerprints. toks/lines ride their
    * own projections (multi-use aliases — q105's gotcha: lambda
    * interiors evaluate interpretively, outside codegen CSE, so an
    * inlined split would re-split the document per element). */
  def withLines(docs: DataFrame, w: Int): DataFrame = {
    val toks = col("toks")
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("lines", transform(
        sequence(lit(0), ceil(size(toks) / lit(w.toDouble)).cast("int") - 1),
        i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
      .withColumn("lh", transform(col("lines"), l => xxhash64(l)))
      .select(col("doc_id"), col("lines"), col("lh"))
  }

  /** Fingerprints of lines appearing in ≥ cap distinct reference docs —
    * the chrome index a production pipeline persists and periodically
    * rebuilds. Loud assert: a cap that fails to select a Zipf head must
    * not silently ship a corpus-sized probe table. */
  def commonHead(lined: DataFrame, cap: Int): IndexedSeq[Long] = {
    val head = lined
      .select(col("doc_id"), explode_outer(col("lh")).as("h"))
      .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= cap)
      .select(col("h")).collect().map(_.getLong(0)).toIndexedSeq
    require(head.size <= 100000,
      s"line-dedup chrome head has ${head.size} lines; df cap $cap is " +
        "not selecting a Zipf head — refusing to ship it as a probe table")
    head
  }

  /** Row-local rewrite of a [[withLines]] frame against the probe head:
    * (doc_id, n_lines, n_removed, text) with surviving lines re-joined
    * in original order. Batch and streaming run this same projection. */
  def rewrite(lined: DataFrame, head: Seq[Long]): DataFrame =
    lined
      .withColumn("keep", graft.functions.SetKeepPositions(col("lh"), head))
      .select(col("doc_id"),
        size(col("lines")).as("n_lines"),
        (size(col("lines")) - size(col("keep"))).as("n_removed"),
        array_join(
          transform(col("keep"), p => element_at(col("lines"), p + 1)),
          " ").as("text"))
}
