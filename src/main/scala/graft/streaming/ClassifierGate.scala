package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality-classifier gate — q147's scoring projection as a
  * shared batch/stream code object (the s82/s85/s93 convention: ONE
  * function, so the oracled batch answer and the ingest-time stream
  * gate cannot drift). Stateless by construction — a verdict depends
  * only on its own row — so the stream spelling needs no state store,
  * no watermark, and no output-mode constraint: the classifier drops
  * into any `readStream → writeStream` topology as a projection, which
  * is what lets a 100 TB ingest pipeline gate quality BEFORE paying
  * storage and downstream compute for a rejected document (the
  * GPT-3/CCNet/FineWeb posture: classify at crawl ingest, not in a
  * later batch sweep). The weight table rides folded into the
  * expression exactly as in batch — the broadcast posture; a
  * production 2^20-bucket table is an ~8 MB literal/broadcast either
  * way.
  *
  * Scoring contract (mirrored in q147's DuckDB oracle, which is what
  * keeps the STREAM honest too — s95 pins the streamed verdicts
  * row-identical to the oracled q147 batch answer): token code =
  * len·17 + first-char (q87's engine-portable arithmetic), bucket =
  * knuthMix2 mod `QcBuckets` (the quadratic scramble per the coset
  * rule), score = exact-BIGINT Σ weights, keep = score ≥ 0. */
object ClassifierGate {

  /** The classifier's integer score over a `text` column — exposed as
    * an expression so other projections can compose it in the SAME scan
    * (q152's agreement matrix scores heuristic and classifier
    * side-by-side without a join). */
  def scoreExpr: Column = {
    import graft.queries.knuthBucket2
    val toks = split(col("text"), " ")
    def code(tk: Column) =
      (length(tk) * 17 + ascii(substring(tk, 1, 1))).cast("long")
    val table = typedlit(graft.queries.LlmOps.QcWeights.toArray)
    def weight(tk: Column) = element_at(table,
      (knuthBucket2(code(tk), graft.queries.LlmOps.QcBuckets.toLong) + 1)
        .cast("int"))
    // single-pass fold — no transform() intermediate array, no explode
    aggregate(toks, lit(0L), (acc, tk) => acc + weight(tk))
  }

  /** Score a (doc_id, text, …) frame: (doc_id, n_tok, score, keep).
    * Pure row-local fold — no explode, no intermediate array, no
    * shuffle at any scale. */
  def gate(docs: DataFrame): DataFrame = {
    val score = scoreExpr
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      score.as("score"),
      (score >= 0L).as("keep"))
  }
}
