package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed curation gate stack — q162's per-document verdict frame
  * as a shared batch/stream code object (the s82/s85/s95/s97/s98/s99
  * convention: ONE function, so the oracled batch funnel and the
  * ingest-time stream cannot drift). Production curation does not run
  * five separate passes over an arriving document: the four row-local
  * gates (repetition, heuristic quality, learned classifier,
  * decontamination) and the one static-dimension gate (k-anonymity)
  * all evaluate in ONE projection, and the admit verdict is their
  * conjunction in pipeline order. s100 is that projection on a stream;
  * q162 folds the identical frame into the oracled per-source funnel.
  *
  * Stateless by construction: every verdict depends only on the
  * document itself plus two STATIC artifacts of the previous corpus
  * build — the eval-set shingle fingerprints (q103's broadcast probe
  * contract: benchmarks, ~1e6 longs) and the QI class-size table
  * (q160's shrinking aggregate, a stream-static broadcast join) — so
  * the stream needs no state store, no watermark, no output-mode
  * constraint, and recovers trivially (the s95/s97/s99 argument,
  * composed).
  *
  * Every stage verdict is its parent's EXACT spelling:
  * [[graft.queries.LlmOps.repetitionFlag]] (q64),
  * [[graft.queries.LlmOps.qualityExpr]] ≥ 0.5 (q85 via q152's
  * threshold), [[ClassifierGate.scoreExpr]] ≥ 0 (q147),
  * [[Decontaminator]]'s shingle probe ≥ 0.5 (q103), and
  * [[QiGate]]'s class-size ≥ k (q161). */
object GateStack {

  /** Per-document verdict frame over any (doc_id, text, lang, source,
    * n_chars) frame, batch or streaming: (doc_id, source, keep_rep,
    * keep_q, keep_c, keep_d, keep_a, admit). One scan, row-local folds
    * + the broadcast class join; no aggregation, no state. */
  def verdicts(docs: DataFrame, evalShingles: Seq[Long], n: Int,
      classes: DataFrame, k: Long): DataFrame =
    docs
      // toks and sha ride their own projections (the Decontaminator
      // HOF-re-evaluation rule)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sha", Decontaminator.shingleFingerprints(col("toks"), n))
      .withColumn("n_sh", size(col("sha")))
      .withColumn("n_hit", graft.functions.SetHitCount(col("sha"), evalShingles))
      .withColumn("keep_rep", !graft.queries.LlmOps.repetitionFlag(col("toks")))
      .withColumn("keep_q", graft.queries.LlmOps.qualityExpr >= 0.5)
      .withColumn("keep_c", ClassifierGate.scoreExpr >= 0L)
      .withColumn("keep_d", !coalesce(
        when(col("n_sh") > 0,
          round(col("n_hit").cast("double") / col("n_sh"), 6)) >= 0.5,
        lit(false)))
      .withColumn("len_band", expr(s"n_chars div ${QiGate.BandWidth}"))
      .join(broadcast(classes), Seq("lang", "source", "len_band"), "left")
      .withColumn("keep_a", coalesce(col("class_size"), lit(0L)) >= k)
      .select(col("doc_id"), col("source"), col("keep_rep"), col("keep_q"),
        col("keep_c"), col("keep_d"), col("keep_a"),
        (col("keep_rep") && col("keep_q") && col("keep_c") &&
          col("keep_d") && col("keep_a")).as("admit"))
}
