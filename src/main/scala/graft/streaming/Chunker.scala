package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunker — q130's projection as a shared
  * batch/stream code object (the s82/s85 convention: ONE function, so
  * the oracled batch answer and the streaming path cannot drift).
  * Stateless by construction — a chunk depends only on its own row —
  * so the stream spelling needs no state store, no watermark, and no
  * output-mode constraint: it drops into any `readStream → writeStream`
  * topology as a projection, which is what makes chunking safe to run
  * AT INGEST (each arriving document fans out to its chunk rows in the
  * same micro-batch; s93 pins the stream row-set identical to the
  * batch q130 answer over the same corpus).
  *
  * Geometry contract (mirrored in q130's oracle SQL): chunks start at
  * token 1, 1+stride, … ≤ n, so every token lands in ≥ 1 chunk for any
  * stride ≤ window; the tail chunk truncates to the document edge and
  * `n_chunk_toks` carries the truth. NULL text coalesces to '' (the
  * q139–q143 convention — real corpora carry null bodies), so a
  * NULL-body document still yields its one empty chunk row rather than
  * silently vanishing from the chunk report. */
object Chunker {

  /** Chunk a (doc_id, text, …) frame: one row per (doc, window start).
    * Output: doc_id, chunk_idx (1-based), start_tok, n_chunk_toks,
    * chunk_text. Pure row-local Generate — no shuffle at any scale. */
  def chunk(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window >= 2, s"chunk window must be >= 2, got $window")
    require(stride >= 1 && stride <= window,
      s"stride $stride must sit in [1, window=$window] — a stride past " +
        "the window leaves token gaps no chunk covers")
    docs
      .withColumn("toks", split(coalesce(col("text"), lit("")), " "))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(1), size(col("toks")), lit(stride)))
          .as(Seq("pos", "start")))
      .select(
        col("doc_id"),
        (col("pos") + 1).cast("long").as("chunk_idx"),
        col("start").cast("long").as("start_tok"),
        least(lit(window), size(col("toks")) - col("start") + 1).cast("long")
          .as("n_chunk_toks"),
        array_join(slice(col("toks"), col("start"), lit(window)), " ")
          .as("chunk_text"))
  }
}
