package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{LlmOps, TokenStats}

/** Winnowing fingerprint extraction as a shared batch/stream code
  * object (the s82/s85/s95/s97/s99 convention: ONE function, so the
  * oracled batch answer and the ingest-time projection cannot drift).
  * q165 reports the per-document selection stats in batch, q166 builds
  * its overlap index from the same fingerprint sets, and s102 runs the
  * IDENTICAL expressions at ingest — the production posture for a
  * winnowed copy-detection index: each arriving document's MOSS
  * fingerprint set is computed ONCE, at ingest, and appended to the
  * inverted index, so the nightly q166 overlap pass never re-tokenizes
  * the corpus (the same amortization argument as s96's learned-BPE
  * encode and q148's incremental labels).
  *
  * Stateless by construction — a document's fingerprint set depends
  * only on its own text plus the fixed (k, w) geometry — so the stream
  * spelling needs no state store, no watermark, and no output-mode
  * constraint; at 100 TB fingerprint extraction scales as
  * embarrassingly parallel map work over crawl shards, emitting
  * ~2/(w+1) of the gram mass as 8-byte BIGINTs (q165 prices exactly
  * that ratio).
  *
  * Plan shape (why each layer rides its own projection): `codes`,
  * `grams`, and `fps` are materialized as SEPARATE columns before the
  * next consumes them — higher-order-function interiors evaluate
  * interpreted with no common-subexpression elimination, so inlining
  * [[LlmOps.gramHashes]] into [[LlmOps.winnowSelect]] would re-run the
  * whole gram fold per window start (measured on this very op: 6.9 s
  * solo at sf0.1 inlined vs the materialized spelling's sub-q88
  * floor — see q165's scaladoc). */
object WinnowFingerprinter {

  /** Per-document winnowed fingerprints plus selection stats:
    * (doc_id, fps, n_grams, n_selected). TOTAL — docs shorter than k
    * tokens carry the empty fingerprint set and 0/0 counts (the
    * sequence-descends guard inside [[LlmOps.gramHashes]]). Row-local:
    * no Generate, no join, no exchange at any scale. Consumers prune
    * what they don't read (q166 keeps only `fps`, [[stats]] drops it),
    * so the shared spelling costs neither side anything. */
  def fingerprints(docs: DataFrame, k: Int, w: Int): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("codes",
        transform(col("toks"), tk => LlmOps.winnowTokenCode(tk)))
      .withColumn("grams", LlmOps.gramHashes(col("codes"), k))
      .withColumn("fps", LlmOps.winnowSelect(col("grams"), w))
      .select(col("doc_id"), col("fps"),
        size(col("grams")).cast("long").as("n_grams"),
        size(col("fps")).cast("long").as("n_selected"))

  /** q165's report frame: (doc_id, n_grams, n_selected, density_ppm) —
    * the realized selection density in exact ppm (integer floor
    * division on both engines; theory says ~2/(w+1) for random
    * hashes). The batch entry orders and dumps this frame; s102
    * streams it row-identically. */
  def stats(docs: DataFrame, k: Int, w: Int): DataFrame =
    fingerprints(docs, k, w)
      .select(col("doc_id"), col("n_grams"), col("n_selected"),
        when(col("n_grams") > 0,
          expr(TokenStats.ppmSql("n_selected", "n_grams")))
          .otherwise(lit(0L)).as("density_ppm"))
}
