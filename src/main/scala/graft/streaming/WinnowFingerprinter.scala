package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{LlmOps, TokenStats}

/** Winnowing fingerprint extraction as a shared batch/stream code
  * object (the s82/s85/s95/s97/s99 convention: ONE function, so the
  * oracled batch answer and the ingest-time projection cannot drift).
  * q165 reports the per-document selection stats in batch, q166 builds
  * its overlap index from [[fpRows]], and s102 runs the IDENTICAL
  * expressions at ingest — the production posture for a winnowed
  * copy-detection index: each arriving document's MOSS fingerprint set
  * is computed ONCE, at ingest, and appended to the inverted index, so
  * the nightly q166 overlap pass never re-tokenizes the corpus (the
  * same amortization argument as s96's learned-BPE encode and q148's
  * incremental labels).
  *
  * Stateless by construction — a document's fingerprint set depends
  * only on its own text plus the fixed (k, w) geometry — so the stream
  * spelling needs no state store, no watermark, and no output-mode
  * constraint; at 100 TB fingerprint extraction scales as
  * embarrassingly parallel map work over crawl shards, emitting
  * ~2/(w+1) of the gram mass as 8-byte BIGINTs (q165 prices exactly
  * that ratio).
  *
  * Plan shape (why the spellings below are EXACTLY the measured q165/
  * q166 originals): `codes`, `grams`, and `fps` must each ride their
  * own projection before the next consumes them — higher-order-function
  * interiors evaluate interpreted with no common-subexpression
  * elimination (the q135/q64 defect class). This object's first
  * version learned the corollary the hard way: it returned ONE frame
  * carrying both the `fps` array and its stats columns, and pruning +
  * CollapseProject on the explode consumer inlined the codes transform
  * into the gram fold — every `element_at(codes, i+o)` probe re-ran
  * the whole per-token transform, and q166 went from its 1.4 s floor
  * to minutes (jstack: `Pmod → ArrayTransform → Ascii` in interpreted
  * eval, two tasks at 370 s CPU). Splitting the consumers onto the
  * original projection chains restored the floor; the shared object
  * shares the CHAIN BUILDER, not a wider materialized frame. */
object WinnowFingerprinter {

  /** Intermediate column names this object claims on the caller's
    * frame (`withColumn` REPLACES by name, so a caller's same-named
    * column would be silently clobbered — ADVICE r14; [[stats]]
    * additionally claims `fps`). Asserted loudly below, since this is
    * a shared public-ish entry point rather than a query-local chain. */
  private val Reserved = Seq("toks", "codes", "grams")

  private def requireFree(docs: DataFrame, names: Seq[String]): Unit = {
    // case-INSENSITIVE compare: withColumn resolves case-insensitively
    // under the default spark.sql.caseSensitive=false, so a caller's
    // "Toks" would be clobbered just the same
    val lower = names.map(_.toLowerCase)
    val clash = docs.columns.filter(c => lower.contains(c.toLowerCase))
    require(clash.isEmpty,
      s"WinnowFingerprinter reserves intermediate column names " +
        s"${names.mkString("/")}; the input frame already carries " +
        s"${clash.mkString(", ")} — rename before calling")
  }

  /** The materialized token-code → gram-hash chain (each layer its own
    * projection — see the plan-shape note above). Requires a `text`
    * column and that none of [[Reserved]] pre-exist; passes everything
    * else through. */
  private def withGrams(docs: DataFrame, k: Int): DataFrame = {
    requireFree(docs, Reserved)
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("codes",
        transform(col("toks"), tk => LlmOps.winnowTokenCode(tk)))
      .withColumn("grams", LlmOps.gramHashes(col("codes"), k))
  }

  /** q166's index feed: the exploded (doc_id, fp) rows of each
    * document's winnowed fingerprint set. TOTAL in the no-row sense —
    * docs shorter than k tokens select the empty set and emit nothing
    * (exactly what an inverted index wants). Row-local until the
    * explode; no join, no exchange at any scale. */
  def fpRows(docs: DataFrame, k: Int, w: Int): DataFrame =
    withGrams(docs, k)
      .select(col("doc_id"),
        explode(LlmOps.winnowSelect(col("grams"), w)).as("fp"))

  /** q165's report frame: (doc_id, n_grams, n_selected, density_ppm) —
    * the realized selection density in exact ppm (integer floor
    * division on both engines; theory says ~2/(w+1) for random
    * hashes). TOTAL — docs shorter than k tokens report 0/0/0. The
    * batch entry orders and dumps this frame; s102 streams it
    * row-identically. */
  def stats(docs: DataFrame, k: Int, w: Int): DataFrame = {
    requireFree(docs, Seq("fps"))
    val scored = withGrams(docs, k)
      .withColumn("fps", LlmOps.winnowSelect(col("grams"), w))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        size(col("fps")).cast("long").as("n_selected"))
    scored.select(col("doc_id"), col("n_grams"), col("n_selected"),
      when(col("n_grams") > 0,
        expr(TokenStats.ppmSql("n_selected", "n_grams")))
        .otherwise(lit(0L)).as("density_ppm"))
  }
}
