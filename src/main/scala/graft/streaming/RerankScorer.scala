package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Composition

/** q172's cross-encoder-style interaction scoring as a shared
  * batch/stream code object (the s82/s95/s102 convention) — the ONLINE
  * half of the two-stage retrieval stack: production rerank serving
  * scores ARRIVING documents against a fixed, artifact-served query
  * panel at ingest (index-time feature tagging), exactly as q172
  * re-scores its fused candidates in batch. Stateless by construction —
  * a (doc, query) score depends only on the doc's own tokens plus the
  * broadcast panel — so the stream spelling (s103) needs no state
  * store, no watermark, and no output-mode constraint; at 100 TB the
  * scorer is embarrassingly parallel map work over crawl shards, the
  * panel a ≤ queries×terms literal riding the closure.
  *
  * Scoring contract: IDENTICAL packing arithmetic and constants as
  * q172 — the four [[Composition]] one-spelling vals (coverage step,
  * proximity cap/step, tf cap) are referenced, never copied, and
  * StreamingSpec pins the streamed (query, doc) scores row-identical
  * to the DuckDB-oracled q172 batch answer on q172's own candidate
  * set, so the two spellings cannot drift. The SHAPE differs by
  * design: q172 explodes per (pair, term) and re-aggregates (its
  * candidate set is panel-bounded — the groupBy touches ≤ 75×3 rows);
  * a stream cannot carry a blocking aggregation statelessly, so here
  * the SAME features fold row-locally over the terms array
  * (`transform`/`filter`/`aggregate` — one output row per (doc,
  * query) emitted inside the doc's own micro-batch).
  *
  * Plan-shape note (the q135/q64/winnow HOF lesson): `toks` and `pos`
  * each ride their own projection below; the three consumers of `pos`
  * (match count, min, max) read the PREVIOUS projection's column, so a
  * CollapseProject re-inline costs at most the 3-element position
  * probe per consumer — bounded by the panel's term count, not by the
  * document. */
object RerankScorer {

  /** Reserved intermediate column names (the WinnowFingerprinter
    * guard): [[score]] claims these on the caller's frame. */
  private val Reserved = Seq("toks", "qrow", "query_id", "terms", "pos",
    "n_match", "minpos", "maxpos", "tfsum", "ce_e9")

  /** The artifact-served query panel, collected driver-side — ≤
    * queries×terms rows (panel-bounded, the q172 collect class):
    * (query_id, its df-ranked terms in ascending term order). */
  def panelOf(spark: SparkSession, dir: String): Seq[(Int, Seq[String])] =
    Composition.QueryPanelTable.of(spark, dir)
      .select(col("query_id"), col("term"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)))
      .groupBy(_._1).toSeq
      .map { case (q, ts) => (q, ts.map(_._2).sorted.toSeq) }
      .sortBy(_._1)

  /** Score a (doc_id, text, …) frame against the collected panel: one
    * row per (doc, query) — (doc_id, query_id, n_match, minpos,
    * maxpos, tfsum, ce_e9), ce packed exactly as q172 (coverage
    * dominates, proximity breaks coverage ties at n_match ≥ 2, capped
    * tf breaks proximity ties). Pure row-local projection chain. */
  def score(docs: DataFrame, panel: Seq[(Int, Seq[String])]): DataFrame = {
    val lower = Reserved.map(_.toLowerCase)
    val clash = docs.columns.filter(c =>
      lower.contains(c.toLowerCase) && c.toLowerCase != "doc_id")
    require(clash.isEmpty,
      s"RerankScorer reserves intermediate column names " +
        s"${Reserved.mkString("/")}; the input frame already carries " +
        s"${clash.mkString(", ")} — rename before calling")
    val panelLit = typedlit(panel)
    val perQuery = docs
      .select(col("doc_id"),
        split(coalesce(col("text"), lit("")), " ").as("toks"))
      .select(col("doc_id"), col("toks"), explode(panelLit).as("qrow"))
      .select(col("doc_id"), col("toks"),
        col("qrow._1").as("query_id"), col("qrow._2").as("terms"))
      .withColumn("pos",
        transform(col("terms"), tm => array_position(col("toks"), tm)))
      .withColumn("tfsum",
        aggregate(col("terms"), lit(0L), (acc, tm) =>
          acc + size(filter(col("toks"), x => x === tm)).cast("long")))
    val feat = perQuery.select(
      col("doc_id"), col("query_id"), col("tfsum"),
      size(filter(col("pos"), p => p > 0)).cast("long").as("n_match"),
      array_min(filter(col("pos"), p => p > 0)).as("minpos"),
      array_max(filter(col("pos"), p => p > 0)).as("maxpos"))
    feat.withColumn("ce_e9",
      col("n_match") * lit(Composition.RerankCoverageStep) +
        when(col("n_match") >= 2,
          greatest(lit(0L),
            lit(Composition.RerankProxCap) - (col("maxpos") - col("minpos"))))
          .otherwise(lit(0L)) * lit(Composition.RerankProxStep) +
        least(col("tfsum"), lit(Composition.RerankTfCap)))
      .select(col("doc_id"), col("query_id"), col("n_match"),
        col("minpos"), col("maxpos"), col("tfsum"), col("ce_e9"))
  }
}
