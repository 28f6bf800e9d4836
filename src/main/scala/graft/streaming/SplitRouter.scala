package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.knuthBucket

/** Cluster-aware split assignment — q158's projection as a shared
  * batch/stream code object (the s82/s85/s93/s95/s96/s97 convention:
  * ONE function, so the oracled batch answer and the ingest-time
  * router cannot drift). The router is the production posture of the
  * q154 comparison: the materialized near-dup label table
  * ([[graft.queries.LlmOps.LabelTable]] — the nightly artifact) rides
  * as a STATIC dimension, each arriving document LEFT-joins it on
  * doc_id, and the split hashes the CLUSTER id (own id for unclustered
  * docs) — so a near-dup cluster lands in one split no matter which
  * member arrives, or when. Stateless by construction: a stream-static
  * broadcast join keeps no state store and needs no watermark, which
  * is what lets ingest route documents to train/val/test shards
  * BEFORE they land (the s95/s97 gate-at-ingest argument applied to
  * placement instead of filtering). At 100 TB the label table is
  * pair-graph-sized (far smaller than the corpus) and refreshes
  * nightly with the q148 incremental merge.
  *
  * Determinism: the split is the package's exact-BIGINT Knuth bucket
  * (q94's arithmetic) over the cluster id — no RNG, no engine hash —
  * so the same document gets the same split on every run, every
  * engine, every arrival order. */
object SplitRouter {

  /** q94's 80/10/10 rule over an arbitrary BIGINT key — applied to the
    * doc id (q94's spelling) or the cluster id (the fix); q154's
    * comparison uses BOTH, q158/s98 ship the cluster one. */
  private[graft] def splitOf(k: Column): Column = {
    val b = knuthBucket(k, 100L)
    when(b < 80, lit("train")).when(b < 90, lit("val")).otherwise(lit("test"))
  }

  /** Assign each (doc_id, …) row its cluster-aware split against a
    * (doc_id, cluster_id) label table: (doc_id, cluster, clustered,
    * split). TOTAL — unlabeled docs are their own singleton cluster.
    * One broadcast join + row-local bucket arithmetic; no aggregation,
    * no state, no shuffle of the document stream at any scale. */
  def assign(docs: DataFrame, labels: DataFrame): DataFrame =
    docs.join(broadcast(labels.select(col("doc_id"), col("cluster_id"))),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster"),
        col("cluster_id").isNotNull.as("clustered"))
      .select(col("doc_id"), col("cluster"), col("clustered"),
        splitOf(col("cluster")).as("split"))
}
