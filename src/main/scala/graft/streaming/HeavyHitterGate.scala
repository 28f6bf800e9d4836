package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Streaming heavy-hitter summary (s87) — bounded-state Misra-Gries
  * over the token stream, the sketch-side twin of q124's exact
  * 500 ppm answer (batch-mirror pattern of s86/q113, s81/q49).
  *
  * The stream is hash-bucketed (`bucketOf`) and each bucket group
  * maintains a k-slot Misra-Gries summary in
  * `flatMapGroupsWithState`: an incoming token increments its slot,
  * claims a free slot at weight 1, or — when all k slots are
  * occupied — decrements EVERY slot (evicting zeros). The classic
  * guarantee survives bucketing because hash partitioning sends all
  * occurrences of a token to one bucket: any token whose true count
  * exceeds n_b/(k+1) of its bucket's n_b processed tokens MUST hold
  * a slot, and its slot weight understates the true count by at most
  * n_b/(k+1). `StreamingSpec` pins exactly that superset relation
  * against a sequential re-derivation, and pins q124's exact heavy
  * hitters ⊆ the streamed summary on the sf corpus.
  *
  * 100 TB posture: state is Buckets·Slots (token, weight) pairs —
  * constant, stream-volume-independent (the bounded-state contract
  * of s80/s86); buckets are independent groups, so the summary
  * parallelizes across executors and a production deployment dials
  * `Buckets` to the cluster, not the data. Each micro-batch emits
  * its buckets' full (snapshot) summaries tagged with n_b; readers
  * take the latest snapshot per bucket (s74's convention). */
object HeavyHitterGate {

  val Slots = 8
  val Buckets = 4

  def bucketOf(tok: String): Int =
    (tok.hashCode % Buckets + Buckets) % Buckets

  /** One Misra-Gries step: k-slot summary ⊕ token. */
  def fold(summary: Map[String, Long], tok: String): Map[String, Long] =
    if (summary.contains(tok)) summary.updated(tok, summary(tok) + 1L)
    else if (summary.size < Slots) summary.updated(tok, 1L)
    else summary.collect { case (t, c) if c > 1L => t -> (c - 1L) }

  /** s87's `flatMapGroupsWithState` function over (bucket, seq, tok)
    * rows: sort the micro-batch by stream sequence (arrival order, not
    * shuffle order, drives the fold — s86's secondary-sort contract),
    * fold through the bucket's summary, emit one
    * (bucket, tok, weight_lb, n_bucket) row per surviving slot.
    *
    * Ordering contract: the per-batch sort restores sequence order
    * WITHIN a micro-batch only. Exact equality with the sequential
    * fold (what StreamingSpec pins) additionally requires micro-batches
    * to deliver disjoint ascending seq ranges — s86's input convention,
    * which the file/rate sources used here satisfy. The Misra-Gries
    * guarantees themselves (superset of true heavy hitters; per-token
    * undercount ≤ n/Slots) are fold-order-independent, so an
    * out-of-order upstream degrades only the pinned exact-trace
    * equality, never the error bound. */
  def updateGroup(bucket: Int, rows: Iterator[(Int, Long, String)],
      state: GroupState[(Long, Map[String, Long])]): Iterator[(Int, String, Long, Long)] = {
    var (n, s) = state.getOption.getOrElse((0L, Map.empty[String, Long]))
    rows.toSeq.sortBy(_._2).foreach { case (_, _, tok) => n += 1L; s = fold(s, tok) }
    state.update((n, s))
    s.iterator.map { case (tok, w) => (bucket, tok, w, n) }
  }
}
