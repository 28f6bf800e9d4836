package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Streaming 3-sigma anomaly gate (s86) — the stream-side twin of the
  * oracled q113 batch verdict (the batch-mirror pattern of s74/q66,
  * s81/q49, s85/q109): flag an incoming metric event whose value sits
  * more than 3 sigma from the trailing-20 mean of its event type.
  *
  * The verdict arithmetic is ONE pure function ([[verdict]]) — the same
  * cross-multiplied integer test q113 evaluates as columns
  * ((n·x − S)² > 9·(n·Q − S²) over exact cents, no float mean/stddev
  * ever), and StreamingSpec pins stream-vs-batch EQUALITY on the sf
  * fixture, so the oracle gate on q113 carries this operator's
  * semantics too (q62/s72's equivalence trick).
  *
  * State per event type is the trailing-20 ring of cents values — a
  * fixed ≤ 20-long vector, so the state store holds
  * O(|event types| · 20) BIGINTs regardless of stream volume: the
  * bounded-state posture every 100 TB streaming operator here carries
  * (s80's TTL note). Within a micro-batch the group's rows are sorted
  * by (epoch_s, event_id) before folding — event time, not arrival
  * order, drives the window, the same secondary-sort contract as
  * q66's batch fold; the sort is bounded by the micro-batch, not the
  * stream. */
object AnomalyGate {

  val WinLen = 20
  val MinFill = 10

  /** The q113 verdict on a filled window: n rows summing to s with
    * sum-of-squares q — is x more than 3 sigma out? Pure BIGINT. */
  def verdict(n: Long, x: Long, s: Long, q: Long): Boolean = {
    val lhs = n * x - s
    n >= MinFill && lhs * lhs > 9 * (n * q - s * s)
  }

  /** Fold one event into the ring: returns (next ring, flag). The ring
    * INCLUDES the new event (q113's frame is 19 preceding + current). */
  def step(ring: Vector[Long], x: Long): (Vector[Long], Boolean) = {
    val w = (ring :+ x).takeRight(WinLen)
    (w, verdict(w.length.toLong, x, w.sum, w.map(v => v * v).sum))
  }

  /** s86's `flatMapGroupsWithState` function over
    * (event_type, event_id, epoch_s, cents) rows: sort the micro-batch
    * by event time, fold each event through [[step]], emit one
    * (event_type, event_id, epoch_s, cents, is_anomaly) verdict per
    * event. */
  def updateGroup(eventType: String, rows: Iterator[(String, Long, Long, Long)],
      state: GroupState[Vector[Long]]): Iterator[(String, Long, Long, Long, Boolean)] = {
    var ring = state.getOption.getOrElse(Vector.empty[Long])
    val out = rows.toSeq.sortBy(r => (r._3, r._2)).map { case (_, id, ep, cents) =>
      val (next, flag) = step(ring, cents)
      ring = next
      (eventType, id, ep, cents, flag)
    }
    state.update(ring)
    out.iterator
  }
}
