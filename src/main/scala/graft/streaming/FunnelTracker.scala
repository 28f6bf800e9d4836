package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** In-stream funnel tracking — q112's view → click → purchase
  * progression maintained per user as events arrive, instead of
  * recomputed over history: the live-campaign spelling of the same
  * analytic (how deep is each user RIGHT NOW), emitting the user's
  * funnel row when a micro-batch CHANGES it — plus once on first
  * touch, the stage-0 row mirroring q112's every-user output — so a
  * batch of gate-rejected events is a true no-op (no duplicate Append
  * row, no state-store write).
  *
  * Semantics proof (q66's pattern): q112's batch answer is three
  * strictly-after min-aggregations — t_view = min view time, t_click =
  * min click time > t_view, t_purchase = min purchase time > t_click —
  * and the in-order fold below reproduces it exactly: replayed in
  * ascending (event-time, event_id) order, the FIRST qualifying event
  * of each stage IS that stage's minimum, and the strict `>` gates are
  * order-robust to timestamp ties (a tied click fails `tus > t_view`
  * regardless of which side of the tie the fold visits first — same
  * verdict the batch min-plus-filter reaches). StreamingSpec s91
  * streams the real sf events fixture in ascending micro-batches and
  * pins each user's final emitted row identical to the DuckDB-oracled
  * q112 answer.
  *
  * Carried by `transformWithState` with a single `ValueState` of three
  * longs per user (unset = [[FunnelTracker.Unset]] sentinel — the
  * state encoder stays a flat product, no Option boxing in the store):
  * O(users-seen) state with O(1) per user, the funnel analog of s88's
  * meter bound. A deployment that should forget idle users passes a
  * TTL — the same dial s80 demonstrates — without touching the
  * transition.
  *
  * Ordering contract (s86/s87/s88's convention): rows fold in
  * (tus, event_id) order within a batch; micro-batches deliver
  * ascending event-time ranges. Enforced, not assumed: a per-user
  * high-water register (`lastEvt`, the newest folded (tus, event_id))
  * fails the query with [[IllegalStateException]] when a batch
  * delivers an event at or below it — cross-batch disorder would
  * silently mis-stage the funnel otherwise. The register is one extra
  * long pair written per touched (user, batch); the "no-op batch"
  * claim above therefore covers the Append sink and the funnel value,
  * while the high-water write always lands (it is what makes the next
  * batch's contract check sound). */
object FunnelTracker {

  /** Sentinel for an unreached stage (no event time is negative). */
  val Unset: Long = Long.MinValue

  /** Input row: (user_id, event_type, tus µs, event_id). */
  type In = (Long, String, Long, Long)

  /** Output row: (user_id, stage 0–3, t_view, t_click, t_purchase) —
    * unreached stages as None, matching q112's nullable columns. */
  type Out = (Long, Int, Option[Long], Option[Long], Option[Long])

  /** The shared per-event transition: q112's strictly-after first-time
    * capture. */
  def step(s: (Long, Long, Long), eventType: String, tus: Long): (Long, Long, Long) = {
    val (v, c, p) = s
    eventType match {
      case "view" if v == Unset => (tus, c, p)
      case "click" if v != Unset && tus > v && c == Unset => (v, tus, p)
      case "purchase" if c != Unset && tus > c && p == Unset => (v, c, tus)
      case _ => s
    }
  }

  private def toOut(user: Long, s: (Long, Long, Long)): Out = {
    val (v, c, p) = s
    val stage = if (p != Unset) 3 else if (c != Unset) 2 else if (v != Unset) 1 else 0
    (user, stage,
      if (v == Unset) None else Some(v),
      if (c == Unset) None else Some(c),
      if (p == Unset) None else Some(p))
  }

  class Processor extends StatefulProcessor[Long, In, Out] {
    @transient private var funnel: ValueState[(Long, Long, Long)] = _
    @transient private var lastEvt: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      funnel = getHandle.getValueState[(Long, Long, Long)](
        "funnel", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
      lastEvt = getHandle.getValueState[(Long, Long)](
        "lastEvt", Encoders.product[(Long, Long)], TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      val known = funnel.exists()
      val s0 = if (known) funnel.get() else (Unset, Unset, Unset)
      var s = s0
      val sorted = rows.toArray.sortBy(r => (r._3, r._4))
      if (sorted.isEmpty) return Iterator.empty
      // cross-batch half of the ordering contract: the batch's earliest
      // (tus, event_id) must sit strictly above the newest event already
      // folded — a strictly-after gate (`tus > t_view`) evaluated out of
      // order gives a silently wrong stage, so violations fail the query
      if (lastEvt.exists()) {
        val hw = lastEvt.get()
        val first = (sorted.head._3, sorted.head._4)
        if (Ordering[(Long, Long)].lteq(first, hw)) {
          throw new IllegalStateException(
            s"FunnelTracker ordering contract violated for user=$user: batch " +
              s"delivered event (tus=${first._1}, id=${first._2}) at or below " +
              s"the already-folded high-water mark (tus=${hw._1}, id=${hw._2}) " +
              "— micro-batches must carry ascending event-time ranges per key")
        }
      }
      sorted.foreach { case (_, et, tus, _) => s = step(s, et, tus) }
      lastEvt.update((sorted.last._3, sorted.last._4))
      // emit on CHANGE, plus once on first touch (the stage-0 row that
      // mirrors q112's every-user output) — a batch of gate-rejected
      // events for a known user writes no Append row and no funnel value
      // (only the high-water register above lands)
      if (known && s == s0) Iterator.empty
      else {
        funnel.update(s)
        Iterator(toOut(user, s))
      }
    }
  }

  /** s91's surface: track (user_id, event_type, tus, event_id) into
    * one updated funnel row per touched user per micro-batch. */
  def track(in: Dataset[In]): Dataset[Out] = {
    import in.sparkSession.implicits._
    in.groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
