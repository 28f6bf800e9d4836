package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** The per-key state transition behind the stateful-streaming surface
  * (s74, `flatMapGroupsWithState` in StreamingSpec): running
  * (event-count, value-sum) counters per user.
  *
  * Factored out so the SAME transition code is exercised by two harnesses:
  *   - the streaming path: s74 feeds micro-batches through
  *     [[updateGroup]] with the state held in Spark's `GroupState`;
  *   - the batch mirror: q66_stateful_counters folds every event through
  *     [[step]] in event order (each event its own micro-batch) and is
  *     hash-gated against a DuckDB window-function oracle.
  * Green q66 therefore proves the stateful operator's SEMANTICS
  * (cumulative count/sum per user over event order), not just its
  * plumbing — the same trick q62 uses for s72's session windows.
  *
  * The sum accumulates `java.math.BigDecimal` (events carry exact
  * DECIMAL(18,4) values — `dsum`'s argument): decimal addition is
  * associative, so micro-batch boundaries, fold order, and DuckDB's
  * window aggregation cannot diverge by an ulp. */
object RunningCounters {

  /** (events seen, exact running sum). */
  type State = (Long, java.math.BigDecimal)

  val zero: State = (0L, java.math.BigDecimal.ZERO)

  def step(s: State, v: java.math.BigDecimal): State = (s._1 + 1, s._2.add(v))

  def fold(s: State, vs: Iterator[java.math.BigDecimal]): State = vs.foldLeft(s)(step)

  /** s74's `flatMapGroupsWithState` function: fold the micro-batch into
    * the stored state, emit one updated (user, n, total) row. */
  def updateGroup(user: Long, rows: Iterator[(Long, Double)],
      state: GroupState[State]): Iterator[(Long, Long, Double)] = {
    val next = fold(state.getOption.getOrElse(zero),
      rows.map(r => java.math.BigDecimal.valueOf(r._2)))
    state.update(next)
    Iterator((user, next._1, next._2.doubleValue))
  }

  /** s80's TTL state: the running counters plus the newest event time
    * EVER seen for the key — stored, not recomputed per batch, so an
    * out-of-order micro-batch (older rows arriving later, still above
    * the watermark) can never move the timeout EARLIER than an event
    * already folded in. */
  type TtlState = (Long, java.math.BigDecimal, Long)

  /** s80's TTL variant: same transition, plus an event-time timeout of
    * `gapMs` past the group's newest event. Without a timeout, per-key
    * state grows with the KEY CARDINALITY EVER SEEN — the unbounded-state
    * failure mode that kills a 100 TB streaming job; with it, the state
    * store holds only keys active within the TTL window (watermark-driven
    * eviction, same bound the stream-stream join gets from its
    * watermarks). A key re-appearing after eviction restarts from
    * [[zero]] — the documented and tested semantic. Single-pass: the
    * batch streams through the fold (a hot key's micro-batch is never
    * buffered — the same O(1)-state argument as q66's mapPartitions). */
  def updateGroupTtl(gapMs: Long)(user: Long,
      rows: Iterator[(java.sql.Timestamp, Long, Double)],
      state: GroupState[TtlState]): Iterator[(Long, Long, Double)] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      var (n, sum, maxTs) = state.getOption.getOrElse(
        (zero._1, zero._2, Long.MinValue))
      rows.foreach { r =>
        val next = step((n, sum), java.math.BigDecimal.valueOf(r._3))
        n = next._1; sum = next._2
        if (r._1.getTime > maxTs) maxTs = r._1.getTime
      }
      state.update((n, sum, maxTs))
      state.setTimeoutTimestamp(maxTs + gapMs)
      Iterator((user, n, sum.doubleValue))
    }
}
