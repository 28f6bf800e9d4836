package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-source ingest-session summarizer — s80's session semantics
  * (a source's feed goes quiet for `gap`, emit one session summary and
  * forget the source) carried by Spark 4's `transformWithState` with
  * EVENT-TIME TIMERS: where s80 encodes expiry through
  * `GroupStateTimeout.EventTimeTimeout` (one opaque timeout per key,
  * fused into the state object), the v2 API separates the concerns the
  * way a production session store needs — composite per-key state
  * (a `MapState` of per-language doc counts + a `ValueState` newest
  * event time) and an explicit timer registry (`registerTimer` /
  * `deleteTimer`, fired by watermark advance into
  * `handleExpiredTimer`). The summary normally emits from the TIMER
  * path: a session row exists because the watermark PROVED the source
  * quiet, not because a batch happened to poll it. One strictness
  * exception: when a batch's EARLIEST row already sits at or past the
  * open session's expiry edge (every new row is > gap after the old
  * newest event), the old session is provably over regardless of where
  * the watermark stands — input rows are processed against the
  * batch-start watermark before pending timers fire, so waiting for
  * the timer would wrongly merge two sessions separated by more than
  * the gap into one summary. That case closes the old session from the
  * data path (see `handleInputRows`) and the batch opens a fresh one.
  *
  * State per key: |langs-seen-this-session| map entries + one long +
  * one timer — session-bounded, cleared on expiry, so a 100 TB ingest
  * holds state only for sources active within the gap window (s80's
  * eviction argument, now with the map sized by the session's own
  * language mix instead of a fixed tuple).
  *
  * Ordering contract and the attribution boundary: the newest-event
  * register (`maxTs`) is stored monotone-max, so out-of-order rows
  * above the watermark can only EXTEND the open session, never shorten
  * it (s80's guarantee). ATTRIBUTION is weaker, and deliberately so: a
  * data-path close emits the old session BEFORE the watermark has
  * proved it quiet, so a later batch can still legally deliver a row
  * whose event time belonged to the closed session (above the lagging
  * GLOBAL watermark — other sources hold it back — but below the old
  * expiry edge). That row folds into the successor session: with the
  * summary already emitted and Append mode unable to retract, the
  * successor is the only owner left (pinned as a tested contract by
  * StreamingSpec s90d). A pipeline that needs exact late-row
  * attribution should hold sessions until the watermark passes them —
  * that is precisely Spark's built-in `session_window` aggregation
  * (s72), which buffers un-finalized sessions in the state store; this
  * kernel trades that buffering for strict early emission. */
object SourceSessions {

  /** Summary row: (source, n_docs, n_langs, session_end). */
  type Out = (String, Long, Long, Timestamp)

  class Processor(gapMs: Long)
      extends StatefulProcessor[String, (String, Long, Timestamp, String), Out] {
    @transient private var langCounts: MapState[String, Long] = _
    @transient private var maxTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      langCounts = getHandle.getMapState[String, Long](
        "langCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      maxTs = getHandle.getValueState[Long]("maxTs", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(source: String,
        rows: Iterator[(String, Long, Timestamp, String)],
        timerValues: TimerValues): Iterator[Out] = {
      val known = maxTs.exists()
      val m0 = if (known) maxTs.get() else Long.MinValue
      // single pass over the batch into a local delta (bounded by the
      // session's language mix, not by row count), tracking the batch's
      // event-time extremes — the delta merges into state only after
      // the same-batch gap check below has decided which session owns it
      val delta = scala.collection.mutable.HashMap.empty[String, Long]
      var lo = Long.MaxValue
      var hi = Long.MinValue
      rows.foreach { case (_, _, ts, lang) =>
        delta.update(lang, delta.getOrElse(lang, 0L) + 1L)
        val t = ts.getTime
        if (t < lo) lo = t
        if (t > hi) hi = t
      }
      if (delta.isEmpty) return Iterator.empty
      // same-batch gap close (strict sessionization, not just the timer
      // path): when every row of this batch sits at or past the open
      // session's expiry edge (m0 + gap), the old session is over by
      // the gap definition — emit its summary from the data path,
      // delete the now-moot timer, and restart state so the batch opens
      // a fresh session. Without this, rows landing in the same
      // micro-batch that advances the watermark past expiry would merge
      // two sessions separated by more than the gap (input rows are
      // processed against the batch-START watermark, before the pending
      // timer fires). Two documented boundaries of this early emission:
      // splits WITHIN one batch's own rows still merge (the batch is
      // one poll, span bounded by the micro-batch interval); and a row
      // of the CLOSED session arriving in a LATER batch — legal while
      // the global watermark lags behind the old expiry edge — folds
      // into the successor session, because the summary is already out
      // (the attribution boundary in the class scaladoc, pinned by
      // s90d).
      val closedEarly: Option[Out] =
        if (known && lo >= m0 + gapMs) {
          val counts = langCounts.values().toArray
          val out = (source, counts.sum, counts.length.toLong, new Timestamp(m0))
          langCounts.clear()
          getHandle.deleteTimer(m0 + gapMs)
          Some(out)
        } else None
      val fresh = !known || closedEarly.isDefined
      delta.foreach { case (lang, n) =>
        val prev = if (langCounts.containsKey(lang)) langCounts.getValue(lang) else 0L
        langCounts.updateValue(lang, prev + n)
      }
      val m = if (fresh) hi else math.max(m0, hi)
      maxTs.update(m)
      // re-arm: exactly one live timer per key, at newest-event + gap.
      // The live timer's expiry is derivable from the stored register
      // (m0 + gap), so an out-of-order batch that doesn't advance the
      // session edge skips the delete+register round-trip entirely
      if (fresh) getHandle.registerTimer(m + gapMs)
      else if (m > m0) {
        getHandle.deleteTimer(m0 + gapMs)
        getHandle.registerTimer(m + gapMs)
      }
      closedEarly.iterator
    }

    override def handleExpiredTimer(source: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Out] = {
      val counts = langCounts.values().toArray
      val out = Iterator((source, counts.sum, counts.length.toLong,
        new Timestamp(maxTs.get())))
      langCounts.clear()
      maxTs.clear()
      out
    }
  }

  /** s90's surface: summarize (source, doc_id, event_ts, lang) ingest
    * into one row per quiet-for-`gapMs` session. The input must carry a
    * watermark on the event-time column — timers fire on watermark
    * advance. */
  def summarize(in: Dataset[(String, Long, Timestamp, String)],
      gapMs: Long): Dataset[Out] = {
    import in.sparkSession.implicits._
    in.groupByKey(_._1)
      .transformWithState(new Processor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
