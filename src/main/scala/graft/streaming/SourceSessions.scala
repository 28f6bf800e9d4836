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
  * `handleExpiredTimer`). The summary therefore emits from the TIMER
  * path, not the data path: a session row exists because the watermark
  * PROVED the source quiet, never because a batch happened to poll it.
  *
  * State per key: |langs-seen-this-session| map entries + one long +
  * one timer — session-bounded, cleared on expiry, so a 100 TB ingest
  * holds state only for sources active within the gap window (s80's
  * eviction argument, now with the map sized by the session's own
  * language mix instead of a fixed tuple).
  *
  * Ordering contract: the newest-event register (`maxTs`) is stored
  * monotone-max, so out-of-order rows above the watermark can only
  * EXTEND a session, never shorten it — the same guarantee
  * `RunningCounters.updateGroupTtl` documents for s80. */
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
      var m = m0
      rows.foreach { case (_, _, ts, lang) =>
        val prev = if (langCounts.containsKey(lang)) langCounts.getValue(lang) else 0L
        langCounts.updateValue(lang, prev + 1L)
        if (ts.getTime > m) m = ts.getTime
      }
      maxTs.update(m)
      // re-arm: exactly one live timer per key, at newest-event + gap.
      // The live timer's expiry is derivable from the stored register
      // (m0 + gap), so an out-of-order batch that doesn't advance the
      // session edge skips the delete+register round-trip entirely
      if (!known) getHandle.registerTimer(m + gapMs)
      else if (m > m0) {
        getHandle.deleteTimer(m0 + gapMs)
        getHandle.registerTimer(m + gapMs)
      }
      Iterator.empty
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
