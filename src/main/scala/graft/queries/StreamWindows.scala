package graft.queries

import org.apache.spark.sql.functions._

/** Batch-expressible event-time windows (SURVEY.md §2.2 streaming row):
  * the same `window()` plans run unchanged under readStream (exercised in
  * the streaming ScalaTest suite); here they run on the batch events table
  * so DuckDB can oracle them. Window starts are emitted as epoch-second
  * BIGINTs — origin-free arithmetic that cannot disagree on alignment. */
object StreamWindows {

  /** q60: tumbling 1-hour window per event_type. */
  val q60Tumbling: Q = (spark, dir) => {
    val e = events(spark, dir)
    orderAll(e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("ws"),
        col("event_type"), col("n"), col("sum_value")))
  }

  /** q61: sliding 1-hour window every 15 minutes (4 overlapping panes). */
  val q61Sliding: Q = (spark, dir) => {
    val e = events(spark, dir)
    orderAll(e.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("n"), col("sum_value")))
  }

  /** q62: `session_window` — s72's streaming operator run as a batch
    * query over the events table, so the session-merge semantics the
    * streaming suite exercises with MemoryStream are ALSO hash-gated
    * against DuckDB: a session extends while the next event arrives
    * strictly within 30 minutes of the last (Spark merges sessions when
    * next.start < prev.end, the window end being exclusive — mirrored
    * as `gap >= 30min ⇒ new session` in the oracle's gaps-and-islands
    * SQL). Bounds are emitted as epoch-MICROSECOND BIGINTs because the
    * fixture's timestamps are µs-grained — second-flooring would move
    * the tie boundary. One shuffle on user_id, like s72 at scale. */
  val q62SessionWindow: Q = (spark, dir) => {
    val e = events(spark, dir)
    orderAll(e.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("ws_us"),
        unix_micros(col("session_window.end")).as("we_us"),
        col("n"), col("sum_value")))
  }

  /** q66: the s74 stateful operator's semantics as an ORACLED batch
    * query — every event is applied to
    * [[graft.streaming.RunningCounters.step]] (the SAME transition
    * function s74's `flatMapGroupsWithState` runs) in event order
    * (epoch_s, event_id) per user, emitting the post-event state: each
    * event is its own micro-batch, so the output is the running
    * per-user (count, sum) after every event. DuckDB mirrors it with
    * cumulative window functions, which hash-gates the transition
    * function's semantics, not just its plumbing.
    *
    * Distribution shape is the secondary-sort pattern: one hash
    * repartition on user_id + sortWithinPartitions, then a single
    * streaming pass per partition holding O(1) state (reset on key
    * change) — no per-group materialization, mirroring how the
    * streaming operator's state store scales. `mapPartitions` is the
    * honest tool here: the point is running the imperative transition
    * function itself, which no declarative operator can exercise. The
    * sum folds exact DECIMAL(18,4) (q31's trick), so fold order and
    * DuckDB's window SUM cannot diverge by an ulp. */
  val q66StatefulCounters: Q = (spark, dir) => {
    import spark.implicits._
    import graft.streaming.RunningCounters
    val e = events(spark, dir).select(
        col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        col("value").cast("decimal(18,4)").as("v"))
      .as[(Long, Long, Long, java.math.BigDecimal)]
    val out = e.repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("epoch_s"), col("event_id"))
      .mapPartitions { it =>
        var user = 0L
        var seen = false
        var st = RunningCounters.zero
        it.map { case (u, id, ep, v) =>
          if (!seen || u != user) { user = u; seen = true; st = RunningCounters.zero }
          st = RunningCounters.step(st, v)
          (u, id, ep, st._1, st._2)
        }
      }
      .toDF("user_id", "event_id", "epoch_s", "n_events", "running_total")
      .withColumn("running_total", col("running_total").cast("double"))
    orderAll(out)
  }

  /** q49: the s81 streaming QA-drift monitor's aggregation
    * ([[graft.streaming.QualityMonitor.drift]] — the SAME function the
    * watermarked stream runs) as an ORACLED batch query: documents get a
    * synthetic event time (epoch 86400 + doc_id minutes, one doc per
    * minute → ~60-doc hourly windows at every SF) and DuckDB hash-gates
    * the windowed pass-count/pass-ppm/mean-quality semantics — the q62
    * trick, so the streaming operator's MATH is verified, not just its
    * plumbing. The mean sums DECIMAL(18,6) (order-free) and divides
    * once; pass_ppm is exact integer arithmetic. */
  val q49QualityDrift: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
      .select(timestamp_seconds(lit(86400L) + col("doc_id") * 60).as("ts"), col("text"))
    orderAll(graft.streaming.QualityMonitor.drift(d))
  }

  val defs: Map[String, Q] = Map(
    "q49_quality_drift" -> q49QualityDrift,
    "q60_window_tumbling" -> q60Tumbling,
    "q61_window_sliding" -> q61Sliding,
    "q62_window_session" -> q62SessionWindow,
    "q66_stateful_counters" -> q66StatefulCounters)

  val oracles: Map[String, String] = Map(
    "q49_quality_drift" ->
      // quality is q85's oracle formula verbatim; the window start is
      // pure integer epoch arithmetic (q60's convention) on the same
      // synthetic doc_id-minute event time the engine constructs; the
      // pass threshold interpolates QualityMonitor's knob so engine and
      // oracle cannot diverge on it
      s"""WITH g AS (
        |  SELECT ((86400 + doc_id * 60) // 3600) * 3600 AS ws,
        |    round(0.4 * coalesce(CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and'], x))) AS DOUBLE)
        |                 / nullif(len(string_split(text, ' ')), 0), 0.0)
        |        + 0.3 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0)
        |        + 0.3 * (1.0 - coalesce(CAST(length(text) - length(regexp_replace(text, '[.!?,;]', '', 'g')) AS DOUBLE) / nullif(length(text), 0), 0.0)), 6) AS quality
        |  FROM documents),
        |w AS (
        |  SELECT ws, count(*) AS n_docs,
        |    CAST(sum(CASE WHEN quality >= ${graft.streaming.QualityMonitor.PassThreshold} THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |    sum(CAST(quality AS DECIMAL(18,6))) AS sum_q
        |  FROM g GROUP BY ws)
        |SELECT CAST(ws AS BIGINT) AS ws, n_docs, n_pass,
        |  CAST((1000000 * n_pass) // n_docs AS BIGINT) AS pass_ppm,
        |  round(CAST(sum_q AS DOUBLE) / n_docs, 6) AS mean_quality
        |FROM w
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "q60_window_tumbling" ->
      """SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS ws, event_type,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q61_window_sliding" ->
      """SELECT ws, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT CAST(floor(epoch(ts)/900)*900 - k*900 AS BIGINT) AS ws, value
        |  FROM events, range(4) t(k))
        |GROUP BY ws
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q62_window_session" ->
      // gaps-and-islands in µs: new session when the gap to the user's
      // previous event is >= 30 min (session_window's exclusive end);
      // session end = last event + gap
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS u, value FROM events),
        |g AS (
        |  SELECT user_id, u, value,
        |    CASE WHEN lag(u) OVER w IS NULL
        |           OR u - lag(u) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS st
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY u ASC)),
        |sess AS (
        |  SELECT user_id, u, value,
        |    SUM(st) OVER (PARTITION BY user_id ORDER BY u ASC
        |                  ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id,
        |  min(u) AS ws_us,
        |  max(u) + 1800000000 AS we_us,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM sess
        |GROUP BY user_id, sid
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "q66_stateful_counters" ->
      // the running-counter semantics as cumulative window functions:
      // row_number = events seen so far, SUM OVER = running total, both
      // over the engine's exact fold order (epoch_s, event_id)
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |    CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events)
        |SELECT user_id, event_id, epoch_s,
        |  CAST(row_number() OVER w AS BIGINT) AS n_events,
        |  CAST(SUM(v) OVER w AS DOUBLE) AS running_total
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s ASC, event_id ASC
        |             ROWS UNBOUNDED PRECEDING)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin)
}
