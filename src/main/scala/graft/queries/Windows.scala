package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface [EXT] (SURVEY.md §2.2). Every window has a
  * total order within its partition (unique tiebreak column) so
  * row_number/lag/lead are deterministic. One shuffle per distinct
  * partitioning — all three queries shuffle exactly once. */
object Windows {

  /** q30: ranking trio over customers' orders by price. */
  val q30Rank: Q = (spark, dir) => {
    val o = t(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orderAll(o.select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      row_number().over(w).as("rn"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk")))
  }

  /** q31: lag/lead + running exact-decimal sum per customer over time. */
  val q31Analytic: Q = (spark, dir) => {
    val o = t(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    orderAll(o.select(
      col("o_custkey"), col("o_orderkey"),
      col("o_totalprice"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      sum(col("o_totalprice").cast("decimal(18,4)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_total")))
  }

  /** q32: RANGE frame over event time — trailing 10-minute window per
    * user, keyed on epoch seconds (numeric range frames port exactly
    * to DuckDB). */
  val q32RangeFrame: Q = (spark, dir) => {
    val e = events(spark, dir)
    val withEpoch = e.withColumn("epoch_s", unix_timestamp(col("ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
      .rangeBetween(-600, 0)
    orderAll(withEpoch.select(
      col("user_id"), col("event_id"), col("epoch_s"),
      count(lit(1)).over(w).as("n_10m"),
      sum(col("value").cast("decimal(18,4)")).over(w)
        .cast("double").as("sum_10m")))
  }

  /** q33 [EXT]: batch sessionization — the gap-based session id every
    * event pipeline needs: a session starts when the gap to the user's
    * previous event exceeds 30 minutes; the id is the running count of
    * session starts. Two stacked window functions over ONE partitioning
    * (user_id), so it still costs a single shuffle; at 100 TB this is
    * the batch mirror of s72's streaming session_window. */
  val q33Sessionize: Q = (spark, dir) => {
    val e = events(spark, dir)
    val withEpoch = e.withColumn("epoch_s", unix_timestamp(col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch_s").asc, col("event_id").asc)
    val gap = col("epoch_s") - lag(col("epoch_s"), 1).over(w)
    val isStart = when(gap.isNull || gap > 1800, 1).otherwise(0)
    orderAll(withEpoch
      .withColumn("is_start", isStart)
      .withColumn("session_id",
        sum(col("is_start")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("epoch_s"),
        col("is_start"), col("session_id")))
  }

  /** q34 [EXT]: time-series resample + gap-fill — the hourly grid per
    * user (sequence over the user's own span, so grid size is bounded
    * by activity, not by global min/max), left-joined with the hourly
    * aggregate, missing hours forward-filled with the last observation
    * (`last(_, ignoreNulls)` over a running frame). One shuffle for the
    * hourly agg, one for the span, one window — all on user_id, so AQE
    * can reuse the partitioning. */
  val q34GapFill: Q = (spark, dir) => {
    val e = events(spark, dir)
    val hourly = e.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_events"))
    val spans = e.groupBy(col("user_id")).agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val grid = spans.select(col("user_id"),
      explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hr"))
    val joined = grid.join(hourly, Seq("user_id", "hr"), "left")
    val w = Window.partitionBy(col("user_id")).orderBy(col("hr").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orderAll(joined.select(
      col("user_id"),
      unix_timestamp(col("hr")).as("hr_s"),
      col("n_events").isNull.as("was_gap"),
      coalesce(col("n_events"), lit(0L)).as("n_events"),
      last(col("n_events"), ignoreNulls = true).over(w).as("n_filled")))
  }

  /** q37 [EXT]: distribution window functions — ntile buckets,
    * percent_rank, cume_dist (the quartile/percentile-position trio) over
    * the same single partitioning as q30. */
  val q37WindowDistribution: Q = (spark, dir) => {
    val o = t(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    orderAll(o.select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume")))
  }

  /** q112 [EXT]: funnel analysis — per user, how far along the ordered
    * view → click → purchase sequence did they get, with the FIRST
    * qualifying event time of each stage (strictly-after semantics: a
    * click only counts after the first view, a purchase only after that
    * click). The sequential-pattern-match analytic sessionization (q33)
    * cannot express: stage k's window opens only when stage k-1 fires.
    *
    * Shape: one conditional min-agg per stage — each stage scans the
    * events table with its event-type filter PUSHED to the parquet scan,
    * shuffles (user, µs) pairs under a map-side-combined min, and joins
    * the previous stage's user-keyed state under the SAME user
    * partitioning (join and agg share one exchange). Per-stage state is
    * one row per user — never event-sized; stages are a fixed small
    * constant, so total cost is ~3 filtered scans + 3 user-keyed
    * shuffles regardless of corpus size. Timestamps ride as exact
    * unix_micros BIGINTs (the events helper's ns→µs floor, mirrored by
    * DuckDB's epoch_us truncation). */
  val q112Funnel: Q = (spark, dir) => {
    val ev = events(spark, dir).select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("tus"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("tus")).as("t_view"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("tus") > col("t_view"))
      .groupBy("user_id").agg(min(col("tus")).as("t_click"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("tus") > col("t_click"))
      .groupBy("user_id").agg(min(col("tus")).as("t_purchase"))
    orderAll(ev.select(col("user_id")).distinct()
      .join(s1, Seq("user_id"), "left_outer")
      .join(s2, Seq("user_id"), "left_outer")
      .join(s3, Seq("user_id"), "left_outer")
      .select(col("user_id"),
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0).as("stage"),
        col("t_view"), col("t_click"), col("t_purchase")))
  }

  /** q113 [EXT]: rolling z-score anomaly detection — flag events whose
    * value sits more than 3 sigma from the trailing-20-event mean of
    * their event type (the ops-monitoring primitive a curation pipeline
    * runs over its own ingest metrics). The analytic windows (q31/q32)
    * give the frame; this adds the variance test.
    *
    * Determinism contract (what makes a VARIANCE test hash-oracle-able):
    * no float mean/stddev ever computed. Values ride as exact integer
    * cents (the data is 2-dp; round(value*100) is >1e8 ulps from any
    * rounding tie), and |x-mu| > 3*sigma is tested in cross-multiplied
    * integer form: (n*x - S)^2 > 9*(n*Q - S^2) with S = window sum,
    * Q = window sum of squares — pure BIGINT on both engines (max
    * magnitude ~9e12, 20-row frames of <=49102-cent values; q72-style
    * headroom note: a 1e7-cent value ceiling still fits 2e18). NULL-free
    * by construction, ties impossible (ts,event_id is a total order).
    *
    * 100 TB: one hash exchange on event_type (low-cardinality — a
    * production run partitions on (metric, hour) exactly like this
    * frame's secondary sort), one WindowExec pass holding a 20-row ring
    * buffer per partition, zero joins, zero driver state. The flag is a
    * scan-shaped per-row verdict — the same plan at any corpus size. */
  val q113AnomalyZscore: Q = (spark, dir) => {
    val winLen = 20
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("epoch_s"), col("event_id"))
      .rowsBetween(-(winLen - 1), org.apache.spark.sql.expressions.Window.currentRow)
    val e = events(spark, dir).select(
      col("event_type"), col("event_id"),
      unix_timestamp(col("ts")).as("epoch_s"),
      expr("cast(round(value * 100) as bigint)").as("cents"))
      // squared term precomputed in the scan projection so all three
      // window aggregates reference plain attributes and Catalyst plans
      // ONE WindowExec pass (an inline cents*cents forces a second
      // Window node for the derived input) — PlanSpec pins this
      .withColumn("cents_sq", col("cents") * col("cents"))
    orderAll(e
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("win_sum", sum(col("cents")).over(w))
      .withColumn("win_sumsq", sum(col("cents_sq")).over(w))
      .select(col("event_type"), col("event_id"), col("epoch_s"), col("cents"),
        col("win_n"), col("win_sum"),
        (col("win_n") >= 10 &&
          (col("win_n") * col("cents") - col("win_sum")) *
            (col("win_n") * col("cents") - col("win_sum")) >
          lit(9) * (col("win_n") * col("win_sumsq") -
            col("win_sum") * col("win_sum"))).as("is_anomaly")))
  }

  /** q114 [EXT]: first-order Markov transition mining — the global
    * event-type transition matrix (view->click probability etc.) from
    * per-user event sequences. The funnel (q112) asks "did the fixed
    * pattern fire"; this learns the empirical transition structure.
    *
    * Transition probabilities are exact micro-units
    * (n*1000000 div row_total — BIGINT floor division, Spark `div` ===
    * DuckDB `//` on positives), so the matrix is fully hash-gated.
    *
    * 100 TB: one exchange on user_id with (tus, event_id) secondary sort
    * feeds the lead() — per-partition streaming, O(1) state per user;
    * the transition pairs then collapse under a map-side-combined
    * count to |types|^2 rows (25 here), and the per-source normalizing
    * window runs on that tiny aggregate, not the events. Event volume
    * crosses the wire exactly once. */
  val q114MarkovTransitions: Q = (spark, dir) => {
    val wSeq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    orderAll(events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("tus"))
      .withColumn("to_type", lead(col("event_type"), 1).over(wSeq))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("p_mic",
        expr("n_trans * 1000000L div sum(n_trans) over (partition by from_type)"))
      .select(col("from_type"), col("to_type"), col("n_trans"), col("p_mic")))
  }

  val defs: Map[String, Q] = Map(
    "q112_funnel" -> q112Funnel,
    "q113_anomaly_zscore" -> q113AnomalyZscore,
    "q114_markov_transitions" -> q114MarkovTransitions,
    "q30_window_rank" -> q30Rank,
    "q31_window_analytic" -> q31Analytic,
    "q32_window_range_frame" -> q32RangeFrame,
    "q33_sessionize" -> q33Sessionize,
    "q34_gap_fill" -> q34GapFill,
    "q37_window_distribution" -> q37WindowDistribution)

  val oracles: Map[String, String] = Map(
    "q112_funnel" ->
      // same strictly-after stage chain; epoch_us truncates the parquet
      // nanos exactly like the engine's `ts div 1000` floor
      """WITH ev AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |           FROM events),
        |s1 AS (SELECT user_id, min(tus) AS t_view FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.tus) AS t_click
        |       FROM ev e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.tus > s1.t_view GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.tus) AS t_purchase
        |       FROM ev e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.tus > s2.t_click GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT u.user_id,
        |  CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
        |            WHEN s2.t_click IS NOT NULL THEN 2
        |            WHEN s1.t_view IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage,
        |  s1.t_view, s2.t_click, s3.t_purchase
        |FROM u LEFT JOIN s1 ON u.user_id = s1.user_id
        |       LEFT JOIN s2 ON u.user_id = s2.user_id
        |       LEFT JOIN s3 ON u.user_id = s3.user_id
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST""".stripMargin,
    "q113_anomaly_zscore" ->
      // same integer-cents cross-multiplied 3-sigma test; DuckDB's
      // HUGEINT-widening sums cast back to BIGINT for the hash gate
      """WITH e AS (SELECT event_type, event_id,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |             CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events),
        |w AS (SELECT event_type, event_id, epoch_s, cents,
        |        CAST(count(*) OVER fr AS BIGINT) AS win_n,
        |        CAST(sum(cents) OVER fr AS BIGINT) AS win_sum,
        |        CAST(sum(cents * cents) OVER fr AS BIGINT) AS win_sumsq
        |      FROM e
        |      WINDOW fr AS (PARTITION BY event_type ORDER BY epoch_s, event_id
        |                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT event_type, event_id, epoch_s, cents, win_n, win_sum,
        |  (win_n >= 10 AND
        |   (win_n * cents - win_sum) * (win_n * cents - win_sum) >
        |   9 * (win_n * win_sumsq - win_sum * win_sum)) AS is_anomaly
        |FROM w
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST""".stripMargin,
    "q114_markov_transitions" ->
      // same (tus, event_id)-ordered lead per user; micro-unit
      // probability via // === Spark div on positive counts
      """WITH s AS (SELECT event_type AS from_type,
        |             lead(event_type, 1) OVER (PARTITION BY user_id
        |               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS to_type
        |           FROM events),
        |g AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_trans
        |      FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_trans,
        |  CAST(n_trans * 1000000 // CAST(sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS BIGINT) AS p_mic
        |FROM g
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q30_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    "q31_window_analytic" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    "q32_window_range_frame" ->
      """SELECT user_id, event_id, epoch_s,
        |  count(*) OVER w AS n_10m,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_10m
        |FROM (SELECT user_id, event_id, value,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
        |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "q33_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM events),
        |g AS (SELECT user_id, event_id, epoch_s,
        |        CASE WHEN lag(epoch_s) OVER w IS NULL
        |               OR epoch_s - lag(epoch_s) OVER w > 1800
        |             THEN 1 ELSE 0 END AS is_start
        |      FROM e
        |      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s ASC, event_id ASC))
        |SELECT user_id, event_id, epoch_s, is_start,
        |  CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY epoch_s ASC, event_id ASC
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |FROM g
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "q37_window_distribution" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    "q34_gap_fill" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |spans AS (
        |  SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |         date_trunc('hour', max(ts)) AS h1
        |  FROM events GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        |  FROM spans),
        |j AS (
        |  SELECT g.user_id, g.hr, h.n
        |  FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hr = g.hr)
        |SELECT user_id,
        |  CAST(floor(epoch(hr)) AS BIGINT) AS hr_s,
        |  (n IS NULL) AS was_gap,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n_events,
        |  CAST(last_value(n IGNORE NULLS)
        |       OVER (PARTITION BY user_id ORDER BY hr
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_filled
        |FROM j
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin)
}
