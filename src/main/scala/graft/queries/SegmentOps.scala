package graft.queries

import org.apache.spark.sql.functions._

/** [EXT] Behavioral / customer-segment analytics, round 11 of the
  * declared surface (SURVEY.md §2.2): cohort retention (q122), RFM
  * segmentation (q123), and robust IQR outlier fencing (q127). The
  * reference ships order rows blind (`app.py:128-139`); these are the
  * read-side reports the same feed powers once it lands — the classic
  * warehouse trio every BI layer re-derives.
  *
  * Determinism: month math is integer (year·12+month), money rides the
  * package's exact-decimal `dsum`, quantile boundaries follow q26's
  * proven `percentile` ↔ `quantile_cont` parity and are rounded to 6 dp
  * BEFORE any comparison so an ulp of interpolation difference cannot
  * flip a score, and every result ends in a total ORDER BY.
  */
object SegmentOps {

  /** q122 [EXT]: cohort retention matrix — customers bucketed by the
    * calendar month of their FIRST order; for each (cohort, month
    * offset) cell, how many of them ordered again and how many orders
    * they placed. The canonical retention triangle.
    *
    * 100 TB: one shuffle on custkey produces both the cohort assignment
    * (min-month aggregate) and the re-join back to the order stream —
    * same key, so the exchange is reused, not repeated. The distinct
    * count re-shuffles on the (cohort, offset) pair, which is
    * months²-sized key space with customer-sized values — Spark's
    * two-phase distinct (partial dedup before the exchange) keeps the
    * wire volume at distinct-(cell, cust) pairs, not raw orders. The
    * final table is a few hundred rows regardless of input scale. */
  val q122RetentionCohort: Q = (spark, dir) => {
    val om = t(spark, dir, "orders").select(
      col("o_custkey").as("cust"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
      .scopedPersist
    val first = om.groupBy("cust").agg(min(col("m")).as("m0"))
    val cells = om.join(first, "cust")
      .groupBy(col("m0"), (col("m") - col("m0")).as("month_offset"))
      .agg(countDistinct(col("cust")).as("n_custs"),
        count(lit(1)).as("n_orders"))
    orderAll(cells.select(
      expr("concat(cast((m0 - 1) div 12 as string), '-', " +
        "lpad(cast((m0 - 1) % 12 + 1 as string), 2, '0'))").as("cohort_month"),
      col("month_offset"), col("n_custs"), col("n_orders")))
  }

  /** q123 [EXT]: RFM segmentation — per customer, days since last
    * order (R), order count (F), exact-decimal lifetime spend (M),
    * each scored 1–5 against the customer population's own exact
    * quintile boundaries, plus the concatenated segment code ("555" =
    * most-recent/most-frequent/highest-spend under the
    * higher-value-higher-score convention; R is days-stale, so R5 =
    * longest dormant).
    *
    * Scale posture — the textbook formulation (global `ntile(5)`)
    * is a single-partition window over every customer and dies at
    * 100 TB; this one computes the four boundaries per metric as ONE
    * scalar row (exact `percentile`, q26's recipe) and scores by
    * broadcast comparison, so the customer table never sees a global
    * sort: one custkey shuffle, one 1-row boundary aggregate, one
    * broadcast join. Boundaries are rounded to 6 dp in BOTH engines
    * before the `>` so interpolation ulps cannot flip a score. */
  val q123RfmSegments: Q = (spark, dir) => {
    val o = t(spark, dir, "orders")
    val maxd = o.agg(max(col("o_orderdate")).as("maxd"))
    val cust = o.groupBy(col("o_custkey").as("cust"))
      .agg(max(col("o_orderdate")).as("lastd"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("monetary"))
      .join(broadcast(maxd))
      .select(col("cust"),
        datediff(col("maxd"), col("lastd")).cast("long").as("r_days"),
        col("n_orders"), col("monetary"))
      .scopedPersist
    val qs = "array(0.2D, 0.4D, 0.6D, 0.8D)"
    val bounds = cust.agg(
      expr(s"percentile(r_days, $qs)").as("rb"),
      expr(s"percentile(n_orders, $qs)").as("fb"),
      expr(s"percentile(monetary, $qs)").as("mb"))
    def score(c: String, b: String) = (1 to 4)
      .map(i => (col(c) > round(element_at(col(b), i), 6)).cast("int"))
      .foldLeft(lit(1))(_ + _)
    orderAll(cust.join(broadcast(bounds))
      .select(col("cust"), col("r_days"), col("n_orders"), col("monetary"),
        score("r_days", "rb").as("r_score"),
        score("n_orders", "fb").as("f_score"),
        score("monetary", "mb").as("m_score"))
      .withColumn("segment", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string"))))
  }

  /** q127 [EXT]: robust outlier fencing — per event type, the Tukey
    * IQR fences (q1 − 1.5·IQR, q3 + 1.5·IQR) over `value` and the
    * count of events outside each fence. The distribution-free
    * complement to q113's rolling z-score (which assumes
    * normal-ish residuals and a time axis); this is the batch QA
    * gate a feature pipeline runs before training on a numeric
    * column.
    *
    * 100 TB: exact quantiles per event type are a type-keyed
    * aggregate (the only full shuffle); the fence table is
    * types-sized and broadcast back over the raw stream, which is
    * then counted with map-side combine — the event stream crosses
    * the wire once. At web scale the exact `percentile` dials down
    * to `approx_percentile` (q28's sketch) with nothing else
    * changing. Fences are rounded to 6 dp in both engines before the
    * comparison AND in the output, q123's ulp discipline. */
  val q127IqrOutliers: Q = (spark, dir) => {
    val ev = events(spark, dir).scopedPersist
    val fences = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.25D)").as("q1"),
        expr("percentile(value, 0.75D)").as("q3"))
      .select(col("event_type"),
        round(col("q1") - (col("q3") - col("q1")) * 1.5, 6).as("lo_fence"),
        round(col("q3") + (col("q3") - col("q1")) * 1.5, 6).as("hi_fence"))
    orderAll(ev.join(broadcast(fences), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") < col("lo_fence"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("value") > col("hi_fence"), 1L).otherwise(0L)).as("n_high"),
        min(col("lo_fence")).as("lo_fence"),
        min(col("hi_fence")).as("hi_fence")))
  }

  val defs: Map[String, Q] = Map(
    "q122_retention_cohort" -> q122RetentionCohort,
    "q123_rfm_segments" -> q123RfmSegments,
    "q127_iqr_outliers" -> q127IqrOutliers)

  val oracles: Map[String, String] = Map(
    "q122_retention_cohort" ->
      """WITH om AS (
        |  SELECT o_custkey AS cust,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT) AS m
        |  FROM orders),
        |f AS (SELECT cust, min(m) AS m0 FROM om GROUP BY 1),
        |cells AS (
        |  SELECT m0, om.m - m0 AS month_offset,
        |    count(DISTINCT om.cust) AS n_custs, count(*) AS n_orders
        |  FROM om JOIN f USING (cust) GROUP BY 1, 2)
        |SELECT
        |  concat(CAST((m0 - 1) // 12 AS VARCHAR), '-',
        |    lpad(CAST((m0 - 1) % 12 + 1 AS VARCHAR), 2, '0')) AS cohort_month,
        |  CAST(month_offset AS INT) AS month_offset, n_custs, n_orders
        |FROM cells
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q123_rfm_segments" ->
      """WITH mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
        |cust AS (
        |  SELECT o_custkey AS cust,
        |    CAST(datediff('day', CAST(max(o_orderdate) AS DATE),
        |      CAST((SELECT maxd FROM mx) AS DATE)) AS BIGINT) AS r_days,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY 1),
        |b AS (
        |  SELECT quantile_cont(r_days, [0.2, 0.4, 0.6, 0.8]) AS rb,
        |    quantile_cont(n_orders, [0.2, 0.4, 0.6, 0.8]) AS fb,
        |    quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mb
        |  FROM cust),
        |s AS (
        |  SELECT cust, r_days, n_orders, monetary,
        |    CAST(1 + (r_days > round(rb[1], 6))::INT + (r_days > round(rb[2], 6))::INT
        |      + (r_days > round(rb[3], 6))::INT + (r_days > round(rb[4], 6))::INT AS INT) AS r_score,
        |    CAST(1 + (n_orders > round(fb[1], 6))::INT + (n_orders > round(fb[2], 6))::INT
        |      + (n_orders > round(fb[3], 6))::INT + (n_orders > round(fb[4], 6))::INT AS INT) AS f_score,
        |    CAST(1 + (monetary > round(mb[1], 6))::INT + (monetary > round(mb[2], 6))::INT
        |      + (monetary > round(mb[3], 6))::INT + (monetary > round(mb[4], 6))::INT AS INT) AS m_score
        |  FROM cust CROSS JOIN b)
        |SELECT cust, r_days, n_orders, monetary, r_score, f_score, m_score,
        |  concat(CAST(r_score AS VARCHAR), CAST(f_score AS VARCHAR),
        |    CAST(m_score AS VARCHAR)) AS segment
        |FROM s
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST, 8 NULLS FIRST""".stripMargin,
    "q127_iqr_outliers" ->
      """WITH ev AS (
        |  SELECT event_type, value FROM events),
        |f AS (
        |  SELECT event_type,
        |    round(quantile_cont(value, 0.25)
        |      - (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)) * 1.5, 6) AS lo_fence,
        |    round(quantile_cont(value, 0.75)
        |      + (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)) * 1.5, 6) AS hi_fence
        |  FROM ev GROUP BY 1)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN value < lo_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN value > hi_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  min(lo_fence) AS lo_fence, min(hi_fence) AS hi_fence
        |FROM ev JOIN f USING (event_type)
        |GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST, 6 NULLS FIRST""".stripMargin)
}
