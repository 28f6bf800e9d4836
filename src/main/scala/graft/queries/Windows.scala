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

  val defs: Map[String, Q] = Map(
    "q30_window_rank" -> q30Rank,
    "q31_window_analytic" -> q31Analytic,
    "q32_window_range_frame" -> q32RangeFrame,
    "q33_sessionize" -> q33Sessionize)

  val oracles: Map[String, String] = Map(
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
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin)
}
