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

  val defs: Map[String, Q] = Map(
    "q60_window_tumbling" -> q60Tumbling,
    "q61_window_sliding" -> q61Sliding)

  val oracles: Map[String, String] = Map(
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
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin)
}
