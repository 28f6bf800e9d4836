package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics pins for the aggregate-maintenance layer (the oracled
  * aggregates are covered by the driver's DuckDB gate; these assert the
  * INTERNAL contracts the oracle can't see — partition-independence of
  * the merge and the artifact's memoized ≡ fresh equality). */
class AggregatesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q174: merged(base ∪ delta) is row-identical to the flat full recompute") {
    // the partition-independence contract, asserted engine-side (the
    // DuckDB oracle states the same thing cross-engine): re-aggregate
    // the whole events table flat, with the same exact-decimal
    // arithmetic, and require row identity with the merge path
    val got = Aggregates.q174AggDeltaMerge(spark, sf).collect().map(_.toString)
    val e = events(spark, sf)
    val flat = orderAll(e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(date_trunc("day", col("ts"))).as("n_days"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        (sum(col("value").cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("avg_value")))
      .collect().map(_.toString)
    assert(got.toSeq == flat.toSeq,
      s"merge diverged from flat recompute:\n${got.take(3).mkString("\n")}\nvs\n${flat.take(3).mkString("\n")}")
    assert(got.nonEmpty, "no event types — fixture degenerated")
  }

  test("q174: base artifact is memoized ≡ fresh, and base/delta partition the days exactly") {
    val memo = orderAll(Aggregates.BaseAggTable.of(spark, sf))
      .collect().map(_.toString).toSeq
    val fresh = orderAll(Aggregates.BaseAggTable.fresh(spark, sf))
      .collect().map(_.toString).toSeq
    assert(memo == fresh, "parquet-served base partials diverged from fresh derivation")
    // the boundary: base days all strictly before the delta's min day,
    // and |base| + |delta| covers every (event_type, day) cell exactly
    // once (no overlap, no loss)
    val e = events(spark, sf)
    val allCells = e.select(col("event_type"),
      date_trunc("day", col("ts")).as("day")).distinct().count()
    val baseDf = Aggregates.BaseAggTable.of(spark, sf)
    val baseMax = baseDf.agg(max(col("day"))).collect()(0).getTimestamp(0)
    val deltaMinRow = e.agg(max(date_trunc("day", col("ts"))).as("d"))
      .select((col("d") - expr("INTERVAL 6 DAYS")).as("cut")).collect()(0)
    val cut = deltaMinRow.getTimestamp(0)
    assert(baseMax.before(cut), s"base leaked into the delta window: $baseMax >= $cut")
    val deltaCells = e.filter(col("ts") >= lit(cut))
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .distinct().count()
    assert(baseDf.count() + deltaCells == allCells,
      "base ∪ delta does not partition the (event_type, day) cells")
  }
}
