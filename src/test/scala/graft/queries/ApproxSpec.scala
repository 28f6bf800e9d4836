package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Accuracy bounds for the no-oracle approximate aggregates: the
  * sketches must land near their exact counterparts, or they are not
  * useful as the documented 100 TB alternatives. */
class ApproxSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("q28 approx percentiles land within 2% of the exact percentiles") {
    val approx = Aggregates.q28ApproxPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val exact = t(spark, sf, "lineitem").groupBy(col("l_returnflag")).agg(
      expr("percentile(l_extendedprice, 0.5)").as("p50"),
      expr("percentile(l_extendedprice, 0.95)").as("p95")).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    exact.foreach { case (flag, (p50, p95)) =>
      val (a50, a95) = approx(flag)
      assert(math.abs(a50 - p50) / p50 < 0.02, s"$flag p50: $a50 vs $p50")
      assert(math.abs(a95 - p95) / p95 < 0.02, s"$flag p95: $a95 vs $p95")
    }
  }

  test("q106: hour-sketch union tracks the direct day sketch, and within 5% of exact") {
    // property 1 — the rollup's soundness: the union SKETCH is lossless
    // (HLL register-wise max is associative/order-independent), but the
    // ESTIMATES can differ within estimator error — a directly-built
    // DataSketches HLL serves the HIP estimator while a union result
    // must serve the composite estimator. At this SF's per-day
    // cardinality the sketches sit in the sparse/list regime where both
    // estimators are exact, so the 5% bound is loose here — but the
    // bound, not equality, is the claim that survives any SF (the
    // round-11 bench gate tripped an exact-equality spelling at sf0.1:
    // 0.3% apart, both estimates within 1.5% of exact). The bench
    // re-asserts this bound at its own SF every round (Bench.approxBounds).
    val ev = events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
    val direct = ev.groupBy(col("day"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rolled = Aggregates.q106HllRollup(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rolled.nonEmpty)
    rolled.foreach { case (day, nHours, est) =>
      assert(nHours >= 1 && nHours <= 24, s"$day: $nHours hourly buckets")
      val d = direct(day)
      assert(math.abs(est - d).toDouble / d < 0.05,
        s"$day: union-of-hours $est vs direct day sketch $d — rollup unsound")
    }
    // property 2 — the estimate is usable: within 5% of exact distinct
    val exact = ev.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rolled.foreach { case (day, _, est) =>
      val n = exact(day)
      assert(math.abs(est - n).toDouble / n < 0.05, s"$day: rollup $est vs exact $n")
    }
  }

  test("q25 approx distinct lands within 5% of the exact counts") {
    val approx = Aggregates.q25ApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = t(spark, sf, "lineitem").groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, n) =>
      assert(math.abs(approx(flag) - n).toDouble / n < 0.05,
        s"$flag: approx ${approx(flag)} vs exact $n")
    }
  }
}
