package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import java.sql.Timestamp

/** Behavioral contracts for the segment-analytics operators
  * (SegmentOps). The DuckDB oracles pin exact values at the gate SF;
  * these pin the semantics on crafted fixtures. */
class SegmentOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def writeOrders(dir: String,
      rows: Seq[(Long, Long, Double, String)]): Unit =
    rows.zipWithIndex.map { case ((cust, _, price, date), i) =>
      (i.toLong, cust, "O", price, ts(date), "3-MEDIUM")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")

  test("q122: cohort is the first-order month; offsets and counts are exact") {
    val dir = tmpDir("q122orders")
    writeOrders(dir, Seq(
      (1L, 0L, 10.0, "1995-01-05"), (1L, 0L, 10.0, "1995-01-20"), // m0, 2 orders
      (1L, 0L, 10.0, "1995-02-11"),                               // +1
      (1L, 0L, 10.0, "1995-04-01"),                               // +3
      (2L, 0L, 10.0, "1995-02-25")))                              // own cohort
    val got = SegmentOps.q122RetentionCohort(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      ("1995-01", 0) -> ((1L, 2L)),
      ("1995-01", 1) -> ((1L, 1L)),
      ("1995-01", 3) -> ((1L, 1L)),
      ("1995-02", 0) -> ((1L, 1L))), s"got $got")
  }

  test("q123: five distinct customers score their own quintiles exactly") {
    val dir = tmpDir("q123orders")
    // customer c places c orders of 100·c each, last order c months in:
    // every metric is strictly monotone in c, so scores must equal rank
    // (R inverted: most recent last order = lowest r_days = score 1)
    val rows = for {
      c <- 1L to 5L
      k <- 1L to c
    } yield (c, 0L, 100.0 * c, f"1995-0$c%d-01")
    writeOrders(dir, rows)
    val got = SegmentOps.q123RfmSegments(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))).toMap
    (1 to 5).foreach { c =>
      val (r, f, m, seg) = got(c.toLong)
      assert(f == c && m == c, s"customer $c: expected F=M=$c, got F=$f M=$m")
      assert(r == 6 - c, s"customer $c: expected R=${6 - c}, got $r")
      assert(seg == s"$r$f$m", s"segment must concatenate the scores, got $seg")
    }
  }

  test("q127: a far outlier is fenced high, none low, counts exact") {
    val dir = tmpDir("q127events")
    val base = (1 to 20).map(i => (i.toLong, i.toLong * 1000000000L, 1L,
      "click", 10.0 + (i % 5), "{}"))
    val out = Seq((21L, 21L * 1000000000L, 1L, "click", 1000.0, "{}"))
    (base ++ out).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    val got = SegmentOps.q127IqrOutliers(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "click" && r.getLong(1) == 21L
      && r.getLong(2) == 0L && r.getLong(3) == 1L,
      s"expected 21 events, 0 low, 1 high, got $r")
    assert(r.getDouble(5) < 1000.0 && r.getDouble(4) < r.getDouble(5),
      "fences must bracket the bulk below the outlier")
  }
}
