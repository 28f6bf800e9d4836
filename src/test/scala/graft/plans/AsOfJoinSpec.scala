package graft.plans

import java.sql.Timestamp

import graft.SparkSpec

/** The custom as-of operator against the composed window formulation and
  * hand-built edge cases. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(86400000L + min * 60000L)

  test("native as-of equals the window formulation on events data") {
    val sf = "/root/testdata/sf0.001"
    val native = graft.queries.Joins.q18AsOfNative(spark, sf).collect().map(_.toSeq)
    val window = graft.queries.Joins.q16AsOf(spark, sf).collect().map(_.toSeq)
    assert(native.length == window.length)
    assert(native.toSeq == window.toSeq)
  }

  test("inner as-of drops lefts with no prior right; outer keeps them") {
    val l = Seq((1L, ts(10), "p1"), (1L, ts(0), "p0"), (2L, ts(5), "p2"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, ts(5), "v5"), (1L, ts(9), "v9"), (3L, ts(1), "vx"))
      .toDF("k2", "t2", "rtag")
    val inner = AsOf.join(l, r, "k", "t", "k2", "t2").collect()
    // p1 matches v9 (latest <= t10); p0 has no prior view; user 2 none
    assert(inner.length == 1)
    assert(inner.head.getAs[String]("tag") == "p1")
    assert(inner.head.getAs[String]("rtag") == "v9")

    val outer = AsOf.join(l, r, "k", "t", "k2", "t2", outer = true)
      .orderBy("tag").collect()
    assert(outer.length == 3)
    assert(outer.map(_.getAs[String]("rtag")).toSeq == Seq(null, "v9", null))
  }

  test("exact-time ties match, and the tiebreak picks the largest") {
    val l = Seq((1L, ts(5), "p")).toDF("k", "t", "tag")
    val r = Seq((1L, ts(5), 100L), (1L, ts(5), 200L), (1L, ts(4), 300L))
      .toDF("k2", "t2", "rid")
    val got = AsOf.join(l, r, "k", "t", "k2", "t2",
      rightTieBreak = Some("rid")).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("rid") == 200L)
  }

  test("plan shape: one exchange per side, sorts inserted, no window") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.queries.Joins.q18AsOfNative(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoinExec") || p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), "native path must not fall back to window")
  }
}
