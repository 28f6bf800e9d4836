package graft.queries

import org.apache.spark.sql.SaveMode

import graft.SparkSpec

/** Funnel-semantics invariants q112's hash oracle can't state on its
  * own: the strictly-after ordering chain, stage/timestamp consistency,
  * and every funnel depth — pinned on a crafted event log (the sf
  * fixture is dense enough that every user converts, so it exercises
  * only stage 3). */
class WindowsSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def runOn(events: Seq[(Long, Long, String)]): Map[Long, (Int, Option[Long], Option[Long], Option[Long])] = {
    // ts written as plain BIGINT nanos — the events() reader treats the
    // column exactly like the driver's TIMESTAMP(NANOS) under
    // nanosAsLong, so the µs floor path is the production path
    val dir = tmpDir("q112ev")
    events.toDF("user_id", "ts", "event_type")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    Windows.q112Funnel(spark, dir).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      r.getLong(0) -> ((r.getInt(1), opt(2), opt(3), opt(4)))
    }.toMap
  }

  test("q112: every funnel depth and the strictly-after edge, on crafted events") {
    val s = 1000000000L // 1 second in nanos
    val got = runOn(Seq(
      (1L, 1 * s, "view"), (1L, 2 * s, "click"), (1L, 3 * s, "purchase"),
      // purchase BEFORE the click chain completes must not count
      (2L, 1 * s, "purchase"), (2L, 2 * s, "view"), (2L, 3 * s, "click"),
      // click before the first view must not count
      (3L, 1 * s, "click"), (3L, 2 * s, "view"),
      (4L, 1 * s, "error"),
      // same-µs click is NOT strictly after the view
      (5L, 5 * s, "view"), (5L, 5 * s, "click")))
    assert(got(1L) == ((3, Some(1000000L), Some(2000000L), Some(3000000L))))
    assert(got(2L) == ((2, Some(2000000L), Some(3000000L), None)),
      "a purchase before the view->click chain must not convert")
    assert(got(3L) == ((1, Some(2000000L), None, None)),
      "a click before the first view must not count")
    assert(got(4L) == ((0, None, None, None)))
    assert(got(5L) == ((1, Some(5000000L), None, None)),
      "same-instant click is not strictly after the view")
  }

  test("q112: ordering chain and stage/null consistency hold on the sf fixture") {
    val rows = Windows.q112Funnel(spark, sf).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      (r.getLong(0), r.getInt(1), opt(2), opt(3), opt(4))
    }
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "one row per user")
    rows.foreach { case (u, stage, tv, tc, tp) =>
      assert(stage == Seq(tv, tc, tp).count(_.isDefined),
        s"user $u: stage $stage disagrees with stamped stages ($tv,$tc,$tp)")
      assert(!(tc.isDefined && tv.isEmpty), s"user $u: click without view")
      assert(!(tp.isDefined && tc.isEmpty), s"user $u: purchase without click")
      for (a <- tv; b <- tc) assert(a < b, s"user $u: click not after view")
      for (a <- tc; b <- tp) assert(a < b, s"user $u: purchase not after click")
    }
  }
}
