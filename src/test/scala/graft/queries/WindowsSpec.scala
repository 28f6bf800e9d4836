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

  test("q113: the 3-sigma flag fires on the spike, nowhere else, and never under-filled frames") {
    val s = 1000000000L
    val dir = tmpDir("q113ev")
    // type "m": constant 10.00 except a 500.00 spike at event 25;
    // type "c": constant everywhere (sigma = 0 must never flag)
    val rows = (1 to 30).map(i =>
      (i.toLong, i * s, "m", if (i == 25) 500.00 else 10.00)) ++
      (1 to 30).map(i => (100L + i, i * s, "c", 7.50))
    rows.toDF("event_id", "ts", "event_type", "value")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    val got = Windows.q113AnomalyZscore(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(6)))
    assert(got.length == 60)
    assert(got.filter(_._3) sameElements Array(("m", 25L, true)),
      "exactly the spike event flags")
    // under-filled frames (first 9 rows of each type) can never flag,
    // even if made degenerate — win_n >= 10 is part of the contract
    assert(got.filter(t => t._2 % 100 <= 9).forall(!_._3))
  }

  test("q114: transition counts and micro-unit probabilities on a crafted sequence") {
    val s = 1000000000L
    val dir = tmpDir("q114ev")
    // user 1: a->b->a; user 2: a->b; user 3: a->c — transitions
    // (a,b):2 (b,a):1 (a,c):1; last event of a user emits nothing
    Seq((1L, 1L, 1 * s, "a"), (1L, 2L, 2 * s, "b"), (1L, 3L, 3 * s, "a"),
      (2L, 4L, 1 * s, "a"), (2L, 5L, 2 * s, "b"),
      (3L, 6L, 1 * s, "a"), (3L, 7L, 2 * s, "c"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    val got = Windows.q114MarkovTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("a", "b", 2L, 666666L), ("a", "c", 1L, 333333L), ("b", "a", 1L, 1000000L)),
      s"got $got")
    // per-source probabilities floor-sum to <= 1e6 by construction
    got.groupBy(_._1).foreach { case (_, ts) => assert(ts.map(_._4).sum <= 1000000L) }
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
