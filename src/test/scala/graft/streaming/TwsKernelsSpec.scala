package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic contracts of the transformWithState transition kernels
  * (s88/s91/s92) — the properties that make their batch/fold oracles
  * valid regardless of how the stream chops into micro-batches. Plain
  * code, no SparkSession (RunningCountersSpec's pattern). */
class TwsKernelsSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  // --- s88: the token meter ------------------------------------------

  test("token meter: admissions form a prefix and the meter is the exact prefix sum") {
    val toks = Gen.listOf(Gen.chooseNum(0L, 5000L))
    val quota = Gen.chooseNum(0L, 50000L)
    check(Prop.forAll(toks, quota) { (ns: List[Long], q: Long) =>
      var m = 0L
      val out = ns.map { n =>
        val (m1, adm) = TokenBudget.step(m, n, q)
        m = m1
        (m1, adm)
      }
      val metersExact = out.map(_._1) == ns.scanLeft(0L)(_ + _).tail
      // once over quota, never admitted again (the meter only grows) —
      // zero-token docs keep the flag at its current value, so the flag
      // sequence is monotone non-increasing
      val flags = out.map(_._2)
      val prefix = flags.zip(flags.drop(1)).forall { case (a, b) => a || !b }
      metersExact && prefix && m == ns.sum
    })
  }

  // --- s91: the funnel fold ------------------------------------------

  private val eventGen: Gen[(String, Long)] = for {
    et <- Gen.oneOf("view", "click", "purchase", "refund")
    t <- Gen.chooseNum(0L, 500L) // small range forces timestamp ties
  } yield (et, t)

  test("funnel fold: stage monotone, times immutable once set, strict ordering invariant") {
    check(Prop.forAll(Gen.listOf(eventGen)) { evs: List[(String, Long)] =>
      def stage(s: (Long, Long, Long)): Int = {
        val (v, c, p) = s
        if (p != FunnelTracker.Unset) 3
        else if (c != FunnelTracker.Unset) 2
        else if (v != FunnelTracker.Unset) 1 else 0
      }
      var s = (FunnelTracker.Unset, FunnelTracker.Unset, FunnelTracker.Unset)
      evs.forall { case (et, t) =>
        val prev = s
        s = FunnelTracker.step(prev, et, t)
        val monotone = stage(s) >= stage(prev)
        val immutable =
          (prev._1 == FunnelTracker.Unset || s._1 == prev._1) &&
            (prev._2 == FunnelTracker.Unset || s._2 == prev._2) &&
            (prev._3 == FunnelTracker.Unset || s._3 == prev._3)
        val strict =
          (s._2 == FunnelTracker.Unset || s._2 > s._1) &&
            (s._3 == FunnelTracker.Unset || s._3 > s._2)
        monotone && immutable && strict
      }
    })
  }

  test("funnel fold: replayed in time order it equals the batch min-plus-strictly-after answer") {
    // the s91 oracle argument as a property: fold ascending == the
    // three-stage min computation q112 performs globally
    val timed = Gen.listOf(for {
      et <- Gen.oneOf("view", "click", "purchase")
      t <- Gen.chooseNum(0L, 60L) // dense ties
      id <- Gen.chooseNum(0L, 1000000L)
    } yield (et, t, id))
    check(Prop.forAll(timed) { evs: List[(String, Long, Long)] =>
      var s = (FunnelTracker.Unset, FunnelTracker.Unset, FunnelTracker.Unset)
      evs.sortBy(e => (e._2, e._3)).foreach { case (et, t, _) =>
        s = FunnelTracker.step(s, et, t)
      }
      def minAfter(et: String, after: Long): Long =
        evs.collect { case (`et`, t, _) if t > after => t }
          .minOption.getOrElse(FunnelTracker.Unset)
      val tv = evs.collect { case ("view", t, _) => t }
        .minOption.getOrElse(FunnelTracker.Unset)
      val tc = if (tv == FunnelTracker.Unset) FunnelTracker.Unset
        else minAfter("click", tv)
      val tp = if (tc == FunnelTracker.Unset) FunnelTracker.Unset
        else minAfter("purchase", tc)
      s == ((tv, tc, tp))
    })
  }

  // --- s92: the recent-dup ring --------------------------------------

  test("dup ring: the ring is exactly the last min(window, seen) arrivals") {
    val fps = Gen.listOf(Gen.chooseNum(0L, 30L)) // small range forces dups
    val win = Gen.chooseNum(1, 8)
    check(Prop.forAll(fps, win) { (ns: List[Long], w: Int) =>
      var r = Vector.empty[Long]
      ns.zipWithIndex.forall { case (fp, i) =>
        val seenBefore = r.contains(fp)
        val (r1, hit) = RecentDupGate.step(r, fp, w)
        r = r1
        // flag == membership in the previous ring, and the ring after
        // step i is the last min(w, i+1) arrivals in order
        hit == seenBefore &&
          r == ns.take(i + 1).takeRight(math.min(w, i + 1)).toVector
      }
    })
  }

  // --- s94: the minwise panel ----------------------------------------

  test("minwise panel: the panel is the bottom-K of the arrival SET under any permutation") {
    // the order-independence that exempts s94 from the ordering
    // contract, as a property: fold forward and fold reversed both land
    // on the k smallest (priority, id) pairs of the distinct arrivals,
    // the panel stays sorted, and the enter/evict event log always nets
    // to the panel
    val idsGen = Gen.listOf(Gen.chooseNum(0L, 100000L))
    val kGen = Gen.chooseNum(1, 8)
    check(Prop.forAll(idsGen, kGen) { (ids: List[Long], k: Int) =>
      def fold(order: List[Long]) =
        order.foldLeft((Vector.empty[(Long, Long)],
            List.empty[(Long, Long, String)])) {
          case ((p, evs), id) =>
            val (p1, e) = MinwisePanel.step(p, id, k)
            (p1, evs ++ e)
        }
      val (fwd, evs) = fold(ids)
      val (rev, _) = fold(ids.reverse)
      val expected = ids.distinct
        .map(id => (MinwisePanel.priority(id), id)).sorted.take(k).toVector
      val netted = evs.foldLeft(Set.empty[(Long, Long)]) {
        case (s, (id, p, "enter")) => s + ((p, id))
        case (s, (id, p, _))       => s - ((p, id))
      }
      fwd == expected && rev == expected &&
        fwd == fwd.sorted && netted == fwd.toSet
    })
  }
}
