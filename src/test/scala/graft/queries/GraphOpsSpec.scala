package graft.queries

import graft.SparkSpec

/** PageRank's structural invariants, independent of the oracle mirror:
  * one verdict per graph node, (near-)conserved rank mass, centrality
  * actually tracking connectivity, and genuine iteration. */
class GraphOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q111: rank mass conserves, degree drives centrality, iteration moves ranks") {
    def run(rounds: Int): Seq[(String, Long, Long, Long)] =
      GraphOps.q111WithRounds(rounds)(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val r2 = run(2)
    assert(r2.nonEmpty && r2.forall(_._4 > 0), "every graph node holds positive rank")
    assert(r2.map(t => (t._1, t._2)).distinct.size == r2.size, "one row per node")
    // micro-unit mass: seeded at 1e6, each round loses only floor dust
    // (≤ 1 micro-unit per division) plus the 15/85 split's rounding
    val mass = r2.map(_._4).sum
    assert(mass <= 1000001L && mass >= 900000L,
      s"rank mass $mass strayed from the seeded 1e6 micro-units")
    // connectivity drives rank: the best-connected decile must out-rank
    // the least-connected decile on average (PageRank's defining
    // monotonicity on this symmetric graph)
    val byDeg = r2.sortBy(_._3)
    val k = math.max(1, r2.size / 10)
    val lo = byDeg.take(k).map(_._4.toDouble).sum / k
    val hi = byDeg.takeRight(k).map(_._4.toDouble).sum / k
    assert(hi > lo,
      s"top-degree decile rank $hi not above bottom decile $lo")
    // the loop is real: a second round moves at least one node's rank
    val r1 = run(1).map(t => (t._1, t._2) -> t._4).toMap
    assert(r2.exists(t => r1((t._1, t._2)) != t._4),
      "round 2 changed nothing — the iteration is not iterating")
  }
}
