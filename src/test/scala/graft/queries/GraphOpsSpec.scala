package graft.queries

import org.apache.spark.sql.SaveMode

import graft.SparkSpec

/** PageRank's structural invariants, independent of the oracle mirror:
  * one verdict per graph node, (near-)conserved rank mass, centrality
  * actually tracking connectivity, and genuine iteration. Triangle
  * counting is pinned against a hand-countable graph plus the naive
  * ordered-triple enumeration on the sf fixture. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("q115: per-node triangle participation on a hand-countable graph") {
    val dir = tmpDir("q115li")
    // order 1 buys {1,2,3}, order 2 {1,2,4}, order 3 {4,5}: edges
    // {12,13,23,14,24,45} — triangles (1,2,3) and (1,2,4) only (the
    // 3–4 edge that would close K4 never co-occurs), node 5 edge-only
    Seq((1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 4L),
      (3L, 4L), (3L, 5L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    val got = GraphOps.q115TriangleCount(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 1L), (4L, 1L)),
      s"triangles (1,2,3)+(1,2,4) only, node 5 silent — got $got")
  }

  test("q115: the order-width cap drops pathological wide orders whole") {
    val dir = tmpDir("q115cap")
    // order 1 is a planted catalog-dump pathology: 12 lines → 66 pairs
    // if expanded; order 2 is an honest triangle. Under a cap of 8 the
    // wide order must contribute ZERO pairs (dropped whole, not
    // truncated) while order 2's triangle survives untouched.
    val wide = (1L to 12L).map(p => (1L, 100L + p))
    val tri = Seq((2L, 1L), (2L, 2L), (2L, 3L))
    (wide ++ tri).toDF("l_orderkey", "l_partkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    val got = GraphOps.q115WithWidthCap(8)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L)),
      s"only order 2's triangle may survive a width-8 cap — got $got")
    // and the uncapped default keeps both orders' structure: the wide
    // order is a 12-clique, so its every node sits on C(11,2) = 55
    // triangles and nodes 1..3 additionally keep their small triangle
    val uncapped = GraphOps.q115TriangleCount(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(uncapped(101L) == 55L && uncapped(1L) == 1L,
      s"default cap (64) must admit the 12-wide order — got $uncapped")
  }

  test("q115: compact-forward agrees with the naive a<b<c enumeration on the sf fixture") {
    import org.apache.spark.sql.functions._
    val got = GraphOps.q115TriangleCount(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every triangle contributes exactly 3 participations
    assert(got.values.sum % 3 == 0, "participation total must be divisible by 3")
    // naive ground truth: ordered triples over the undirected edge set
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val e = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v")).distinct()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"), "left_semi")
      .select(explode(array(col("e1.u"), col("e1.v"), col("e2.v"))).as("p"))
      .groupBy("p").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive, "degree-oriented count diverged from the naive enumeration")
  }

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

  test("q111: the above-cap shuffle fallback is row-identical to the broadcast spelling") {
    // maxBroadcastNodes = 0 forces every round's edges⋈state join onto
    // the shuffle path — the 100 TB fallback must be a tested execution
    // path producing bit-identical BIGINT ranks, not a comment
    val bcast = GraphOps.q111WithStrategy(2, maxBroadcastNodes = Long.MaxValue)(spark, sf)
      .collect().toSeq
    val shuffled = GraphOps.q111WithStrategy(2, maxBroadcastNodes = 0L)(spark, sf)
      .collect().toSeq
    assert(bcast == shuffled, "broadcast and shuffle pagerank spellings diverged")
  }

  test("q115: the above-cap shuffle fallback is row-identical to the broadcast spelling") {
    // maxBroadcastArcs = 0 forces both edge⋈adjacency attaches onto
    // shuffle joins — same intersection kernel, two more exchanges,
    // identical triangles
    val bcast = GraphOps.q115WithStrategy(64, maxBroadcastArcs = Long.MaxValue)(spark, sf)
      .collect().toSeq
    val shuffled = GraphOps.q115WithStrategy(64, maxBroadcastArcs = 0L)(spark, sf)
      .collect().toSeq
    assert(bcast == shuffled, "broadcast and shuffle triangle spellings diverged")
  }
}
