package graft.queries

import graft.SparkSpec

/** Behavioral contracts for the corpus-governance audits (CorpusAudit).
  * The DuckDB oracles pin exact values at the gate SF; these pin the
  * semantics on hand graphs small enough to verify by JVM arithmetic. */
class CorpusAuditSpec extends SparkSpec {
  import spark.implicits._

  /** The spec's independent mirror of the package's Knuth split rule —
    * plain JVM longs, no Spark, so an arithmetic slip in the Column
    * spelling cannot hide. */
  private def splitOf(id: Long): String = {
    val b = math.floorMod(id, KnuthP) * KnuthC % KnuthP % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  test("q154: doc-hash leaks exactly the clusters whose members split; cluster-hash leaks none") {
    // hand graph: scan ids until we find a 2-doc cluster whose members'
    // DOC-hash splits differ (the leak the op exists to measure) and
    // one whose members agree — so both leak classes are present and
    // the expected counts are computed independently below
    val leakPair = (1L to 5000L).sliding(2).collectFirst {
      case Seq(a, b) if splitOf(a) != splitOf(b) => (a, b)
    }.get
    val agreePair = (1L to 5000L).sliding(2).collectFirst {
      case Seq(a, b) if splitOf(a) == splitOf(b) => (a, b)
    }.get
    val singles = Seq(9001L, 9002L, 9003L)
    val labels = Seq(
      (leakPair._1, leakPair._1), (leakPair._2, leakPair._1),
      (agreePair._1, agreePair._1), (agreePair._2, agreePair._1))
      .toDF("doc_id", "cluster_id")
    val uniIds =
      Seq(leakPair._1, leakPair._2, agreePair._1, agreePair._2) ++ singles
    val uni = uniIds.toDF("doc_id")
    val got = CorpusAudit.clusterAwareSplit(labels, uni).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq
    // expected, by the JVM mirror: doc-hash splits per id; cluster-hash
    // splits by the cluster min id (singletons hash their own id)
    def counts(split: Long => String) = {
      val assigns = uniIds.map(split)
      (assigns.count(_ == "train").toLong, assigns.count(_ == "val").toLong,
        assigns.count(_ == "test").toLong)
    }
    val clusterOf = Map(leakPair._1 -> leakPair._1, leakPair._2 -> leakPair._1,
      agreePair._1 -> agreePair._1, agreePair._2 -> agreePair._1)
    val (trD, vaD, teD) = counts(id => splitOf(id))
    val (trC, vaC, teC) = counts(id => splitOf(clusterOf.getOrElse(id, id)))
    assert(got == Seq(
      ("cluster_hash", trC, vaC, teC, 2L, 0L),
      ("doc_hash", trD, vaD, teD, 2L, 1L)),
      s"split-leakage audit diverged:\n${got.mkString("\n")}")
  }

  test("q155: drops attribute to the source of the shorter member; clean sources report zero") {
    // cluster 1: doc 1 (srcA, 5 toks, kept — longest) + doc 2 (srcB,
    // 3 toks, dropped); doc 3 (srcA) is unclustered
    val labels = Seq((1L, 1L, 2L), (2L, 1L, 2L))
      .toDF("doc_id", "cluster_id", "cluster_size")
    val uni = Seq((1L, "srcA", 5L), (2L, "srcB", 3L), (3L, "srcA", 4L))
      .toDF("doc_id", "source", "n_toks")
    val got = CorpusAudit.dupBySource(labels, uni).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      ("srcA", 2L, 1L, 0L, 0L, 0.0),
      ("srcB", 1L, 1L, 1L, 3L, 1.0)),
      s"dup attribution diverged:\n${got.mkString("\n")}")
  }

  test("q159: TV distance is the exact cross-multiplied rational, disjoint splits measure exactly 1") {
    // hand corpus: train = d1 [a a b] (N=3), val = d2 [a c] (N=2),
    // test = d3 [b] (N=1). By hand:
    //   TV(tr,va) = (|2·2−1·3| + |1·2−0| + |0−1·3|) / (2·3·2) = 6/12 → 500000
    //   TV(tr,te) = (|2·1−0| + |1·1−1·3| + 0) / (2·3·1) = 4/6 → 666666 (floor)
    //   TV(va,te): disjoint type sets except none shared → 4/4 = 1 → 1000000
    val toks = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "c"),
      (3L, "b")).toDF("doc_id", "tok")
    val asg = Seq((1L, "train"), (2L, "val"), (3L, "test"))
      .toDF("doc_id", "split")
    val got = CorpusAudit.splitBalance(toks, asg).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      ("train", "test", 3L, 1L, 2L, 1L, 1L, 666666L),
      ("train", "val", 3L, 2L, 2L, 2L, 1L, 500000L),
      ("val", "test", 2L, 1L, 2L, 1L, 0L, 1000000L)),
      s"TV audit diverged:\n${got.mkString("\n")}")
  }

  test("q160: the ladder counts classes and docs below each k; ppm is the exact floor") {
    // class sizes [1, 3, 7] (11 docs): k=2 → 1 class / 1 doc at risk
    // (ppm floor(1e6/11) = 90909); k=5 → 2 classes / 4 docs (363636)
    val classes = Seq(("en", "web", 0L, 1L), ("en", "web", 1L, 3L),
      ("de", "book", 0L, 7L))
      .toDF("lang", "source", "len_band", "class_size")
    val got = CorpusAudit.anonymityAudit(classes, Seq(2L, 5L).toDF("k"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (2L, 3L, 11L, 1L, 1L, 90909L, 1L, 7L),
      (5L, 3L, 11L, 2L, 4L, 363636L, 1L, 7L)),
      s"anonymity ladder diverged:\n${got.mkString("\n")}")
  }

  test("q161/QiGate: unseen classes suppress (size 0), the k compare is >=") {
    val classes = Seq(("en", "web", 2L, 5L), ("de", "book", 1L, 4L))
      .toDF("lang", "source", "len_band", "class_size")
    val docs = Seq(
      (1L, "en", "web", 250L), // class size 5 ≥ 5 → admit
      (2L, "de", "book", 150L), // class size 4 < 5 → suppress
      (3L, "fr", "news", 10L)) // unseen class → size 0, suppress
      .toDF("doc_id", "lang", "source", "n_chars")
    val got = graft.streaming.QiGate.gate(docs, classes, 5L).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getBoolean(5)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 5L, true), (2L, 4L, false), (3L, 0L, false)),
      s"QI gate diverged:\n${got.mkString("\n")}")
  }
}
