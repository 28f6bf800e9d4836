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

  test("q162: the funnel is cumulative-AND per stage; yield is the exact ppm floor") {
    // srcA: 3 docs — one survives everything, one dies at the FIRST
    // gate only (must not resurrect downstream), one dies at the LAST;
    // srcB: 1 doc dies mid-funnel. Counts are checkable by eye.
    val scored = Seq(
      ("srcA", true, true, true, true, true),   // survives all
      ("srcA", false, true, true, true, true),  // dies at repetition
      ("srcA", true, true, true, true, false),  // dies at anonymity
      ("srcB", true, true, false, true, true))  // dies at classifier
      .toDF("source", "keep_rep", "keep_q", "keep_c", "keep_d", "keep_a")
    val got = CorpusAudit.gateFunnel(scored).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      ("srcA", 3L, 2L, 2L, 2L, 2L, 1L, 333333L),
      ("srcB", 1L, 1L, 1L, 0L, 0L, 0L, 0L)),
      s"funnel diverged:\n${got.mkString("\n")}")
  }

  test("q163: hand fills at every ladder level; hierarchical rollup equals the naive cross spelling") {
    // one source, docs in id order with token counts 200, 100, 300,
    // 2200 (a 2200-token doc overruns every L). cum = 0/200/300/600.
    // L=256: packs ⌊cum/256⌋ = 0,0,1,2 → fills [300, 300, 2200]
    // L=512: packs 0,0,0,1 → fills [600, 2200]
    // L=1024/2048: all in pack 0 except the giant at cum 600 → at
    // L=1024 packs 0,0,0,0 → [2800]; L=2048 same [2800]
    def text(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq((1L, "s", text(200)), (2L, "s", text(100)),
      (3L, "s", text(300)), (4L, "s", text(2200)))
      .toDF("doc_id", "source", "text")
    val got = CorpusAudit.packEfficiency(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10)))
      .sortBy(_._1).toSeq
    // (ctx, n_packs, total, capacity, ovf_packs, ovf_toks, slack,
    //  util_ppm, eff_ppm, max, min) — util = (total - ovf) * 1e6 /
    // capacity; eff = (total - ovf) * 1e6 / (capacity + ovf). This
    // fixture IS the round-13 advice case: util saturates at 1e6 on
    // every row (no pack underfills) while 2032/2800 tokens overflow
    // at L=256 — eff is the column that degrades (274285 ppm there)
    assert(got == Seq(
      (256L, 3L, 2800L, 768L, 3L, 2032L, 0L, 1000000L, 274285L, 2200L, 300L),
      (512L, 2L, 2800L, 1024L, 2L, 1776L, 0L, 1000000L, 365714L, 2200L, 600L),
      (1024L, 1L, 2800L, 1024L, 1L, 1776L, 0L, 1000000L, 365714L, 2800L, 2800L),
      (2048L, 1L, 2800L, 2048L, 1L, 752L, 0L, 1000000L, 731428L, 2800L, 2800L)),
      s"pack ladder diverged:\n${got.mkString("\n")}")
    // eff_ppm saturates ONLY at perfect packing: every pack exactly full
    val perfect = Seq((1L, "s", text(256)), (2L, "s", text(256)))
      .toDF("doc_id", "source", "text")
    val eff256 = CorpusAudit.packEfficiency(perfect).collect()
      .map(r => (r.getLong(0), r.getLong(8))).toMap
    assert(eff256(256L) == 1000000L,
      s"perfectly packed L=256 should read 1e6 eff_ppm, got ${eff256(256L)}")
    // the floor-nesting identity on a messier corpus: hierarchical
    // rollup ≡ the naive per-L grouping, for every ladder level
    val docs2 = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", text((i * 37 % 450).toInt + 1)))
      .toDF("doc_id", "source", "text")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val tok = size(split(col("text"), " ")).cast("long")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = coalesce(sum(tok).over(w), lit(0L))
    val withCum = docs2.select(col("source"), tok.as("n_tok"),
      cum.as("cum"))
    val naive = CorpusAudit.PackLens.map { l =>
      withCum.groupBy(col("source"), expr(s"cum div $l").as("pack_id"))
        .agg(sum(col("n_tok")).as("fill"))
        .agg(count(lit(1)), sum(col("fill")),
          sum(when(col("fill") > l, col("fill") - l).otherwise(0L)))
        .collect()(0)
    }.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hier = CorpusAudit.packEfficiency(docs2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
      .sortBy(_._1).toSeq
    hier.zip(naive).foreach { case ((l, np, tot, ovf), (np2, tot2, ovf2)) =>
      assert((np, tot, ovf) == (np2, tot2, ovf2),
        s"hierarchical rollup diverged from naive at L=$l")
    }
  }

  test("q164: per-category counts, any-PII doc count, and the per-Mtok rate on hand docs") {
    // residues chosen so plants are OFF (ids 1, 2, 4): the patterns
    // under test are the ones already in the text. doc 1 (srcX): one
    // email + one phone in 10 tokens; doc 2 (srcX): clean, 5 tokens;
    // doc 4 (srcY): two ids, 8 tokens.
    val docs = Seq(
      (1L, "srcX", "a b c d e f g h x@y.com 555-123-4567"),
      (2L, "srcX", "a b c d e"),
      (4L, "srcY", "a b c d e f 123-45-6789 987-65-4321"))
      .toDF("doc_id", "source", "text")
    val got = CorpusAudit.piiPrevalence(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1).toSeq
    // srcX: 15 tokens, 1 email + 1 phone → floor(2e6/15) = 133333
    // srcY: 8 tokens, 2 ids → 250000
    assert(got == Seq(
      ("srcX", 2L, 1L, 1L, 1L, 0L, 15L, 133333L),
      ("srcY", 1L, 1L, 0L, 0L, 2L, 8L, 250000L)),
      s"pii prevalence diverged:\n${got.mkString("\n")}")
  }
}
