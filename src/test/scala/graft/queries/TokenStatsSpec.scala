package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral contracts for the token-statistics operators (TokenStats).
  * The DuckDB oracles pin exact values at the gate SF; these pin the
  * semantic invariants on crafted fixtures — so a fixture regeneration
  * can't silently green a wrong implementation. */
class TokenStatsSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.map { case (id, text) => (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")

  test("q118: a true collocation outranks a frequent-parts pair") {
    val dir = tmpDir("q118docs")
    // "hong kong" always adjacent (5×); "the cat/dog/..." — 'the' is
    // everywhere, so (the, X) pairs sit near independence
    val filler = (1 to 5).map(i => s"the w$i the x$i the y$i the z$i").mkString(" ")
    writeDocs(dir, Seq(
      (1L, ("hong kong " * 5).trim),
      (2L, filler), (3L, filler), (4L, filler), (5L, filler)))
    val got = TokenStats.q118Collocations(spark, dir)
      .orderBy(col("lift_mic").desc).collect()
    assert(got.nonEmpty)
    val top = got.head
    assert(top.getString(0) == "hong" && top.getString(1) == "kong",
      s"expected (hong, kong) as the top collocation, got $top")
    // support gate: every returned pair has cnt >= 5
    assert(got.forall(_.getLong(2) >= 5L))
  }

  test("q118: lift is exactly 1e6 micro-units under independence") {
    // one token type on both sides: P(xy)=1, P(x)=P(y)=1 — lift 1.0
    val dir = tmpDir("q118ind")
    writeDocs(dir, Seq((1L, ("a " * 9).trim)))
    val got = TokenStats.q118Collocations(spark, dir).collect()
    assert(got.length == 1 && got.head.getLong(3) == 1000000L,
      s"expected exactly 1e6 micro-units, got ${got.toSeq}")
  }

  test("q119: the spectrum partitions the vocabulary exactly") {
    val dir = tmpDir("q119docs")
    // counts: a=1 (bucket 0), b=2, c=3 (bucket 1), d=8 (bucket 3)
    writeDocs(dir, Seq((1L, "a b b c c c d d d d d d d d")))
    val got = TokenStats.q119FreqSpectrum(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 1L, 1L), (1L, 2L, 5L), (3L, 1L, 8L)), s"got $got")
  }

  test("q119: buckets cover all types and tokens on the sf corpus") {
    val rows = TokenStats.q119FreqSpectrum(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val nTypes = toks.distinct().count()
    val nToks = toks.count()
    assert(rows.map(_.getLong(1)).sum == nTypes)
    assert(rows.map(_.getLong(2)).sum == nToks)
  }

  test("q120: shuffled text scores higher than fluent text of the same words") {
    val dir = tmpDir("q120docs")
    // 20 fluent docs establish the model; doc 100 uses the same words in
    // transitions the corpus never repeats
    val fluent = (1L to 20L).map(i => i -> "one two three four five six")
    writeDocs(dir, fluent :+ (100L -> "six one five two four three"))
    val got = TokenStats.q120BigramLm(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(100L) > got(1L),
      s"shuffled doc must out-surprise fluent docs: ${got(100L)} vs ${got(1L)}")
    assert(got(1L) == 0L, // every fluent transition is near-deterministic
      s"fluent transitions should cost ~0 whole bits, got ${got(1L)}")
  }

  test("q120: docs with fewer than two tokens pin to zero, present in output") {
    val dir = tmpDir("q120tiny")
    writeDocs(dir, Seq((1L, "solo"), (2L, ""), (3L, "a b a b")))
    val byId = TokenStats.q120BigramLm(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byId.keySet == Set(1L, 2L, 3L))
    assert(byId(1L) == ((0L, 0L, 0L)) && byId(2L) == ((0L, 0L, 0L)))
    assert(byId(3L)._1 == 3L)
  }

  test("q121: a source-exclusive token tops its source; rank caps at 10") {
    val dir = tmpDir("q121docs")
    val common = ("base " * 20).trim
    Seq(
      (1L, s"$common ${"wiki_only " * 10}".trim, "en", "wiki", 1L),
      (2L, common, "en", "cc", 1L),
      (3L, common, "en", "cc", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val got = TokenStats.q121DistinctiveTerms(spark, dir).collect()
    val wiki = got.filter(_.getString(0) == "wiki")
    assert(wiki.nonEmpty && wiki.minBy(_.getInt(4)).getString(1) == "wiki_only",
      s"wiki's rank-1 term must be its exclusive token: ${wiki.toSeq}")
    assert(got.forall(_.getInt(4) <= 10))
    assert(got.forall(_.getLong(2) >= 10L))
  }

  test("q118/q120/q121: engine answers hash-match the DuckDB-mirror " +
    "arithmetic re-derived in Scala on the sf corpus") {
    // re-derive lift/surprisal sequentially from raw collected tokens —
    // the distributed integer pipeline must agree exactly
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val bigs = docs.flatMap { case (_, text) =>
      val toks = text.split(" ", -1)
      toks.sliding(2).collect {
        case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b) }
    }
    val c = bigs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = c.values.sum
    val cl = c.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cr = c.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val expected = c.filter(_._2 >= 5).map { case ((a, b), n) =>
      (a, b, n, math.min(1000000000000L,
        (BigInt(n) * total * 1000000 / (BigInt(cl(a)) * cr(b))).toLong))
    }.toSeq.sortBy { case (a, b, n, l) => (-l, -n, a, b) }.take(50).toSet
    val got = TokenStats.q118Collocations(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, "q118 disagrees with the sequential re-derivation")
  }

  test("q124: the 500 ppm gate keeps hitters and drops the tail, shares exact") {
    val dir = tmpDir("q124docs")
    // 'a' ×2500 + 'b' ×1: share(a) = 2500e6/2501 = 999600 ppm,
    // share(b) = 1e6/2501 = 399 ppm < 500 → dropped
    writeDocs(dir, Seq((1L, ("a " * 2500).trim + " b")))
    val got = TokenStats.q124HeavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 2500L, 1L, 999600L)), s"got ${got.toSeq}")
  }

  test("q124: doc_freq counts documents, not occurrences") {
    val dir = tmpDir("q124df")
    writeDocs(dir, Seq((1L, "a a a"), (2L, "a b b")))
    val got = TokenStats.q124HeavyHitters(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("a") == ((4L, 2L)) && got("b") == ((2L, 1L)), s"got $got")
  }

  test("q125: target-like documents gain bits over off-target ones") {
    val dir = tmpDir("q125docs")
    // en slice = {x}; doc 3 (fr) is pure-x → more target-like than
    // doc 2 (fr, pure-y, y unseen in the target model)
    Seq((1L, "x x x x", "en"), (2L, "y y y y", "fr"), (3L, "x x x x", "fr"))
      .map { case (id, text, lang) => (id, text, lang, "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val got = TokenStats.q125DsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(got.size == 3, "one weight row per document, total")
    assert(got(3L) > got(2L),
      s"pure-target doc must outscore off-target doc: $got")
    assert(got(2L) < 0, s"a doc of target-unseen tokens must lose bits: $got")
  }

  test("q126: quantized entropy is exact on uniform and degenerate docs") {
    val dir = tmpDir("q126docs")
    writeDocs(dir, Seq(
      (1L, "a b c d"), // 4 types × ct 1: bits = log2(4) = 2 → 2000 mbits
      (2L, "a a a a"), // 1 type: log2(1) = 0 → 0 mbits
      (3L, "a a b b"))) // 2 types × ct 2: log2(2) = 1 → 1000 mbits
    val got = TokenStats.q126TokenEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((4L, 4L, 2000L)),
      2L -> ((4L, 1L, 0L)),
      3L -> ((4L, 2L, 1000L))), s"got $got")
  }

  test("q157: coverage is exact, tie-invariant, and saturates past the vocab size") {
    import spark.implicits._
    // vocab: a×4, b×2, c×2, d×1 — b and c TIE at ct 2: coverage at any
    // budget must not depend on which of them the cut "takes" (the
    // count-of-counts argument that lets the engine skip the global
    // vocab sort); total mass 9
    val docs = Seq((1L, "a a a a b b"), (2L, "c c d")).toDF("doc_id", "text")
    val got = TokenStats.vocabCoverage(spark, docs, Seq(1L, 2L, 3L, 10L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1L, 4L, 9L, 444444L),          // top-1 = a
      (2L, 2L, 6L, 9L, 666666L),          // a + ONE of {b, c} — mass 2 either way
      (3L, 3L, 8L, 9L, 888888L),          // a + both tied types
      (10L, 4L, 9L, 9L, 1000000L)),       // budget past V: full mass, 4 types
      s"coverage curve diverged:\n${got.mkString("\n")}")
  }
}
