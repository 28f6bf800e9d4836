package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral contracts for the corpus-composition operators
  * (Composition): BM25 retrieval, the source-overlap matrix, and DSIR
  * importance resampling. The DuckDB oracles pin exact values at the
  * gate SF; these pin the semantic invariants on crafted fixtures —
  * so a fixture regeneration can't silently green a wrong
  * implementation. */
class CompositionSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: String, docs: Seq[(Long, String, String, String)]): Unit =
    docs.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")

  // ---- q171 hybrid RRF ---------------------------------------------------

  test("q171: fused rows are exactly the union of the two arms, rrf terms are the integer formula, ranks re-derive") {
    // self-consistency against the PARENTS on the real fixture: every
    // (query, doc) of q134's top-10 and q82's qid<5 top-5 appears
    // exactly once, rank columns echo the parents' ranks, rrf_e9 is
    // the exact two-term integer sum, and fused_rank is the
    // (rrf DESC, doc_id ASC) ordering — the DuckDB oracle re-derives
    // the same from its own chains, this pins engine-internal wiring
    val sparse = Composition.q134Bm25Retrieval(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2)) -> r.getInt(1)).toMap
    val dense = LlmOps.q82SimilarityTopk(spark, sf).collect()
      .filter(_.getLong(0) < Composition.Bm25QueryCount)
      .map(r => (r.getLong(0).toInt, r.getLong(2)) -> r.getInt(1)).toMap
    val fused = Composition.q171HybridRrf(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getLong(2)),
        (r.getInt(1),
          if (r.isNullAt(3)) None else Some(r.getInt(3)),
          if (r.isNullAt(4)) None else Some(r.getInt(4)),
          r.getLong(5))))
    assert(fused.map(_._1).toSet == sparse.keySet ++ dense.keySet,
      "fused key set is not the union of the arms")
    assert(fused.length == fused.map(_._1).toSet.size, "duplicate fused rows")
    fused.foreach { case (key, (_, rs, rd, rrf)) =>
      assert(rs == sparse.get(key), s"$key sparse rank mismatch")
      assert(rd == dense.get(key), s"$key dense rank mismatch")
      val expect = rs.map(r => 1000000000L / (60L + r)).getOrElse(0L) +
        rd.map(r => 1000000000L / (60L + r)).getOrElse(0L)
      assert(rrf == expect, s"$key rrf $rrf != $expect")
    }
    // fused_rank: contiguous from 1 per query, ordered by (rrf DESC, doc ASC)
    fused.groupBy(_._1._1).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_._2._1)
      assert(byRank.map(_._2._1).toSeq == (1 to rows.length),
        s"query $q fused_rank not contiguous")
      val resorted = rows.sortBy { case ((_, doc), (_, _, _, rrf)) => (-rrf, doc) }
      assert(resorted.map(_._2._1).toSeq == (1 to rows.length),
        s"query $q fused_rank disagrees with (rrf DESC, doc ASC)")
    }
    // both single-arm classes must exist or the full-outer contract is
    // untested at this SF
    assert(fused.exists(f => f._2._2.isEmpty && f._2._3.isDefined),
      "no dense-only docs — fixture makes the outer join vacuous")
    assert(fused.exists(f => f._2._2.isDefined && f._2._3.isEmpty),
      "no sparse-only docs — fixture makes the outer join vacuous")
  }

  // ---- q172 cross-encoder rerank -----------------------------------------

  test("q172: reranks exactly the fused candidate set, and the packed score re-derives from raw text") {
    val fusedKeys = Composition.q171HybridRrf(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2))).toSet
    val rows = Composition.q172RerankCross(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(r => (r._1, r._3)).toSet == fusedKeys,
      "rerank is not a permutation of the fused candidate set")
    assert(rows.length == fusedKeys.size, "duplicate rerank rows")
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.sortBy(_._2).map(_._2).toSeq == (1 to rs.length),
        s"query $q rerank not contiguous from 1")
      val resorted = rs.sortBy(r => (-r._7, r._3))
      assert(resorted.map(_._2).toSeq == (1 to rs.length),
        s"query $q rerank disagrees with (ce_e9 DESC, doc ASC)")
      // coverage dominance — the packing's defining property: a doc
      // matching MORE query terms can never rank below one matching
      // fewer, whatever their proximity/tf
      for (a <- rs; b <- rs if a._6 > b._6)
        assert(a._2 < b._2, s"query $q: doc ${a._3} (n_match ${a._6}) " +
          s"ranked below doc ${b._3} (n_match ${b._6})")
    }
    // independent re-derivation of every packed score from the raw
    // fixture text + the served panel (the oracle re-derives the same
    // in SQL; this pins the engine's column arithmetic in Scala)
    val terms = Composition.QueryPanelTable.of(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(terms.values.forall(_.size == 3), s"panel not 3 terms/query: $terms")
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
      .as[(Long, String)].collect().toMap
    rows.foreach { case (q, _, doc, _, _, nMatch, ce) =>
      val toks = text(doc).split(" ", -1)
      val pos = terms(q).map(tm => toks.indexOf(tm) + 1L) // 1-based, 0 = absent
      val matched = pos.filter(_ > 0)
      val span = if (matched.size >= 2) matched.max - matched.min else 0L
      val tfsum = terms(q).map(tm => toks.count(_ == tm).toLong).sum
      // ALL FOUR packing constants are this spec's own literals (not
      // reads of Composition's vals) — a drifted constant must fail
      // here, not move engine/oracle/spec together
      val expect = matched.size.toLong * 1000000000L +
        (if (matched.size >= 2)
           math.max(0L, 1000L - span) else 0L) * 10000L +
        math.min(tfsum, 9999L)
      assert(nMatch == matched.size.toLong, s"($q,$doc) n_match $nMatch")
      assert(ce == expect, s"($q,$doc) ce_e9 $ce != re-derived $expect")
    }
    // the stage must MOVE something at this SF, or the rerank facet is
    // vacuous (interaction features genuinely reorder RRF's fusion)
    assert(rows.exists(r => r._2 != r._4),
      "rerank equals fused order everywhere — vacuous fixture")
  }

  test("QueryPanelTable: the materialized query panel is row-identical to a fresh qterms derivation") {
    // the artifact-layer pin every MaterializedTable carries (the
    // LabelTable/GateIndexTable/PairTable/BpeTable convention): the
    // parquet round-trip q172 serves from must equal the un-memoized
    // derivation, twice (stability)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    val fresh = rows(Composition.QueryPanelTable.fresh(spark, sf))
    assert(fresh.size == 15, s"panel is not 5 queries x 3 terms: ${fresh.size}")
    assert(rows(Composition.QueryPanelTable.of(spark, sf)) == fresh,
      "materialized panel diverges from a fresh derivation")
    assert(rows(Composition.QueryPanelTable.of(spark, sf)) == fresh,
      "second read diverges — the memo is not stable")
  }

  // ---- q134 BM25 -------------------------------------------------------

  /** 21 docs engineered so the df ranking is fully known: c1..c3 are in
    * every doc (ranks 1–3, excluded from the panel), t01/t02 have df=2
    * (ranks 4–5), t03.. have df=1 — so query 0 is exactly
    * {t01, t02, t03} and the BM25 axioms are observable. */
  private def bm25Fixture(dir: String): Unit = {
    val base = (1 to 19).map { i =>
      (i.toLong, f"t$i%02d z$i%02d c1 c2 c3", "en", "web")
    }
    writeDocs(dir, base ++ Seq(
      (20L, "t01 t01 c1 c2 c3", "en", "web"),  // tf=2, same dl as doc 1
      (21L, "t02 c1 c2 c3", "en", "web")))     // tf=1, SHORTER than doc 2
  }

  test("q134: tf, brevity, and rarity each raise the BM25 score as the axioms say") {
    val dir = tmpDir("q134docs")
    bm25Fixture(dir)
    val rows = Composition.q134Bm25Retrieval(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    val q0 = rows.filter(_._1 == 0).map(r => r._3 -> r._5).toMap
    // tf monotonicity: doc 20 (t01 twice) beats doc 1 (t01 once, same dl)
    assert(q0(20L) > q0(1L), s"tf=2 must outscore tf=1 at equal dl: $q0")
    // length normalization: doc 21 (4 tokens) beats doc 2 (same tf, 5 tokens)
    assert(q0(21L) > q0(2L), s"shorter doc must outscore at equal tf: $q0")
    // idf: doc 3's df=1 term contributes more than doc 2's df=2 term
    assert(q0(3L) > q0(2L), s"rarer term must outscore at equal tf+dl: $q0")
    // ranks are contiguous from 1 and ordered by (score desc, doc_id asc)
    rows.groupBy(_._1).foreach { case (_, qr) =>
      val byRk = qr.sortBy(_._2)
      assert(byRk.map(_._2).toSeq == (1 to byRk.length).toSeq)
      assert(byRk.sliding(2).forall {
        case Array(a, b) => a._5 > b._5 || (a._5 == b._5 && a._3 < b._3)
        case _           => true
      })
    }
  }

  test("q134: a vocabulary smaller than the panel floor yields an empty result, not a crash") {
    val dir = tmpDir("q134tiny")
    writeDocs(dir, Seq((1L, "a b c a b c", "en", "web")))
    assert(Composition.q134Bm25Retrieval(spark, dir).collect().isEmpty)
  }

  test("q134: the sf corpus panel returns 5 full top-10 lists with sane hit counts") {
    val rows = Composition.q134Bm25Retrieval(spark, sf).collect()
    assert(rows.length == 50, s"expected 5 queries x 10, got ${rows.length}")
    val byQ = rows.groupBy(_.getInt(0))
    assert(byQ.keySet == Set(0, 1, 2, 3, 4))
    assert(rows.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 3))
    assert(rows.forall(_.getLong(4) > 0L))
  }

  // ---- q135 source overlap ---------------------------------------------

  test("q135: a mirror source shows full containment; a disjoint one shows zero") {
    val dir = tmpDir("q135docs")
    val shared = "alpha beta gamma delta epsilon zeta"
    writeDocs(dir, Seq(
      (1L, shared, "en", "mirror_a"),
      (2L, shared, "en", "mirror_b"),
      (3L, "one two three four five six", "en", "other")))
    val rows = Composition.q135SourceOverlap(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(rows.size == 3, s"3 sources -> 3 unordered pairs, got $rows")
    val (shA, shB, common, jacc) = rows(("mirror_a", "mirror_b"))
    assert(shA == shB && common == shA && jacc == 1.0,
      s"mirror pair must be identical: $rows")
    assert(rows(("mirror_a", "other"))._3 == 0L)
    assert(rows(("mirror_b", "other"))._4 == 0.0)
  }

  test("q135: the sf matrix is complete and every measure respects its bounds") {
    val rows = Composition.q135SourceOverlap(spark, sf).collect()
    val nSrc = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count().toInt
    assert(rows.length == nSrc * (nSrc - 1) / 2,
      s"expected C($nSrc,2) pairs, got ${rows.length}")
    rows.foreach { r =>
      val (a, b, shA, shB, common, jacc, ca, cb) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7))
      assert(a < b)
      assert(common >= 0 && common <= math.min(shA, shB))
      assert(jacc >= 0.0 && jacc <= 1.0 && ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0)
      // containment dominates jaccard (|A∩B|/|A| >= |A∩B|/|A∪B|)
      assert(ca + 1e-9 >= jacc && cb + 1e-9 >= jacc)
    }
  }

  test("q134: identical documents tie on score and break by doc_id") {
    val dir = tmpDir("q134ties")
    val base = (1 to 19).map { i =>
      (i.toLong, f"t$i%02d z$i%02d c1 c2 c3", "en", "web")
    }
    // doc 30 duplicates doc 3's text exactly: t03's df becomes 2 (tie
    // with t01/t02, broken by term asc -> still rank 6, query 0)
    writeDocs(dir, base :+ (30L, "t03 z03 c1 c2 c3", "en", "web"))
    val q0 = Composition.q134Bm25Retrieval(spark, dir).collect()
      .filter(_.getInt(0) == 0).map(r => (r.getInt(1), r.getLong(2), r.getLong(4)))
    val three = q0.find(_._2 == 3L).get
    val thirty = q0.find(_._2 == 30L).get
    assert(three._3 == thirty._3, s"identical docs must tie: $three vs $thirty")
    assert(three._1 < thirty._1, "ties must break by doc_id ascending")
  }

  test("q135: a single-source corpus yields an empty matrix, not a crash") {
    val dir = tmpDir("q135one")
    writeDocs(dir, Seq(
      (1L, "alpha beta gamma delta epsilon", "en", "only"),
      (2L, "one two three four five", "en", "only")))
    assert(Composition.q135SourceOverlap(spark, dir).collect().isEmpty)
  }

  test("q136: when total mass is under the target, step clamps to 1 and every unit draws") {
    // 5 uniform docs: W = 80 < M = 200, so step = max(W div M, 1) = 1
    // and systematic sampling degenerates to n_picks = w exactly
    val dir = tmpDir("q136small")
    writeDocs(dir, (1L to 5L).map(i => (i, s"tok$i words here", "en", "web")))
    val rows = Composition.q136ImportanceResample(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getLong(6) == r.getLong(4),
      s"step=1 must draw every unit of mass: $r"))
    assert(rows.map(_.getLong(6)).sum == rows.map(_.getLong(4)).sum)
  }

  // ---- q138 memorization span ------------------------------------------

  test("q138: a contiguous splice is memorized, the same tokens scattered are not") {
    // ids chosen by their q94 buckets (computed): 4 → train (74) with
    // its planted copy dropped (bucket(5000004) < 80); 2, 9 → val
    // (87/88). Doc 2 splices train's first 15 tokens verbatim →
    // 8-gram hits at positions 1..8, one run. Doc 9 interleaves the
    // SAME train tokens with novel ones → zero 8-gram hits: the span
    // metric separates verbatim splice from token-level similarity.
    val dir = tmpDir("q138docs")
    val trainText = (1 to 20).map(i => s"w$i").mkString(" ")
    val splice = ((1 to 15).map(i => s"w$i") ++ (1 to 5).map(i => s"x$i")).mkString(" ")
    val scattered = (1 to 10).flatMap(i => Seq(s"w$i", s"y$i")).mkString(" ")
    writeDocs(dir, Seq(
      (4L, trainText, "en", "web"),
      (2L, splice, "en", "web"),
      (9L, scattered, "en", "web")))
    val rows = Composition.q138MemorizationSpan(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(rows.keySet == Set(2L, 9L), s"expected exactly the val docs: $rows")
    assert(rows(2L) == (("val", 13L, 8L, 8L, true)),
      s"splice doc wrong: ${rows(2L)}")
    assert(rows(9L) == (("val", 13L, 0L, 0L, false)),
      s"scattered doc wrong: ${rows(9L)}")
  }

  test("q138: planted leaks are full-span on the sf corpus and runs never exceed their budget") {
    val rows = Composition.q138MemorizationSpan(spark, sf).collect()
    assert(rows.nonEmpty)
    val planted = rows.filter(_.getLong(0) >= 5000000L)
    assert(planted.nonEmpty, "the q133 plant must land eval docs")
    planted.foreach { r =>
      // full-span always; the memorized flag additionally needs the
      // span to reach R — a 9-token original leaves only 2 positions
      assert(r.getLong(4) == r.getLong(2),
        s"a truncated re-ingest is verbatim end-to-end: $r")
    }
    assert(planted.exists(_.getBoolean(5)),
      "at least one planted leak must clear the memorized threshold")
    rows.foreach { r =>
      val (nPos, nHit, maxRun) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(maxRun <= nHit && nHit <= nPos,
        s"run/hit/budget ordering violated: $r")
      assert(r.getBoolean(5) == (maxRun >= Composition.MemoRunMin))
    }
  }

  // ---- q136 importance resampling --------------------------------------

  test("q136: a uniform corpus gets uniform weights and the draw total lands on the step arithmetic") {
    val dir = tmpDir("q136docs")
    // all-English corpus: target LM == raw LM, gain_bits = 0 for every
    // doc, so w = 2^4 = 16 uniformly
    writeDocs(dir, (1L to 40L).map(i => (i, s"tok$i common words here", "en", "web")))
    val rows = Composition.q136ImportanceResample(spark, dir).collect()
    assert(rows.length == 40)
    assert(rows.forall(_.getLong(4) == 16L), "uniform corpus must weigh 16 everywhere")
    val wTotal = 40L * 16L
    val step = math.max(wTotal / Composition.ResampleTarget, 1L)
    val picks = rows.map(_.getLong(6)).sum
    assert(picks == wTotal / step,
      s"systematic draw total must be floor(W/step): $picks vs ${wTotal / step}")
  }

  test("q136: weights clamp to [1, 16384], heavy docs always draw, and the draw is deterministic") {
    val rows = Composition.q136ImportanceResample(spark, sf).collect()
    val again = Composition.q136ImportanceResample(spark, sf).collect()
    assert(rows.toSeq == again.toSeq, "resampling must be bit-deterministic")
    val n = rows.length
    val wTotal = rows.map(_.getLong(4)).sum
    val step = math.max(wTotal / Composition.ResampleTarget, 1L)
    rows.foreach { r =>
      val (gain, w, picks) = (r.getLong(2), r.getLong(4), r.getLong(6))
      assert(w >= 1L && w <= 16384L)
      assert(w == (1L << (math.max(-4L, math.min(10L, gain)) + 4L).toInt))
      assert(picks >= 0L)
      if (w >= step) assert(picks >= 1L, s"span >= step must contain a draw point: w=$w step=$step")
    }
    val total = rows.map(_.getLong(6)).sum
    assert(total == wTotal / step, s"draw total $total != floor(W/step) ${wTotal / step}")
    assert(n > 0 && total >= math.min(Composition.ResampleTarget, n / 2).toLong)
  }

  test("q137: every source gets min(K, its docs) panel rows with the kernel's own priorities") {
    val rows = Composition.q137MinwisePanel(spark, sf).collect()
    val perSource = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = graft.streaming.MinwisePanel.K
    val bySrc = rows.groupBy(_.getString(0))
    assert(bySrc.keySet == perSource.keySet)
    bySrc.foreach { case (src, panel) =>
      assert(panel.length == math.min(k.toLong, perSource(src)),
        s"$src panel size ${panel.length}")
      panel.foreach { r =>
        assert(r.getLong(3) == graft.streaming.MinwisePanel.priority(r.getLong(2)),
          "batch priority must equal the streaming kernel's")
      }
      // the panel really is the bottom-k: every member's priority is
      // <= the rank-k boundary, and ranks are contiguous
      assert(panel.map(_.getInt(1)).sorted.toSeq == (1 to panel.length).toSeq)
    }
  }

  test("q136: the weighted prefix sum is globally consistent across shards") {
    val rows = Composition.q136ImportanceResample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    // within a shard, cum increases by exactly w in doc_id order
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val inOrder = docs.sortBy(_._1)
      inOrder.foldLeft(Option.empty[Long]) { case (prev, (_, _, w, cum)) =>
        prev.foreach(p => assert(cum == p + w, "per-shard prefix must be contiguous"))
        Some(cum)
      }
    }
    // shards tile [1, W] without gaps: the global max equals the sum of
    // all weights and every shard's first cum is its offset + first w
    assert(rows.map(_._4).max == rows.map(_._3).sum)
  }

  // ---- q139 MLM mask ---------------------------------------------------

  private def maskDocs = spark.read.parquet(s"$sf/documents.parquet")

  test("q139: the schedule is reproducible, rate extremes mask nothing/everything, and the checksum is the position sum") {
    val once = Composition.mlmMaskReport(maskDocs, 150L, 0L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
    val again = Composition.mlmMaskReport(maskDocs, 150L, 0L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(once.sameElements(again), "same (rate, epoch) must re-draw identically")
    val none = Composition.mlmMaskReport(maskDocs, 0L, 0L).collect()
    assert(none.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))
    val all = Composition.mlmMaskReport(maskDocs, 1000L, 0L).collect()
    all.foreach { r =>
      val n = r.getLong(2)
      assert(r.getLong(3) == n, "rate 1000 must mask every position")
      assert(r.getLong(4) == n * (n + 1) / 2,
        "possum of a full mask is the triangular number — the checksum really is the position sum")
    }
    // the corpus-wide realized rate lands near the dial (hash uniformity)
    val tot = once.map(_._2).sum.toDouble
    val msk = once.map(_._3).sum.toDouble
    assert(math.abs(msk / tot - 0.15) < 0.01, s"realized rate ${msk / tot}")
  }

  test("q139: bumping the epoch re-draws the mask without moving the realized rate") {
    val e0 = Composition.mlmMaskReport(maskDocs, 150L, 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val e1 = Composition.mlmMaskReport(maskDocs, 150L, 1L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // re-draw: many docs' masked-position sets move (checksum differs)
    val moved = e1.count { case (id, _, _, ps) => e0(id) != ps }
    assert(moved > e1.length / 2, s"epoch bump moved only $moved/${e1.length} docs")
    val tot = e1.map(_._2).sum.toDouble
    assert(math.abs(e1.map(_._3).sum / tot - 0.15) < 0.01,
      "the re-drawn epoch keeps the dialed rate")
  }

  // ---- q141 span corruption --------------------------------------------

  test("q141: span bounds hold, extremes degenerate correctly, and the epoch re-draws") {
    val lenMax = Composition.SpanLenMax
    val rows = Composition.spanMaskReport(maskDocs, 30L, lenMax, 0L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    rows.foreach { case (id, n, spans, corrupt, psum) =>
      // each span covers >= 1 token; the union never exceeds the doc or
      // spans x lenMax
      assert(corrupt >= spans && corrupt <= math.min(n, spans * lenMax),
        s"doc $id: $spans spans, $corrupt corrupted of $n")
      assert((spans == 0) == (corrupt == 0 && psum == 0L))
    }
    // rate 0 -> untouched corpus; rate 1000 -> every position starts a
    // span, so the union is the whole doc and possum is triangular
    assert(Composition.spanMaskReport(maskDocs, 0L, lenMax, 0L).collect()
      .forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))
    Composition.spanMaskReport(maskDocs, 1000L, lenMax, 0L).collect().foreach { r =>
      val n = r.getLong(2)
      assert(r.getLong(3) == n && r.getLong(4) == n &&
        r.getLong(5) == n * (n + 1) / 2)
    }
    // the quadratic scramble's distribution contract (the linear mix
    // failed exactly this: 391/500 zero-span docs from the stride-168
    // orbit): zero-span docs stay near the independent-draw expectation
    val none = rows.count(_._3 == 0L)
    assert(none < rows.length / 2, s"$none/${rows.length} docs drew no span")
    val e1 = Composition.spanMaskReport(maskDocs, 30L, lenMax, 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    val moved = rows.count { case (id, _, _, _, ps) => e1(id) != ps }
    assert(moved > rows.count(_._3 > 0L) / 2,
      s"epoch bump moved only $moved schedules")
  }

  test("q139/q141 keys: doc_ids congruent mod P draw identical schedules — the pre-wrap keeps any BIGINT id exact") {
    // the schedule key wraps doc_id mod P BEFORE the ·100003 multiply,
    // so a near-Long.MaxValue id draws the same mask as its mod-P twin
    // (congruence) instead of riding a silently-wrapped product the
    // oracle engine would reject
    val p = 1000000007L
    val big = Long.MaxValue - 1234567L
    val twin = ((big % p) + p) % p
    val body = Seq.fill(200)("w").mkString(" ")
    val docs = Seq((twin, "en", body), (big, "en", body))
      .toDF("doc_id", "lang", "text")
    val m = Composition.mlmMaskReport(docs, 150L, 0L).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(m(0)._2 == m(1)._2 && m(0)._3 == m(1)._3,
      s"q139 congruence broken: ${m.toSeq}")
    assert(m(0)._2 > 0L, "the fixture must actually mask something")
    val s = Composition.spanMaskReport(docs, 30L, 8L, 0L).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert((s(0)._2, s(0)._3, s(0)._4) == ((s(1)._2, s(1)._3, s(1)._4)),
      s"q141 congruence broken: ${s.toSeq}")
  }

  // ---- q142 source drift -----------------------------------------------

  test("q142: identical content scores zero, half-correlated content scores maximal, a one-half source is NULL") {
    // the test drives the half assignment through the JVM twin of the
    // engine's bucket (KnuthSpec pins them equal), so it can craft
    // content ON each half
    def half(id: Long): Long =
      math.floorMod(graft.streaming.MinwisePanel.priority(id), 2L)
    val ids = (1L to 60L)
    val drifted = (101L to 160L)
    val d0 = drifted.filter(half(_) == 0L)
    val d1 = drifted.filter(half(_) == 1L)
    val lop = (201L to 260L).filter(half(_) == 0L)
    assert(d0.nonEmpty && d1.nonEmpty && lop.nonEmpty, "fixture needs both halves")
    val dir = tmpDir("q142docs")
    writeDocs(dir,
      // stable: every doc identical -> rate vectors equal -> drift 0
      ids.map(id => (id, "a a b", "en", "stable")) ++
        // drifted: vocabulary follows the half -> maximal L1 (2e6 ppm)
        d0.map(id => (id, "x x x", "en", "drifted")) ++
        d1.map(id => (id, "y y y", "en", "drifted")) ++
        // lopsided: docs only in half 0 -> t1 = 0 -> NULL drift
        lop.map(id => (id, "z z", "en", "lopsided")))
    val rows = Composition.q142SourceDrift(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(rows("stable")._4 == Some(0L),
      s"identical halves must score zero drift: ${rows("stable")}")
    assert(rows("drifted")._4 == Some(2000000L),
      s"disjoint half vocabularies must score maximal drift: ${rows("drifted")}")
    val (nt, t0, t1, l1) = rows("lopsided")
    assert(t1 == 0L && l1.isEmpty,
      s"an empty half has undefined rates — NULL, not a number: ${rows("lopsided")}")
    assert(nt == 1L && t0 > 0L)
  }

  test("q142: the sf corpus sits at the sampling-noise floor, TOTAL over sources") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val nSources = d.select("source").distinct().count()
    val rows = Composition.q142SourceDrift(spark, sf).collect()
    assert(rows.length == nSources, "report must be total over sources")
    rows.foreach { r =>
      val l1 = r.getLong(4)
      // bounds: L1 of two prob vectors in ppm is [0, 2e6]; the uniform
      // synthetic corpus has no injected drift, so scores stay well
      // under half the ceiling (they sit near the sqrt(1/n) noise floor)
      assert(l1 >= 0L && l1 < 1000000L, s"${r.getString(0)} drift $l1")
    }
  }

  // ---- q143 epoch allocation -------------------------------------------

  test("q143: the hand-computed waterline — capped prefix, shared waterline, bounded remainder") {
    // tiny capT=8, mid capT=40, big capT=400; cap=4, budget 2500permille
    // of T_total=112 -> B=280. Walk: tiny capped (24<=280), mid capped
    // (80<=272), big uncapped -> waterline (280-48) div 1 = 232
    val dir = tmpDir("q143docs")
    writeDocs(dir, Seq(
      (1L, "a b", "en", "tiny"),
      (2L, Seq.fill(10)("w").mkString(" "), "en", "mid"),
      (3L, Seq.fill(100)("w").mkString(" "), "en", "big")))
    val rows = Composition.epochAllocation(
        spark.read.parquet(s"$dir/documents.parquet"), 2500L, 4L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows("tiny") == ((2L, 8L, 8L, 4000L)), s"${rows("tiny")}")
    assert(rows("mid") == ((10L, 40L, 40L, 4000L)), s"${rows("mid")}")
    assert(rows("big") == ((100L, 400L, 232L, 2320L)), s"${rows("big")}")
  }

  test("q143: all-capped and zero-budget extremes, and the sf corpus invariants") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // budget >= cap x corpus: every source contributes its whole capped
    // mass (10000permille = 10 epochs' worth, cap 4)
    val full = Composition.epochAllocation(docs, 10000L, 4L).collect()
    full.foreach(r => assert(r.getLong(3) == r.getLong(2) &&
      r.getLong(4) == 4000L, s"all-capped violated: $r"))
    // zero budget: nothing allocated, no crash
    Composition.epochAllocation(docs, 0L, 4L).collect()
      .foreach(r => assert(r.getLong(3) == 0L && r.getLong(4) == 0L))
    // default geometry on the sf corpus: allocation never exceeds the
    // cap or the budget; the undistributed remainder is < the number of
    // uncapped sources (the waterline div's floor loss)
    val rows = Composition.epochAllocation(docs, 2500L, 4L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tTotal = rows.map(_._2).sum
    val budget = tTotal * 2500L / 1000L
    val spent = rows.map(_._4).sum
    val nUncapped = rows.count(r => r._4 < r._3)
    rows.foreach { case (s, _, capT, alloc) =>
      assert(alloc <= capT, s"$s over its cap") }
    assert(spent <= budget && (nUncapped == 0 || budget - spent < nUncapped),
      s"spent $spent of $budget with $nUncapped uncapped")
    // capped-prefix property under the walk's order (capT asc, source asc)
    val sorted = rows.sortBy(r => (r._3, r._1))
    val firstUncapped = sorted.indexWhere(r => r._4 < r._3)
    if (firstUncapped >= 0)
      sorted.drop(firstUncapped).foreach(r =>
        assert(r._4 < r._3 || r._3 == sorted(firstUncapped)._3,
          s"capped row after the cut: $r"))
  }

  // ---- q140 curriculum order -------------------------------------------

  test("q140: nine distinct lengths split into exact terciles and ties share a phase") {
    val dir = tmpDir("q140docs")
    writeDocs(dir, (1 to 9).map(i =>
      (i.toLong, Seq.fill(i)("w").mkString(" "), "en", "web")) ++
      // a second language where ALL docs tie on length: everyone is
      // "easy" (zero docs strictly shorter => phase 0)
      (11 to 14).map(i => (i.toLong, "a b c", "de", "web")))
    val rows = Composition.q140CurriculumOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val en = rows.filter(_._2 == "en").sortBy(_._3).map(_._4).toSeq
    assert(en == Seq(0L, 0L, 0L, 1L, 1L, 1L, 2L, 2L, 2L),
      s"9 distinct lengths must tile phases 0/1/2 evenly: $en")
    assert(rows.filter(_._2 == "de").forall(_._4 == 0L),
      "an all-tied language has no one strictly shorter — all phase 0")
    rows.foreach { case (id, _, _, _, prio) =>
      assert(prio == graft.streaming.MinwisePanel.priority(id),
        "prio must be the shared Knuth mix (q137's kernel spelling)")
    }
  }

  test("q140: on the sf corpus phases are per-lang balanced and monotone in length") {
    val rows = Composition.q140CurriculumOrder(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val n = docs.length
      val byPhase = docs.groupBy(_._3).view.mapValues(_.length).toMap
      assert(byPhase.keySet.subsetOf(Set(0L, 1L, 2L)))
      // each phase holds n/3 up to tie-granularity: no phase may exceed
      // a tercile by more than the largest tied length class
      val maxTie = docs.groupBy(_._2).values.map(_.length).max
      byPhase.foreach { case (p, c) =>
        assert(c <= n / 3 + maxTie, s"$lang phase $p holds $c of $n (maxTie $maxTie)")
      }
      // monotone: a longer doc never lands in an earlier phase
      val sorted = docs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 <= b._3, s"$lang: phase must be monotone in dl")
        case _           =>
      }
    }
  }
}
