package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] LLM-training-data pipeline operators (BASELINE.json north_star):
  * deduplication (exact, MinHash-LSH, n-gram Jaccard, SimHash), similarity
  * search (brute-force cosine baseline + LSH-bucketed scale path), and the
  * text-analysis battery. All run over the documents/embeddings tables.
  *
  * 100 TB posture:
  *  - exact dedup is a hash groupBy (one shuffle on the normalized text —
  *    at scale, on a 128-bit digest of it);
  *  - near-dup paths (LSH/shingle inverted index) are candidate-pair
  *    generators: the join key is the bucket/shingle, never a cross join;
  *  - brute-force cosine exists as the small-query-set baseline (the
  *    query side is broadcast); the IVF/SRP-bucketed variant is the
  *    path that scales to corpus×corpus;
  *  - every score/ratio is computed with formulas written identically in
  *    the DuckDB oracles, rounded to 6 dp where doubles are involved.
  */
object LlmOps {

  import graft.core.SketchGeometry

  /** Sketch geometry, env-backed (the reference's own config idiom,
    * `settings.py:1-20`): defaults are the sf0.001–0.1 values every
    * CORRECTNESS run uses; a 100× corpus re-tunes via env
    * (GRAFT_SRP_BITS etc.), not a recompile. Scaling derivations live on
    * [[graft.core.SketchGeometry]] and at each use site. */
  private[graft] val geom: SketchGeometry = SketchGeometry.fromEnv()

  /** Candidate pairs from an LSH band table `(doc_id, band)` — shared by
    * q81 (MinHash bands) and q89 (SimHash bands). Two properties carry
    * the 100 TB posture:
    *
    *  - the self-join shuffles (doc_id, band) rows only, never
    *    signatures or bodies (verification re-joins those by id);
    *  - bands hotter than `cap` are dropped before the join: a band with
    *    occupancy b yields b²/2 pairs, and on boilerplate-heavy corpora
    *    hot bands carry no discriminative signal — the same Σ df²
    *    argument as q88's shingle df-cap. The occupancy aggregation is
    *    map-side combinable and keyed on `band`, the same key as the
    *    join, so the hash partitioning is computed once and reused. */
  private[graft] def bandCandidates(bands: DataFrame, cap: Int): DataFrame = {
    val ok = bands.groupBy("band").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= cap)
      .select("band")
    val b = bands.join(ok, Seq("band"))
    b.as("x").join(b.as("y"), Seq("band"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .dropDuplicates("d1", "d2")
  }

  /** Documents unioned with a deterministic "re-ingestion" copy: exact
    * duplicates for q80. */
  private def docsWithDups(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000))
  }

  /** Documents unioned with a mutated copy (last token dropped, id+1e6):
    * guaranteed near-duplicates for q88/q89. */
  private[queries] def docsWithNearDups(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val toks = split(col("text"), " ")
    val mutated = d
      .withColumn("doc_id", col("doc_id") + 1000000)
      .withColumn("text", array_join(slice(toks, lit(1), size(toks) - 1), " "))
    d.unionByName(mutated)
  }

  /** q80: exact dedup — group by a digest of the normalized text, keep
    * min doc_id (the deterministic alternative to dropDuplicates, which
    * keeps an arbitrary row). The shuffle key is (xxhash64(norm),
    * length(norm)) — ~12 bytes/row — NOT the document body: the digest
    * builds the same groups as the text (a false merge needs equal hash
    * AND equal length, ~2^-64 per pair), and at 100 TB it is the
    * difference between shuffling the corpus and shuffling a fingerprint
    * table. The oracle groups by the text itself; outputs are
    * identical. */
  val q80DedupExact: Q = (spark, dir) => {
    val d = docsWithDups(spark, dir)
    val norm = lower(trim(col("text")))
    orderAll(d
      .select(col("doc_id"), xxhash64(norm).as("h"), length(norm).as("text_len"))
      .groupBy(col("h"), col("text_len"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("text_len")))
  }

  /** q81: MinHash + LSH near-dup detection, the classic
    * shingle → minhash signature → band → bucket-join pipeline:
    *
    *   1. 3-token shingles per doc (shingling is load-bearing: unigram
    *      token sets over a small vocabulary are near-identical, every
    *      minhash collides, and LSH degenerates to an all-pairs join —
    *      spark.ml's MinHashLSH.approxSimilarityJoin showed exactly that,
    *      plus ~30 s of join overhead even shingled, vs ~3 s here);
    *   2. k=12 minhashes per doc — entirely in codegen'd expressions:
    *      hash family h is `hash(h, shingle)` (Spark's murmur3 chained
    *      from the family id), min'd per doc with array_min∘transform —
    *      no typed map, no JVM object churn, stays in WholeStageCodegen
    *      (the typed-map formulation this replaced cost an
    *      encode/decode of every token seq);
    *   3. 4 bands × 3 rows — docs agreeing on ALL 3 hashes of any band
    *      become candidates (band value is the join key: candidate
    *      generation is a bucket join, never cross);
    *   4. exact Jaccard verification on the candidate pairs only.
    *
    * At 100 TB this shape holds: signatures are ~48 bytes/doc, the band
    * join shuffles doc-id+band rows, and verification touches only
    * candidates.
    *
    * FULLY ORACLED even though the LSH internals are engine-local: the
    * final stage is exact-Jaccard ≥ 0.5 on candidates, and the 4×3
    * banding's candidate recall on this corpus's j ≥ 0.5 pairs is
    * exactly 1 (measured: engine output ≡ the all-pairs exact-Jaccard
    * set, 600/600 at sf0.01 — P(band miss) = (1-j³)⁴ ≈ 5.7e-5 at the
    * planted pairs' j ≈ 0.97, and the natural dup pairs are exact-text
    * copies at j = 1). The DuckDB oracle computes the same verified set
    * from first principles (distinct string shingles, exact Jaccard);
    * hashing shingles (xxhash64 here, strings there) is
    * Jaccard-invariant modulo a ~2e-11 collision, q88's argument.
    * Contrast q89, where the same recipe is measurably unsound.
    *
    * The recall-1 property is an sf0.01 (gate-SF) measurement, not a
    * theorem: at sf0.001 the fixture contains one true pair at
    * j = 0.778 — docs 33 and 1000436 — whose band-miss probability
    * (1-j³)⁴ ≈ 8% comes up a miss, so a LOCAL sf0.001 oracle check
    * shows 611/612. Deterministic (minhash has no RNG), fixture-bound,
    * and absent at the SF the driver verifies; noted so it is not
    * mistaken for a regression. */
  /** q81 minus the dump ordering — consumers that feed the pair list
    * into further distributed work (q68's components loop) use this so
    * the oracle-dump global sort isn't paid inside their pipelines
    * (Catalyst can't eliminate it across a checkpoint boundary). */
  private[queries] def q81Pairs(spark: SparkSession, dir: String): DataFrame = {
    val NumHashes = geom.minhashK
    val RowsPerBand = geom.minhashRowsPerBand
    val toks = split(col("text"), " ")
    val docs = docsWithNearDups(spark, dir)
      .withColumn("toks", toks)
      .filter(size(col("toks")) >= 3)
    // persisted: three consumers below (band explode + two verify joins)
    // would otherwise each recompute shingling + 12 minhash passes from
    // the scan — Spark reuses exchanges, not arbitrary subtrees
    graft.functions.MinHashSignature.register(spark)
    // shingle = 64-bit xxhash of the 3 tokens (equality is all minhash
    // and Jaccard need — skips string building, and the verify-join
    // arrays below are long[] instead of string[]); the k signature
    // minima come from the native minhash_sig kernel — one codegen'd
    // pass over the shingle array instead of k array_min∘transform
    // trees (k walks + k intermediate arrays per row).
    // Persist lifetime (here and in q88/q89/q91/q92): every cache goes
    // through CacheScope — alive across this query's consumers, drained
    // by the harness (Bench/Verify) once the query's action completes,
    // so a session running the whole surface never accumulates entries.
    // The cached frames are fingerprint-sized (KBs–MBs), not corpus-sized.
    val sigs = docs.select(col("doc_id"),
      array_distinct(transform(sequence(lit(1), size(col("toks")) - 2),
        i => xxhash64(
          element_at(col("toks"), i),
          element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2)))).as("shingles"))
      .withColumn("sig", expr(s"minhash_sig(shingles, $NumHashes)"))
      .scopedPersist
    // band rows carry ONLY (doc_id, band): shuffling the shingle arrays
    // through the candidate join would move ~the whole corpus per band —
    // verification re-joins the arrays by id instead (broadcast-able
    // candidate list at any scale where near-dup pairs << corpus)
    val bands = sigs.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(NumHashes / RowsPerBand - 1)),
        b => concat_ws(":", b +: (0 until RowsPerBand).map(r =>
          element_at(col("sig"), b * RowsPerBand + r + 1)): _*)))
        .as("band"))
    val cands = bandCandidates(bands, geom.bandOccupancyCap)
    val verified = cands
      .join(sigs.select(col("doc_id").as("d1"), col("shingles").as("sh1")), Seq("d1"))
      .join(sigs.select(col("doc_id").as("d2"), col("shingles").as("sh2")), Seq("d2"))
      .withColumn("common",
        size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jacc", round(col("common").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("common")), 6))
      .filter(col("jacc") >= 0.5)
    verified.select(col("d1"), col("d2"), col("jacc"))
  }

  val q81DedupMinhash: Q = (spark, dir) => orderAll(q81Pairs(spark, dir))

  /** Codegen'd cosine kernel (graft.functions.CosineSimilarity) — same
    * sequential fold as the HOF formulation, but inside WholeStageCodegen. */
  private def cosine(a: String, b: String) = expr(s"cosine_sim($a, $b)")

  /** q82: brute-force cosine top-k — the correctness baseline. The query
    * set (10 vectors) is broadcast against the corpus; at 100 TB the
    * corpus side stays partitioned and only top-k per query survives the
    * final shuffle (q91 is the bucketed scale path). */
  val q82SimilarityTopk: Q = (spark, dir) => {
    graft.functions.CosineSimilarity.register(spark)
    val v = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val queries = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val scored = v.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(cosine("qe", "e"), 6).as("cos6"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos6").desc, col("nid").asc)
    orderAll(scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk"), col("nid"), col("cos6")))
  }

  /** q83: corpus stats per (lang, source) — pure relational. */
  val q83TextStats: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")))
    orderAll(d.groupBy(col("lang"), col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("sum_chars"),
      round(sum(col("n_tok")).cast("double") / count(lit(1)), 6).as("avg_tok"),
      max(col("n_chars")).as("max_chars")))
  }

  private val stopwords = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "de", "et"))

  private def stopScore(lang: String) = {
    val toks = split(col("text"), " ")
    size(filter(toks, tk => tk.isInCollection(stopwords(lang))))
  }

  /** q84's per-language stopword hit counts as named columns — factored
    * so q150's per-language encode report scores a document's language
    * with the SAME spelling q84's oracle certifies (the qualityExpr
    * convention: one expression, no drift between its consumers). */
  private[graft] def langScoredCols: Seq[org.apache.spark.sql.Column] =
    Seq(stopScore("en").as("s_en"), stopScore("es").as("s_es"),
      stopScore("de").as("s_de"), stopScore("fr").as("s_fr"))

  /** The argmax over materialized s_en..s_fr score columns, fixed
    * priority order (en>es>de>fr, else und) — q84's decision rule. Run
    * it over a projection that already bound [[langScoredCols]]: the
    * scores are referenced up to five times, and attributes are free
    * where re-running the stopword filters is not. */
  private[graft] def langPredFromScores: org.apache.spark.sql.Column = {
    val top = greatest(col("s_en"), col("s_es"), col("s_de"), col("s_fr"))
    when(top === 0, lit("und"))
      .when(col("s_en") === top, lit("en"))
      .when(col("s_es") === top, lit("es"))
      .when(col("s_de") === top, lit("de"))
      .otherwise(lit("fr"))
  }

  /** q84: language-ID heuristic — per-language stopword hit counts,
    * argmax with a fixed priority order (en>es>de>fr, else und). */
  val q84LangId: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val scored = d.select(
      col("doc_id") +: col("lang").as("lang_true") +: langScoredCols: _*)
    orderAll(scored.withColumn("lang_pred", langPredFromScores))
  }

  /** The q85 quality score (rounded 6 dp) over a `text` column —
    * factored out because it is also the grading function of the s81
    * streaming drift monitor and its q49 batch mirror, so stream and
    * batch grade a document identically by construction. */
  private[graft] def qualityExpr: org.apache.spark.sql.Column = {
    val nTok = size(split(col("text"), " "))
    val punct = length(col("text")) - length(regexp_replace(col("text"), "[.!?,;]", ""))
    // Total contract (round-8 advice): an empty/whitespace-only document
    // scores its ratios as 0 rather than NULL (Spark's non-ANSI x/0) vs
    // NaN/inf (DuckDB's IEEE float division) — without the guards the
    // q49/q85 hash gates diverge on any corpus containing empty docs.
    // nTok can't be 0 on non-null text (split('') = ['']) but is guarded
    // to the same convention so the contract doesn't lean on split
    // semantics. Oracles mirror via coalesce(x / nullif(d, 0), 0).
    val stopR = when(nTok > 0, stopScore("en").cast("double") / nTok).otherwise(lit(0.0))
    val lenR = least(lit(1.0), nTok.cast("double") / 100.0)
    val punctR = when(length(col("text")) > 0,
      punct.cast("double") / length(col("text"))).otherwise(lit(0.0))
    round(lit(0.4) * stopR + lit(0.3) * lenR + lit(0.3) * (lit(1.0) - punctR), 6)
  }

  /** q85: quality scoring — length/punctuation/stopword ratios combined
    * into one bounded score (the classic pre-training filter shape). */
  val q85QualityScore: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val nTok = size(split(col("text"), " "))
    val punct = length(col("text")) - length(regexp_replace(col("text"), "[.!?,;]", ""))
    val stopR = when(nTok > 0, stopScore("en").cast("double") / nTok).otherwise(lit(0.0))
    orderAll(d.select(
      col("doc_id"),
      nTok.as("n_tok"),
      punct.as("n_punct"),
      round(stopR, 6).as("stop_ratio"),
      qualityExpr.as("quality")))
  }

  /** q147's hashed-feature geometry: bucket count of the hashing-trick
    * featurizer and the weight table derived per bucket. The weights
    * are a FIXED deterministic stand-in for trained logistic-regression
    * weights (knuthMix2-scrambled into [-10, 10] — per-BUCKET draws, so
    * the quadratic scramble per the q139/q141 coset rule): what the
    * engine owns is the classifier SURFACE — featurize, integer dot
    * product, thresholded verdict — and swapping in weights a training
    * job produced is a data change, not a code change (the multimodal
    * StubDecoder argument). Derivation is engine-portable integer
    * arithmetic, so the oracle re-derives the same table in SQL and
    * KnuthSpec pins the JVM / Column / SQL spellings equal. */
  private[graft] val QcBuckets = 64
  private[graft] lazy val QcWeights: IndexedSeq[Long] =
    (0 until QcBuckets).map(b => knuthMix2Jvm(b.toLong) % 21 - 10)

  /** q147 [EXT]: model-based quality filtering — the GPT-3/LLaMA/
    * FineWeb-style LEARNED classifier gate, the one canonical curation
    * stage the heuristic (q85), repetition (q64), LM-perplexity
    * (q117/q120), and DSIR (q125) family did not cover: documents are
    * featurized by the hashing trick (token → [[QcBuckets]]-bucket
    * hash over q87's portable token code), scored by an exact-BIGINT
    * dot product against a fixed weight table ([[QcWeights]], shipped
    * as a literal — the broadcast posture), and gated by
    * `score ≥ 0`. Output is TOTAL (q103's gate contract): every doc
    * carries its token count, score, and verdict — the rewrite is one
    * `filter(keep)` and the drop audit is the same frame.
    *
    * 100 TB: scoring is ROW-LOCAL map work — one documents scan, the
    * weight table folded into the expression (a production 2^20-bucket
    * table is an ~8 MB broadcast array), zero shuffles beyond the dump
    * sort (PlanSpec pins it). No explode: the per-token walk is one
    * codegen'd aggregate over the token array, so the (doc, token)
    * pair stream never materializes, let alone moves. FULLY ORACLED:
    * featurization, weight derivation, and sum are engine-portable
    * integer arithmetic (q70's no-libm argument) — DuckDB re-derives
    * the weight table from the same scramble and folds the same sum.
    * The scoring projection lives in
    * [[graft.streaming.ClassifierGate]] (the s82/s85/s93 shared
    * batch/stream code-object convention) so the s95 ingest-time gate
    * runs the IDENTICAL expression this oracle certifies. */
  val q147QualityClassifier: Q = (spark, dir) =>
    orderAll(graft.streaming.ClassifierGate.gate(t(spark, dir, "documents")))

  /** q152 [EXT]: filter-agreement matrix — the calibration table a
    * pipeline builds before swapping its heuristic quality gate for a
    * model-based one (the FineWeb methodology: compare the rule-based
    * filter and the classifier on the SAME corpus and read where they
    * disagree): bucket every document by (heuristic verdict, classifier
    * verdict) and report each cell's size and mean scores. The
    * off-diagonal cells ARE the decision: docs the heuristic keeps but
    * the classifier rejects (and vice versa) are exactly what a human
    * audits before the cutover. Heuristic verdict = q85's qualityExpr
    * ≥ 0.5 (the fixture median — splits ~47/53); classifier verdict =
    * q147's score ≥ 0, via the SAME [[graft.streaming.ClassifierGate]]
    * expression the s95 ingest gate runs.
    *
    * 100 TB: both scores are row-local folds computed in ONE scan
    * projection (no join stitches them — scoreExpr composes into the
    * same select), and the rollup is a ≤4-group hash aggregate whose
    * partial side collapses each partition to ≤4 rows. Mean quality
    * sums through DECIMAL(18,6) (exact, order-independent — a naive
    * double sum would make the 6-dp round racy across partition
    * orders); mean score sums exact BIGINTs. FULLY ORACLED: composes
    * q85's quality CTE with q147's re-derived weight fold. */
  val q152FilterAgreement: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val score = graft.streaming.ClassifierGate.scoreExpr
    val scored = d.select(qualityExpr.as("quality"), score.as("score"))
    val flagged = scored.select(col("quality"), col("score"),
      (col("quality") >= 0.5).as("keep_heuristic"),
      (col("score") >= 0L).as("keep_classifier"))
    val agg = flagged.groupBy("keep_heuristic", "keep_classifier").agg(
      count(lit(1)).as("n_docs"),
      sum(col("quality").cast("decimal(18,6)")).as("sq"),
      sum(col("score")).as("ss"))
    orderAll(agg.select(col("keep_heuristic"), col("keep_classifier"),
      col("n_docs"),
      round(col("sq").cast("double") / col("n_docs"), 6).as("avg_quality"),
      round(col("ss").cast("double") / col("n_docs"), 6).as("avg_score")))
  }

  /** q86: token counting — whitespace tokens, regex (BPE-ish word/number
    * pieces), and the chars/4 subword estimate. */
  val q86TokenCount: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    orderAll(d.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]+")).as("re_tokens"),
      ceil(length(col("text")).cast("double") / 4.0).cast("long").as("subword_est")))
  }

  /** q87: document fingerprint — polynomial rolling hash over tokens
    * (mod 1e9+7), engine-portable because the per-token value uses only
    * length/first-char arithmetic, not a library hash. */
  val q87Fingerprint: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val toks = split(col("text"), " ")
    val vals = transform(toks, tk => (length(tk) * 17 + ascii(substring(tk, 1, 1))).cast("long"))
    val fp = aggregate(vals, lit(0L), (acc, v) => pmod(acc * 31 + v, lit(1000000007L)))
    orderAll(d.select(col("doc_id"), fp.as("fingerprint")))
  }

  /** q67: rarity-weighted top terms — the keyword-extraction primitive
    * behind topic filtering and corpus inspection dashboards: per doc,
    * the 5 terms with the highest tf/df score (term frequency weighted
    * by inverse document frequency). The score is deliberately the
    * LOG-FREE surrogate `tf / df`: a single IEEE double division of two
    * exact counts is bit-identical in Spark and DuckDB, so the op is
    * fully hash-oracled — the classic `tf·log(N/df)` weighting would
    * ride on `Math.log` vs libm ulp differences and forfeit the oracle
    * for no behavioral gain at the top of the ranking.
    *
    * 100 TB shape: explode is map-local; tf is one shuffle on
    * (doc_id, term) with partial aggregation; df reuses tf's output
    * (one row per (doc,term)) through a second, smaller shuffle on
    * term; the enrichment join is 1:1 per tf row so hot stopword terms
    * fan nothing out; and the per-doc top-5 plans as a map-side
    * WindowGroupLimit (pinned in PlanSpec, q96's rewrite) so each map
    * task forwards ≤5 rows per doc. Ties broken by term, so the output
    * is deterministic. */
  val q67TfidfTerms: Q = (spark, dir) => {
    // persisted: tf feeds BOTH the df aggregation and the enrichment
    // join — unpersisted, the scan+explode+partial-agg subtree appears
    // 4× in the physical plan (q88's measured defect class)
    val tf = t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .scopedPersist
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("term"))
      .withColumn("score", round(col("tf").cast("double") / col("df"), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    orderAll(scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
        col("score")))
  }

  /** q68: dedup cluster assignment — the step BETWEEN pair-finding and
    * deduping: q81's verified near-dup pairs form a graph whose
    * connected components are the duplicate clusters (keep
    * doc == cluster_id, drop the rest). Labels converge by min-label
    * propagation ACCELERATED with a pointer jump: each round takes the
    * min over (own label, neighbors' labels, label-of-label), so the
    * reached minimum compounds round-over-round and rounds are
    * O(log longest-chain), not O(longest-chain) — measured: the sf0.001
    * pair graph chains incidental cross-doc near-dups into a 14-hop
    * path, 14 rounds under plain neighbor-min, 3 with the jump. The
    * loop is a driver loop over DISTRIBUTED steps — per-round work is
    * three joins over two label-table-sized frames, the driver only
    * compares the monotone label-sum scalar for convergence.
    *
    * Cost shape, measured (tools/Profile, sf0.001, local[8]): warm
    * steady state 3.3 s total, ~0.3-0.5 s/round; the first rep pays the
    * q81 pair pipeline. Round cost is scheduling floor at toy scale and
    * shuffle volume of the (node, label) pair table — ~16 B/row — at
    * 100 TB; round count depends on chain length, not corpus size
    * (ScaleProbe: 8× data ⇒ same 3 rounds). FULLY ORACLED: DuckDB
    * computes the same components with a recursive CTE (min reachable
    * id over the undirected graph). */
  val q68DedupClusters: Q = (spark, dir) =>
    q68WithCheckpoint(graft.core.Checkpoints.dirFromEnv())(spark, dir)

  /** q68 with an explicit checkpoint mode. The declared query binds the
    * env-backed switch ([[graft.core.Checkpoints.dirFromEnv]]): unset ⇒
    * localCheckpoint (single-JVM sandbox), GRAFT_CHECKPOINT_DIR set ⇒
    * reliable checkpoint() to fault-tolerant storage, the 1000-executor
    * posture. CheckpointSpec drives the reliable path with an explicit
    * temp dir and pins both modes to identical results. */
  private[graft] def q68WithCheckpoint(ckptDir: Option[String]): Q =
    (spark, dir) => orderAll(q68Core(ckptDir)(spark, dir))

  /** q68's unordered core — the label table BEFORE the dump sort, so
    * consumers that immediately re-key it (q131's doc_id join) don't
    * pay orderAll's global range exchange only to destroy the order
    * (the dsirPerDoc/q136 sharing pattern). */
  private[graft] def q68Core(ckptDir: Option[String]): Q = (spark, dir) => {
    import graft.core.{CacheScope, Checkpoints}
    // both union branches reference `pairs`; q81's INTERNAL persists make
    // the second traversal cheap (measured: an extra persist here only
    // adds a materialization layer), and `edges` is checkpointed for the loop
    def ckpt(df: DataFrame): DataFrame =
      CacheScope.trackCheckpoint(Checkpoints.truncate(df, ckptDir))
    val pairs = q81Pairs(spark, dir).select(col("d1"), col("d2"))
    val edges = ckpt(pairs.unionByName(
        pairs.select(col("d2").as("d1"), col("d1").as("d2")))
      .toDF("src", "dst"))
    withClusterSizes(propagateMin(spark, edges, ckptDir))
  }

  /** Converged min-label propagation (pointer-jumped) over a
    * bidirectional (src, dst) edge table the CALLER has already
    * checkpoint-truncated — q68's loop factored out so q148's
    * incremental maintenance can run the same propagation over the
    * AFFECTED subgraph only. Returns (node, label) at the fixpoint.
    *
    * The loop's frames are checkpoint-truncated, not persisted: a cached
    * plan is substituted by CANONICAL-PLAN LOOKUP at analysis time, and
    * round k's tree (edges and the round-(k-1) labels, each referenced
    * through fresh self-joined aliases) reliably missed it — measured:
    * ~15 s/round, the cost of silently recomputing the q81 pair
    * pipeline inside every round. A checkpoint truncates the lineage to
    * the materialized blocks themselves, so a round's plan is three
    * joins over two tiny leaf tables no matter how deep the iteration.
    * `ckpt` frames that the RESULT plan reads (edges, final labels) are
    * registered for the harness drain; superseded round frames are
    * released in-loop, so the block manager holds at most two label
    * tables at any point of the iteration (round-8 advice). */
  private[graft] def propagateMin(spark: SparkSession, edges: DataFrame,
      ckptDir: Option[String]): DataFrame = {
    import graft.core.{CacheScope, Checkpoints}
    def ckpt(df: DataFrame): DataFrame =
      CacheScope.trackCheckpoint(Checkpoints.truncate(df, ckptDir))
    var labels = ckpt(edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")))
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).collect()(0).getLong(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < 25) {
      val t0 = System.nanoTime()
      val neighborMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(edges("src").as("n2")).agg(min(col("label")).as("nlabel"))
      val hop = labels.join(neighborMin, labels("node") === neighborMin("n2"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("lbl1"))
      // pointer jump: also take label(label(x)) from the current table.
      // Neighbor-min alone moves a label ONE hop per round, so rounds =
      // longest chain in the pair graph (measured 14 at sf0.001, where
      // incidental cross-doc pairs chain clusters together); the jump
      // lets the reached min compound round-over-round, collapsing the
      // same graph in O(log chain) rounds. label(x) is always a node id
      // in x's component, so the jump target's label is too — the
      // fixpoint argument (stable ⇒ adjacent labels equal ⇒ component
      // min everywhere) is unchanged.
      val next = ckpt(hop.join(
          labels.select(col("node").as("pnode"), col("label").as("plabel")),
          hop("lbl1") === col("pnode"), "left")
        .select(col("node"),
          least(col("lbl1"), coalesce(col("plabel"), col("lbl1"))).as("label")))
      val s = labelSum(next)
      converged = s == prevSum // min-propagation: sum strictly decreases until fixpoint
      prevSum = s
      // `next` is materialized (truncation is eager), so the previous
      // round's blocks are dead — release now instead of letting ~25
      // superseded label tables sit in the block manager until GC
      Checkpoints.release(labels)
      labels = next
      iter += 1
      System.err.println(f"[q68] round $iter: ${(System.nanoTime() - t0) / 1e9}%.2f s, labelSum=$s")
    }
    require(converged, s"label propagation did not converge in $iter iterations")
    labels
  }

  /** (node, label) → the label-table shape (doc_id, cluster_id,
    * cluster_size) — q68's output tail, shared by q148's merged
    * components. */
  private[graft] def withClusterSizes(labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("label"))
      .select(col("node").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"))
  }

  /** The materialized near-dup label table — the production posture
    * q131's scaladoc and SURVEY §2.2 describe: a nightly pipeline runs
    * connected components ONCE per corpus build, writes the label
    * table, and every downstream ACTION step (canonical pick q131,
    * corpus rewrite q145) READS it instead of re-running the
    * propagation. This object is that posture in-process: the first
    * consumer materializes the table to a JVM-scoped temp parquet and
    * later consumers read it — still self-contained (a consumer with no
    * table builds it), still deterministic (q68Core is a pure function
    * of the corpus, so memoized and fresh answers are row-identical —
    * CurationSpec pins the equality). q68 itself NEVER uses the memo:
    * the label computation is its declared benchmark and stays a fresh
    * full run every time. `GRAFT_LABEL_MEMO=0` restores
    * recompute-always for the consumers too.
    *
    * Scope honestly stated: staleness is detected by a CONTENT
    * fingerprint of the corpus parquet — every part file's relative
    * path, size, and mtime (a regeneration landing inside one mtime
    * tick still renames the UUID part files, so the key moves where a
    * bare dir-mtime key could not — round-12 advice); a superseded
    * table is deleted when its corpus changes, so regenerating N times
    * leaks nothing. Placement: `GRAFT_LABEL_DIR` unset ⇒ a driver-local
    * temp dir per (JVM, corpus) — the single-JVM harness default; set ⇒
    * `$GRAFT_LABEL_DIR/labels_<fingerprint>`, a STABLE warehouse path
    * shared across JVMs (the nightly job writes it once, later jobs —
    * this JVM or not — find `_SUCCESS` and just read). CurationSpec
    * drives the configured-path arm explicitly and pins it
    * row-identical to a fresh run. */
  private[graft] object LabelTable {
    private val tbl = new MaterializedTable("labels",
      (s, d) => q68Core(graft.core.Checkpoints.dirFromEnv())(s, d))
    def of(spark: SparkSession, dir: String): DataFrame = tbl.of(spark, dir)
    private[graft] def of(spark: SparkSession, dir: String,
        base: Option[String]): DataFrame = tbl.of(spark, dir, base)
  }

  /** The materialize-once mechanics shared by [[LabelTable]],
    * [[GateIndexTable]] and [[PairTable]]: first consumer writes
    * `fresh(corpus)` to parquet, later consumers read it. Staleness is
    * the corpus CONTENT [[fingerprint]] (a rebuild renames UUID part
    * files, so the key moves even inside one mtime tick); a superseded
    * table is deleted (temp AND warehouse mode — the old fingerprint
    * names a corpus build that no longer exists). `GRAFT_LABEL_DIR`
    * unset ⇒ a JVM-scoped temp dir; set ⇒ `$base/<prefix>_<fp>`, a
    * STABLE warehouse path shared across JVMs (writer leaves
    * `_SUCCESS`, later JVMs adopt). `GRAFT_LABEL_MEMO=0` restores
    * recompute-always. Locking is PER KEY (`ConcurrentHashMap.compute`
    * — round-13 advice on BpeTable's global lock): the fingerprint walk
    * and a cache hit never wait on another corpus's seconds-scale
    * build; two consumers racing on the SAME key serialize, so the
    * artifact is built once. */
  private[graft] final class MaterializedTable(prefix: String,
      freshFn: (SparkSession, String) => DataFrame,
      // the table whose CONTENT keys staleness — must be the one
      // freshFn actually reads (a dense-rank artifact keyed on the
      // documents table would survive an embeddings regeneration and
      // serve stale ranks)
      srcTable: String = "documents.parquet") {
    // (corpus dir, base) → (content fingerprint, materialized path)
    private val memo = new java.util.concurrent.ConcurrentHashMap[
      (String, Option[String]), (String, String)]()

    def of(spark: SparkSession, dir: String): DataFrame =
      of(spark, dir, sys.env.get("GRAFT_LABEL_DIR"))

    def of(spark: SparkSession, dir: String,
        base: Option[String]): DataFrame =
      if (sys.env.get("GRAFT_LABEL_MEMO").contains("0")) freshFn(spark, dir)
      else {
        val fp = fingerprint(java.nio.file.Paths.get(dir, srcTable))
        val key = (dir, base)
        val hit = memo.get(key)
        val path =
          if (hit != null && hit._1 == fp) hit._2 // lock-free fast path
          else memo.compute(key, (_, old) => {
            if (old != null && old._1 == fp) old
            else {
              if (old != null) deleteTree(java.nio.file.Paths.get(old._2))
              val p = base match {
                case Some(b) =>
                  val d = java.nio.file.Paths.get(b, s"${prefix}_$fp")
                  if (!java.nio.file.Files.exists(d.resolve("_SUCCESS"))) {
                    java.nio.file.Files.createDirectories(d)
                    freshFn(spark, dir).write.mode("overwrite").parquet(d.toString)
                  }
                  d.toString
                case None =>
                  val d = java.nio.file.Files.createTempDirectory(s"graft_${prefix}_")
                  freshFn(spark, dir).write.mode("overwrite").parquet(d.toString)
                  d.toString
              }
              (fp, p)
            }
          })._2
        spark.read.parquet(path)
      }
  }

  /** Hex fold of every regular file's (relative path, size, mtime)
    * under `src`, sorted — the staleness key shared by [[LabelTable]]
    * and [[GateIndexTable]]. */
  private[queries] def fingerprint(src: java.nio.file.Path): String = {
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.walk(src)
    val files =
      try stream.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => (src.relativize(p).toString,
          java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toVector.sorted
      finally stream.close()
    Integer.toHexString(scala.util.hashing.MurmurHash3.seqHash(files))
  }

  private def deleteTree(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      val stream = java.nio.file.Files.walk(root)
      try stream.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally stream.close()
    }

  /** q148's gate index, materialized ONCE per (JVM, corpus build) — the
    * [[LabelTable]] posture extended to the OTHER artifact a nightly
    * near-dup pipeline persists: the inverted band index over the full
    * node universe (the `NearDupGate documents` table q148's scaladoc
    * names). Rebuilding it per run is the recompute-always posture
    * (`GRAFT_LABEL_MEMO=0` restores it — one dial governs all
    * materialized artifacts); reading the persisted index and paying
    * only Δ-batch gating is the production shape. Same staleness key
    * (corpus content fingerprint), same supersede-and-delete, same
    * `GRAFT_LABEL_DIR` warehouse override. The parquet round-trip is
    * exact (doc_id, bigint shingle arrays, band strings), so gated
    * pairs are bit-identical either way — CurationSpec pins memoized ≡
    * fresh, and q148's DuckDB oracle (a full recompute over the union
    * graph) gates the composed result regardless of posture. */
  private[graft] object GateIndexTable {
    /** The index build itself — the universe is corpus + its planted
      * re-crawls + the ingest batch (a batch doc near-duping another
      * batch doc is an edge a full recompute would see). */
    private[graft] def fresh(spark: SparkSession, dir: String): DataFrame = {
      val universe = docsWithNearDups(spark, dir)
        .select(col("doc_id"), col("text"))
        .unionByName(q148Batch(spark, dir))
      graft.streaming.NearDupGate.index(spark, universe, geom)
    }

    private val tbl = new MaterializedTable("gateindex", fresh)

    def of(spark: SparkSession, dir: String): DataFrame = tbl.of(spark, dir)

    private[graft] def of(spark: SparkSession, dir: String,
        base: Option[String]): DataFrame = tbl.of(spark, dir, base)
  }

  /** q88's candidate-pair universe materialized ONCE per (JVM, corpus
    * build) — the [[LabelTable]] posture applied to the THIRD artifact
    * a nightly near-dup pipeline persists: the verified-pair table
    * (candidate pairs with exact Jaccard) that both the 0.5-cut dedup
    * (q88) and the threshold sizing sweep (q169) consume. Production
    * builds the pair table once per corpus build and every decision
    * reads it; re-deriving it inside each consumer is the
    * recompute-always posture (`GRAFT_LABEL_MEMO=0` restores it — one
    * dial governs all materialized artifacts, and the annotated
    * `label_memo:off` BENCH_HISTORY line anchors the fresh build cost).
    * The parquet round-trip is exact (BIGINT ids/counts, one
    * already-rounded double), so consumers are bit-identical either
    * way — CurationSpec pins memoized ≡ fresh, and both consumers'
    * DuckDB oracles (full pair recomputes) gate the composed results
    * regardless of posture. */
  private[graft] object PairTable {
    private val tbl = new MaterializedTable("pairs", ngramPairJaccard)
    def of(spark: SparkSession, dir: String): DataFrame = tbl.of(spark, dir)
    private[graft] def of(spark: SparkSession, dir: String,
        base: Option[String]): DataFrame = tbl.of(spark, dir, base)
  }

  /** q131 [EXT]: near-dup cluster canonicalization — the ACTION step
    * between q68's labels and the corpus rewrite: every near-dup
    * cluster collapses to one canonical document, chosen by the
    * standard keep-the-longest rule (max token count, tie → smallest
    * doc_id — the untruncated original beats its planted re-crawl by
    * construction, so the fixture makes the rule's effect observable).
    * Output is TOTAL over cluster members (q103's gate argument): every
    * member carries its cluster, length, and a `keep` verdict, so the
    * downstream rewrite is one `filter(keep)` and the drop AUDIT (what
    * was removed, and in favor of what) is the same frame.
    *
    * 100 TB: the label table from q68 dominates the cost (its own
    * scale story); the selection itself is one doc_id-keyed join of two
    * aggregate-shaped frames plus a per-CLUSTER window — partitions are
    * bounded by duplicate multiplicity (never corpus-sized), and the
    * window spills on a pathological million-copy cluster where any
    * collect_list spelling would not. FULLY ORACLED: q68's recursive
    * CTE extended by the same window. */
  val q131DedupCanonical: Q = (spark, dir) => {
    // labels come off the MATERIALIZED table ([[LabelTable]] — built by
    // the first consumer in this JVM, read thereafter): the production
    // nightly posture, still self-contained. [[q131WithLabels]] is the
    // same selection step over any caller-supplied label frame;
    // CurationSpec drives it against a hand-built table.
    val labels = LabelTable.of(spark, dir)
    // token counts of the SAME planted frame q68/q81 cluster (originals
    // + id-shifted truncated re-crawls); the inner join to labels keeps
    // exactly the cluster members, so no len filter is needed here
    val d = t(spark, dir, "documents")
    val nTok = size(split(col("text"), " ")).cast("long")
    val nt = d.select(col("doc_id"), nTok.as("n_toks"))
      .unionByName(d.select((col("doc_id") + 1000000).as("doc_id"),
        (nTok - 1).as("n_toks")))
    orderAll(q131WithLabels(labels, nt))
  }

  /** q131's selection step over a PRE-MATERIALIZED label table — the
    * spelling a production pipeline actually runs nightly (labels come
    * off disk, not out of a fresh connected-components pass). `labels`
    * carries (doc_id, cluster_id, cluster_size), `nToks`
    * (doc_id, n_toks); output is q131's TOTAL keep/drop audit. One
    * doc_id-keyed join plus a per-CLUSTER window — partitions bounded
    * by duplicate multiplicity, never corpus-sized. */
  private[graft] def q131WithLabels(labels: DataFrame,
      nToks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_toks").desc, col("doc_id").asc)
    labels.join(nToks, Seq("doc_id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("n_toks"), col("keep"))
  }

  /** q146 [EXT]: the corpus-level deduplication audit — the REPORT a
    * nightly dedup job publishes next to its rewrite: for each cluster
    * multiplicity k, how many near-dup clusters have exactly k members,
    * how many documents that is, how much token mass those members
    * carry, and how much of it the canonical collapse (q131's
    * keep-the-longest verdicts) deletes. One glance answers "how
    * duplicated is this corpus and what does collapsing cost" — the
    * number that decides whether a 100 TB crawl re-runs dedup at all.
    * Only documents with at least one near-dup pair appear (q68's label
    * table is over the pair graph), so k ≥ 2 by construction.
    *
    * 100 TB: reads the MATERIALIZED label table ([[LabelTable]] — the
    * production posture q131/q145 established; the first consumer in a
    * JVM builds it, everyone else reads parquet); the verdict step is
    * q131's bounded per-cluster window; the histogram then aggregates
    * CLUSTER-count-sized data down to multiplicity-count-sized output —
    * a two-level rollup whose every exchange shrinks. Nothing here
    * touches bodies: token counts ride as BIGINTs from the one
    * documents scan. FULLY ORACLED: q131's recursive CTE + the same
    * GROUP BY cluster_size rollup. */
  val q146DedupAudit: Q = (spark, dir) => {
    val labels = LabelTable.of(spark, dir)
    val d = t(spark, dir, "documents")
    val nTok = size(split(col("text"), " ")).cast("long")
    val nt = d.select(col("doc_id"), nTok.as("n_toks"))
      .unionByName(d.select((col("doc_id") + 1000000).as("doc_id"),
        (nTok - 1).as("n_toks")))
    val verdicts = q131WithLabels(labels, nt)
    orderAll(verdicts.groupBy(col("cluster_size"))
      .agg(countDistinct(col("cluster_id")).as("n_clusters"),
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_toks_total"),
        sum(when(col("keep"), lit(0L)).otherwise(col("n_toks")))
          .as("n_toks_dropped")))
  }

  /** q148 [EXT]: INCREMENTAL label maintenance — the operator that saves
    * a nightly 100 TB pipeline from full connected-components re-runs,
    * completing the materialized-[[LabelTable]] posture: given the
    * existing (doc_id, cluster_id, cluster_size) table and a NEW
    * batch's verified near-dup pairs (q104's gate pointed at the
    * corpus∪batch index, so batch↔corpus AND batch↔batch edges are both
    * caught), merge by re-propagating labels over the AFFECTED subgraph
    * only; labels of untouched clusters pass through unchanged.
    *
    * The affected subgraph is a CONTRACTION, not the original edges:
    * each touched old cluster is represented by its star
    * (member → cluster_id), which is connectivity-equivalent to
    * whatever intra-cluster edges produced it and carries every member
    * id — so the merged component's min is computed over exactly the
    * ids a full recompute would see, and the two agree ROW-IDENTICALLY
    * (CurationSpec pins incremental ≡ full-recompute-over-union; the
    * DuckDB oracle IS that full recompute, q68's recursive CTE over the
    * union graph). Batch fixture: q104's four re-crawl classes on the
    * `doc_id % 5 == 2` subset — a batch that touches SOME clusters, so
    * the pass-through arm is observable, not vacuous.
    *
    * 100 TB: Δ-pair generation is q104's shape (batch side broadcasts,
    * index scan is the only shuffle-scale work — in production the
    * index is the persisted table NearDupGate documents); the
    * propagation runs over |affected| + |Δ| rows, not the corpus label
    * table; untouched labels never enter an exchange keyed by anything
    * but the anti-join's cluster_id. Nightly cost becomes
    * O(batch + touched clusters), while q68 stays the declared
    * full-rebuild benchmark. */
  /** q167's negative-draw bucket count — small enough that every
    * bucket is populated at any real SF (64 buckets over ≥10k universe
    * ids), large enough that a bucket rarely sits inside one cluster;
    * interpolated into the oracle. */
  private[queries] val ContrastiveBuckets = 64L

  /** q167 [EXT]: contrastive training-pair mining — the
    * embedding-model TRAINING DATA the near-dup label table exists to
    * feed (SimCSE/E5-style corpus mining): for every clustered
    * document, a (anchor, positive, negative) triplet where the
    * positive is a same-cluster near-duplicate and the negative is a
    * deterministically drawn non-member. Positives: the cluster's
    * minimum member id (the anchor that IS the minimum takes the
    * second-minimum — every cluster has ≥ 2 members by construction).
    * Negatives: the corpus universe is Knuth-bucketed
    * ([[ContrastiveBuckets]] cells); each anchor draws cell
    * knuthBucket2(anchor) (the quadratic scramble — per-anchor draws
    * over a dense id band, q139/q141's coset rule) and takes the
    * cell's minimum id, falling back to its second-minimum when the
    * minimum shares the anchor's cluster; if both minima share it the
    * negative is NULL (TOTAL output — a mining job must surface, not
    * silently drop, the anchors it could not serve).
    *
    * 100 TB: labels come off the materialized [[LabelTable]]
    * (pair-graph-sized); the positive attach is one cluster-keyed join
    * of two label-table-sized frames; the negative table SHRINKS to
    * 2·buckets rows and broadcasts; nothing corpus-sized shuffles —
    * the corpus itself is touched only to enumerate universe ids.
    * FULLY ORACLED: q68's recursive-CTE labels + the package knuth
    * spellings + the same window minima. */
  val q167ContrastivePairs: Q = (spark, dir) =>
    orderAll(contrastivePairs(
      LabelTable.of(spark, dir).select(col("doc_id"), col("cluster_id")),
      docsWithNearDups(spark, dir).select(col("doc_id"))))

  /** q167's core over an explicit (doc_id, cluster_id) label table and
    * a (doc_id) universe — spec-drivable on hand graphs where every
    * positive and negative is checkable by the JVM knuth mirror. */
  private[graft] def contrastivePairs(labelsRaw: DataFrame,
      uni: DataFrame): DataFrame = {
    val labels = labelsRaw.scopedPersist
    // cluster minima: rank members per cluster, take ids at rank 1/2
    // (m2 always exists — every cluster has >= 2 members)
    val wC = Window.partitionBy(col("cluster_id")).orderBy(col("doc_id").asc)
    val ranked = labels.withColumn("rk", row_number().over(wC))
    val m12 = ranked.filter(col("rk") <= 2)
      .groupBy(col("cluster_id"))
      .agg(min(when(col("rk") === 1, col("doc_id"))).as("m1"),
        min(when(col("rk") === 2, col("doc_id"))).as("m2"))
    // negative pool: per Knuth cell, the two smallest universe ids with
    // their cluster labels (unlabeled ids are their own singleton)
    // the label table is pair-graph-sized — broadcast territory (the
    // q158 posture); unhinted, a sort-merge pick would shuffle the
    // whole universe id stream
    val pool = uni.join(broadcast(labels), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("ncl"),
        knuthBucket(col("doc_id"), ContrastiveBuckets).as("cell"))
    // two map-side-combinable struct-min aggregates, NOT a window: a
    // rank window partitioned by the 64 draw cells would funnel the
    // whole id pool through 64 sort partitions at scale — min(struct)
    // partial-aggregates per input partition and the second minimum
    // re-aggregates after excluding the first (broadcast of 64 rows)
    val pooled = pool.scopedPersist
    val m1 = pooled.groupBy(col("cell"))
      .agg(min(struct(col("doc_id"), col("ncl"))).as("s1"))
    val m2 = pooled.join(broadcast(m1), Seq("cell"))
      .filter(col("doc_id") =!= col("s1.doc_id"))
      .groupBy(col("cell"))
      .agg(min(struct(col("doc_id"), col("ncl"))).as("s2"))
    val cellMins = m1.join(m2, Seq("cell"), "left")
      .select(col("cell"),
        col("s1.doc_id").as("n1"), col("s1.ncl").as("ncl1"),
        col("s2.doc_id").as("n2"), col("s2.ncl").as("ncl2"))
    val triplets = labels
      .join(broadcast(m12), Seq("cluster_id"))
      .withColumn("positive_id",
        when(col("doc_id") === col("m1"), col("m2")).otherwise(col("m1")))
      .withColumn("cell", knuthBucket2(col("doc_id"), ContrastiveBuckets))
      // LEFT: an anchor whose draw cell holds no universe ids (sparse
      // id bands vs 64 cells) must still appear, with a NULL negative —
      // the TOTAL contract; an inner join here silently dropped such
      // anchors (caught by the hand-graph spec, invisible at sf scale
      // where every cell is occupied)
      .join(broadcast(cellMins), Seq("cell"), "left")
      .withColumn("negative_id",
        when(col("ncl1") =!= col("cluster_id"), col("n1"))
          .when(col("ncl2") =!= col("cluster_id"), col("n2")))
      .select(col("doc_id").as("anchor_id"), col("cluster_id"),
        col("positive_id"), col("negative_id"))
    triplets
  }

  val q148LabelIncremental: Q = (spark, dir) => {
    import graft.core.Checkpoints
    val ckptDir = Checkpoints.dirFromEnv()
    // consumed three times (affected set, star edges, pass-through)
    val old = LabelTable.of(spark, dir).scopedPersist
    val delta = q148Delta(spark, dir)
      .scopedPersist // consumed by the endpoint set and the edge union
    val ends = delta.select(col("d1").as("doc_id"))
      .unionByName(delta.select(col("d2").as("doc_id"))).distinct()
    val affected = old.join(ends, Seq("doc_id"))
      .select(col("cluster_id")).distinct().scopedPersist
    val stars = old.join(affected, Seq("cluster_id"))
      .select(col("doc_id").as("d1"), col("cluster_id").as("d2"))
    val sub = delta.unionByName(stars)
    val edges = graft.core.CacheScope.trackCheckpoint(Checkpoints.truncate(
      sub.unionByName(sub.select(col("d2").as("d1"), col("d1").as("d2")))
        .toDF("src", "dst"), ckptDir))
    val merged = withClusterSizes(propagateMin(spark, edges, ckptDir))
    val untouched = old.join(affected, Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    orderAll(untouched.unionByName(merged))
  }

  /** q148's ingest batch: q104's four re-crawl classes (verbatim copy /
    * last-token drop / first-quarter prefix / fresh content) on the
    * `doc_id % 5 == 2` SUBSET — class chosen by the PRE-shift id, the
    * oracle's CASE. */
  private[graft] def q148Batch(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    t(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 2)
      .select((col("doc_id") + 4000000).as("doc_id"),
        when(col("doc_id") % 4 === 0, col("text"))
          .when(col("doc_id") % 4 === 1,
            array_join(slice(toks, lit(1), size(toks) - 1), " "))
          .when(col("doc_id") % 4 === 2,
            array_join(slice(toks, lit(1), (size(toks) / lit(4)).cast("int")), " "))
          .otherwise(array_join(transform(toks, tk => concat(tk, lit("_new"))), " "))
          .as("text"))
  }

  /** q148's verified Δ-pairs: the batch gated against the materialized
    * [[GateIndexTable]] — an index of the FULL node universe (corpus +
    * its planted re-crawls + the batch itself; a batch doc near-duping
    * another batch doc is an edge a full recompute would see, so the
    * delta must carry it). Self-matches (a batch doc finding itself in
    * the index at j = 1) are dropped. The scopedPersist serves the
    * index's two consumers (band probe + verify join) in EITHER
    * posture: a cached parquet scan when memoized, the cached fresh
    * build under GRAFT_LABEL_MEMO=0. */
  private[graft] def q148Delta(spark: SparkSession, dir: String): DataFrame = {
    val batch = q148Batch(spark, dir)
    val index = GateIndexTable.of(spark, dir).scopedPersist
    graft.streaming.NearDupGate.verifiedPairs(spark, batch, index, geom)
      .filter(col("b_id") =!= col("c_id"))
      .select(col("b_id").as("d1"), col("c_id").as("d2"))
  }

  /** Shingles with document frequency above this carry no near-dup signal
    * (they're corpus boilerplate) but dominate the inverted-index
    * self-join, whose work is Σ df² over shingles — at sf0.1 the uncapped
    * join produced ~11 M pair rows from 10 k docs, and hot-shingle df
    * grows with corpus duplication, so uncapped work grows quadratically.
    * The cap bounds per-shingle join fan-out at df² ≤ 400 rows, making
    * total work linear in corpus size. Jaccard is then computed over the
    * informative-shingle sets on BOTH engines (cap mirrored in the
    * oracle — both read the same env-backed geometry, so they can never
    * disagree). */
  private def ShingleDfCap = geom.shingleDfCap
  /** q88: n-gram Jaccard near-dup via shingle inverted index — the join
    * key is the 3-token shingle (candidate generation), never a cross
    * join; Jaccard is computed from exact distinct-shingle counts, over
    * shingles with df ≤ [[ShingleDfCap]]. Pairs come off the
    * materialized [[PairTable]] (built by the first consumer in this
    * JVM — q88's own warm rep in the bench — read thereafter): the
    * production posture where the pair table is a per-corpus-build
    * artifact and the cut is a read-filter-decide step over it.
    * `GRAFT_LABEL_MEMO=0` restores the fresh in-query build
    * ([[ngramPairJaccard]]); the annotated `label_memo:off`
    * BENCH_HISTORY line carries the fresh cost. */
  val q88DedupNgram: Q = (spark, dir) => orderAll(
    PairTable.of(spark, dir)
      .filter(col("jacc") >= 0.5)
      .select(col("d1"), col("d2"), col("common"), col("jacc")))

  /** q88's candidate-pair stage WITHOUT the similarity cut — every
    * df-capped-index candidate pair with its exact Jaccard. Factored so
    * q169's threshold sweep reads the identical pair universe q88
    * gates at 0.5 (threshold drift between the dedup and its sizing
    * table would make the table lie). */
  private[graft] def ngramPairJaccard(spark: SparkSession,
      dir: String): DataFrame = {
    val d = docsWithNearDups(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
    // per-doc dedup happens NARROW (array_distinct inside the row) —
    // a row-level `.distinct()` here would be a full extra shuffle of
    // every (doc, shingle) pair for something each row can do locally
    // Shingles are 64-bit xxhash fingerprints, not strings: the inverted
    // index only needs equality, so hashing at creation skips the
    // per-shingle string build and moves 8-byte keys (vs ~30-byte
    // strings) through every exchange below. A false shingle merge
    // needs an xxhash64 collision (~2e-11 across this corpus's 27 k
    // distinct shingles) — the DuckDB oracle joins on the string form,
    // so any collision would surface as a hash-gate mismatch.
    // persisted: consumed by the df aggregation AND the df-filter join —
    // unpersisted, each consumer re-runs the explode from the scan
    // (measured: the subtree appeared 6× in the physical plan)
    val allShingles = d.select(col("doc_id"),
      explode(array_distinct(transform(sequence(lit(1), size(col("toks")) - 2),
        i => xxhash64(
          element_at(col("toks"), i),
          element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2)))))
        .as("sh"))
      .scopedPersist
    // df filter: groupBy-on-sh (map-side combinable) + join back on sh —
    // the same key as the self-join below, so the hash partitioning on sh
    // is computed once and reused across all three operators.
    val informative = allShingles.groupBy("sh")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= ShingleDfCap)
      .select("sh")
    // persisted: feeds sizes + both sides of the pair self-join
    val shingles = allShingles.join(informative, Seq("sh"))
      .scopedPersist
    val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = shingles.as("a").join(shingles.as("b"), Seq("sh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n_sh", "s1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n_sh", "s2"), "d2")
      .withColumn("jacc",
        round(col("common").cast("double") /
          (col("s1") + col("s2") - col("common")), 6))
  }

  /** q173's similarity threshold τ = [[SetSimTauNum]]/[[SetSimTauDen]]
    * as an exact rational, so every τ-comparison in engine AND oracle is
    * an integer cross-multiplication (prefix length
    * `m − ceil(τ·m) + 1`, length filter `τ·max ≤ min`, verification
    * `J ≥ τ ⇔ (num+den)·common ≥ num·(m1+m2)`) — no float ever touches
    * the decision, so the two engines cannot diverge by an ulp.
    * Interpolated into the oracle — one spelling. */
  private[queries] val SetSimTauNum: Int = 1
  private[queries] val SetSimTauDen: Int = 2

  /** q173 [EXT]: EXACT set-similarity self-join with lossless
    * prefix-filter pruning — the PPJoin candidate-generation family
    * (Xiao, Wang, Lin & Yu, "Efficient Similarity Joins for Near
    * Duplicate Detection", WWW 2008; Chaudhuri, Ganti & Kaushik's
    * SSJoin operator, ICDE 2006), completing the surface's candidate-
    * generation spectrum: q81 prunes PROBABILISTICALLY (LSH banding —
    * recall < 1 by construction), q88 prunes LOSSILY (df-capped index —
    * Jaccard over informative shingles only), and q173 prunes
    * LOSSLESSLY: its output is provably the full uncapped exact-Jaccard
    * ≥ τ join over each document's complete distinct-shingle set.
    *
    * The prefix principle: order the universe of shingles by ascending
    * global document frequency (rarest first; ties by fingerprint) and
    * keep, per document, only the first `m − ceil(τ·m) + 1` of its m
    * set elements. Two sets with J ≥ τ overlap in ≥ ceil(τ·m) elements,
    * so by pigeonhole their prefixes under ANY shared total order must
    * intersect — indexing only prefixes loses no qualifying pair, while
    * the rarest-first choice makes prefix buckets the COLDEST shingles
    * (a boilerplate shingle with df = corpus lands in nobody's prefix
    * unless a doc is almost all boilerplate). Candidates additionally
    * pass the length filter τ·max(m1,m2) ≤ min(m1,m2) (J ≥ τ bounds the
    * size ratio), then exact verification.
    *
    * Engine and oracle deliberately use DIFFERENT tie-orders (xxhash64
    * fingerprints here — 8-byte join keys, q88's argument; shingle
    * strings there): the prefix theorem holds under any one consistent
    * total order, so both prune losslessly and both emit the identical
    * verified set — the candidate lists differ, the answers cannot.
    *
    * 100 TB: no cross join and no df cap needed — candidate work is
    * Σ over prefix-resident shingles of (prefix-occupancy)², and
    * rarest-first ordering drives prefix occupancy toward 1; the df
    * aggregation and the prefix self-join share the shingle key, the
    * per-doc set assembly and both verification joins share the doc_id
    * key, so AQE reuses each partitioning. Verification is row-local
    * (`array_intersect` of the two sorted fingerprint arrays — no
    * third shuffle on shingles). Memory: per-doc arrays are the
    * document's DISTINCT shingle fingerprints (8 B each, ~doc tokens),
    * the same per-row footprint every HOF op in the surface carries. */
  val q173SetsimJoin: Q = (spark, dir) =>
    orderAll(setsimPairs(spark, dir))

  /** q173's core without the dump ordering — the exact ≥ τ pair
    * universe, shared by q173 (fresh every run: the join IS its
    * declared benchmark) and, via the memoized [[SetSimPairTable]], by
    * q175's recall audit (the q88/PairTable division of labor). */
  private[queries] def setsimPairs(spark: SparkSession,
      dir: String): DataFrame = {
    val d = docsWithNearDups(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
    // same shingling spelling as q88 (3-token xxhash64 fingerprints,
    // per-doc distinct computed NARROW inside the row).
    // persisted, q88's measured precedent (ngramPairJaccard): consumed
    // by the df aggregation AND the df-attach join below — unpersisted,
    // AQE's runtime broadcast of the join side breaks the ReuseExchange
    // the two sh-keyed subtrees would otherwise share, and the
    // tokenize+hash+explode pass over the corpus runs TWICE (visible in
    // the r15 before-plan: two Generate-over-Union subtrees, one under
    // the BroadcastExchange, one under the df agg's Exchange)
    val shingles = d.select(col("doc_id"),
      explode(array_distinct(transform(sequence(lit(1), size(col("toks")) - 2),
        i => xxhash64(
          element_at(col("toks"), i),
          element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2)))))
        .as("sh"))
      .scopedPersist
    val dfTbl = shingles.groupBy("sh").agg(count(lit(1)).as("df"))
    // per-doc shingle set, sorted by the global (df, fingerprint)
    // rarity order — the ONE total order the prefix theorem needs; the
    // sorted array serves both the prefix slice and (projected to
    // fingerprints) the row-local verification intersect.
    // persisted: three consumers (prefix explode + two verify joins)
    val perDoc = shingles.join(dfTbl, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("arr"))
      .withColumn("m", size(col("arr")).cast("long"))
      .withColumn("sset", transform(col("arr"), s => s.getField("sh")))
      .drop("arr")
      .scopedPersist
    val plen = expr(s"cast(m - (($SetSimTauNum * m + ${SetSimTauDen - 1})" +
      s" div $SetSimTauDen) + 1 as int)")
    val pref = perDoc.select(col("doc_id"), col("m"),
      explode(slice(col("sset"), lit(1), plen)).as("sh"))
    val cand = pref.as("a").join(pref.as("b"), Seq("sh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .filter(lit(SetSimTauNum) * greatest(col("a.m"), col("b.m")) <=
        lit(SetSimTauDen) * least(col("a.m"), col("b.m")))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .dropDuplicates("d1", "d2")
    val verified = cand
      .join(perDoc.select(col("doc_id").as("d1"),
        col("sset").as("s1"), col("m").as("m1")), Seq("d1"))
      .join(perDoc.select(col("doc_id").as("d2"),
        col("sset").as("s2"), col("m").as("m2")), Seq("d2"))
      .withColumn("common",
        size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .filter(lit(SetSimTauNum + SetSimTauDen) * col("common") >=
        lit(SetSimTauNum) * (col("m1") + col("m2")))
    verified.select(col("d1"), col("d2"), col("m1"), col("m2"),
      col("common"),
      expr("(1000 * common) div (m1 + m2 - common)").as("jacc_pm"))
  }

  /** q173's exact pair universe as a materialized artifact — built once
    * per (JVM, corpus build) by [[setsimPairs]]'s own spelling, read by
    * q175's audit thereafter (the PairTable posture: the ground-truth
    * table is a per-corpus-build artifact; q173 itself NEVER reads it —
    * the fresh join is its declared benchmark). `GRAFT_LABEL_MEMO=0`
    * restores recompute-always. */
  private[queries] object SetSimPairTable {
    private val tbl = new MaterializedTable("setsim",
      (s, d) => setsimPairs(s, d))
    def of(spark: SparkSession, dir: String): DataFrame = tbl.of(spark, dir)
    /** Un-memoized derivation — the memoized ≡ fresh spec pin. */
    def fresh(spark: SparkSession, dir: String): DataFrame =
      setsimPairs(spark, dir)
  }

  /** q175 [EXT]: dedup recall/precision audit — q168's ANN-recall-audit
    * posture applied to the near-dup family: the production df-capped
    * dedup (q88's informative-shingle Jaccard cut, served from
    * [[PairTable]]) measured against q173's EXACT full-set ≥ τ ground
    * truth ([[SetSimPairTable]]). Per full-set-Jaccard band
    * (`jacc_pm div 100`): how many exact pairs exist, how many the
    * production pipeline found (recall_ppm), and how many pairs the
    * pipeline admits whose TRUE full-set Jaccard does not clear τ
    * (n_fp — the df cap removes hot shingles from numerator AND
    * denominator, so the informative-shingle Jaccard can sit on either
    * side of the full-set value). This is the table that answers "what
    * does the df cap actually cost, and where?" with measured numbers
    * instead of the Σ df² argument alone — before anyone re-runs a
    * 100 TB dedup to find out.
    *
    * 100 TB: both pair universes serve from materialized artifacts
    * (ground truth is a nightly build exactly like the label table);
    * the audit's own work is pair-graph-sized — one left join + one
    * left-anti + a band rollup. The false-positive arm re-derives
    * full-set Jaccard ONLY for the F\E pairs: per-doc distinct-shingle
    * arrays built fresh (one narrow explode + one doc-keyed groupBy —
    * linear, no df join needed since no ordering is required) and
    * joined to the pair-bounded F\E frame; at production scale this arm
    * is the corpus-linear cost of the audit, and it is the honest
    * distributed shape (no driver-side pair collect — F\E is
    * corpus-proportional, not panel-bounded). FULLY ORACLED: q173's and
    * q88's oracle chains composed with disjoint CTE names, same outer
    * join, same integer band/ppm arithmetic.
    *
    * Measured verdict at the test SFs (hash-gated, so the numbers are
    * cross-engine facts): recall_ppm = 10⁶ in every band and n_fp = 0
    * at sf0.001 AND sf0.01 — on this corpus the df cap costs nothing,
    * which is exactly the kind of sentence this table exists to earn
    * (or, on a boilerplate-heavier corpus, to refute band-by-band). */
  val q175DedupRecallAudit: Q = (spark, dir) => {
    val exact = SetSimPairTable.of(spark, dir)
      .select(col("d1"), col("d2"), col("jacc_pm"))
    val found = PairTable.of(spark, dir)
      .filter(col("jacc") >= 0.5)
      .select(col("d1"), col("d2"))
      .scopedPersist // consumed by the left join AND the anti join
    val flagged = exact
      .join(found.withColumn("is_found", lit(1L)), Seq("d1", "d2"), "left")
      .select(col("d1"), col("d2"), col("jacc_pm"),
        lit(1L).as("is_exact"), coalesce(col("is_found"), lit(0L)).as("is_found"))
    // F \ E: admitted by the df-capped cut, not in the exact universe —
    // their true full-set jacc needs computing (they were never a
    // prefix-filter candidate). Sets WITHOUT the df-order join: the
    // intersect needs no ordering, so this is one narrow explode + one
    // doc-keyed groupBy, strictly cheaper than q173's own build.
    val fpPairs = found.join(exact.select(col("d1"), col("d2")),
      Seq("d1", "d2"), "left_anti")
    val d = docsWithNearDups(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
    val docSets = d.select(col("doc_id"),
      array_distinct(transform(sequence(lit(1), size(col("toks")) - 2),
        i => xxhash64(
          element_at(col("toks"), i),
          element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2)))).as("sset"))
      .withColumn("m", size(col("sset")).cast("long"))
    val fpj = fpPairs
      .join(docSets.select(col("doc_id").as("d1"),
        col("sset").as("s1"), col("m").as("m1")), Seq("d1"))
      .join(docSets.select(col("doc_id").as("d2"),
        col("sset").as("s2"), col("m").as("m2")), Seq("d2"))
      .withColumn("common",
        size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .select(col("d1"), col("d2"),
        expr("(1000 * common) div (m1 + m2 - common)").as("jacc_pm"),
        lit(0L).as("is_exact"), lit(1L).as("is_found"))
    val banded = flagged.unionByName(fpj)
      .groupBy(expr("jacc_pm div 100").as("band"))
      .agg(sum(col("is_exact")).as("n_exact"),
        sum(col("is_exact") * col("is_found")).as("n_found"),
        sum(lit(1L) - col("is_exact")).as("n_fp"))
    orderAll(banded.select(col("band"), col("n_exact"), col("n_found"),
      col("n_fp"),
      when(col("n_exact") > 0,
        expr(TokenStats.ppmSql("n_found", "n_exact")))
        .otherwise(lit(0L)).as("recall_ppm")))
  }

  /** q169's threshold ladder — percent integers so the compare is
    * `jacc >= pct / 100.0`, one IEEE division both engines spell
    * identically; interpolated into the oracle. */
  private[queries] val SweepThresholds: Seq[Int] =
    Seq(30, 40, 50, 60, 70, 80, 90)

  /** q169 [EXT]: dedup threshold sweep — the sizing table behind q88's
    * (and the whole near-dup family's) 0.5 cut: for each candidate
    * threshold, how many verified pairs and how many documents a
    * collapse at that threshold would touch. This is the number that
    * settles "should we dedup at 0.4 or 0.6?" BEFORE anyone re-runs a
    * 100 TB pipeline to find out — the q157/q160/q163 ladder family
    * applied to the dedup decision. Pairs are q88's EXACT universe
    * (the materialized [[PairTable]] — same df-capped index, same exact
    * Jaccard, [[ngramPairJaccard]] under `GRAFT_LABEL_MEMO=0`), so the
    * 0.5 row of this table is by construction q88's output
    * cardinality.
    *
    * 100 TB: all corpus-scale work is q88's (index + bucket self-join);
    * the sweep itself crosses the PAIR-GRAPH-sized jacc frame with the
    * broadcast 7-row ladder and shrinks to |ladder| rows — adding a
    * threshold costs pair-table work, not another corpus pass. FULLY
    * ORACLED: q88's CTE chain minus the cut, same ladder arithmetic
    * (string shingles — q88's collision argument carries to counts). */
  val q169DedupSweep: Q = (spark, dir) => {
    import spark.implicits._
    // the memoized pair artifact (q88's exact universe — [[PairTable]]);
    // no persist: the parquet scan feeds the one crossed build below
    val pairs = PairTable.of(spark, dir)
      .select(col("d1"), col("d2"), col("jacc"))
    val ladder = SweepThresholds.toDF("threshold_pct")
    val crossed = pairs.crossJoin(broadcast(ladder))
      .filter(col("jacc") >= col("threshold_pct").cast("double") / 100.0)
      .scopedPersist
    val nPairs = crossed.groupBy(col("threshold_pct"))
      .agg(count(lit(1)).as("n_pairs"))
    val nDocs = crossed
      .select(col("threshold_pct"),
        explode(array(col("d1"), col("d2"))).as("doc_id"))
      .groupBy(col("threshold_pct"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    orderAll(ladder
      .join(nPairs, Seq("threshold_pct"), "left")
      .join(nDocs, Seq("threshold_pct"), "left")
      .select(col("threshold_pct"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs")))
  }

  /** q170's ladder — same percent-integer convention as q169's. */
  private[queries] val QualityThresholds: Seq[Int] = Seq(30, 40, 50, 60, 70)

  /** q170 [EXT]: quality-threshold sweep — the sensitivity table behind
    * the q152/q162 fixed 0.5 cut: for each candidate threshold, the
    * documents and token mass the heuristic quality gate would keep,
    * in exact ppm of the corpus. Read next to q162's funnel, it says
    * whether the quality stage's yield is a cliff or a plateau — the
    * difference between a tunable gate and a fragile one.
    *
    * 100 TB: ONE corpus scan folds the q85 score and token count, then
    * collapses to an ≤101-row integer PERCENT-BIN table
    * (floor(quality·100) — for integer thresholds, x ≥ T ⟺ floor(x) ≥
    * T, so binning loses nothing and both engines compare the same
    * integers); the ladder crosses the BIN table, never the corpus.
    * FULLY ORACLED: q85's quality CTE, the same bin arithmetic. */
  val q170QualitySweep: Q = (spark, dir) => {
    import spark.implicits._
    val d = t(spark, dir, "documents")
    val bins = d.select(
      floor(qualityExpr * 100).cast("int").as("bin"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_toks"))
      .scopedPersist
    val totals = bins.agg(sum(col("n_docs")).as("t_docs"),
      sum(col("n_toks")).as("t_toks"))
    val ladder = QualityThresholds.toDF("threshold_pct")
    val kept = bins.crossJoin(broadcast(ladder))
      .filter(col("bin") >= col("threshold_pct"))
      .groupBy(col("threshold_pct"))
      .agg(sum(col("n_docs")).as("k_docs"), sum(col("n_toks")).as("k_toks"))
    orderAll(ladder
      .join(kept, Seq("threshold_pct"), "left")
      .crossJoin(broadcast(totals))
      .select(col("threshold_pct"),
        coalesce(col("k_docs"), lit(0L)).as("n_docs_kept"),
        coalesce(col("k_toks"), lit(0L)).as("n_tokens_kept"),
        expr(TokenStats.ppmSql("coalesce(k_docs, 0)", "t_docs"))
          .as("doc_keep_ppm"),
        expr(TokenStats.ppmSql("coalesce(k_toks, 0)", "t_toks"))
          .as("token_keep_ppm")))
  }

  /** Winnowing geometry (Schleimer/Wilkerson/Aiken 2003, "Winnowing:
    * Local Algorithms for Document Fingerprinting" — the MOSS
    * algorithm): k-gram width and window size, env-dialed and parsed
    * per call (the lazy-dial rule), interpolated into both oracles.
    * The guarantee: any shared token run of length ≥ w + k − 1 SHARES
    * at least one selected fingerprint — a detection floor q88's
    * whole-index Jaccard pays ~(w+1)/2× more index mass to beat. */
  private[graft] def winnowK: Int = {
    val k = sys.env.getOrElse("GRAFT_WINNOW_K", "4").toInt
    require(k >= 2, s"GRAFT_WINNOW_K=$k — a gram under 2 tokens is a typo")
    k
  }
  private[graft] def winnowW: Int = {
    val w = sys.env.getOrElse("GRAFT_WINNOW_W", "4").toInt
    require(w >= 1, s"GRAFT_WINNOW_W=$w — the window must be at least 1")
    w
  }

  /** The engine-portable token code winnowing folds into its gram
    * hashes — 4 probes (length, first/mid/last chars) instead of q87's
    * 2, because here the hash is VALUE-critical twice over: selection
    * picks window MINIMA and q166 JOINS on the result, so token codes
    * that merely collide on shape (same length + first char — measured:
    * a `w1_5`/`w2_5`-style synthetic vocabulary made every doc's code
    * sequence identical and every pair flag at overlap 1.0) would merge
    * unrelated grams corpus-wide. The 4-probe code keeps the oracle
    * EXACT (both engines compute the identical numbers — the whole
    * reason a library hash like xxhash64 can't be used here) while
    * pricing a false gram merge at a simultaneous 4-way collision.
    * Empty tokens code to 0 in both spellings. */
  private[graft] def winnowTokenCode(tk: Column): Column =
    when(length(tk) === 0, lit(0L)).otherwise(
      (length(tk) * 17 + ascii(substring(tk, 1, 1))
        + lit(257L) * ascii(tk.substr(length(tk), lit(1)))
        + lit(65537L) * ascii(tk.substr(
          ((length(tk) + lit(1)) / lit(2)).cast("int"), lit(1))))
        .cast("long"))

  /** SQL twin of [[winnowTokenCode]] over a lambda variable `t` —
    * `(length+1) // 2` ≡ the engine's truncating cast on the
    * non-negative midpoint. */
  private[queries] val winnowTokenCodeSql: String =
    "CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT) ELSE " +
      "CAST(length(t) * 17 + ascii(substr(t, 1, 1)) " +
      "+ 257 * ascii(substr(t, length(t), 1)) " +
      "+ 65537 * ascii(substr(t, (length(t) + 1) // 2, 1)) AS BIGINT) END"

  /** The winnowed fingerprint set of a MATERIALIZED token-code array
    * column: k-gram rolling hashes over [[winnowTokenCode]] values,
    * then the distinct minima of every w-window. Rightmost tie-break
    * is irrelevant for the VALUE set (ties select the same value), so
    * the set is total-order-free and oracle-exact. Pure row-local HOF
    * folds — O(n·(k+w)) per doc, no shuffle. */
  private[graft] def gramHashes(codes: Column, k: Int): Column =
    // guarded: sequence(1, n <= 0) DESCENDS (q64's gotcha) and the
    // descending indices land element_at out of bounds
    when(size(codes) >= k,
      transform(sequence(lit(1), size(codes) - (k - 1)),
        i => (0 until k).foldLeft(lit(0L))((h, o) =>
          pmod(h * 31 + element_at(codes, i + o), lit(KnuthP)))))
      .otherwise(array().cast("array<bigint>"))

  /** Window-min selection over a MATERIALIZED grams column. BOTH
    * inputs must ride their own projections: an inline [[gramHashes]]
    * here re-evaluates the whole gram transform PER WINDOW START
    * (lambda interiors evaluate interpretively, outside codegen CSE —
    * the q135/q64 defect class; measured on this very op: 6.9 s solo
    * at sf0.1 inlined vs the materialized spelling's q88-beating
    * floor). A doc with fewer than k tokens has NO grams
    * (sequence(1, n<=0) DESCENDS — q64's gotcha) and selects the empty
    * set; with 1 <= n_grams < w the single truncated window selects
    * the global min (slice truncates at the array edge). */
  private[graft] def winnowSelect(grams: Column, w: Int): Column =
    when(size(grams) >= 1,
      array_distinct(transform(
        sequence(lit(1), greatest(size(grams) - (w - 1), lit(1))),
        i => array_min(slice(grams, i, lit(w))))))
      .otherwise(array().cast("array<bigint>"))

  /** The gram-fold + window-min oracle CTE pair over a `tk(doc_id,
    * codes)` CTE — IDENTICAL arithmetic to [[winnowedFps]] (the hash is
    * VALUE-critical here: selection picks minima, so the oracle must
    * compute the same numbers, not merely distinct ones). Emits CTEs
    * `g` (grams) and `sel` (n_grams, fps). */
  private[queries] def winnowSelCte(k: Int, w: Int): String = {
    val gh = (0 until k).foldLeft("CAST(0 AS BIGINT)")((h, o) =>
      s"(($h * 31 + codes[i + $o]) % 1000000007)")
    s"""g AS (
       |  SELECT doc_id, codes,
       |    list_transform(range(1, len(codes) - ${k - 2}), i -> $gh)
       |      AS grams
       |  FROM tk),
       |sel AS (
       |  SELECT doc_id, len(grams) AS n_grams,
       |    CASE WHEN len(codes) >= $k THEN
       |      list_distinct(list_transform(
       |        range(1, greatest(len(grams) - ${w - 1}, 1) + 1),
       |        i -> list_min(grams[i : least(i + ${w - 1}, len(grams))])))
       |    ELSE CAST([] AS BIGINT[]) END AS fps
       |  FROM g)"""
  }

  /** q165 [EXT]: winnowing fingerprint density — the per-document stats
    * of the MOSS selection: gram count, selected-fingerprint count, and
    * the realized density in exact ppm (theory: 2/(w+1) for random
    * hashes — the number that prices the q166 index against q88's full
    * inverted index). TOTAL: docs shorter than k tokens report 0/0/0.
    *
    * 100 TB: the ideal map-only shape — token codes, gram hashes, and
    * window minima are three row-local HOF folds in one scan's codegen
    * stage; no Generate, no join, no exchange before the dump sort
    * (q139's class). FULLY ORACLED: the hash arithmetic is the
    * portable 4-probe spelling ([[winnowTokenCode]]), so DuckDB
    * selects the IDENTICAL fingerprint sets. The frame itself is the
    * shared batch/stream code object
    * [[graft.streaming.WinnowFingerprinter]] (s102 streams it
    * row-identically at ingest), so this oracle certifies the stream. */
  val q165WinnowStats: Q = (spark, dir) =>
    orderAll(graft.streaming.WinnowFingerprinter.stats(
      t(spark, dir, "documents"), winnowK, winnowW))

  /** q166 [EXT]: winnowing overlap — partial-copy detection with a
    * GUARANTEE: any two documents sharing a token run of length ≥
    * w + k − 1 share at least one winnowed fingerprint, so the
    * inverted index below cannot miss a copied span above the floor —
    * the property q88's Jaccard (whole-doc similarity) and q69's
    * containment probe (first-shingle heuristic) don't give. Pairs
    * sharing fingerprints are scored by min-containment
    * (common / min(|A|, |B|)) ≥ 0.5 — the mid-document quotation /
    * boilerplate-splice class. Universe: the planted near-dup corpus
    * (q68's originals + truncated re-crawls), so every planted pair is
    * an observable guarantee witness.
    *
    * 100 TB: the index carries only the winnowed ~2/(w+1) of gram
    * mass (the op's whole point — q165 prices it), fingerprints are
    * 8-byte BIGINTs on every exchange, the df cap bounds bucket
    * occupancy exactly as q88's (same dial, mirrored in the oracle),
    * and candidate generation is the bucket self-join — never
    * all-pairs. FULLY ORACLED — exactly, not collision-modulo: the
    * portable hash makes DuckDB's selected sets identical, so the
    * pair counts match by construction. */
  val q166WinnowOverlap: Q = (spark, dir) => {
    val (k, w) = (winnowK, winnowW)
    // the fingerprint rows come from the SAME shared code object the
    // s102 ingest stream runs, so the index q166 joins is exactly what
    // ingest-time extraction would have appended
    val fps = graft.streaming.WinnowFingerprinter
      .fpRows(docsWithNearDups(spark, dir), k, w)
      .scopedPersist
    val informative = fps.groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= ShingleDfCap)
      .select("fp")
    val kept = fps.join(informative, Seq("fp")).scopedPersist
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    val pairs = kept.as("a").join(kept.as("b"), Seq("fp"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("common"))
    val j = pairs
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n_fp", "s1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n_fp", "s2"), "d2")
      .withColumn("overlap",
        round(col("common").cast("double") / least(col("s1"), col("s2")), 6))
      .filter(col("overlap") >= 0.5)
    orderAll(j.select(col("d1"), col("d2"), col("common"), col("overlap")))
  }

  /** q89 banding geometry. Band width must grow ~log2(corpus size) for
    * the within-band join to stay sub-quadratic: non-dup docs collide on
    * a band with probability ~2^-SimhashBandBits, so expected bucket
    * occupancy is n · NumBands / 2^BandBits — at 16 bits that's ~15 k
    * docs/bucket at 1 B docs (vs ~4 M with the 8-bit bands this
    * replaced). For larger corpora raise BandBits (and the hash width)
    * rather than the band count — env knob GRAFT_SIMHASH_BAND_BITS. */
  private def SimhashBandBits = geom.simhashBandBits
  private def SimhashNumBands = geom.simhashBands // bands × bits = the full 64-bit sketch

  /** q89: SimHash near-dup — 64-bit simhash over distinct shingle
    * fingerprints (the xxhash64 values' own bits are the per-shingle
    * hash vector), banded into 4×16-bit slices for candidate
    * generation, verified by hamming distance (bit_count(xor)). The
    * sketch is the native `simhash64` expression — one codegen'd pass
    * per document (this replaced a typed map, which paid an encoder
    * round-trip per document, which in turn had replaced an explode +
    * per-bit aggregate that shuffled |tokens| rows per doc and ran 6×
    * slower). Like MinHash (q81), the sketch is over 3-token SHINGLES:
    * unigram distinct-token sets over a small vocabulary are
    * near-identical across documents, which drives every pairwise
    * hamming distance under the threshold and turns the candidate join
    * into all-pairs (observed: 14 M candidate rows at sf0.1).
    *
    * No oracle — and measurably CANNOT have one by q81's verified-pairs
    * recipe: an exact-similarity oracle requires the candidate stage to
    * have recall 1 above some threshold, and simhash banding does not
    * (measured via tools/Q89Probe at sf0.01: 112 of the 600 exact-
    * Jaccard ≥ 0.5 pairs agree on ZERO of the 4×16-bit bands, and the
    * maximum Jaccard among those misses is 0.9895 — on ~100-shingle
    * documents each per-bit majority margin is ~√|shingles| ≈ 10, so
    * dropping one shingle flips every near-zero-margin bit and true
    * near-dups land at hamming 4-15, spread across all four bands. A
    * banding that GUARANTEES hamming ≤ 15 recall needs 16×4-bit bands =
    * 16 bucket values per band — degenerate occupancy). SimHash's
    * contract is hamming-on-sketch, not Jaccard; it stays rows-only
    * with planted-pair recall + the hamming-ball property test, and
    * q81/q88/q92 are the oracled near-dup modalities. */
  val q89DedupSimhash: Q = (spark, dir) => {
    graft.functions.SimHash64.register(spark)
    val d = docsWithNearDups(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
    // persisted: beyond the two consumers (x/y band sides), the cache is
    // an optimizer barrier — the hamming residual's inferred
    // isnotnull(simhash) constraint otherwise substitutes the WHOLE
    // sketch expression into the scan filters and re-evaluates it per
    // row per side (measured: 2s → 28s at sf0.1 without the persist)
    val simhash = d
      .withColumn("shingles",
        array_distinct(transform(sequence(lit(1), size(col("toks")) - 2),
          i => xxhash64(
            element_at(col("toks"), i),
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2)))))
      .select(col("doc_id"), expr("simhash64(shingles)").as("simhash"))
      .scopedPersist
    val bandMask = (1L << SimhashBandBits) - 1
    // band rows carry ONLY (doc_id, band); the 8-byte sketches are
    // re-joined by id from the persisted frame for verification — same
    // shape as q81/q92, plus the hot-band occupancy cap
    val banded = simhash.select(col("doc_id"),
      explode(array((0 until SimhashNumBands).map(k =>
        concat_ws(":", lit(k),
          shiftright(col("simhash"), k * SimhashBandBits).bitwiseAND(bandMask))): _*))
        .as("band"))
    val cands = bandCandidates(banded, geom.bandOccupancyCap)
      .join(simhash.select(col("doc_id").as("d1"), col("simhash").as("h1")), Seq("d1"))
      .join(simhash.select(col("doc_id").as("d2"), col("simhash").as("h2")), Seq("d2"))
    orderAll(cands
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= 6) // 6/64 ≈ the 3/32 threshold this replaced
      .select(col("d1"), col("d2"), col("hamming")))
  }

  /** q91 bucketing geometry. SrpBits is the knob that scales with corpus
    * size (buckets = 2^SrpBits; expected occupancy n/2^bits — pick bits ≈
    * log2(n / target_bucket_size), e.g. 20 bits for 1 B vectors at ~1 k
    * per bucket). 8 bits = 256 buckets here, vs the 16-buckets-ever
    * first-4-dim-signs scheme this replaced. Recall is recovered by
    * multi-probing: each query also probes every bucket within hamming
    * distance ProbeRadius of its own code (1 + 8 + 28 = 37 probes at
    * the default radius 2 — a 37/256 ≈ 14% bucket scan per query, vs
    * 100% for brute force; the radius is the recall-vs-work knob and
    * shrinks relative to 2^bits as bits grow with corpus size). Both
    * knobs are env-backed like the rest of the geometry: GRAFT_SRP_BITS
    * and GRAFT_SRP_PROBE_RADIUS; the embedding width (a property of the
    * upstream embedding model) is GRAFT_EMBEDDING_DIM. */
  private def SrpBits = geom.srpBits
  private def ProbeRadius = geom.srpProbeRadius
  private def EmbeddingDim = geom.embeddingDim

  /** All XOR masks within hamming distance `radius` of zero over `bits`
    * bit positions — the q91 multi-probe set. Enumeration is
    * combinatorial (Σ_{r≤radius} C(bits, r) masks materialized, never
    * 2^bits scanned), so build cost tracks the probe count itself as
    * geometry grows. */
  private[graft] def probeMasks(bits: Int, radius: Int): Seq[Int] =
    (0 to radius).flatMap(r =>
      (0 until bits).combinations(r).map(_.foldLeft(0)((m, b) => m | (1 << b))))

  /** Deterministic ±1 projection matrix (murmur of (bit, dim) — no RNG so
    * plans are reproducible across sessions and engines), one row per SRP
    * bit of the given geometry. */
  private[graft] def srpWeights(g: SketchGeometry): IndexedSeq[Seq[Double]] =
    (0 until g.srpBits).map { b =>
      (0 until g.embeddingDim).map { dim =>
        // caseClassHash: on 2.13.17 the deprecated productHash already
        // delegates to these semantics (verified equal over (b, dim) ∈
        // 64×256 in-console), so bucket codes — and the measured recall
        // numbers in SCALEPROBE.md — are preserved exactly
        if (scala.util.hashing.MurmurHash3.caseClassHash((b, dim)) >= 0) 1.0
        else -1.0
      }
    }

  /** SRP bucket code of an embedding column — shared by q91 (ANN) and
    * q92 (embedding dedup). Sign summation is a sequential fold; the
    * SQL mirror ([[srpBucketSql]]) uses list_dot_product, whose
    * different summation order could only flip a sign at |proj| ≲ 1e-14
    * (probability ~1e-14 per projection on unit vectors — ignorable). */
  private[graft] def srpBucket(e: org.apache.spark.sql.Column,
      g: SketchGeometry = geom): org.apache.spark.sql.Column =
    // native fused kernel (graft.functions.SignedProjectionBucket):
    // all srpBits dot products in one codegen'd loop nest, same
    // per-projection left-to-right fold as the aggregate(zip_with(...))
    // spelling it replaced (srpBits × 2 HOF evaluations and
    // intermediate arrays per row), so bucket codes — and the
    // serialized-matrix DuckDB oracles — are preserved bit-for-bit
    graft.functions.SignedProjectionBucket(e, srpWeights(g))

  /** The same bucket code as DuckDB SQL over a DOUBLE[] column: the ±1
    * matrix is serialized into list literals so candidate generation in
    * the oracle matches the engine bit-for-bit. */
  private[queries] def srpBucketSql(col: String): String =
    (0 until SrpBits).map { b =>
      val w = srpWeights(geom)(b).map(x => if (x > 0) "1.0" else "-1.0")
        .mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product($col, $w) > 0 THEN ${1 << b} ELSE 0 END)"
    }.mkString(" + ")

  /** q91: bucketed ANN (signed-random-projection LSH) — the 100 TB
    * similarity path: bucket = sign pattern of SrpBits random ±1
    * projections of the full vector, join queries to corpus within
    * probed buckets only, top-3 per query. The corpus side stays
    * partitioned (one bucket pass, no per-query scan); only the tiny
    * query side fans out ×|probes| and is broadcast. FULLY ORACLED
    * via q75's recipe plus the probe expansion: the ±1 matrix AND the
    * hamming-ball mask set (both env-backed) are serialized into the
    * DuckDB SQL ([[q91OracleSql]]), so candidate buckets match
    * bit-for-bit; the recall-vs-radius curve + q82 score agreement
    * stay asserted in LlmOpsSpec. */
  val q91SimilarityIvf: Q = (spark, dir) => q91WithGeometry(geom)(spark, dir)

  /** q91 with explicit geometry — the declared query binds the env-backed
    * [[geom]]; specs pass overridden geometries to measure the
    * recall-vs-work curve of `srpProbeRadius` live. */
  private[graft] def q91WithGeometry(g: SketchGeometry): Q = (spark, dir) => {
    graft.functions.CosineSimilarity.register(spark)
    val v = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    // persisted: consumed by both the corpus side and the query probes,
    // and the cache keeps the 8-projection bucket expression from being
    // substituted into downstream filter constraints
    val corpus = v.withColumn("bkt", srpBucket(col("e"), g))
      .scopedPersist
    // multi-probe: every code mask within hamming distance ProbeRadius,
    // enumerated combinatorially so the build cost is Σ C(bits, r≤radius),
    // not O(2^bits), when geometry grows
    val masks = probeMasks(g.srpBits, g.srpProbeRadius)
    val probes = array(masks.map(m => col("bkt").bitwiseXOR(lit(m))): _*)
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        explode(probes).as("bkt"))
    val scored = corpus.join(broadcast(queries), Seq("bkt"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(cosine("qe", "e"), 6).as("cos6"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos6").desc, col("nid").asc)
    orderAll(scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("rnk"), col("nid"), col("cos6")))
  }

  /** q92: embedding-cosine near-dup dedup — the fifth dedup modality
    * (exact q80, minhash q81, ngram q88, simhash q89, and now vector
    * space): a deterministic "re-embedding" copy of each vector (one
    * dimension nudged +0.05, id + 1e6) is planted, candidates are
    * generated by a self equi-join on the q91 SRP bucket code (never a
    * cross join — at 100 TB the join fans out per bucket, occupancy
    * n/2^bits), and candidates are verified with exact cosine ≥ 0.9
    * (planted pairs score ≥ 0.9987 on this data; unrelated same-bucket
    * pairs ≤ 0.514 — the threshold sits in a wide gap, so float noise
    * can't flip membership). FULLY ORACLED, unlike the other
    * hash-sketch dedups: the ±1 projection matrix is serialized into
    * the DuckDB SQL, so both engines build identical buckets.
    *
    * Geometry-parameterized (the declared q92 binds the env-backed
    * [[geom]]): bucket count 2^srpBits is the operational dial that
    * holds bucket occupancy — and so the quadratic-in-occupancy
    * candidate stage — constant as the corpus grows (ScaleProbe
    * demonstrates the scaling: bits + log2(k) at k× data keeps
    * candidate work linear). */
  private[graft] def q92WithGeometry(g: SketchGeometry): Q = (spark, dir) => {
    graft.functions.CosineSimilarity.register(spark)
    val v = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val planted = v.select((col("vec_id") + 1000000).as("vec_id"),
      concat(slice(col("e"), 1, EmbeddingDim - 1),
        array(element_at(col("e"), EmbeddingDim) + lit(0.05))).as("e"))
    // persisted: three consumers (the id-only candidate join + two
    // verify sides), and the cache barrier keeps the bucket projection
    // out of inferred scan constraints
    val corpus = v.unionByName(planted).withColumn("bkt", srpBucket(col("e"), g))
      .scopedPersist
    // Candidate generation shuffles (vec_id, bkt) ONLY — ~12 bytes/row,
    // never the 64-dim vectors (512 B/row): at 100 TB the bucket join
    // moves a fingerprint table, not the corpus twice. The exact-cosine
    // verify re-joins `e` by vec_id afterwards — candidates << corpus,
    // so those joins are broadcast-able at scale (same shape as q81's
    // band join, LlmOps.scala q81 verify step). Each vector has exactly
    // one bucket code, so candidate pairs are already distinct.
    val ids = corpus.select(col("vec_id"), col("bkt"))
    val cands = ids.as("x").join(ids.as("y"), Seq("bkt"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("v1"), col("y.vec_id").as("v2"))
    val pairs = cands
      .join(corpus.select(col("vec_id").as("v1"), col("e").as("e1")), Seq("v1"))
      .join(corpus.select(col("vec_id").as("v2"), col("e").as("e2")), Seq("v2"))
      .select(col("v1"), col("v2"), round(cosine("e1", "e2"), 6).as("cos6"))
      .filter(col("cos6") >= 0.9)
    orderAll(pairs)
  }

  val q92DedupEmbedding: Q = (spark, dir) => q92WithGeometry(geom)(spark, dir)

  private def q92OracleSql: String = {
    val cosSql = "round(list_dot_product(x.e, y.e) / " +
      "(sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))), 6)"
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |all_v AS (
       |  SELECT vec_id, e FROM v
       |  UNION ALL
       |  SELECT vec_id + 1000000,
       |    list_concat(e[1:${EmbeddingDim - 1}], [e[$EmbeddingDim] + 0.05])
       |  FROM v),
       |b AS (SELECT vec_id, e, ${srpBucketSql("e")} AS bkt FROM all_v)
       |SELECT x.vec_id AS v1, y.vec_id AS v2, $cosSql AS cos6
       |FROM b x JOIN b y ON x.bkt = y.bkt AND x.vec_id < y.vec_id
       |WHERE $cosSql >= 0.9
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin
  }

  /** q91's oracle — q75's SRP-bucket recipe plus the multi-probe
    * expansion: the same env-backed hamming-ball mask set the engine
    * enumerates ([[probeMasks]] — Σ C(bits, r≤radius) masks, 37 at the
    * default 8-bit/radius-2 geometry) is serialized into an unnest
    * literal, so the probed candidate buckets match the engine
    * bit-for-bit. Each corpus vector has exactly one bucket and probe
    * masks are distinct, so a (qid, nid) pair matches at most once —
    * no dedup stage in either engine. */
  private def q91OracleSql: String = {
    val masks = probeMasks(SrpBits, ProbeRadius).mkString("[", ",", "]")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, e, ${srpBucketSql("e")} AS bkt FROM v),
       |q AS (
       |  SELECT vec_id AS qid, e AS qe, xor(bkt, m.mask) AS bkt
       |  FROM b, (SELECT unnest($masks) AS mask) m
       |  WHERE vec_id < 10),
       |cand AS (
       |  SELECT q.qid, c.vec_id AS nid,
       |    round(list_dot_product(q.qe, c.e) /
       |      (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.e, c.e))), 6) AS cos6
       |  FROM b c JOIN q ON c.bkt = q.bkt AND c.vec_id <> q.qid),
       |r AS (SELECT qid, nid, cos6,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos6 DESC, nid ASC) AS INT) AS rnk
       |      FROM cand)
       |SELECT qid, rnk, nid, cos6 FROM r WHERE rnk <= 3
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin
  }

  /** q94: deterministic train/val/test split — reproducible assignment
    * is table stakes for a training pipeline: bucket =
    * ((doc_id mod P) · K mod P) mod 100 with P = 1e9+7 and the Knuth
    * multiplicative constant K, exact BIGINT arithmetic identical on
    * every engine (no engine-local RNG or hash), 80/10/10. The mod-P
    * reduction BEFORE the multiply keeps the product < 2.7e18 for ANY
    * int64 doc_id (a straight doc_id·K wraps silently in non-ANSI Spark
    * and errors in DuckDB/ANSI at doc_id ≥ ~3.5e9, and its mod-100
    * would collapse to a function of doc_id mod 100 anyway); the mod-P
    * product mixes the full id range before bucketing. Pure projection:
    * no shuffle at any scale, and the split is stable under corpus
    * growth (a doc's assignment never changes when rows are added —
    * unlike randomSplit or salted sampling). */
  val q94TrainTestSplit: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val bucket = knuthBucket(col("doc_id"), 100L)
    val split = when(bucket < 80, lit("train"))
      .when(bucket < 90, lit("val"))
      .otherwise(lit("test"))
    orderAll(d.select(col("doc_id"), bucket.as("bucket"), split.as("split")))
  }

  /** q95: deterministic hash sampling — the reproducible-ablation
    * subsampling primitive. A doc is in the 10% sample iff its Knuth
    * multiplicative bucket (q94's arithmetic, mod 1000) lands under 100.
    * No RNG, no shuffle beyond the output sort: the same doc is in the
    * sample on every run, every cluster, every corpus size — unlike
    * `df.sample`, whose membership shifts with partitioning, a backfill
    * never silently changes which documents an ablation trained on. At
    * 100 TB this is a pure scan-side filter (predicate on a projected
    * expression, corpus never reshuffled). */
  val q95SampleHash: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val bucket = knuthBucket(col("doc_id"), 1000L)
    orderAll(d.filter(bucket < 100)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        bucket.as("bucket")))
  }

  /** q132 [EXT]: temperature-scaled language rebalancing — the
    * multilingual-mixing rule (exponent-smoothed sampling): language L
    * with natural share p_L is kept at rate ∝ p_L^(α−1), flattening
    * the head so low-resource languages are not drowned by the
    * English-dominant crawl (the fixture's real shape: en carries ~3×
    * any other lang, so the rule visibly fires), normalized so the
    * SMALLEST language keeps everything (pure downsampling — no
    * upsampling, no duplicated rows). α is FIXED at 1/2: keep rate
    * r_L = √(n_min/n_L), because sqrt is the one power IEEE 754
    * guarantees correctly rounded — identical in Spark and DuckDB —
    * where an arbitrary-α pow() is libm-specific and would make the
    * hash gate probabilistic (q70's no-ln argument, applied to the
    * mixing exponent). Rates quantize to permille (floor — exact) and
    * gate q94's deterministic Knuth bucket, so membership is stable
    * under corpus growth and reruns like q95's sample.
    *
    * Output is TOTAL with an audit (n_lang, rate_permille, bucket,
    * kept), q103's gate convention: the rewrite is `filter(kept)` and
    * the mixing report is the same frame.
    *
    * 100 TB: per-language counts are an aggregate (langs ≪ corpus) that
    * BROADCASTS back onto the scan; the keep decision is row-local —
    * the corpus is read once and never shuffled. */
  val q132TemperatureMix: Q = (spark, dir) =>
    orderAll(temperatureMix(t(spark, dir, "documents")))

  /** q132's core over any (doc_id, lang) frame — factored (q139's
    * pattern) so the spec can drive the NULL-lang verdict directly. */
  private[graft] def temperatureMix(d: DataFrame): DataFrame = {
    // NULL lang coalesces to a sentinel language so an unscorable doc
    // still receives a kept/dropped verdict (the TOTAL-gate contract —
    // an equi-join on raw lang would silently drop it, the exact
    // failure mode the Decontaminator warns against); the output keeps
    // the ORIGINAL lang column, the sentinel only keys the rate
    val lk = coalesce(col("lang"), lit("__und__"))
    val counts = d.groupBy(lk.as("lang_key")).agg(count(lit(1)).as("n_lang"))
    val minN = counts.agg(min(col("n_lang")).as("n_min"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("lang_key"), col("n_lang"),
        floor(lit(1000.0) *
            sqrt(col("n_min").cast("double") / col("n_lang").cast("double")))
          .cast("long").as("rate_permille"))
    val bucket = knuthBucket(col("doc_id"), 1000L)
    d.select(col("doc_id"), col("lang"), lk.as("lang_key"),
        bucket.as("bucket"))
      .join(broadcast(rates), Seq("lang_key"))
      .select(col("doc_id"), col("lang"), col("n_lang"), col("rate_permille"),
        col("bucket"), (col("bucket") < col("rate_permille")).as("kept"))
  }

  /** q96: per-language quota cap — corpus curation caps each language at
    * K=50 docs, keeping the best under a deterministic order (longest
    * first, doc_id tiebreak; in production the q85 quality score slots in
    * as the ranking column). One shuffle on `lang`, then a per-group
    * sort+rank: with K bounded and languages in the hundreds the group
    * count is tiny relative to the corpus, so the worry is the window
    * rank shuffling the WHOLE corpus to keep 50 rows per language.
    * Catalyst already prevents that: a rank filter over a window plans a
    * `WindowGroupLimit(Partial)` BEFORE the exchange — each map task
    * forwards at most k rows per language, the same bounded-heap trick a
    * hand-written mapPartitions prefilter would do, minus the
    * row-serialization cost (a GroupTopK operator built here was
    * measured strictly worse and deleted — don't hand-schedule what the
    * optimizer does). PlanSpec pins the Partial node so a regression in
    * that rewrite can't silently reinstate the full-corpus shuffle. */
  val q96QuotaPerLang: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    orderAll(d.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 50)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("rk")))
  }

  /** q97: token-budget sequence packing — assign each doc to a training
    * pack of ~512 whitespace tokens (q86's ws_tokens measure): pack_id =
    * floor(running-token-total-before-this-doc / 512) within a `source`
    * shard, docs in doc_id order. The floor-of-prefix-sum formulation is
    * the window-expressible packing used at scale (a pack may overrun by
    * at most one doc, vs the sequential greedy variant that cannot be
    * parallelized); parallelism = #shards, the same sharding production
    * packing jobs use. One shuffle on `source`; the prefix sum is a
    * single window pass. */
  val q97PackSequences: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val tok = size(split(col("text"), " ")).cast("long")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumBefore = coalesce(sum(tok).over(w), lit(0L))
    orderAll(d.select(col("doc_id"), col("source"), tok.as("n_tokens"),
      floor(cumBefore / lit(512.0)).cast("long").as("pack_id")))
  }

  /** Sliding-window chunk geometry for q130 — window W tokens, stride S
    * (overlap W−S). Env-dialed; the oracle SQL interpolates the SAME
    * values so both engines chunk on one geometry. */
  private[graft] val ChunkWindow: Int = {
    val w = sys.env.getOrElse("GRAFT_CHUNK_WINDOW", "64").toInt
    require(w >= 2, s"GRAFT_CHUNK_WINDOW=$w — a window under 2 tokens is a typo")
    w
  }
  private[graft] val ChunkStride: Int = {
    val s = sys.env.getOrElse("GRAFT_CHUNK_STRIDE", "48").toInt
    require(s >= 1 && s <= ChunkWindow,
      s"GRAFT_CHUNK_STRIDE=$s must sit in [1, window=$ChunkWindow] — a stride " +
        "past the window leaves token gaps no chunk covers")
    s
  }

  /** q130 [EXT]: sliding-window chunking — q97's complement: q97 PACKS
    * short documents into fixed-budget sequences; this SPLITS long
    * documents into window-W token chunks at stride S, the overlap
    * (W−S tokens) preserving cross-boundary context the way a
    * pretraining tokenizer pipeline expects (a sentence cut at a hard
    * boundary reappears whole in the next chunk). Chunks start at token
    * 1, 1+S, 1+2S, … ≤ n, so every token lands in ≥ 1 chunk for any
    * S ≤ W (the dial's own require), and the tail chunk truncates to
    * the document edge rather than padding — n_chunk_toks carries the
    * truth.
    *
    * 100 TB: the ideal map-only shape — one row-local Generate
    * (posexplode over the start sequence) inside whole-stage codegen,
    * NO shuffle, NO join, output ~n/S rows per doc; the corpus is read
    * once and chunk rows stream straight to the sink. Geometry is
    * env-dialed and interpolated into the oracle (q103's convention).
    * The projection is the shared batch/stream code object
    * [[graft.streaming.Chunker]] (s82/s85's convention) — s93 pins the
    * streaming spelling row-identical to this oracled batch answer. */
  val q130ChunkWindows: Q = (spark, dir) => orderAll(
    graft.streaming.Chunker.chunk(t(spark, dir, "documents"),
      ChunkWindow, ChunkStride))

  /** q77: text normalization — the canonicalization pass that FEEDS
    * dedup (q80 groups by `lower(trim(text))`; production corpora also
    * need whitespace collapse and control-char stripping before any
    * hash is stable). Pure row-local codegen'd expressions; the
    * patterns stick to classes with identical Java-regex/RE2 meaning,
    * so the op is fully oracled. */
  val q77TextNormalize: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val norm = regexp_replace(
      regexp_replace(lower(trim(col("text"))), "[\\x00-\\x1F]", " "),
      "\\s+", " ")
    orderAll(d.select(
      col("doc_id"),
      length(col("text")).as("n_raw"),
      length(norm).as("n_norm"),
      substring(norm, 1, 32).as("norm_prefix")))
  }

  /** q79: multi-pattern PII scrubbing — the redaction pass every
    * training corpus runs before the tokenizer, over the three pattern
    * families a real pass owes you: emails, phone numbers, and
    * SSN-shaped ID numbers. The synthetic corpus carries no PII, so the
    * query deterministically PLANTS one instance class per residue of
    * `doc_id % 10` (0 → email, 3 → phone, 6 → ID) and then scrubs; the
    * op under test is the scrubber, the plants make its effect
    * observable and oracle-checkable. All three patterns stick to
    * character classes + bounded quantifiers + ASCII `\b` word
    * boundaries that mean the same thing in Java regex (Spark,
    * codegen'd regexp_replace) and RE2 (DuckDB). The patterns are
    * mutually exclusive by construction (the ID's 2-digit middle group
    * cannot match the phone's 3–4-digit one), so scrub order cannot
    * change the result. Per-pattern counts are measured on the raw
    * text; `clean` pins that NO pattern matches the final scrubbed
    * text — the property a redaction pass actually owes you.
    * Row-local codegen'd projection, no shuffle at any scale. The
    * plant, patterns, and report live in
    * [[graft.streaming.PiiScrubber]] (the s82/s85/s93/s95 shared
    * batch/stream code-object convention) so the s97 ingest-time
    * scrub gate runs the IDENTICAL expression this oracle certifies —
    * redaction belongs at ingest, before unredacted text lands
    * anywhere downstream. */
  val q79PiiScrub: Q = (spark, dir) =>
    orderAll(graft.streaming.PiiScrubber.scrub(t(spark, dir, "documents")))

  /** q99: deterministic dataset mixture — the pretraining reweighting
    * primitive: each source gets a sampling rate (upweighted curated
    * sources kept in full, bulk web crawl cut hard), applied as
    * `q94-bucket(doc_id) < rate` — no RNG, so the mixture is
    * reproducible row-for-row across runs and clusters, and raising a
    * source's rate later ADDS docs without reshuffling the ones already
    * in (nested samples: rate 25 ⊂ rate 50 ⊂ rate 100). Pure
    * projection + filter; the rate table is config, not data. */
  val q99DatasetMixture: Q = (spark, dir) => {
    val rates = Seq("src0" -> 100L, "src1" -> 50L, "src2" -> 25L) // % kept
    val defaultRate = 10L
    val bucket = knuthBucket(col("doc_id"), 100L)
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col("source") === s, lit(r)).otherwise(acc)
    }
    orderAll(t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), bucket.as("bucket"), rate.as("rate"))
      .filter(col("bucket") < col("rate")))
  }

  /** q63: benchmark decontamination — the pre-training hygiene pass that
    * catches eval data leaked into the training corpus. Eval set = every
    * 97th document; the corpus = the rest PLUS a planted near-verbatim
    * leak of each eval doc (last token dropped, id + 3e6) so the check
    * has guaranteed true positives. Overlap = fraction of a corpus doc's
    * distinct n-token shingles that appear in ANY eval doc; docs at
    * overlap ≥ 0.5 are flagged contaminated.
    *
    * The shingle width n is env-backed ([[graft.core.SketchGeometry]],
    * GRAFT_DECON_SHINGLE_N, default 3 — the sf0.01 oracle geometry):
    * production decontamination runs 8–13-token n-grams, because a
    * 3-gram flags incidental phrase overlap while a wide shingle only
    * fires on near-verbatim leaks (LlmOpsSpec proves both behaviors at
    * n=8: planted leaks still flagged, cross-doc overlap gone). The
    * oracle SQL is generated from the SAME knob.
    *
    * 100 TB posture: the eval/benchmark side is benchmark-sized (10²–10⁵
    * docs), so its distinct-shingle set is BROADCAST — the corpus is
    * never shuffled for candidate generation; the only exchange is the
    * per-doc hit count, which carries (doc_id, n_sh, cnt) ~20 B/row.
    * Shingles are xxhash64 fingerprints (q88's argument: equality is all
    * membership needs; the string-form oracle would surface any
    * collision as a hash mismatch). The shingle array is materialized
    * ONCE per row (`withColumn` then size/explode of the attribute) —
    * selecting size(expr) and explode(expr) directly would evaluate the
    * full transform twice per corpus row, since subexpression
    * elimination does not cross the Generate boundary (PlanSpec pins
    * single evaluation; measured ~2× the per-row hashing cost).
    * Empirical linearity at k× corpus: tools/ScaleProbe (SCALEPROBE.md). */
  private[queries] def q63With(n: Int): Q = (spark, dir) => {
    // SketchGeometry already enforces this for the env path; direct test
    // callers must fail fast too (n=1 degenerates the shingle sequence
    // and the oracle's ' || ' join)
    require(n >= 2, s"decontamination shingle width must be >= 2, got $n")
    val base = t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
    val evalDocs = base.filter(col("doc_id") % 97 === 0)
    val leaked = evalDocs
      .withColumn("doc_id", col("doc_id") + 3000000)
      .withColumn("toks", slice(col("toks"), lit(1), size(col("toks")) - 1))
    val corpus = base.filter(col("doc_id") % 97 =!= 0).unionByName(leaked)
      .filter(size(col("toks")) >= n)
    def shingleArr = array_distinct(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
      i => xxhash64((0 until n).map(o => element_at(col("toks"), i + o)): _*)))
    // explode_OUTER, deliberately: plain explode triggers Catalyst's
    // InferFiltersFromGenerate, which pushes `size(sha) > 0 AND
    // isnotnull(sha)` below the projection — re-expanding `sha` to the
    // full transform and evaluating it a SECOND time per corpus row in
    // the filter. The `size(toks) >= n` filter above already guarantees
    // every array is non-empty, so outer ≡ inner here (a null row could
    // not survive the inner join on `sh` anyway).
    val corpusSh = corpus
      .withColumn("sha", shingleArr)
      .select(col("doc_id"), size(col("sha")).as("n_sh"), explode_outer(col("sha")).as("sh"))
    // eval side materialized + outer-exploded for the same reason: plain
    // explode of the raw expression happens not to trigger
    // InferFiltersFromGenerate on Spark 4.1.2, but the symmetric form
    // removes the dependence on that optimizer detail (the size filter
    // above guarantees non-empty arrays, so outer ≡ inner here too)
    val evalSh = evalDocs.filter(size(col("toks")) >= n)
      .withColumn("sha", shingleArr)
      .select(explode_outer(col("sha")).as("sh")).distinct()
    val hits = corpusSh.join(broadcast(evalSh), Seq("sh"))
      .groupBy(col("doc_id"), col("n_sh"))
      .agg(count(lit(1)).as("n_hit"))
    orderAll(hits
      .withColumn("overlap", round(col("n_hit").cast("double") / col("n_sh"), 6))
      .withColumn("contaminated", col("overlap") >= 0.5)
      .select(col("doc_id"), col("n_sh"), col("n_hit"), col("overlap"),
        col("contaminated")))
  }

  val q63Decontaminate: Q = q63With(geom.deconShingleN)

  /** q103: the streaming decontamination GATE's batch mirror —
    * [[graft.streaming.Decontaminator.flag]], the SAME function s82
    * runs over a watermark-less document stream, folded over the q63
    * corpus fixture (eval docs + planted near-copy leaks) so the
    * row-local set-probe scoring carries a CORRECTNESS row (the
    * s74/q66 and s81/q49 pattern). Differs from q63 by contract, not
    * just plumbing: q63 is the offline REPORT (hits only, join+agg over
    * the corpus — the scale path when the eval set is exploded and
    * joined); q103 is the per-doc GATE (total — every corpus doc gets a
    * verdict, including unscorably-short ones, because a gate that
    * drops the unscorable passes contamination through).
    *
    * 100 TB: the eval fingerprint set (benchmarks — ~1e6 longs) is
    * collected ONCE driver-side and rides every task as a broadcast-
    * sized array literal; the corpus side is a pure codegen'd
    * projection — no shuffle, no explode, no join. */
  val q103DeconGate: Q = (spark, dir) => {
    val n = geom.deconShingleN
    val base = t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
    val evalDocs = base.filter(col("doc_id") % 97 === 0)
    // same leak plant as q63: an eval doc re-ingested minus its last token
    val leaked = evalDocs.select((col("doc_id") + 3000000).as("doc_id"),
      array_join(slice(col("toks"), lit(1), size(col("toks")) - 1), " ").as("text"))
    val corpus = base.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("text")).unionByName(leaked)
    val evalSh = graft.streaming.Decontaminator
      .evalShingleSet(t(spark, dir, "documents"), n)
    orderAll(graft.streaming.Decontaminator.flag(corpus, evalSh, n))
  }

  /** q133 [EXT]: train→eval split-leakage audit — the decontamination
    * family's third member, closing the loop q63/q103 leave open: q63
    * reports corpus overlap against an EXTERNAL eval set and q103 gates
    * a stream against it, but a pipeline's own q94 train/val/test split
    * can leak INTERNALLY (a re-crawled near-copy of a train doc hashes
    * to a different id and lands in test — exactly how test-set
    * contamination happens in practice). Every val/test doc is scored
    * by its distinct-shingle overlap against the FULL train-side
    * shingle set; ≥ 0.5 flags the leak (q63's threshold). The fixture
    * plants the failure mode deterministically: each train doc
    * re-ingested minus its last token under doc_id+5000000, kept only
    * when the NEW id's q94 bucket lands outside train — a genuine
    * train→eval leak whose flag is observable, mirrored exactly in the
    * oracle.
    *
    * 100 TB — and why this is NOT q103's broadcast probe: there the
    * probe set is a benchmark (~1e6 fingerprints, ships to every task);
    * here the probe side is 80% OF THE CORPUS, so the membership test
    * becomes a shingle-keyed LEFT SEMI join — two corpus-sized
    * exchanges keyed on the shingle fingerprint (eval-side explode,
    * train-side distinct), then a doc-keyed re-agg; ids and 8-byte
    * fingerprints cross the wire, bodies never do. */
  /** q133's shingle width — deliberately its OWN dial, default 8 (the
    * standard decontamination n-gram), NOT q63/q103's
    * `GRAFT_DECON_SHINGLE_N` (default 3): against a ~5-doc eval set a
    * trigram probe is already selective, but against 80% OF THE CORPUS
    * the trigram space saturates — measured 75/96 clean val/test docs
    * flagging at n=3 on sf0.001 (pure vocabulary collision), vs 8/96 at
    * n=8, and those 8 are the fixture's genuine cross-split exact
    * duplicates (q80's groups landing on both sides of the q94 split —
    * real leaks, correct findings). The oracle interpolates the same
    * dial. */
  private[graft] val LeakShingleN: Int = {
    val n = sys.env.getOrElse("GRAFT_LEAK_SHINGLE_N", "8").toInt
    require(n >= 2, s"GRAFT_LEAK_SHINGLE_N=$n — a width under 2 is a typo")
    n
  }

  /** q133/q138's shared corpus derivation: documents + the planted
    * train→eval leaks (train docs re-ingested truncated under new ids,
    * kept only when the new id's own q94 bucket is val/test), split
    * labels, and the materialized token array. Returned UNPERSISTED —
    * each consumer persists its own enriched frame. */
  private[queries] def leakSplitCorpus(spark: SparkSession, dir: String): DataFrame = {
    def bucketOf(id: org.apache.spark.sql.Column) = knuthBucket(id, 100L)
    val d0 = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val planted = d0.filter(bucketOf(col("doc_id")) < 80)
      .select((col("doc_id") + 5000000).as("doc_id"),
        array_join(slice(split(col("text"), " "), lit(1),
          size(split(col("text"), " ")) - 1), " ").as("text"))
      .filter(bucketOf(col("doc_id")) >= 80)
    d0.unionByName(planted)
      .withColumn("bucket", bucketOf(col("doc_id")))
      .withColumn("split", when(col("bucket") < 80, lit("train"))
        .when(col("bucket") < 90, lit("val")).otherwise(lit("test")))
      .withColumn("toks", split(col("text"), " "))
  }

  val q133SplitLeakage: Q = (spark, dir) => {
    val n = LeakShingleN
    // the cache holds exactly what the two consumers read — (doc_id,
    // split, sha) — not the bodies/token arrays the derivation needed:
    // an unpruned persist stores ~3x the footprint for nothing (toks is
    // still an attribute here, so the shingle lambda never re-splits)
    val corpus = leakSplitCorpus(spark, dir)
      .select(col("doc_id"), col("split"),
        graft.streaming.Decontaminator.shingleFingerprints(col("toks"), n)
          .as("sha"))
      .scopedPersist
    val trainSh = corpus.filter(col("split") === "train")
      .select(explode(col("sha")).as("sh")).distinct()
    val evalSide = corpus.filter(col("split") =!= "train")
      .select(col("doc_id"), col("split"), col("sha"), size(col("sha")).as("n_sh"))
    val hits = evalSide.select(col("doc_id"), explode(col("sha")).as("sh"))
      .join(trainSh, Seq("sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).cast("int").as("hits"))
    orderAll(evalSide.drop("sha")
      .join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("split"), col("n_sh"),
        coalesce(col("hits"), lit(0)).as("n_hit"),
        when(col("n_sh") > 0,
          round(coalesce(col("hits"), lit(0)).cast("double") / col("n_sh"), 6))
          .as("overlap"))
      .withColumn("leaked", coalesce(col("overlap") >= 0.5, lit(false))))
  }

  /** q64: repetition-based quality filter (the Gopher repetition rules'
    * shape): per-doc duplicate-token fraction and duplicate-2/3-gram
    * fractions, flagged when any crosses its threshold. Every 10th doc
    * gets a planted boilerplate tail (" spam" × 12) so the filter has
    * observable true positives. Entirely row-local array arithmetic —
    * pure codegen'd projection, NO shuffle at any scale (the ideal shape
    * for a 100 TB quality pass: reads the corpus once, writes flags).
    * N-grams are counted as xxhash64 fingerprints; the oracle counts the
    * string forms (q88's collision argument). */
  /** q64's duplicate-fraction kernels over a MATERIALIZED toks column —
    * factored so q162's funnel stage runs the IDENTICAL rule (the
    * shared-spelling convention; q64's own CORRECTNESS row certifies
    * the arithmetic for both consumers). Pass a toks column that rides
    * its own projection, not an inline `split` (the HOF re-evaluation
    * defect class q64's body documents). */
  private[queries] def dupWordFrac(toks: Column): Column = {
    val n1 = size(toks)
    round((n1 - size(array_distinct(toks))).cast("double") / n1, 6)
  }

  private[queries] def dupGramFrac(toks: Column, k: Int): Column = {
    val n = size(toks) - (k - 1)
    // guarded: sequence(1, n) with n ≤ 0 yields a DESCENDING range in
    // Spark, so the gram array is only built under the n > 0 branch
    val grams = transform(sequence(lit(1), n),
      i => xxhash64((0 until k).map(o => element_at(toks, i + o)): _*))
    when(n > 0,
      round((n - size(array_distinct(grams))).cast("double") / n, 6))
      .otherwise(lit(0.0))
  }

  /** q64's flag: any duplicate fraction past its Gopher-shaped
    * threshold. The ROUNDED fractions are compared, mirroring the
    * oracle. */
  private[graft] def repetitionFlag(toks: Column): Column =
    dupWordFrac(toks) > 0.7 || dupGramFrac(toks, 2) > 0.3 ||
      dupGramFrac(toks, 3) > 0.25

  val q64RepetitionFilter: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val text = when(col("doc_id") % 10 === 0,
      concat(col("text"), lit(" spam spam spam spam spam spam spam spam spam spam spam spam")))
      .otherwise(col("text"))
    // toks rides its own projection: HOF lambda bodies re-evaluate
    // every non-attribute expression they reference, so an inlined
    // split would re-split the text for each element_at in the gram
    // lambdas — ~5 splits per token position (q135's measured defect
    // class; harmless at 54-token fixture docs, a real multiplier on
    // long documents at scale)
    val withToks = d.withColumn("toks", split(text, " "))
    val toks = col("toks")
    val n1 = size(toks)
    val dupWord = dupWordFrac(toks)
    val dup2 = dupGramFrac(toks, 2)
    val dup3 = dupGramFrac(toks, 3)
    orderAll(withToks.select(
      col("doc_id"),
      n1.as("n_tok"),
      dupWord.as("dup_word_frac"),
      dup2.as("dup_2gram_frac"),
      dup3.as("dup_3gram_frac"),
      (dupWord > 0.7 || dup2 > 0.3 || dup3 > 0.25).as("flagged")))
  }

  /** q65: incremental dedup — the daily-ingest posture: dedup TODAY'S
    * batch against the existing corpus snapshot without rereading bodies.
    * The batch is a deterministic re-crawl (even ids byte-identical →
    * must drop; odd ids edited → must keep); matching is by the q80
    * fingerprint (xxhash64(lower(trim(text))), length) via LEFT ANTI
    * join. 100 TB posture: both sides project to (id, hash, len) ~20
    * B/row IN THE SCAN — document bodies never enter the anti-join
    * exchange (PlanSpec pins it); in production the corpus side is a
    * persisted fingerprint table, so the daily cost is
    * O(batch + fingerprints), not O(corpus bodies). */
  val q65DedupIncremental: Q = (spark, dir) => {
    val base = t(spark, dir, "documents")
    val batch = base.select(
      (col("doc_id") + 2000000).as("doc_id"),
      when(col("doc_id") % 2 === 0, col("text"))
        .otherwise(concat(col("text"), lit(" v2"))).as("text"),
      col("lang"), col("source"))
    def fp(df: DataFrame) = {
      val norm = lower(trim(col("text")))
      df.select(col("doc_id"), col("lang"), col("source"),
        xxhash64(norm).as("h"), length(norm).as("text_len"))
    }
    val survivors = fp(batch).join(fp(base).select("h", "text_len"),
      Seq("h", "text_len"), "left_anti")
    orderAll(survivors.select(col("doc_id"), col("lang"), col("source"),
      col("text_len")))
  }

  /** q104: incremental NEAR-dup dedup — q65's daily-ingest posture with
    * fuzzy matching: the new batch is gated against the existing corpus
    * by [[graft.streaming.NearDupGate.flag]], the SAME function s83 runs
    * per micro-batch (the s74/q66, s81/q49, s82/q103 pattern), so the
    * cross-relation minhash-band pipeline carries a CORRECTNESS row.
    *
    * Batch fixture (a re-crawl, one class per `doc_id % 4` residue):
    * 0 = verbatim copy (j = 1, must drop); 1 = last token dropped
    * (j = (n-3)/(n-2) ≈ 0.97, must drop); 2 = first ⌊n/4⌋ tokens
    * (j ≤ 0.25 — CONTAINED in the corpus doc, so q69's containment
    * dedup would drop it, but the Jaccard gate keeps it: the two
    * operators' contracts genuinely differ); 3 = every token suffixed
    * (fresh content, j = 0, must keep).
    *
    * ORACLED by q81's verified-pairs recipe: the final stage is exact
    * Jaccard ≥ 0.5 on candidates, and the batch×corpus pair space here
    * is content-identical to pair structures q81's recall-1 measurement
    * already covers at the gate SF (verbatim pairs collide in every
    * band by construction; truncated-copy pairs are q81's own plant;
    * classes 2/3 sit at j ≤ 0.25). The DuckDB oracle recomputes the
    * verified set from distinct string shingles (membership-invariant
    * vs xxhash64, q88's argument). */
  val q104DedupNearIncremental: Q = (spark, dir) => {
    val base = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val toks = split(col("text"), " ")
    val batch = base.select((col("doc_id") + 4000000).as("doc_id"),
      when(col("doc_id") % 4 === 0, col("text"))
        .when(col("doc_id") % 4 === 1,
          array_join(slice(toks, lit(1), size(toks) - 1), " "))
        .when(col("doc_id") % 4 === 2,
          array_join(slice(toks, lit(1), (size(toks) / lit(4)).cast("int")), " "))
        .otherwise(array_join(transform(toks, t => concat(t, lit("_new"))), " "))
        .as("text"))
    val index = graft.streaming.NearDupGate.index(spark, base, geom).scopedPersist
    orderAll(graft.streaming.NearDupGate.flag(spark, batch, index, geom))
  }

  /** q117 [EXT]: unigram language-model scoring — per-document average
    * token surprisal against the corpus's own unigram distribution, the
    * perplexity-proxy quality signal (a doc of corpus-typical tokens
    * scores low; rare-token gibberish scores high — CCNet's LM filter
    * shape with the corpus itself as the model).
    *
    * Determinism contract (how a LOG-domain score gets hash-oracled):
    * no float log. Token surprisal is quantized to whole bits as
    * floor(log2(total div cnt)) computed EXACTLY via the binary-string
    * length of a BIGINT — length(bin(x)) - 1, bit-identical in Spark
    * (Long.toBinaryString) and DuckDB (unpadded bin()), both verified
    * unpadded. Per-doc mean rides as millibits under BIGINT floor
    * division, zero-token docs pinned to 0 (q48's total contract).
    *
    * 100 TB: the vocab is a token-keyed aggregate (map-side combined;
    * vocab size ≪ corpus size), the scalar `total` is a broadcast of
    * one number folded into the surprisal expression, and the doc score
    * re-aggregates the exploded tokens by doc_id — two shuffles of
    * (token)- and (doc_id)-keyed COUNTS; bodies never move. The
    * token⋈vocab join broadcasts the vocab below the threshold and
    * shuffle-joins above it — either way linear. */
  val q117LmScore: Q = (spark, dir) => {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("tok"))
      .scopedPersist
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt"))).collect()(0).getLong(0)
    val bits = (length(expr(s"bin(${total}L div cnt)")) - 1).cast("long")
    val scored = toks.join(vocab.withColumn("bits", bits), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("bits")).as("sum_bits"))
    orderAll(t(spark, dir, "documents").select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
        coalesce(expr("sum_bits * 1000L div n_tok"), lit(0L)).as("avg_mbits")))
  }

  val defs: Map[String, Q] = Map(
    "q117_lm_score" -> q117LmScore,
    "q63_decontaminate" -> q63Decontaminate,
    "q103_decon_gate" -> q103DeconGate,
    "q133_split_leakage" -> q133SplitLeakage,
    "q104_dedup_near_incremental" -> q104DedupNearIncremental,
    "q64_repetition_filter" -> q64RepetitionFilter,
    "q65_dedup_incremental" -> q65DedupIncremental,
    "q67_tfidf_terms" -> q67TfidfTerms,
    "q68_dedup_clusters" -> q68DedupClusters,
    "q131_dedup_canonical" -> q131DedupCanonical,
    "q146_dedup_audit" -> q146DedupAudit,
    "q148_label_incremental" -> q148LabelIncremental,
    "q167_contrastive_pairs" -> q167ContrastivePairs,
    "q132_temperature_mix" -> q132TemperatureMix,
    "q80_dedup_exact" -> q80DedupExact,
    "q95_sample_hash" -> q95SampleHash,
    "q96_quota_per_lang" -> q96QuotaPerLang,
    "q97_pack_sequences" -> q97PackSequences,
    "q130_chunk_windows" -> q130ChunkWindows,
    "q99_dataset_mixture" -> q99DatasetMixture,
    "q77_text_normalize" -> q77TextNormalize,
    "q79_pii_scrub" -> q79PiiScrub,
    "q81_dedup_minhash" -> q81DedupMinhash,
    "q82_similarity_topk" -> q82SimilarityTopk,
    "q83_text_stats" -> q83TextStats,
    "q84_lang_id" -> q84LangId,
    "q85_quality_score" -> q85QualityScore,
    "q147_quality_classifier" -> q147QualityClassifier,
    "q152_filter_agreement" -> q152FilterAgreement,
    "q86_token_count" -> q86TokenCount,
    "q87_fingerprint" -> q87Fingerprint,
    "q88_dedup_ngram" -> q88DedupNgram,
    "q173_setsim_join" -> q173SetsimJoin,
    "q175_dedup_recall_audit" -> q175DedupRecallAudit,
    "q169_dedup_sweep" -> q169DedupSweep,
    "q170_quality_sweep" -> q170QualitySweep,
    "q165_winnow_stats" -> q165WinnowStats,
    "q166_winnow_overlap" -> q166WinnowOverlap,
    "q89_dedup_simhash" -> q89DedupSimhash,
    "q91_similarity_ivf" -> q91SimilarityIvf,
    "q92_dedup_embedding" -> q92DedupEmbedding,
    "q94_train_test_split" -> q94TrainTestSplit)

  /** q63's oracle generated from the SAME shingle-width knob as the
    * engine (string-form shingles — the engine's xxhash64 fingerprints
    * are membership-invariant, q88's argument); same eval/leak plant. */
  private[queries] def q63OracleWith(n: Int): String = {
    require(n >= 2, s"decontamination shingle width must be >= 2, got $n")
    val sh = (0 until n).map(o => s"toks[i + $o]").mkString(" || ' ' || ")
    s"""WITH base AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |ev AS (SELECT * FROM base WHERE doc_id % 97 = 0),
       |leaked AS (
       |  SELECT doc_id + 3000000 AS doc_id, toks[1:len(toks) - 1] AS toks FROM ev),
       |corpus AS (
       |  SELECT * FROM (
       |    SELECT * FROM base WHERE doc_id % 97 != 0
       |    UNION ALL SELECT * FROM leaked)
       |  WHERE len(toks) >= $n),
       |csh AS (
       |  SELECT DISTINCT doc_id, $sh AS sh
       |  FROM corpus, unnest(range(1, len(toks) - ${n - 2})) AS t(i)),
       |sizes AS (SELECT doc_id, CAST(count(*) AS INT) AS n_sh FROM csh GROUP BY 1),
       |evn AS (SELECT * FROM ev WHERE len(toks) >= $n),
       |esh AS (
       |  SELECT DISTINCT $sh AS sh
       |  FROM evn, unnest(range(1, len(toks) - ${n - 2})) AS t(i)),
       |hits AS (
       |  SELECT c.doc_id, count(*) AS n_hit
       |  FROM csh c JOIN esh e USING (sh) GROUP BY 1)
       |SELECT h.doc_id, s.n_sh, h.n_hit,
       |  round(CAST(h.n_hit AS DOUBLE) / s.n_sh, 6) AS overlap,
       |  round(CAST(h.n_hit AS DOUBLE) / s.n_sh, 6) >= 0.5 AS contaminated
       |FROM hits h JOIN sizes s USING (doc_id)
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin
  }

  /** q103's oracle — q63's CTE chain with the gate's TOTAL contract:
    * corpus is unfiltered by length (short docs shingle to the empty
    * set via the empty unnest range), sizes/hits left-join back so
    * every corpus doc gets a verdict. Same string-form shingles
    * (membership-invariant vs the engine's xxhash64, q88's argument),
    * same eval/leak plant, same width knob. */
  private[queries] def q103OracleWith(n: Int): String = {
    require(n >= 2, s"decontamination shingle width must be >= 2, got $n")
    val sh = (0 until n).map(o => s"toks[i + $o]").mkString(" || ' ' || ")
    s"""WITH base AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |ev AS (SELECT * FROM base WHERE doc_id % 97 = 0),
       |leaked AS (
       |  SELECT doc_id + 3000000 AS doc_id, toks[1:len(toks) - 1] AS toks FROM ev),
       |corpus AS (
       |  SELECT * FROM base WHERE doc_id % 97 != 0
       |  UNION ALL SELECT * FROM leaked),
       |csh AS (
       |  SELECT DISTINCT doc_id, $sh AS sh
       |  FROM corpus, unnest(range(1, len(toks) - ${n - 2})) AS t(i)),
       |sizes AS (SELECT doc_id, CAST(count(*) AS INT) AS n_sh FROM csh GROUP BY 1),
       |esh AS (
       |  SELECT DISTINCT $sh AS sh
       |  FROM ev, unnest(range(1, len(toks) - ${n - 2})) AS t(i)),
       |hits AS (
       |  SELECT c.doc_id, CAST(count(*) AS INT) AS n_hit
       |  FROM csh c JOIN esh e USING (sh) GROUP BY 1),
       |tot AS (
       |  SELECT c.doc_id,
       |    coalesce(s.n_sh, 0) AS n_sh, coalesce(h.n_hit, 0) AS n_hit
       |  FROM corpus c
       |  LEFT JOIN sizes s USING (doc_id) LEFT JOIN hits h USING (doc_id))
       |SELECT doc_id, n_sh, n_hit,
       |  CASE WHEN n_sh > 0 THEN round(CAST(n_hit AS DOUBLE) / n_sh, 6) END AS overlap,
       |  coalesce(CASE WHEN n_sh > 0
       |    THEN round(CAST(n_hit AS DOUBLE) / n_sh, 6) END >= 0.5, FALSE) AS contaminated
       |FROM tot
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin
  }

  /** q133's oracle — q103's CTE conventions with the q94 split
    * derivation and the train-side membership as a JOIN (string-form
    * shingles; membership-invariant vs the engine's fingerprints,
    * q88's argument). Same plant, same knob. */
  private[queries] def q133OracleWith(n: Int): String = {
    require(n >= 2, s"decontamination shingle width must be >= 2, got $n")
    val sh = (0 until n).map(o => s"toks[i + $o]").mkString(" || ' ' || ")
    def bucket(c: String) = knuthBucketSql(c, 100L)
    s"""WITH d0 AS (SELECT doc_id, text FROM documents),
       |planted AS (
       |  SELECT doc_id + 5000000 AS doc_id,
       |    array_to_string(
       |      string_split(text, ' ')[1:len(string_split(text, ' ')) - 1],
       |      ' ') AS text
       |  FROM d0 WHERE ${bucket("doc_id")} < 80),
       |corpus AS (
       |  SELECT * FROM d0
       |  UNION ALL SELECT * FROM planted WHERE ${bucket("doc_id")} >= 80),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
       |         ELSE 'test' END AS split,
       |    string_split(text, ' ') AS toks
       |  FROM (SELECT doc_id, text, ${bucket("doc_id")} AS b FROM corpus)),
       |csh AS (
       |  SELECT DISTINCT doc_id, $sh AS sh
       |  FROM sp, unnest(range(1, len(toks) - ${n - 2})) AS t(i)
       |  WHERE split <> 'train'),
       |tsh AS (
       |  SELECT DISTINCT $sh AS sh
       |  FROM sp, unnest(range(1, len(toks) - ${n - 2})) AS t(i)
       |  WHERE split = 'train'),
       |sizes AS (SELECT doc_id, CAST(count(*) AS INT) AS n_sh FROM csh GROUP BY 1),
       |hits AS (SELECT c.doc_id, CAST(count(*) AS INT) AS n_hit
       |         FROM csh c JOIN tsh e USING (sh) GROUP BY 1),
       |tot AS (
       |  SELECT s.doc_id, s.split,
       |    coalesce(z.n_sh, 0) AS n_sh, coalesce(h.n_hit, 0) AS n_hit
       |  FROM sp s LEFT JOIN sizes z USING (doc_id) LEFT JOIN hits h USING (doc_id)
       |  WHERE s.split <> 'train')
       |SELECT doc_id, split, n_sh, n_hit,
       |  CASE WHEN n_sh > 0 THEN round(CAST(n_hit AS DOUBLE) / n_sh, 6) END AS overlap,
       |  coalesce(CASE WHEN n_sh > 0
       |    THEN round(CAST(n_hit AS DOUBLE) / n_sh, 6) END >= 0.5, FALSE) AS leaked
       |FROM tot
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
       |  5 NULLS FIRST, 6 NULLS FIRST""".stripMargin
  }

  // lazy (the CorpusOps pattern): q165/q166 entries parse the winnow
  // dials and several entries interpolate env-backed geometry — a bad
  // dial must fail at oracle access, not take down every LlmOps query
  // via ExceptionInInitializerError (the ADVICE-r12 lazy-dial rule)
  lazy val oracles: Map[String, String] = Map(
    "q117_lm_score" ->
      // same quantized surprisal: unpadded bin() length == Spark's
      // Long.toBinaryString; // === div; HUGEINT sums cast back
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |          FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
        |b AS (SELECT tok,
        |        CAST(length(bin((SELECT total FROM tot) // cnt)) - 1 AS BIGINT) AS bits
        |      FROM vocab),
        |scored AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |             CAST(sum(b.bits) AS BIGINT) AS sum_bits
        |           FROM toks t JOIN b ON t.tok = b.tok GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(s.n_tok, 0) AS BIGINT) AS n_tok,
        |  CAST(coalesce(s.sum_bits, 0) AS BIGINT) AS sum_bits,
        |  CAST(coalesce(s.sum_bits * 1000 // s.n_tok, 0) AS BIGINT) AS avg_mbits
        |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q63_decontaminate" -> q63OracleWith(geom.deconShingleN),
    "q103_decon_gate" -> q103OracleWith(geom.deconShingleN),
    "q133_split_leakage" -> q133OracleWith(LeakShingleN),
    "q104_dedup_near_incremental" ->
      // the verified batch×corpus match set from first principles —
      // distinct string shingles, exact Jaccard, same rounded-≥0.5 gate
      // as the engine — sound by q81's recall-1 measurement (see
      // q104DedupNearIncremental scaladoc); the CASE mirrors the
      // engine's four re-crawl classes on the PRE-shift doc_id
      """WITH corpus AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |batch AS (
        |  SELECT c.doc_id + 4000000 AS doc_id,
        |    CASE CAST(c.doc_id % 4 AS INT)
        |      WHEN 0 THEN c.toks
        |      WHEN 1 THEN c.toks[1:len(c.toks) - 1]
        |      WHEN 2 THEN c.toks[1:CAST(len(c.toks) // 4 AS INT)]
        |      ELSE list_transform(c.toks, t -> t || '_new')
        |    END AS toks
        |  FROM corpus c),
        |csh AS (
        |  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
        |  FROM corpus, unnest(range(1, len(toks) - 1)) AS t(i)),
        |bsh AS (
        |  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
        |  FROM batch, unnest(range(1, len(toks) - 1)) AS t(i)),
        |bsizes AS (SELECT doc_id, CAST(count(*) AS INT) AS n_sh FROM bsh GROUP BY 1),
        |csizes AS (SELECT doc_id, CAST(count(*) AS INT) AS n_sh FROM csh GROUP BY 1),
        |pairs AS (
        |  SELECT b.doc_id AS b_id, c.doc_id AS c_id, count(*) AS common
        |  FROM bsh b JOIN csh c USING (sh) GROUP BY 1, 2),
        |jacc AS (
        |  SELECT b_id, c_id,
        |    round(CAST(common AS DOUBLE) / (bs.n_sh + cs.n_sh - common), 6) AS jacc
        |  FROM pairs
        |  JOIN bsizes bs ON bs.doc_id = b_id
        |  JOIN csizes cs ON cs.doc_id = c_id
        |  WHERE round(CAST(common AS DOUBLE) / (bs.n_sh + cs.n_sh - common), 6) >= 0.5),
        |m AS (
        |  SELECT b_id, CAST(count(*) AS INT) AS n_matches, max(jacc) AS best_jacc
        |  FROM jacc GROUP BY 1)
        |SELECT b.doc_id, coalesce(bs.n_sh, 0) AS n_sh,
        |  coalesce(m.n_matches, 0) AS n_matches, m.best_jacc,
        |  (coalesce(m.n_matches, 0) = 0) AS kept
        |FROM batch b
        |LEFT JOIN bsizes bs ON bs.doc_id = b.doc_id
        |LEFT JOIN m ON m.b_id = b.doc_id
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "q67_tfidf_terms" ->
      // DuckDB count(*) is already BIGINT (matching Spark's count), so
      // the casts here are documentation, not gate requirements — uncast
      // count(*) oracles (q69/q70/q78) pass the same hash gate. The
      // genuinely dtype-sensitive parts are row_number (DuckDB BIGINT vs
      // Spark INT — that cast IS load-bearing) and keeping the score a
      // single double division of exact counts, bit-identical everywhere
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |s AS (
        |  SELECT t.doc_id, t.term, t.tf, d.df,
        |    round(CAST(t.tf AS DOUBLE) / d.df, 6) AS score
        |  FROM tf t JOIN df d USING (term)),
        |r AS (SELECT doc_id, term, tf, df, score,
        |        CAST(row_number() OVER (PARTITION BY doc_id
        |             ORDER BY score DESC, term ASC) AS INT) AS rk
        |      FROM s)
        |SELECT doc_id, rk, term, tf, df, score FROM r WHERE rk <= 5
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    "q64_repetition_filter" ->
      // flags compare the ROUNDED fractions, mirroring the engine
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0
        |      THEN text || ' spam spam spam spam spam spam spam spam spam spam spam spam'
        |      ELSE text END AS text
        |  FROM documents),
        |tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM p),
        |g AS (
        |  SELECT doc_id,
        |    len(toks) AS n_tok,
        |    len(list_distinct(toks)) AS d1,
        |    len(toks) - 1 AS n2,
        |    len(list_distinct(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i + 1]))) AS d2,
        |    len(toks) - 2 AS n3,
        |    len(list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS d3
        |  FROM tk),
        |r AS (
        |  SELECT doc_id, CAST(n_tok AS INT) AS n_tok,
        |    round(CAST(n_tok - d1 AS DOUBLE) / n_tok, 6) AS dup_word_frac,
        |    CASE WHEN n2 > 0 THEN round(CAST(n2 - d2 AS DOUBLE) / n2, 6)
        |         ELSE 0.0 END AS dup_2gram_frac,
        |    CASE WHEN n3 > 0 THEN round(CAST(n3 - d3 AS DOUBLE) / n3, 6)
        |         ELSE 0.0 END AS dup_3gram_frac
        |  FROM g)
        |SELECT doc_id, n_tok, dup_word_frac, dup_2gram_frac, dup_3gram_frac,
        |  (dup_word_frac > 0.7 OR dup_2gram_frac > 0.3 OR dup_3gram_frac > 0.25)
        |    AS flagged
        |FROM r
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    "q65_dedup_incremental" ->
      """WITH batch AS (
        |  SELECT doc_id + 2000000 AS doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN text ELSE text || ' v2' END AS text,
        |    lang, source
        |  FROM documents),
        |bf AS (SELECT doc_id, lang, source, lower(trim(text)) AS norm FROM batch),
        |basef AS (SELECT DISTINCT lower(trim(text)) AS norm FROM documents)
        |SELECT b.doc_id, b.lang, b.source, CAST(length(b.norm) AS INT) AS text_len
        |FROM bf b
        |WHERE NOT EXISTS (SELECT 1 FROM basef f WHERE f.norm = b.norm)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q77_text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    regexp_replace(
        |      regexp_replace(lower(trim(text)), '[\x00-\x1F]', ' ', 'g'),
        |      '\s+', ' ', 'g') AS norm
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_raw,
        |  CAST(length(norm) AS INT) AS n_norm,
        |  substring(norm, 1, 32) AS norm_prefix
        |FROM n
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q79_pii_scrub" ->
      // same character-class patterns (Java regex ≡ RE2 for all three,
      // including ASCII \b); DuckDB needs the 'g' flag to match Spark's
      // replace-all default. Same plant residues and scrub order.
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0
        |      THEN text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com now'
        |         WHEN doc_id % 10 = 3
        |      THEN text || ' call 555-867-5309 today'
        |         WHEN doc_id % 10 = 6
        |      THEN text || ' ssn 123-45-6789 on file'
        |      ELSE text END AS raw
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, raw,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |        '\b\d{3}[- ]\d{3,4}[- ]\d{4}\b', '<PHONE>', 'g'),
        |      '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g') AS scrubbed
        |  FROM p)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
        |  CAST(len(regexp_extract_all(raw, '\b\d{3}[- ]\d{3,4}[- ]\d{4}\b')) AS INT) AS n_phone,
        |  CAST(len(regexp_extract_all(raw, '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_id,
        |  CAST(length(raw) AS INT) AS n_raw,
        |  CAST(length(scrubbed) AS INT) AS n_scrubbed,
        |  (NOT regexp_matches(scrubbed, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
        |   AND NOT regexp_matches(scrubbed, '\b\d{3}[- ]\d{3,4}[- ]\d{4}\b')
        |   AND NOT regexp_matches(scrubbed, '\b\d{3}-\d{2}-\d{4}\b')) AS clean
        |FROM s
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST""".stripMargin,
    "q68_dedup_clusters" ->
      // pair CTEs duplicated verbatim from q81's oracle (same corpus
      // plant, same exact-Jaccard >= 0.5 pairs); the recursive member
      // computes min-reachable-id over the undirected pair graph —
      // exactly what min-label propagation converges to
      """WITH RECURSIVE dd AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 1]
        |  FROM documents),
        |docs AS (SELECT * FROM dd WHERE len(toks) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
        |  FROM docs, unnest(range(1, len(toks) - 1)) AS t(i)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |prs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |vp AS (
        |  SELECT d1, d2 FROM prs
        |  JOIN sizes s1 ON s1.doc_id = d1
        |  JOIN sizes s2 ON s2.doc_id = d2
        |  WHERE CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) >= 0.5),
        |edges AS (SELECT d1 AS a, d2 AS b FROM vp
        |          UNION ALL SELECT d2, d1 FROM vp),
        |reach(n, m) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        |  UNION
        |  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m),
        |lbl AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        |       FROM lbl GROUP BY 1)
        |SELECT l.doc_id, l.cluster_id, sz.cluster_size
        |FROM lbl l JOIN sz USING (cluster_id)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q167_contrastive_pairs" -> {
      // q68's recursive-CTE labels + the package knuth spellings + the
      // same rank-1/2 minima; buckets interpolated from the engine dial
      val b = ContrastiveBuckets
      OracleCtes.labels + s""",
        |uni AS (SELECT doc_id FROM documents
        |        UNION ALL SELECT doc_id + 1000000 FROM documents),
        |m12 AS (
        |  SELECT cluster_id,
        |    min(CASE WHEN rk = 1 THEN doc_id END) AS m1,
        |    min(CASE WHEN rk = 2 THEN doc_id END) AS m2
        |  FROM (SELECT cluster_id, doc_id,
        |          row_number() OVER (PARTITION BY cluster_id
        |                             ORDER BY doc_id ASC) AS rk
        |        FROM lbl) WHERE rk <= 2 GROUP BY 1),
        |pool AS (
        |  SELECT u.doc_id, coalesce(l.cluster_id, u.doc_id) AS ncl,
        |    ${knuthBucketSql("u.doc_id", b)} AS cell
        |  FROM uni u LEFT JOIN lbl l ON l.doc_id = u.doc_id),
        |cellmins AS (
        |  SELECT cell,
        |    min(CASE WHEN rk = 1 THEN doc_id END) AS n1,
        |    min(CASE WHEN rk = 1 THEN ncl END) AS ncl1,
        |    min(CASE WHEN rk = 2 THEN doc_id END) AS n2,
        |    min(CASE WHEN rk = 2 THEN ncl END) AS ncl2
        |  FROM (SELECT cell, doc_id, ncl,
        |          row_number() OVER (PARTITION BY cell
        |                             ORDER BY doc_id ASC) AS rk
        |        FROM pool) WHERE rk <= 2 GROUP BY 1)
        |SELECT l.doc_id AS anchor_id, l.cluster_id,
        |  CASE WHEN l.doc_id = m.m1 THEN m.m2 ELSE m.m1 END AS positive_id,
        |  CASE WHEN c.ncl1 <> l.cluster_id THEN c.n1
        |       WHEN c.ncl2 <> l.cluster_id THEN c.n2 END AS negative_id
        |FROM lbl l
        |JOIN m12 m USING (cluster_id)
        |LEFT JOIN cellmins c ON c.cell = ${knuthBucket2Sql("l.doc_id", b)}
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin
    },
    "q148_label_incremental" ->
      // the FULL recompute over corpus ∪ batch — exactly what the
      // incremental merge must equal row-identically: q68's recursive
      // CTE with dd extended by the batch fixture (q104's four re-crawl
      // classes on the doc_id % 5 = 2 subset, CASE on the PRE-shift id)
      // and the verify gate in the ROUNDED spelling both engine pair
      // generators (q81Pairs, NearDupGate) share
      """WITH RECURSIVE dd AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 1]
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 4000000,
        |    CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN string_split(text, ' ')
        |      WHEN 1 THEN string_split(text, ' ')[1:len(string_split(text, ' ')) - 1]
        |      WHEN 2 THEN string_split(text, ' ')[1:CAST(len(string_split(text, ' ')) // 4 AS INT)]
        |      ELSE list_transform(string_split(text, ' '), t -> t || '_new')
        |    END
        |  FROM documents WHERE doc_id % 5 = 2),
        |docs AS (SELECT * FROM dd WHERE len(toks) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
        |  FROM docs, unnest(range(1, len(toks) - 1)) AS t(i)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |prs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |vp AS (
        |  SELECT d1, d2 FROM prs
        |  JOIN sizes s1 ON s1.doc_id = d1
        |  JOIN sizes s2 ON s2.doc_id = d2
        |  WHERE round(CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common), 6) >= 0.5),
        |edges AS (SELECT d1 AS a, d2 AS b FROM vp
        |          UNION ALL SELECT d2, d1 FROM vp),
        |reach(n, m) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        |  UNION
        |  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m),
        |lbl AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        |       FROM lbl GROUP BY 1)
        |SELECT l.doc_id, l.cluster_id, sz.cluster_size
        |FROM lbl l JOIN sz USING (cluster_id)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q131_dedup_canonical" ->
      // q68's recursive-CTE labels verbatim, extended by the canonical
      // pick: keep-the-longest (token count desc, doc_id asc) per
      // cluster — the planted frame's token counts come from the same
      // dd CTE (originals + truncated re-crawls)
      """WITH RECURSIVE dd AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 1]
        |  FROM documents),
        |docs AS (SELECT * FROM dd WHERE len(toks) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
        |  FROM docs, unnest(range(1, len(toks) - 1)) AS t(i)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |prs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |vp AS (
        |  SELECT d1, d2 FROM prs
        |  JOIN sizes s1 ON s1.doc_id = d1
        |  JOIN sizes s2 ON s2.doc_id = d2
        |  WHERE CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) >= 0.5),
        |edges AS (SELECT d1 AS a, d2 AS b FROM vp
        |          UNION ALL SELECT d2, d1 FROM vp),
        |reach(n, m) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        |  UNION
        |  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m),
        |lbl AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        |       FROM lbl GROUP BY 1),
        |nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM dd)
        |SELECT doc_id, cluster_id, cluster_size, n_toks,
        |  (row_number() OVER (PARTITION BY cluster_id
        |                      ORDER BY n_toks DESC, doc_id ASC) = 1) AS keep
        |FROM lbl JOIN sz USING (cluster_id) JOIN nt USING (doc_id)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST""".stripMargin,
    "q146_dedup_audit" ->
      // q131's recursive-CTE labels + keep verdicts verbatim, rolled up
      // by cluster multiplicity; sums CAST to BIGINT (DuckDB widens to
      // HUGEINT), n_docs = cluster_size · n_clusters by construction
      """WITH RECURSIVE dd AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 1]
        |  FROM documents),
        |docs AS (SELECT * FROM dd WHERE len(toks) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
        |  FROM docs, unnest(range(1, len(toks) - 1)) AS t(i)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |prs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |vp AS (
        |  SELECT d1, d2 FROM prs
        |  JOIN sizes s1 ON s1.doc_id = d1
        |  JOIN sizes s2 ON s2.doc_id = d2
        |  WHERE CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) >= 0.5),
        |edges AS (SELECT d1 AS a, d2 AS b FROM vp
        |          UNION ALL SELECT d2, d1 FROM vp),
        |reach(n, m) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        |  UNION
        |  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m),
        |lbl AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        |       FROM lbl GROUP BY 1),
        |nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM dd),
        |v AS (
        |  SELECT doc_id, cluster_id, cluster_size, n_toks,
        |    (row_number() OVER (PARTITION BY cluster_id
        |                        ORDER BY n_toks DESC, doc_id ASC) = 1) AS keep
        |  FROM lbl JOIN sz USING (cluster_id) JOIN nt USING (doc_id))
        |SELECT cluster_size,
        |  CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_toks_total,
        |  CAST(sum(CASE WHEN keep THEN 0 ELSE n_toks END) AS BIGINT)
        |    AS n_toks_dropped
        |FROM v GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST""".stripMargin,
    "q132_temperature_mix" ->
      // same α=1/2 arithmetic: sqrt and the double division are IEEE
      // correctly rounded on both engines, floor is exact, and the
      // bucket is q94's pmod-parity spelling
      """WITH c AS (SELECT coalesce(lang, '__und__') AS lang_key,
        |             CAST(count(*) AS BIGINT) AS n_lang
        |           FROM documents GROUP BY 1),
        |m AS (SELECT min(n_lang) AS n_min FROM c),
        |r AS (SELECT lang_key, n_lang,
        |        CAST(floor(1000.0 * sqrt(
        |          CAST((SELECT n_min FROM m) AS DOUBLE) / CAST(n_lang AS DOUBLE)))
        |          AS BIGINT) AS rate_permille
        |      FROM c),
        |b AS (SELECT doc_id, lang, coalesce(lang, '__und__') AS lang_key,
        |        CAST(((((((((doc_id % 1000000007) + 1000000007) % 1000000007)
        |              * 2654435761) % 1000000007) + 1000000007) % 1000000007) % 1000
        |         + 1000) % 1000 AS BIGINT) AS bucket
        |      FROM documents)
        |SELECT b.doc_id, b.lang, r.n_lang, r.rate_permille, b.bucket,
        |  b.bucket < r.rate_permille AS kept
        |FROM b JOIN r USING (lang_key)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    "q99_dataset_mixture" ->
      // q94's pmod-parity bucket, gated per-source by the same rate CASE
      """WITH b AS (
        |  SELECT doc_id, source,
        |    ((((((((doc_id % 1000000007) + 1000000007) % 1000000007)
        |          * 2654435761) % 1000000007) + 1000000007) % 1000000007) % 100
        |     + 100) % 100 AS bucket,
        |    CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
        |                WHEN 'src2' THEN 25 ELSE 10 END AS rate
        |  FROM documents)
        |SELECT doc_id, source, bucket, CAST(rate AS BIGINT) AS rate
        |FROM b WHERE bucket < rate
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q95_sample_hash" ->
      // q94's pmod-parity arithmetic, mod 1000 for a 10% cut
      """WITH b AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    ((((((((doc_id % 1000000007) + 1000000007) % 1000000007)
        |          * 2654435761) % 1000000007) + 1000000007) % 1000000007) % 1000
        |     + 1000) % 1000 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, source, n_chars, bucket
        |FROM b WHERE bucket < 100
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "q96_quota_per_lang" ->
      """SELECT doc_id, lang, n_chars, rk FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM documents)
        |WHERE rk <= 50
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q97_pack_sequences" ->
      """SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(floor(COALESCE(
        |    SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
        |      OVER (PARTITION BY source ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) / 512.0) AS BIGINT) AS pack_id
        |FROM documents
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q130_chunk_windows" ->
      // same geometry interpolated (window/stride env dials); DuckDB
      // range() is end-exclusive so the +1 keeps the final start at
      // len(toks); list slicing toks[a:b] is 1-based inclusive, the
      // mirror of Spark's slice(arr, start, length)
      s"""WITH base AS (
        |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST((i - 1) // $ChunkStride + 1 AS BIGINT) AS chunk_idx,
        |  CAST(i AS BIGINT) AS start_tok,
        |  CAST(least($ChunkWindow, len(toks) - i + 1) AS BIGINT) AS n_chunk_toks,
        |  array_to_string(toks[i : least(i + ${ChunkWindow - 1}, len(toks))], ' ')
        |    AS chunk_text
        |FROM base, unnest(range(1, len(toks) + 1, $ChunkStride)) AS t(i)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST""".stripMargin,
    "q94_train_test_split" ->
      // every % is wrapped ((x % m) + m) % m to mirror Spark's pmod:
      // DuckDB's % keeps the sign, so a negative doc_id would otherwise
      // produce a negative bucket (→ 'test') where Spark buckets it
      // non-negatively — Pmod parity is spec-tested in LlmOpsSpec
      """WITH b AS (
        |  SELECT doc_id,
        |    ((((((((doc_id % 1000000007) + 1000000007) % 1000000007)
        |          * 2654435761) % 1000000007) + 1000000007) % 1000000007) % 100
        |     + 100) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q91_similarity_ivf" -> q91OracleSql,
    "q92_dedup_embedding" -> q92OracleSql,
    "q80_dedup_exact" ->
      """WITH dd AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        |  CAST(length(lower(trim(text))) AS INT) AS text_len
        |FROM dd GROUP BY lower(trim(text))
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q82_similarity_topk" ->
      // chain shared with q171's dense arm via OracleCtes (one spelling)
      s"""WITH ${OracleCtes.denseTopk}
        |SELECT qid, rnk, nid, cos6 FROM r WHERE rnk <= 5
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q83_text_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  round(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / count(*), 6) AS avg_tok,
        |  max(n_chars) AS max_chars
        |FROM documents GROUP BY lang, source
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    "q84_lang_id" ->
      """WITH s AS (
        |  SELECT doc_id, lang AS lang_true,
        |    CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and'], x))) AS INT) AS s_en,
        |    CAST(len(list_filter(string_split(text,' '), x -> list_contains(['el','la','de','y'], x))) AS INT) AS s_es,
        |    CAST(len(list_filter(string_split(text,' '), x -> list_contains(['der','die','das','und'], x))) AS INT) AS s_de,
        |    CAST(len(list_filter(string_split(text,' '), x -> list_contains(['le','la','de','et'], x))) AS INT) AS s_fr
        |  FROM documents)
        |SELECT doc_id, lang_true, s_en, s_es, s_de, s_fr,
        |  CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        |       WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
        |       WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
        |       WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
        |       ELSE 'fr' END AS lang_pred
        |FROM s
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST""".stripMargin,
    "q85_quality_score" ->
      // ratio denominators guarded with coalesce(x / nullif(d, 0), 0) —
      // the same total contract qualityExpr enforces on empty docs
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
        |    CAST(length(text) - length(regexp_replace(text, '[.!?,;]', '', 'g')) AS INT) AS n_punct,
        |    CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and'], x))) AS DOUBLE) AS n_stop,
        |    CAST(length(text) AS INT) AS n_chars
        |  FROM documents)
        |SELECT doc_id, n_tok, n_punct,
        |  round(coalesce(n_stop / nullif(n_tok, 0), 0.0), 6) AS stop_ratio,
        |  round(0.4 * coalesce(n_stop / nullif(n_tok, 0), 0.0)
        |      + 0.3 * least(1.0, CAST(n_tok AS DOUBLE) / 100.0)
        |      + 0.3 * (1.0 - coalesce(CAST(n_punct AS DOUBLE) / nullif(n_chars, 0), 0.0)), 6) AS quality
        |FROM f
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "q147_quality_classifier" -> {
      // the weight table re-DERIVED in SQL from the same quadratic
      // scramble the driver builds QcWeights with (KnuthSpec pins the
      // spellings equal); token code is q87's portable arithmetic;
      // list_reduce keeps the sum BIGINT (list_sum widens to HUGEINT)
      val code = "CAST(length(t) * 17 + ascii(substr(t, 1, 1)) AS BIGINT)"
      val w = s"(${knuthMix2Sql(knuthBucket2Sql(code, QcBuckets.toLong))} % 21 - 10)"
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    list_reduce(
         |      list_prepend(CAST(0 AS BIGINT),
         |        list_transform(string_split(text, ' '),
         |          t -> $w)),
         |      (a, b) -> a + b) AS score
         |  FROM documents)
         |SELECT doc_id, n_tok, score, score >= 0 AS keep
         |FROM scored
         |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin
    },
    "q152_filter_agreement" -> {
      // q85's quality CTE composed with q147's re-derived weight fold;
      // mean quality sums through DECIMAL(18,6) (exact — mirrors the
      // engine's decimal sum, keeping the 6-dp round order-independent),
      // mean score through the exact BIGINT sum
      val code = "CAST(length(t) * 17 + ascii(substr(t, 1, 1)) AS BIGINT)"
      val w = s"(${knuthMix2Sql(knuthBucket2Sql(code, QcBuckets.toLong))} % 21 - 10)"
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
         |    CAST(length(text) - length(regexp_replace(text, '[.!?,;]', '', 'g')) AS INT) AS n_punct,
         |    CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and'], x))) AS DOUBLE) AS n_stop,
         |    CAST(length(text) AS INT) AS n_chars
         |  FROM documents),
         |q AS (
         |  SELECT doc_id,
         |    round(0.4 * coalesce(n_stop / nullif(n_tok, 0), 0.0)
         |        + 0.3 * least(1.0, CAST(n_tok AS DOUBLE) / 100.0)
         |        + 0.3 * (1.0 - coalesce(CAST(n_punct AS DOUBLE) / nullif(n_chars, 0), 0.0)), 6) AS quality
         |  FROM f),
         |c AS (
         |  SELECT doc_id,
         |    list_reduce(
         |      list_prepend(CAST(0 AS BIGINT),
         |        list_transform(string_split(text, ' '),
         |          t -> $w)),
         |      (a, b) -> a + b) AS score
         |  FROM documents),
         |j AS (SELECT q.quality, c.score
         |      FROM q JOIN c ON c.doc_id = q.doc_id)
         |SELECT quality >= 0.5 AS keep_heuristic,
         |  score >= 0 AS keep_classifier,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  round(CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE)
         |          / count(*), 6) AS avg_quality,
         |  round(CAST(sum(score) AS DOUBLE) / count(*), 6) AS avg_score
         |FROM j GROUP BY 1, 2
         |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
         |  4 NULLS FIRST, 5 NULLS FIRST""".stripMargin
    },
    "q86_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INT) AS re_tokens,
        |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS subword_est
        |FROM documents
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q87_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ' '),
        |        t -> CAST(length(t) * 17 + ascii(substr(t, 1, 1)) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
        |FROM documents
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "q81_dedup_minhash" ->
      // the verified-pairs set from first principles: distinct string
      // shingles (the engine's xxhash64 fingerprints are Jaccard-
      // invariant), exact Jaccard >= 0.5 — sound because the 4x3 minhash
      // banding's candidate recall at j >= 0.5 is exactly 1 on this
      // corpus (see q81DedupMinhash scaladoc); unlike q88 there is no
      // df-cap, so the Jaccard is over ALL shingles
      """WITH dd AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 1]
        |  FROM documents),
        |docs AS (SELECT * FROM dd WHERE len(toks) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
        |  FROM docs, unnest(range(1, len(toks) - 1)) AS t(i)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2,
        |  round(CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common), 6) AS jacc
        |FROM pairs
        |JOIN sizes s1 ON s1.doc_id = d1
        |JOIN sizes s2 ON s2.doc_id = d2
        |WHERE CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) >= 0.5
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q165_winnow_stats" -> {
      val (k, w) = (winnowK, winnowW)
      s"""WITH tk AS (
        |  SELECT doc_id, list_transform(string_split(text, ' '),
        |    t -> $winnowTokenCodeSql) AS codes
        |  FROM documents),
        |${winnowSelCte(k, w)}
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        |  CAST(len(fps) AS BIGINT) AS n_selected,
        |  CASE WHEN n_grams > 0
        |    THEN CAST(${ppmDuckSql("len(fps)", "n_grams")} AS BIGINT)
        |    ELSE 0 END AS density_ppm
        |FROM sel
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin
    },
    "q166_winnow_overlap" -> {
      val (k, w) = (winnowK, winnowW)
      s"""WITH dd AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 1]
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, list_transform(toks,
        |    t -> $winnowTokenCodeSql) AS codes
        |  FROM dd),
        |${winnowSelCte(k, w)},
        |fpx AS (
        |  SELECT DISTINCT doc_id, f.fp FROM sel, unnest(fps) AS f(fp)),
        |keepf AS (
        |  SELECT fp FROM (SELECT fp, count(*) AS df FROM fpx GROUP BY 1)
        |  WHERE df <= ${geom.shingleDfCap}),
        |kept AS (SELECT f.doc_id, f.fp FROM fpx f JOIN keepf USING (fp)),
        |sizes AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
        |  FROM kept GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(count(*) AS BIGINT) AS common
        |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, common,
        |  round(CAST(common AS DOUBLE) / least(s1.n_fp, s2.n_fp), 6)
        |    AS overlap
        |FROM pairs
        |JOIN sizes s1 ON s1.doc_id = d1
        |JOIN sizes s2 ON s2.doc_id = d2
        |WHERE round(CAST(common AS DOUBLE) / least(s1.n_fp, s2.n_fp), 6)
        |  >= 0.5
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin
    },
    "q169_dedup_sweep" -> {
      // q88's CTE chain minus the 0.5 cut, crossed with the
      // interpolated ladder; the 0.5 row equals q88's cardinality
      val ladder = SweepThresholds.mkString(", ")
      s"""WITH dd AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 1]
        |  FROM documents),
        |docs AS (SELECT * FROM dd WHERE len(toks) >= 3),
        |sh_all AS (
        |  SELECT DISTINCT doc_id,
        |    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
        |  FROM docs, unnest(range(1, len(toks) - 1)) AS t(i)),
        |informative AS (SELECT sh FROM sh_all GROUP BY sh HAVING count(*) <= $ShingleDfCap),
        |sh AS (SELECT s.doc_id, s.sh FROM sh_all s JOIN informative i USING (sh)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT d1, d2,
        |    round(CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common), 6) AS jacc
        |  FROM pairs
        |  JOIN sizes s1 ON s1.doc_id = d1
        |  JOIN sizes s2 ON s2.doc_id = d2),
        |l AS (SELECT CAST(unnest([$ladder]) AS INT) AS threshold_pct),
        |hit AS (
        |  SELECT threshold_pct, d1, d2 FROM j, l
        |  WHERE jacc >= threshold_pct / 100.0),
        |np AS (SELECT threshold_pct, CAST(count(*) AS BIGINT) AS n_pairs
        |       FROM hit GROUP BY 1),
        |nd AS (SELECT threshold_pct, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |       FROM (SELECT threshold_pct, d1 AS doc_id FROM hit
        |             UNION ALL SELECT threshold_pct, d2 FROM hit)
        |       GROUP BY 1)
        |SELECT l.threshold_pct,
        |  coalesce(np.n_pairs, 0) AS n_pairs,
        |  coalesce(nd.n_docs, 0) AS n_docs
        |FROM l
        |LEFT JOIN np USING (threshold_pct)
        |LEFT JOIN nd USING (threshold_pct)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin
    },
    "q170_quality_sweep" -> {
      val ladder = QualityThresholds.mkString(", ")
      s"""WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(length(text) - length(regexp_replace(text, '[.!?,;]', '', 'g')) AS INT) AS n_punct,
        |    CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and'], x))) AS DOUBLE) AS n_stop,
        |    CAST(length(text) AS INT) AS n_chars
        |  FROM documents),
        |q AS (
        |  SELECT n_tok,
        |    round(0.4 * coalesce(n_stop / nullif(n_tok, 0), 0.0)
        |        + 0.3 * least(1.0, CAST(n_tok AS DOUBLE) / 100.0)
        |        + 0.3 * (1.0 - coalesce(CAST(n_punct AS DOUBLE) / nullif(n_chars, 0), 0.0)), 6) AS quality
        |  FROM f),
        |bins AS (
        |  SELECT CAST(floor(quality * 100) AS INT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_toks
        |  FROM q GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t_docs,
        |               CAST(sum(n_toks) AS BIGINT) AS t_toks FROM bins),
        |l AS (SELECT CAST(unnest([$ladder]) AS INT) AS threshold_pct),
        |kept AS (
        |  SELECT threshold_pct,
        |    CAST(coalesce(sum(n_docs), 0) AS BIGINT) AS k_docs,
        |    CAST(coalesce(sum(n_toks), 0) AS BIGINT) AS k_toks
        |  FROM l LEFT JOIN bins ON bin >= threshold_pct
        |  GROUP BY 1)
        |SELECT threshold_pct, k_docs AS n_docs_kept, k_toks AS n_tokens_kept,
        |  CAST(${ppmDuckSql("k_docs", "t_docs")} AS BIGINT) AS doc_keep_ppm,
        |  CAST(${ppmDuckSql("k_toks", "t_toks")} AS BIGINT) AS token_keep_ppm
        |FROM kept, tot
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST""".stripMargin
    },
    "q173_setsim_join" ->
      // the same lossless prefix-filter pruning, spelled over STRING
      // shingles with string tie-order — a DIFFERENT (but internally
      // consistent) total order than the engine's fingerprint order;
      // the prefix theorem makes both prune losslessly, so the verified
      // outputs are identical even though the candidate sets are not
      s"""WITH dd AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 1]
        |  FROM documents),
        |docs AS (SELECT * FROM dd WHERE len(toks) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS s
        |  FROM docs, unnest(range(1, len(toks) - 1)) AS t(i)),
        |m AS (SELECT doc_id, count(*) AS m FROM sh GROUP BY 1),
        |df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
        |ranked AS (
        |  SELECT t.doc_id, t.s,
        |    row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.s) AS rn
        |  FROM sh t JOIN df d USING (s)),
        |pref AS (
        |  SELECT r.doc_id, r.s FROM ranked r JOIN m USING (doc_id)
        |  WHERE rn <= m - (($SetSimTauNum * m + ${SetSimTauDen - 1})
        |    // $SetSimTauDen) + 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM pref a JOIN pref b ON a.s = b.s AND a.doc_id < b.doc_id),
        |candlen AS (
        |  SELECT c.d1, c.d2, m1.m AS m1, m2.m AS m2
        |  FROM cand c JOIN m m1 ON m1.doc_id = c.d1
        |              JOIN m m2 ON m2.doc_id = c.d2
        |  WHERE $SetSimTauNum * greatest(m1.m, m2.m)
        |     <= $SetSimTauDen * least(m1.m, m2.m)),
        |common AS (
        |  SELECT c.d1, c.d2, c.m1, c.m2, count(*) AS common
        |  FROM candlen c
        |  JOIN sh t1 ON t1.doc_id = c.d1
        |  JOIN sh t2 ON t2.doc_id = c.d2 AND t2.s = t1.s
        |  GROUP BY 1, 2, 3, 4)
        |SELECT d1, d2, m1, m2, common,
        |  CAST((1000 * common) // (m1 + m2 - common) AS BIGINT) AS jacc_pm
        |FROM common
        |WHERE ${SetSimTauNum + SetSimTauDen} * common
        |   >= $SetSimTauNum * (m1 + m2)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    "q175_dedup_recall_audit" ->
      // q173's exact chain and q88's df-capped chain composed over ONE
      // shared shingle CTE (disjoint downstream names), the same outer
      // join, the same integer band/ppm arithmetic; the τ and df-cap
      // constants interpolate from the same vals as the parents'
      // oracles, so a drifted constant breaks parent and audit together
      s"""WITH dd AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 1]
        |  FROM documents),
        |docs AS (SELECT * FROM dd WHERE len(toks) >= 3),
        |shx AS (
        |  SELECT DISTINCT doc_id,
        |    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS s
        |  FROM docs, unnest(range(1, len(toks) - 1)) AS t(i)),
        |mx AS (SELECT doc_id, count(*) AS m FROM shx GROUP BY 1),
        |dfx AS (SELECT s, count(*) AS df FROM shx GROUP BY 1),
        |rankedx AS (
        |  SELECT t.doc_id, t.s,
        |    row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.s) AS rn
        |  FROM shx t JOIN dfx d USING (s)),
        |prefx AS (
        |  SELECT r.doc_id, r.s FROM rankedx r JOIN mx USING (doc_id)
        |  WHERE rn <= m - (($SetSimTauNum * m + ${SetSimTauDen - 1})
        |    // $SetSimTauDen) + 1),
        |candx AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM prefx a JOIN prefx b ON a.s = b.s AND a.doc_id < b.doc_id),
        |candlenx AS (
        |  SELECT c.d1, c.d2, m1.m AS m1, m2.m AS m2
        |  FROM candx c JOIN mx m1 ON m1.doc_id = c.d1
        |               JOIN mx m2 ON m2.doc_id = c.d2
        |  WHERE $SetSimTauNum * greatest(m1.m, m2.m)
        |     <= $SetSimTauDen * least(m1.m, m2.m)),
        |commonx AS (
        |  SELECT c.d1, c.d2, c.m1, c.m2, count(*) AS common
        |  FROM candlenx c
        |  JOIN shx t1 ON t1.doc_id = c.d1
        |  JOIN shx t2 ON t2.doc_id = c.d2 AND t2.s = t1.s
        |  GROUP BY 1, 2, 3, 4),
        |ex AS (
        |  SELECT d1, d2,
        |    CAST((1000 * common) // (m1 + m2 - common) AS BIGINT) AS jacc_pm
        |  FROM commonx
        |  WHERE ${SetSimTauNum + SetSimTauDen} * common
        |     >= $SetSimTauNum * (m1 + m2)),
        |informativef AS (SELECT s FROM shx GROUP BY s
        |  HAVING count(*) <= $ShingleDfCap),
        |shf AS (SELECT x.doc_id, x.s FROM shx x JOIN informativef USING (s)),
        |sizesf AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY 1),
        |pairsf AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |fnd AS (
        |  SELECT d1, d2 FROM pairsf
        |  JOIN sizesf s1 ON s1.doc_id = d1
        |  JOIN sizesf s2 ON s2.doc_id = d2
        |  WHERE CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) >= 0.5),
        |fponly AS (
        |  SELECT f.d1, f.d2 FROM fnd f
        |  LEFT JOIN ex e ON e.d1 = f.d1 AND e.d2 = f.d2
        |  WHERE e.d1 IS NULL),
        |fpj AS (
        |  SELECT p.d1, p.d2, m1.m AS m1, m2.m AS m2, count(*) AS common
        |  FROM fponly p
        |  JOIN shx t1 ON t1.doc_id = p.d1
        |  JOIN shx t2 ON t2.doc_id = p.d2 AND t2.s = t1.s
        |  JOIN mx m1 ON m1.doc_id = p.d1
        |  JOIN mx m2 ON m2.doc_id = p.d2
        |  GROUP BY 1, 2, 3, 4),
        |allp AS (
        |  SELECT e.jacc_pm, 1 AS is_exact,
        |    CASE WHEN f.d1 IS NULL THEN 0 ELSE 1 END AS is_found
        |  FROM ex e LEFT JOIN fnd f ON f.d1 = e.d1 AND f.d2 = e.d2
        |  UNION ALL
        |  SELECT CAST((1000 * common) // (m1 + m2 - common) AS BIGINT), 0, 1
        |  FROM fpj),
        |banded AS (
        |  SELECT jacc_pm // 100 AS band,
        |    CAST(sum(is_exact) AS BIGINT) AS n_exact,
        |    CAST(sum(is_exact * is_found) AS BIGINT) AS n_found,
        |    CAST(sum(1 - is_exact) AS BIGINT) AS n_fp
        |  FROM allp GROUP BY 1)
        |SELECT CAST(band AS BIGINT) AS band, n_exact, n_found, n_fp,
        |  CASE WHEN n_exact > 0
        |    THEN CAST(${ppmDuckSql("n_found", "n_exact")} AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS recall_ppm
        |FROM banded
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "q88_dedup_ngram" ->
      s"""WITH dd AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 1]
        |  FROM documents),
        |docs AS (SELECT * FROM dd WHERE len(toks) >= 3),
        |sh_all AS (
        |  SELECT DISTINCT doc_id,
        |    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
        |  FROM docs, unnest(range(1, len(toks) - 1)) AS t(i)),
        |informative AS (SELECT sh FROM sh_all GROUP BY sh HAVING count(*) <= $ShingleDfCap),
        |sh AS (SELECT s.doc_id, s.sh FROM sh_all s JOIN informative i USING (sh)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, common,
        |  round(CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common), 6) AS jacc
        |FROM pairs
        |JOIN sizes s1 ON s1.doc_id = d1
        |JOIN sizes s2 ON s2.doc_id = d2
        |WHERE CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) >= 0.5
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin)
}
