package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] The LLM-corpus curation operators composed as ONE lazy DAG —
  * what a user of this library actually runs nightly: gate, dedup,
  * cap, split, pack, in a single plan Catalyst optimizes end-to-end
  * (column pruning reaches the scan once, not once per stage; no
  * intermediate materialization between stages).
  *
  * Stage order follows the cost gradient: the cheap row-local gates run
  * before the shuffling stages, so every shuffle moves an already-
  * shrunken corpus. Shuffle inventory (the 100 TB budget): one hash
  * shuffle for dedup, one for the per-lang quota, one per-`source`
  * window for packing — and NONE of them carries a document body:
  * every body-derived column (quality score, token count, dedup
  * fingerprint) is computed in the scan-side projection and `text` is
  * dropped before the first exchange (q80's trick, now composition-wide;
  * PlanSpec pins that no window input carries `text`). Split assignment
  * is a pure projection (q94).
  */
object Curation {

  /** documents at `dir` → curated, split, packed corpus:
    * `doc_id, lang, source, n_tokens, split, pack_id`.
    *
    * The gate is q85's quality score (stopword/length/punctuation
    * formula), not a bare length cut — the same score then RANKS the
    * per-language quota, so "best docs survive the cap" and "bad docs
    * never enter" share one definition of "good". */
  def curate(spark: org.apache.spark.sql.SparkSession, dir: String,
      minQuality: Double = 0.40, quotaPerLang: Int = 200,
      packTokens: Int = 512): DataFrame = {
    val d = t(spark, dir, "documents")

    // Scan-side projection: EVERY body-derived column at once — q85's
    // quality score (the gate AND the quota rank), the token count, and
    // the (xxhash64, length) dedup fingerprint — then `text` is gone.
    // From here on no operator, and in particular no Exchange, ever
    // moves a document body; at 100 TB the three shuffles below move a
    // ~40-byte metadata row each, not the corpus.
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val punct = length(col("text")) -
      length(regexp_replace(col("text"), "[.!?,;]", ""))
    val stopR = size(filter(toks,
      tk => tk.isInCollection(Seq("the", "a", "of", "and")))).cast("double") / nTok
    val lenR = least(lit(1.0), nTok.cast("double") / 100.0)
    val punctR = punct.cast("double") / length(col("text"))
    val quality = round(lit(0.4) * stopR + lit(0.3) * lenR +
      lit(0.3) * (lit(1.0) - punctR), 6)
    val norm = lower(trim(col("text")))
    val slim = d.select(col("doc_id"), col("lang"), col("source"),
        nTok.cast("long").as("n_tokens"), quality.as("__q"),
        xxhash64(norm).as("__h"), length(norm).as("__hl"))

    // 1. quality gate — row-local, runs at the scan
    val gated = slim.filter(col("__q") >= minQuality)

    // 2. exact dedup, keep-min-id — the window's hash Exchange carries
    //    only the fingerprint + metadata columns selected above
    val dw = Window.partitionBy(col("__h"), col("__hl"))
      .orderBy(col("doc_id").asc)
    val deduped = gated.withColumn("__rn", row_number().over(dw))
      .filter(col("__rn") === 1).drop("__rn", "__h", "__hl")

    // 3. per-language quota, best-quality-first — the rank filter plans
    //    a map-side WindowGroupLimit(Partial), bounding the shuffle to ≤
    //    quota·partitions rows per language (PlanSpec pins the rewrite)
    val qw = Window.partitionBy(col("lang"))
      .orderBy(col("__q").desc, col("doc_id").asc)
    val capped = deduped.withColumn("__rk", row_number().over(qw))
      .filter(col("__rk") <= quotaPerLang).drop("__rk", "__q")

    // 4. deterministic 80/10/10 split — q94's Knuth bucketing, projection
    val bucket = knuthBucket(col("doc_id"), 100L)
    val split_ = when(bucket < 80, lit("train"))
      .when(bucket < 90, lit("val")).otherwise(lit("test"))

    // 5. token-budget packing per (split, source) shard — q97's
    //    prefix-sum formulation, one window pass
    val pw = Window.partitionBy(col("split"), col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumBefore = coalesce(sum(col("n_tokens")).over(pw), lit(0L))

    capped.withColumn("split", split_)
      .withColumn("pack_id", floor(cumBefore / lit(packTokens.toDouble)).cast("long"))
      .select("doc_id", "lang", "source", "n_tokens", "split", "pack_id")
  }

  /** q76: the WHOLE curation DAG as a declared, fully-oracled query —
    * the composition itself is correctness-gated, not just its stages.
    * (The oracle dedups by the normalized text where the engine groups
    * by (xxhash64, length) — identical groups modulo a ~2^-64 collision,
    * q80's accepted argument.) */
  val q76CurationPipeline: Q = (spark, dir) =>
    orderAll(curate(spark, dir))

  val defs: Map[String, Q] = Map(
    "q76_curation_pipeline" -> q76CurationPipeline)

  val oracles: Map[String, String] = Map(
    "q76_curation_pipeline" ->
      """WITH q AS (
        |  SELECT doc_id, lang, source, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    round(0.4 * (CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and'], x))) AS DOUBLE)
        |                 / len(string_split(text, ' ')))
        |        + 0.3 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0)
        |        + 0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.!?,;]', '', 'g')) AS DOUBLE) / length(text)), 6) AS quality
        |  FROM documents),
        |gated AS (
        |  SELECT * FROM q WHERE quality >= 0.40),
        |dedup AS (
        |  SELECT * FROM gated
        |  QUALIFY row_number() OVER (PARTITION BY lower(trim(text))
        |                             ORDER BY doc_id ASC) = 1),
        |capped AS (
        |  SELECT doc_id, lang, source, n_tokens FROM dedup
        |  QUALIFY row_number() OVER (PARTITION BY lang
        |                             ORDER BY quality DESC, doc_id ASC) <= 200),
        |tagged AS (
        |  SELECT doc_id, lang, source, n_tokens,
        |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT *,
        |    ((((((((doc_id % 1000000007) + 1000000007) % 1000000007)
        |          * 2654435761) % 1000000007) + 1000000007) % 1000000007) % 100
        |     + 100) % 100 AS b FROM capped))
        |SELECT doc_id, lang, source, n_tokens, split,
        |  CAST(floor(COALESCE(
        |    SUM(n_tokens) OVER (PARTITION BY split, source ORDER BY doc_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) / 512.0) AS BIGINT) AS pack_id
        |FROM tagged
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin)
}
