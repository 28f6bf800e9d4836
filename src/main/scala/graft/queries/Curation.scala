package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] The LLM-corpus curation operators composed as ONE lazy DAG —
  * what a user of this library actually runs nightly: dedup, gate,
  * cap, split, pack, in a single plan Catalyst optimizes end-to-end
  * (column pruning reaches the scan once, not once per stage; no
  * intermediate materialization between stages).
  *
  * Stage order follows the cost gradient: the cheap row-local gates run
  * before the shuffling stages, so every shuffle moves an already-
  * shrunken corpus. Shuffle inventory (the 100 TB budget): one hash
  * shuffle for dedup (fingerprints, q80's trick), one for the per-lang
  * quota (GroupTopK-prefiltered candidates only), one per-`source`
  * window for packing. Split assignment is a pure projection (q94).
  */
object Curation {

  /** documents at `dir` → curated, split, packed corpus:
    * `doc_id, lang, source, n_tokens, split, pack_id`. */
  def curate(spark: org.apache.spark.sql.SparkSession, dir: String,
      minChars: Int = 64, quotaPerLang: Int = 200,
      packTokens: Int = 512): DataFrame = {
    val d = t(spark, dir, "documents")

    // 1. quality gate — row-local, runs at the scan (predicate pushdown)
    val gated = d.filter(col("n_chars") >= minChars)

    // 2. exact dedup, keep-min-id — fingerprint shuffle, never bodies
    val norm = lower(trim(col("text")))
    val dw = Window.partitionBy(xxhash64(norm), length(norm))
      .orderBy(col("doc_id").asc)
    val deduped = gated.withColumn("__rn", row_number().over(dw))
      .filter(col("__rn") === 1).drop("__rn")

    // 3. per-language quota — the rank filter plans a map-side
    //    WindowGroupLimit(Partial), bounding the shuffle to ≤
    //    quota·partitions rows per language (PlanSpec pins the rewrite)
    val slim = deduped.select(col("doc_id"), col("lang"), col("source"),
      col("n_chars"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val qw = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val capped = slim.withColumn("__rk", row_number().over(qw))
      .filter(col("__rk") <= quotaPerLang).drop("__rk")

    // 4. deterministic 80/10/10 split — q94's Knuth bucketing, projection
    val P = 1000000007L
    val bucket = pmod(pmod(pmod(col("doc_id"), lit(P)) * lit(2654435761L), lit(P)), lit(100L))
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
      """WITH gated AS (
        |  SELECT * FROM documents WHERE n_chars >= 64),
        |dedup AS (
        |  SELECT * FROM gated
        |  QUALIFY row_number() OVER (PARTITION BY lower(trim(text))
        |                             ORDER BY doc_id ASC) = 1),
        |slim AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM dedup),
        |capped AS (
        |  SELECT * FROM slim
        |  QUALIFY row_number() OVER (PARTITION BY lang
        |                             ORDER BY n_chars DESC, doc_id ASC) <= 200),
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
