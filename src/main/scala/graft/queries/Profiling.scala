package graft.queries

import org.apache.spark.sql.functions._

/** [EXT] Dataset-QA profiling — the "what is actually in this corpus"
  * report every ingestion run emits before training jobs trust the data
  * (the reference forwards rows blind, `app.py:128-139`; a 100 TB
  * pipeline cannot). Follows the package determinism rules: exact BIGINT
  * counts, min/max rendered through deterministic casts, total ORDER BY.
  */
object Profiling {

  /** q102: per-column profile of the documents table — null count,
    * exact distinct count, and native-type min/max (computed on the
    * column's own type, then rendered VARCHAR so the report schema is
    * uniform), one output row per column.
    *
    * ONE scan: all 4·m aggregates ride a single `agg(...)` pass and the
    * per-column reshape is a row-local `stack` of the 1-row result —
    * never m scans of the table. The null/min/max aggregates combine
    * map-side; the exact distincts are the one genuinely expensive part
    * (Catalyst plans multi-distinct via Expand — each input row fans out
    * once per distinct aggregate before the partial dedup). That
    * exactness is what the hash gate needs; at 100 TB the same report
    * swaps `countDistinct` for `approx_count_distinct` (q25's mergeable
    * HLL — single pass, no Expand, 2% error) and nothing else changes:
    * the profile is a dial between audit-exact and scan-cheap, not two
    * operators. */
  val q102ColumnProfile: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
    }
    val one = d.agg(aggs.head, aggs.tail: _*)
    val stacked = s"stack(${cols.length}, " + cols.map(c =>
      s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max")
      .mkString(", ") + ") AS (col_name, n_nulls, n_distinct, min_v, max_v)"
    orderAll(one.select(expr(stacked)))
  }

  val defs: Map[String, Q] = Map(
    "q102_column_profile" -> q102ColumnProfile)

  val oracles: Map[String, String] = Map(
    "q102_column_profile" ->
      // same single-scan aggregate, reshaped by UNION ALL; COUNT(*) -
      // COUNT(col) = null count, COUNT(DISTINCT) excludes nulls in both
      // engines, min/max on the native type then CAST — all BIGINT/
      // memcmp-deterministic
      """WITH s AS (SELECT
        |  count(*) AS n,
        |  count(doc_id) AS c1, count(DISTINCT doc_id) AS d1,
        |    CAST(min(doc_id) AS VARCHAR) AS lo1, CAST(max(doc_id) AS VARCHAR) AS hi1,
        |  count(text) AS c2, count(DISTINCT text) AS d2,
        |    CAST(min(text) AS VARCHAR) AS lo2, CAST(max(text) AS VARCHAR) AS hi2,
        |  count(lang) AS c3, count(DISTINCT lang) AS d3,
        |    CAST(min(lang) AS VARCHAR) AS lo3, CAST(max(lang) AS VARCHAR) AS hi3,
        |  count(source) AS c4, count(DISTINCT source) AS d4,
        |    CAST(min(source) AS VARCHAR) AS lo4, CAST(max(source) AS VARCHAR) AS hi4,
        |  count(n_chars) AS c5, count(DISTINCT n_chars) AS d5,
        |    CAST(min(n_chars) AS VARCHAR) AS lo5, CAST(max(n_chars) AS VARCHAR) AS hi5
        |FROM documents),
        |u AS (
        |  SELECT 'doc_id' AS col_name, n - c1 AS n_nulls, d1 AS n_distinct,
        |    lo1 AS min_v, hi1 AS max_v FROM s
        |  UNION ALL SELECT 'text', n - c2, d2, lo2, hi2 FROM s
        |  UNION ALL SELECT 'lang', n - c3, d3, lo3, hi3 FROM s
        |  UNION ALL SELECT 'source', n - c4, d4, lo4, hi4 FROM s
        |  UNION ALL SELECT 'n_chars', n - c5, d5, lo5, hi5 FROM s)
        |SELECT col_name, n_nulls, n_distinct, min_v, max_v FROM u
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin)
}
