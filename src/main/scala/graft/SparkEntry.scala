package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.{Canonicalize, CsvSource, Fixtures}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's whole data path (SURVEY.md §3.3) on real
    * testdata volume — messy-headed `;`/ISO-8859-1 CSV scan (R2) →
    * sanitize-rename (R3) → projection w/ silent extra-column drop (R4) →
    * empty→null (R5) → canonical frame. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val path = Fixtures.messyLineitemCsv(spark, "/root/testdata/sf0.001")
    Canonicalize(CsvSource.readBatch(spark, path), Fixtures.lineitemCanonicalCols)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ScanProject.defs ++ Joins.defs ++ Aggregates.defs ++ Windows.defs ++
      SortSetOps.defs ++ Subqueries.defs ++ Functions.defs ++
      StreamWindows.defs ++ LlmOps.defs ++ MultiModal.defs ++ Curation.defs ++
      CorpusOps.defs ++ Profiling.defs ++ GraphOps.defs ++ TokenStats.defs ++
      SegmentOps.defs ++ Composition.defs ++ CorpusAudit.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ScanProject.oracles ++ Joins.oracles ++ Aggregates.oracles ++
      Windows.oracles ++ SortSetOps.oracles ++ Subqueries.oracles ++
      Functions.oracles ++ StreamWindows.oracles ++ LlmOps.oracles ++
      MultiModal.oracles ++ Curation.oracles ++ CorpusOps.oracles ++
      Profiling.oracles ++ GraphOps.oracles ++ TokenStats.oracles ++
      SegmentOps.oracles ++ Composition.oracles ++ CorpusAudit.oracles
}
