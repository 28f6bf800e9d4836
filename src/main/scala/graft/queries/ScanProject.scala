package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ingest.{Canonicalize, CsvSource, Fixtures}

/** Scans, projections, renames, null-normalization, casts — the part of
  * the surface the reference actually implements (SURVEY.md §2.1 R2-R5),
  * plus the [EXT] filter/cast queries (§2.2).
  */
object ScanProject {

  /** q01: the reference's full input contract end-to-end — `;`/ISO-8859-1
    * CSV with messy headers (R2), sanitize-rename (R3), drop the extra
    * column (R4), empty→null (R5) — then project the lossless (int/string)
    * columns so the oracle can compare against the parquet source the
    * fixture was written from. */
  val q01ScanCsv: Q = (spark, dir) => {
    val path = Fixtures.messyLineitemCsv(spark, dir)
    val raw = CsvSource.readBatch(spark, path)
    val canon = Canonicalize(raw, Fixtures.lineitemCanonicalCols)
    orderAll(canon.select(
      col("l_orderkey").try_cast(LongType).as("l_orderkey"),
      col("l_linenumber").try_cast(IntegerType).as("l_linenumber"),
      col("l_returnflag"),
      col("l_linestatus")))
  }

  /** q02: plain parquet scan + projection; Catalyst must push the column
    * pruning into the scan (ReadSchema shows only 4 columns). */
  val q02ScanParquet: Q = (spark, dir) =>
    orderAll(t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"))

  /** q03: R3+R4 as a standalone op — messy-rename lineitem in-plan, add a
    * junk column, then sanitize+project back onto the canonical set. */
  val q03ProjectRename: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    val messy = li.select(li.columns.map(c =>
      col(c).as(Fixtures.messyLineitemHeaders.getOrElse(c, c))).toIndexedSeq: _*)
      .withColumn("Extra.Col!", lit("drop-me"))
    val canon = Canonicalize.sanitizeColumns(messy)
    val keep = Fixtures.lineitemCanonicalCols.toSet
    orderAll(canon
      .select(canon.columns.filter(keep).map(col).toIndexedSeq: _*)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"))
  }

  /** q04: R5 empty-string→null as data semantics; a deterministic slice of
    * rows gets an empty lang so the nullification is observable. */
  val q04NullNormalize: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    orderAll(d.select(
      col("doc_id"),
      nullif(col("text"), lit("")).as("text_n"),
      nullif(when(col("doc_id") % 7 === 0, lit("")).otherwise(col("lang")), lit(""))
        .as("lang_n"),
      (col("text").isNull || trim(col("text")) === "").as("was_empty")))
  }

  /** q05 [EXT]: conjunctive/disjunctive predicates, BETWEEN/IN/LIKE —
    * all pushable to the parquet scan (PushedFilters). */
  val q05FilterPredicate: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    orderAll(li
      .filter(col("l_quantity").between(10, 40) &&
        col("l_returnflag").isin("A", "R") &&
        col("l_linestatus").like("F%") &&
        (col("l_discount") < 0.05 || col("l_tax") > 0.04))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"))
  }

  /** q06: the settings.py:30-36 *intended* string→int casts with
    * non-numeric → null (try_cast, identical to DuckDB TRY_CAST). */
  val q06CastTypes: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    val s = when(col("l_orderkey") % 10 === 0, lit("n/a"))
      .otherwise(col("l_linenumber").cast(StringType))
    orderAll(li.select(
      col("l_orderkey"),
      col("l_linenumber"),
      s.as("raw_s"),
      s.try_cast(IntegerType).as("cast_i")))
  }

  /** q07 [EXT]: JSON-lines source scan with an explicit schema (streaming
    * sources can't infer, and a schema-less batch scan double-reads the
    * data) — round-trips the lossless lineitem columns through a JSON
    * fixture and is oracled against the parquet source it came from. */
  val q07ScanJson: Q = (spark, dir) => {
    val path = Fixtures.lineitemJson(spark, dir)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType)))
    orderAll(spark.read.schema(schema).json(path)
      .select(Fixtures.lineitemJsonCols.map(col): _*))
  }

  /** q08 [EXT]: ORC source scan — Spark's other native columnar format,
    * with the same pruning/pushdown machinery as parquet; round-trips
    * the lossless lineitem columns and shares q07's oracle shape. */
  val q08ScanOrc: Q = (spark, dir) => {
    val path = Fixtures.lineitemOrc(spark, dir)
    orderAll(spark.read.orc(path)
      .select(Fixtures.lineitemJsonCols.map(col): _*))
  }

  /** q09: R6 end-to-end, driver-visible — a canonical all-strings
    * reclamações frame (built from customer's int/string columns; doubles
    * excluded so string formatting can't diverge between engines) goes
    * through the raw-body Avro encode (`AvroEncodeExpression`, mirroring
    * `/root/reference/src/ex8_producer/app.py:145-152`) and back through
    * the decode. The oracle is the identity SELECT of the same mapping,
    * so the DuckDB gate certifies decode∘encode = id — including the
    * null-union round-trip for the 5 nullable wire fields, which the
    * planted CASE…NULL branches exercise on ~45% of rows. */
  val q09AvroRoundtrip: Q = (spark, dir) => {
    import graft.ingest.AvroCodec
    orderAll(AvroCodec.decodeFrame(spark,
      AvroCodec.encodeFrame(spark, reclamacoesCanon(spark, dir))))
  }

  /** The canonical all-strings reclamações frame q09/q09b encode —
    * factored so the evolution query certifiably encodes the SAME bytes
    * the round-trip does. */
  private[graft] def reclamacoesCanon(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val k = col("c_custkey")
    def m(n: Int) = (k % n).cast(StringType)
    def nullEvery(n: Int, v: org.apache.spark.sql.Column) =
      when(k % n === 0, lit(null)).otherwise(v)
    c.select(
      k.cast(StringType).as("ano"),
      (k % 4 + 1).cast(StringType).as("trimestre"),
      col("c_mktsegment").as("categoria"),
      col("c_name").as("tipo"),
      nullEvery(5, (k * 100 + col("c_nationkey")).cast(StringType)).as("cnpj_if"),
      concat(col("c_name"), lit("#"), col("c_mktsegment"))
        .as("instituicao_financeira"),
      col("c_nationkey").cast(StringType).as("indice"),
      m(7).as("quantidade_de_reclamacoes_reguladas_procedentes"),
      nullEvery(3, m(11)).as("quantidade_de_reclamacoes_reguladas_outras"),
      nullEvery(4, m(13)).as("quantidade_de_reclamacoes_nao_reguladas"),
      m(17).as("quantidade_total_de_reclamacoes"),
      m(19).as("quantidade_total_de_clientes_ccs_e_scr"),
      nullEvery(6, m(23)).as("quantidade_de_clientes_ccs"),
      nullEvery(10, m(29)).as("quantidade_de_clientes_scr"))
  }

  /** q09b: R6's schema-EVOLUTION facet — the same writer-schema bytes
    * q09 encodes, decoded with the evolved READER schema
    * (`Schemas.reclamacoesEvolvedAvsc`) via Avro's standard
    * writer→reader resolution: `indice` dropped (its bytes are read and
    * skipped), `origem` added as a null-union defaulting null, `fonte`
    * added as a required string defaulting "bcb", and the writer's 5
    * null-unions resolved as before. The oracle is q09's identity
    * projection minus the dropped field plus the two default literals,
    * so the DuckDB gate certifies the resolution rules — not just that
    * decode ran. */
  val q09bAvroEvolution: Q = (spark, dir) => {
    import graft.ingest.AvroCodec
    orderAll(AvroCodec.decodeFrameEvolved(spark,
      AvroCodec.encodeFrame(spark, reclamacoesCanon(spark, dir)),
      graft.core.Schemas.reclamacoesEvolvedAvsc))
  }

  val defs: Map[String, Q] = Map(
    "q01_scan_csv" -> q01ScanCsv,
    "q09_avro_roundtrip" -> q09AvroRoundtrip,
    "q09b_avro_evolution" -> q09bAvroEvolution,
    "q02_scan_parquet" -> q02ScanParquet,
    "q07_scan_json" -> q07ScanJson,
    "q08_scan_orc" -> q08ScanOrc,
    "q03_project_rename" -> q03ProjectRename,
    "q04_null_normalize" -> q04NullNormalize,
    "q05_filter_predicate" -> q05FilterPredicate,
    "q06_cast_types" -> q06CastTypes)

  val oracles: Map[String, String] = Map(
    "q09_avro_roundtrip" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS ano,
        |  CAST(c_custkey % 4 + 1 AS VARCHAR) AS trimestre,
        |  c_mktsegment AS categoria,
        |  c_name AS tipo,
        |  CASE WHEN c_custkey % 5 = 0 THEN NULL
        |       ELSE CAST(c_custkey * 100 + c_nationkey AS VARCHAR) END AS cnpj_if,
        |  c_name || '#' || c_mktsegment AS instituicao_financeira,
        |  CAST(c_nationkey AS VARCHAR) AS indice,
        |  CAST(c_custkey % 7 AS VARCHAR) AS quantidade_de_reclamacoes_reguladas_procedentes,
        |  CASE WHEN c_custkey % 3 = 0 THEN NULL
        |       ELSE CAST(c_custkey % 11 AS VARCHAR) END AS quantidade_de_reclamacoes_reguladas_outras,
        |  CASE WHEN c_custkey % 4 = 0 THEN NULL
        |       ELSE CAST(c_custkey % 13 AS VARCHAR) END AS quantidade_de_reclamacoes_nao_reguladas,
        |  CAST(c_custkey % 17 AS VARCHAR) AS quantidade_total_de_reclamacoes,
        |  CAST(c_custkey % 19 AS VARCHAR) AS quantidade_total_de_clientes_ccs_e_scr,
        |  CASE WHEN c_custkey % 6 = 0 THEN NULL
        |       ELSE CAST(c_custkey % 23 AS VARCHAR) END AS quantidade_de_clientes_ccs,
        |  CASE WHEN c_custkey % 10 = 0 THEN NULL
        |       ELSE CAST(c_custkey % 29 AS VARCHAR) END AS quantidade_de_clientes_scr
        |FROM customer
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST, 8 NULLS FIRST,
        |  9 NULLS FIRST, 10 NULLS FIRST, 11 NULLS FIRST, 12 NULLS FIRST,
        |  13 NULLS FIRST, 14 NULLS FIRST""".stripMargin,
    "q09b_avro_evolution" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS ano,
        |  CAST(c_custkey % 4 + 1 AS VARCHAR) AS trimestre,
        |  c_mktsegment AS categoria,
        |  c_name AS tipo,
        |  CASE WHEN c_custkey % 5 = 0 THEN NULL
        |       ELSE CAST(c_custkey * 100 + c_nationkey AS VARCHAR) END AS cnpj_if,
        |  c_name || '#' || c_mktsegment AS instituicao_financeira,
        |  CAST(c_custkey % 7 AS VARCHAR) AS quantidade_de_reclamacoes_reguladas_procedentes,
        |  CASE WHEN c_custkey % 3 = 0 THEN NULL
        |       ELSE CAST(c_custkey % 11 AS VARCHAR) END AS quantidade_de_reclamacoes_reguladas_outras,
        |  CASE WHEN c_custkey % 4 = 0 THEN NULL
        |       ELSE CAST(c_custkey % 13 AS VARCHAR) END AS quantidade_de_reclamacoes_nao_reguladas,
        |  CAST(c_custkey % 17 AS VARCHAR) AS quantidade_total_de_reclamacoes,
        |  CAST(c_custkey % 19 AS VARCHAR) AS quantidade_total_de_clientes_ccs_e_scr,
        |  CASE WHEN c_custkey % 6 = 0 THEN NULL
        |       ELSE CAST(c_custkey % 23 AS VARCHAR) END AS quantidade_de_clientes_ccs,
        |  CASE WHEN c_custkey % 10 = 0 THEN NULL
        |       ELSE CAST(c_custkey % 29 AS VARCHAR) END AS quantidade_de_clientes_scr,
        |  CAST(NULL AS VARCHAR) AS origem,
        |  'bcb' AS fonte
        |FROM customer
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST, 8 NULLS FIRST,
        |  9 NULLS FIRST, 10 NULLS FIRST, 11 NULLS FIRST, 12 NULLS FIRST,
        |  13 NULLS FIRST, 14 NULLS FIRST, 15 NULLS FIRST""".stripMargin,
    "q01_scan_csv" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q02_scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q07_scan_json" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q08_scan_orc" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q03_project_rename" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q04_null_normalize" ->
      """SELECT doc_id,
        |  nullif(text, '') AS text_n,
        |  nullif(CASE WHEN doc_id % 7 = 0 THEN '' ELSE lang END, '') AS lang_n,
        |  (text IS NULL OR trim(text) = '') AS was_empty
        |FROM documents
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q05_filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 40
        |  AND l_returnflag IN ('A','R')
        |  AND l_linestatus LIKE 'F%'
        |  AND (l_discount < 0.05 OR l_tax > 0.04)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "q06_cast_types" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_orderkey % 10 = 0 THEN 'n/a' ELSE CAST(l_linenumber AS VARCHAR) END AS raw_s,
        |  TRY_CAST(CASE WHEN l_orderkey % 10 = 0 THEN 'n/a' ELSE CAST(l_linenumber AS VARCHAR) END AS INTEGER) AS cast_i
        |FROM lineitem
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin)
}
