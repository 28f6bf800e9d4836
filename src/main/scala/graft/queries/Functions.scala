package graft.queries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Naming

/** Scalar / UDF / UDAF / UDTF surface (SURVEY.md §2.2).
  *
  * q50 pins the reference's one nontrivial scalar function — the
  * `sinitize_text` pipeline (`functions.py:5-20`) — applied AS DATA
  * (normally it is a plan-time rename; here it runs per-row so the oracle
  * can check parity on real values). Everything else is `functions._`
  * built-ins (codegen'd, no UDF in the hot path).
  */
object Functions {

  /** Data-path variant of the reference sanitize: a Scala UDF (NFKD has no
    * Spark built-in). Used ONLY by q50; renames stay plan-time. */
  private val sanitizeUdf = udf((s: String) => if (s == null) null else Naming.sanitizeLower(s))

  /** q50: reference sanitize parity over part names. */
  val q50StringSanitize: Q = (spark, dir) => {
    val p = t(spark, dir, "part")
    orderAll(p.select(
      col("p_partkey"), col("p_name"),
      sanitizeUdf(col("p_name")).as("p_name_sane")))
  }

  /** q51 [EXT]: string builtin battery. */
  val q51StringFuncs: Q = (spark, dir) => {
    val c = t(spark, dir, "customer")
    orderAll(c.select(
      col("c_custkey"),
      upper(col("c_name")).as("uname"),
      substring(col("c_name"), 1, 5).as("pre5"),
      concat_ws("-", col("c_name"), col("c_mktsegment")).as("tagged"),
      length(col("c_name")).as("len"),
      col("c_name").like("%1%").as("has1"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
      lpad(col("c_custkey").cast(StringType), 10, "0").as("padded")))
  }

  /** q52 [EXT]: date/time builtins over o_orderdate. */
  val q52DateFuncs: Q = (spark, dir) => {
    val o = t(spark, dir, "orders")
    orderAll(o.select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dy"),
      quarter(col("o_orderdate")).as("qtr"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_str"),
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
      datediff(col("o_orderdate").cast(DateType), to_date(lit("1995-01-01"))).as("days_since"),
      date_format(add_months(col("o_orderdate").cast(DateType), 1), "yyyy-MM-dd").as("next_month")))
  }

  /** q53 [EXT]: math builtins; transcendentals rounded to 6 dp (libm ulp
    * differences across engines round away at any non-boundary value). */
  val q53MathFuncs: Q = (spark, dir) => {
    val p = t(spark, dir, "part")
    orderAll(p.select(
      col("p_partkey"),
      round(col("p_retailprice"), 1).as("r1"),
      abs(col("p_retailprice") - 1000.0).as("dist"),
      floor(col("p_retailprice")).as("fl"),
      ceil(col("p_retailprice")).as("ce"),
      round(ln(col("p_retailprice")), 6).as("lnp"),
      round(sqrt(col("p_retailprice")), 6).as("sqp"),
      round(pow(col("p_retailprice"), 2.0), 4).as("sq"),
      (col("p_size") % 5).as("m5"),
      greatest(col("p_size"), lit(25)).as("gt"),
      least(col("p_size"), lit(25)).as("lt")))
  }

  /** q54 [EXT]: array builtins over embeddings (elements cast to double on
    * BOTH sides so float32 printing can't diverge). Output is scalar-only:
    * the driver's pandas-based hash harness cannot sort array columns, so
    * `slice` is exercised through per-element projections and array_max /
    * array_min pin the whole-array reductions. */
  val q54ArrayFuncs: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    val head3 = slice(col("embedding"), 1, 3)
    orderAll(e.select(
      col("vec_id"), col("label"),
      size(col("embedding")).as("dim"),
      element_at(col("embedding"), 1).cast("double").as("first"),
      element_at(col("embedding"), 64).cast("double").as("last"),
      element_at(head3, 1).cast("double").as("h1"),
      element_at(head3, 2).cast("double").as("h2"),
      element_at(head3, 3).cast("double").as("h3"),
      array_max(col("embedding")).cast("double").as("vmax"),
      array_min(col("embedding")).cast("double").as("vmin")))
  }

  /** q55 [EXT]: JSON extraction + map functions over events.props. */
  val q55JsonMapFuncs: Q = (spark, dir) => {
    val e = events(spark, dir)
    val m = from_json(col("props"), MapType(StringType, StringType))
    orderAll(e.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"),
      map_keys(m).getItem(0).as("first_key"),
      size(m).as("n_keys")))
  }

  /** Weighted-mean Aggregator (q56): exact BigDecimal accumulation
    * mirroring the engines' double→DECIMAL(18,4) casts (valueOf =
    * shortest-string rounding, same as Spark's Cast), merged
    * associatively — a proper two-phase distributed aggregate. */
  // public: Janino-generated (un)safe projections access the buffer class
  // reflectively-free; a private case class forces an interpreted fallback
  // with a logged compile error on every task
  case class WBuf(spq: BigDecimal, sq: BigDecimal)
  object WeightedAvg extends Aggregator[(Double, Double), WBuf, Double] {
    private def d4(x: Double): BigDecimal =
      BigDecimal(java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP))
    def zero: WBuf = WBuf(BigDecimal(0), BigDecimal(0))
    def reduce(b: WBuf, a: (Double, Double)): WBuf =
      WBuf(b.spq + d4(a._1) * d4(a._2), b.sq + d4(a._2))
    def merge(x: WBuf, y: WBuf): WBuf = WBuf(x.spq + y.spq, x.sq + y.sq)
    def finish(b: WBuf): Double =
      if (b.sq.signum == 0) Double.NaN
      else b.spq.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble / b.sq.toDouble
    def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** q56 [EXT]: custom UDAF — quantity-weighted mean extendedprice per
    * returnflag. */
  val q56UdafWeightedAvg: Q = (spark, dir) => {
    val wavg = udaf(WeightedAvg)
    val li = t(spark, dir, "lineitem")
    orderAll(li.groupBy(col("l_returnflag"))
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price")))
  }

  /** q57 [EXT]: generator/UDTF — token table via posexplode(split(...)). */
  val q57ExplodeTokens: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    orderAll(d.select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok")))
  }

  /** q59 [EXT]: structured extraction — regexp capture groups and
    * split_part-style field access, the workhorse of log/ID parsing. */
  val q59RegexpExtract: Q = (spark, dir) => {
    val c = t(spark, dir, "customer")
    orderAll(c.select(
      col("c_custkey"),
      regexp_extract(col("c_name"), "Customer#(\\d+)", 1).as("id_str"),
      regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast("long").as("id_num"),
      element_at(split(col("c_name"), "#"), 1).as("prefix"),
      element_at(split(col("c_name"), "#"), 2).as("suffix"),
      regexp_extract(col("c_mktsegment"), "^([A-Z]+)", 1).as("seg_word")))
  }

  /** q58 [EXT]: ordered collection aggregate — collect_list → sort_array
    * → concat_ws, the deterministic form of "array_agg per group". The
    * value is emitted as a string because the driver's hash harness
    * cannot compare array cells (the q54 lesson); DuckDB mirrors it with
    * ordered string_agg. Two-phase: collect_list partials merge like any
    * other aggregation buffer. */
  val q58StringAgg: Q = (spark, dir) => {
    val o = t(spark, dir, "orders")
    orderAll(o.groupBy(col("o_custkey")).agg(
      concat_ws(",", sort_array(collect_list(col("o_orderpriority")))).as("prios"),
      count(lit(1)).as("n")))
  }

  val defs: Map[String, Q] = Map(
    "q50_string_sanitize" -> q50StringSanitize,
    "q51_string_funcs" -> q51StringFuncs,
    "q52_date_funcs" -> q52DateFuncs,
    "q53_math_funcs" -> q53MathFuncs,
    "q54_array_funcs" -> q54ArrayFuncs,
    "q55_json_map_funcs" -> q55JsonMapFuncs,
    "q56_udaf_weighted_avg" -> q56UdafWeightedAvg,
    "q57_explode_tokens" -> q57ExplodeTokens,
    "q58_string_agg" -> q58StringAgg,
    "q59_regexp_extract" -> q59RegexpExtract)

  val oracles: Map[String, String] = Map(
    "q50_string_sanitize" ->
      """SELECT p_partkey, p_name,
        |  lower(CASE WHEN regexp_matches(s, '^[0-9]') THEN 'col_' || s ELSE s END) AS p_name_sane
        |FROM (
        |  SELECT p_partkey, p_name,
        |    trim(regexp_replace(regexp_replace(regexp_replace(strip_accents(p_name),
        |      '[^a-zA-Z0-9_ ]', '', 'g'), ' +', '_', 'g'), '_+', '_', 'g'), '_') AS s
        |  FROM part)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q51_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_name) AS uname,
        |  substr(c_name, 1, 5) AS pre5,
        |  c_name || '-' || c_mktsegment AS tagged,
        |  length(c_name) AS len,
        |  c_name LIKE '%1%' AS has1,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded
        |FROM customer
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST, 8 NULLS FIRST""".stripMargin,
    "q52_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dy,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d_str,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month
        |FROM orders
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST, 8 NULLS FIRST, 9 NULLS FIRST""".stripMargin,
    "q53_math_funcs" ->
      """SELECT p_partkey,
        |  round(p_retailprice, 1) AS r1,
        |  abs(p_retailprice - 1000.0) AS dist,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  round(ln(p_retailprice), 6) AS lnp,
        |  round(sqrt(p_retailprice), 6) AS sqp,
        |  round(pow(p_retailprice, 2.0), 4) AS sq,
        |  p_size % 5 AS m5,
        |  greatest(p_size, 25) AS gt,
        |  least(p_size, 25) AS lt
        |FROM part
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST, 8 NULLS FIRST, 9 NULLS FIRST, 10 NULLS FIRST, 11 NULLS FIRST""".stripMargin,
    "q54_array_funcs" ->
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS INT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first,
        |  CAST(embedding[64] AS DOUBLE) AS last,
        |  CAST((embedding[1:3])[1] AS DOUBLE) AS h1,
        |  CAST((embedding[1:3])[2] AS DOUBLE) AS h2,
        |  CAST((embedding[1:3])[3] AS DOUBLE) AS h3,
        |  CAST(list_max(embedding) AS DOUBLE) AS vmax,
        |  CAST(list_min(embedding) AS DOUBLE) AS vmin
        |FROM embeddings
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST, 8 NULLS FIRST, 9 NULLS FIRST, 10 NULLS FIRST""".stripMargin,
    "q55_json_map_funcs" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  json_keys(props)[1] AS first_key,
        |  CAST(len(json_keys(props)) AS INT) AS n_keys
        |FROM events
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "q56_udaf_weighted_avg" ->
      """SELECT l_returnflag,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS wavg_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "q57_explode_tokens" ->
      """SELECT doc_id,
        |  CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos,
        |  unnest(string_split(text, ' ')) AS tok
        |FROM documents
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q59_regexp_extract" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, 'Customer#(\d+)', 1) AS id_str,
        |  CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS id_num,
        |  split_part(c_name, '#', 1) AS prefix,
        |  split_part(c_name, '#', 2) AS suffix,
        |  regexp_extract(c_mktsegment, '^([A-Z]+)', 1) AS seg_word
        |FROM customer
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    "q58_string_agg" ->
      """SELECT o_custkey,
        |  string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS prios,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin)
}
