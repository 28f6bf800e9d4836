package graft.queries

import org.apache.spark.sql.functions._

/** Aggregation surface [EXT] (SURVEY.md §2.2). All sums over double
  * measures go through exact decimal (see package doc) so Spark's
  * two-phase parallel HashAggregate and DuckDB's serial sum cannot drift.
  * Partial/final aggregation split is Catalyst's — map-side combine is
  * free, which is exactly what survives a 100 TB groupBy. */
object Aggregates {

  /** q20: TPC-H Q1 shape — hash aggregate with multiple measures. */
  val q20Hash: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    val disc = oneMinus(col("l_discount"))
    val tax = onePlus(col("l_tax"))
    orderAll(li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      dsum(col("l_quantity")).as("sum_qty"),
      dsum(col("l_extendedprice")).as("sum_base_price"),
      // 8/12-dp sums exceed double's 15 exact digits, where decimal→double
      // conversion differs from DuckDB by 1 ulp; round the EXACT decimal
      // sum to 2 dp first (half-up in both engines), then double is exact.
      round(sum(col("l_extendedprice").cast("decimal(18,4)") * disc), 2)
        .cast("double").as("sum_disc_price"),
      round(sum(col("l_extendedprice").cast("decimal(18,4)") * disc * tax), 2)
        .cast("double").as("sum_charge"),
      dmean(col("l_quantity")).as("avg_qty"),
      dmean(col("l_extendedprice")).as("avg_price"),
      count(lit(1)).as("count_order")))
  }

  /** q21: exact distinct aggregation (Expand + two-phase under the hood). */
  val q21Distinct: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    orderAll(li.groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_partkey")).as("nd_parts"),
      countDistinct(col("l_suppkey")).as("nd_supps"),
      count(lit(1)).as("n")))
  }

  /** q22: ROLLUP with explicit grouping flags (null keys from the rollup
    * are disambiguated from data nulls by grouping()). */
  val q22Rollup: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    orderAll(li.rollup(col("l_returnflag"), col("l_linestatus")).agg(
      count(lit(1)).as("n"),
      dsum(col("l_quantity")).as("sum_qty"),
      grouping(col("l_returnflag")).cast("int").as("g_rf"),
      grouping(col("l_linestatus")).cast("int").as("g_ls")))
  }

  /** q23: CUBE — all 4 grouping combinations. */
  val q23Cube: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    orderAll(li.cube(col("l_returnflag"), col("l_linestatus")).agg(
      count(lit(1)).as("n"),
      dsum(col("l_extendedprice")).as("sum_price"),
      grouping(col("l_returnflag")).cast("int").as("g_rf"),
      grouping(col("l_linestatus")).cast("int").as("g_ls")))
  }

  /** q24: GROUPING SETS via the SQL surface (Dataset API has only
    * rollup/cube; this also exercises spark.sql + temp views). */
  val q24GroupingSets: Q = (spark, dir) => {
    t(spark, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    orderAll(spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  count(1) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls
        |FROM gs_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |""".stripMargin))
  }

  /** q25: approximate distinct (HLL++) — no oracle (not bit-compatible
    * with DuckDB's approx sketch); driver records rows-only. This is the
    * 100 TB answer to q21 when exactness isn't required. */
  val q25ApproxDistinct: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    orderAll(li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      approx_count_distinct(col("l_orderkey")).as("approx_orders")))
  }

  /** q26: exact interpolated percentiles (same continuous-quantile
    * definition as DuckDB's quantile_cont: rank = p·(n−1), linear
    * interpolation). At 100 TB, exact percentile means a sort per group —
    * q25's sketch (HLL) and approx_percentile are the scale alternatives;
    * this pins the exact semantics. */
  val q26Percentile: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    orderAll(li.groupBy(col("l_returnflag")).agg(
      round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
      round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
      round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"),
      round(expr("percentile(l_extendedprice, 0.9)"), 6).as("price_p90")))
  }

  /** q28: approximate percentiles — percentile_approx (GK sketch, the
    * mergeable no-sort-per-group scale path q26's Scaladoc points to).
    * No oracle (sketch internals are engine-local); rows-only, with
    * accuracy vs exact percentiles asserted in ApproxSpec. */
  val q28ApproxPercentile: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    orderAll(li.groupBy(col("l_returnflag")).agg(
      round(expr("percentile_approx(l_extendedprice, 0.5, 1000)"), 2).as("p50_approx"),
      round(expr("percentile_approx(l_extendedprice, 0.95, 1000)"), 2).as("p95_approx")))
  }

  /** q29: statistical aggregates — stddev/variance (sample), Pearson
    * correlation and sample covariance per group. Rounded to 4 dp: both
    * engines use numerically stable (merge-able) moment formulas, but
    * partial-merge order differs across engines, so agreement is to
    * ~1e-8 relative, not bit-exact. */
  val q29AggStats: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    orderAll(li.groupBy(col("l_returnflag")).agg(
      round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
      round(var_samp(col("l_quantity")), 4).as("var_qty"),
      round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
      round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qp")))
  }

  /** q27: pivot — returnflag categories become columns (explicit value
    * list, so the plan is a single aggregate pass; an unlisted-values
    * pivot needs an extra distinct scan first, worth avoiding at scale). */
  val q27Pivot: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    orderAll(li.groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum(col("l_quantity")))
      .select(col("l_linestatus"), col("A").as("qty_a"),
        col("N").as("qty_n"), col("R").as("qty_r")))
  }

  /** q153 [EXT]: unpivot — q27's inverse, closing the wide↔long pair
    * (every reporting pipeline needs both directions: pivot to publish
    * a cross-tab, unpivot to bring a published cross-tab back into the
    * long form joins and aggregates want). Spark's `Dataset.unpivot`
    * plans as a map-side Expand over the aggregated (tiny) wide frame —
    * the unpivot itself never shuffles; the only exchange is q27's own
    * grouping. NULL cells (status×flag combinations absent from the
    * data, e.g. TPC-H's O×A) are coalesced to 0 BEFORE unpivoting so
    * both engines see the same rows regardless of their UNPIVOT
    * null-exclusion defaults (SQL UNPIVOT drops NULLs, Dataset.unpivot
    * keeps them — the coalesce makes the question moot). Mirrored in
    * DuckDB as the portable UNION ALL spelling. */
  val q153Unpivot: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    val wide = li.groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum(col("l_quantity")))
      .select(col("l_linestatus"),
        coalesce(col("A"), lit(0.0)).as("qty_a"),
        coalesce(col("N"), lit(0.0)).as("qty_n"),
        coalesce(col("R"), lit(0.0)).as("qty_r"))
    orderAll(wide.unpivot(
      Array(col("l_linestatus")),
      Array(col("qty_a"), col("qty_n"), col("qty_r")),
      "measure", "sum_qty"))
  }

  /** q106: mergeable-sketch rollup — the pre-aggregation pattern that
    * makes distinct-count dashboards affordable at 100 TB: per
    * (day, hour) bucket an Apache DataSketches HLL sketch of user_id is
    * computed ONCE (`hll_sketch_agg`, lgK=12 → ~2.5 KB, partial-agg
    * mergeable map-side); any coarser range — here day level — is then
    * `hll_union_agg` over the bucket sketches, never a re-scan of raw
    * events. Contrast q21's exact distinct, which must shuffle every
    * user_id per queried range, and q25's single-shot HLL, which answers
    * ONE range: a production metrics store persists the hourly sketch
    * column and serves arbitrary ranges by union.
    *
    * No oracle (DuckDB's approx_count_distinct is a different HLL
    * implementation); rows-only, with TWO pinned properties (ApproxSpec
    * at the test SF, and re-asserted by Bench.approxBounds at every
    * bench SF since round 11): the union-of-bucket-sketches estimate
    * tracks the direct whole-day sketch estimate within 5% (≈3× the
    * lgK=12 RSE), and the day estimates sit within 5% of exact distinct
    * counts. The union-vs-direct bound is deliberately NOT equality:
    * the union SKETCH is lossless (register-wise max is associative and
    * order-independent), but a directly-built sketch serves the HIP
    * estimator while a union result serves the composite estimator, so
    * the estimates are bit-equal only in the sparse/list regime —
    * measured 0.3% apart at sf0.1 (both ~1.5% from exact), where an
    * exact-equality gate tripped. */
  val q106HllRollup: Q = (spark, dir) => {
    val ev = events(spark, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        hour(col("ts")).as("hr"), col("user_id"))
    val hourly = ev.groupBy(col("day"), col("hr"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    orderAll(hourly.groupBy(col("day"))
      .agg(count(lit(1)).cast("int").as("n_hours"),
        expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est_users")))
  }

  /** The daily partial-aggregate shape q174 materializes and merges:
    * per (event_type, day), the DECOMPOSABLE pieces of every output
    * measure — count, exact decimal sum, min, max (Gray et al.'s
    * distributive class, "Data Cube", Data Mining & Knowledge
    * Discovery 1997). ONE spelling, used by the base artifact build
    * and the delta recompute, so the two sides cannot drift. */
  private def dailyPartials(e: org.apache.spark.sql.DataFrame) =
    e.groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,4)")).as("vsum"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))

  /** q174's base/delta boundary: the start (midnight) of `maxDay − 6` —
    * the last 7 calendar days are "today's deltas", everything earlier
    * is the nightly base. Derived from the data (deterministic), and a
    * DAY boundary so `date_trunc(day, ts) < cut ⇔ ts < cut`: the base
    * and delta scans filter on RAW ts, which reaches the parquet scan
    * as a pushed predicate. The collect is a 1-row driver-bounded
    * scalar (the documented q172 class). */
  private def deltaCutoff(spark: org.apache.spark.sql.SparkSession,
      dir: String): java.sql.Timestamp =
    events(spark, dir)
      .agg(date_trunc("day", max(col("ts"))).as("d"))
      .select((col("d") - expr("INTERVAL 6 DAYS")).as("cut"))
      .collect()(0).getTimestamp(0)

  /** The materialized base rollup — daily partials for everything
    * STRICTLY BEFORE the cutoff, built once per (JVM, events build)
    * and served from parquet thereafter (the LabelTable posture on the
    * aggregation layer: a nightly job writes the rollup, every refresh
    * reads it). Staleness keys on events.parquet — the table the
    * partials actually read. */
  private[queries] object BaseAggTable {
    private val tbl = new LlmOps.MaterializedTable("aggbase",
      (s, d) => dailyPartials(
        events(s, d).filter(col("ts") < lit(deltaCutoff(s, d)))),
      srcTable = "events.parquet")
    def of(spark: org.apache.spark.sql.SparkSession, dir: String) =
      tbl.of(spark, dir)
    /** Un-memoized derivation — the memoized ≡ fresh spec pin. */
    def fresh(spark: org.apache.spark.sql.SparkSession, dir: String) =
      dailyPartials(
        events(spark, dir).filter(col("ts") < lit(deltaCutoff(spark, dir))))
  }

  /** q174 [EXT]: incremental aggregate maintenance by partial-aggregate
    * merge — the materialized-view refresh pattern that keeps a 100 TB
    * metrics table affordable: the historical base is a MATERIALIZED
    * daily rollup ([[BaseAggTable]], built once per corpus build, read
    * thereafter), only the last-7-days delta partition is re-scanned
    * (its `ts ≥ cutoff` predicate pushed into the parquet scan), and
    * the final per-event-type aggregate re-aggregates base ∪ delta
    * PARTIALS — count merges by sum, exact-decimal sum by sum, min by
    * min, max by max (the distributive class), and avg derives from
    * merged sum/count (algebraic). `n_days` shows the third trick:
    * COUNT DISTINCT day is holistic in general (q106 needs an HLL
    * sketch for exactly this reason), but becomes a free row-count
    * here because the partial KEY carries the day — choosing the
    * rollup grain to cover the distinct dimension is what makes the
    * exact answer mergeable.
    *
    * THE correctness contract is the oracle itself: merged(base ∪
    * delta) must equal the flat full-table GROUP BY — the oracle never
    * mentions the cutoff, so any partition-dependence (a day counted
    * twice, a sum merged non-exactly) is a hash mismatch. Work at
    * refresh time: delta-scan + |types × days| merge rows, never the
    * corpus. AggregatesSpec pins merged ≡ full-recompute row identity
    * and the artifact's memoized ≡ fresh equality. */
  val q174AggDeltaMerge: Q = (spark, dir) => {
    val cut = deltaCutoff(spark, dir)
    val base = BaseAggTable.of(spark, dir)
    val delta = dailyPartials(
      events(spark, dir).filter(col("ts") >= lit(cut)))
    val merged = base.unionByName(delta)
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n_events"),
        count(lit(1)).as("n_days"),
        sum(col("vsum")).as("tsum"),
        min(col("vmin")).as("min_value"),
        max(col("vmax")).as("max_value"))
    orderAll(merged.select(col("event_type"), col("n_events"),
      col("n_days"),
      col("tsum").cast("double").as("total_value"),
      col("min_value"), col("max_value"),
      (col("tsum").cast("double") / col("n_events")).as("avg_value")))
  }

  val defs: Map[String, Q] = Map(
    "q106_hll_rollup" -> q106HllRollup,
    "q174_agg_delta_merge" -> q174AggDeltaMerge,
    "q20_agg_hash" -> q20Hash,
    "q21_agg_distinct" -> q21Distinct,
    "q22_agg_rollup" -> q22Rollup,
    "q23_agg_cube" -> q23Cube,
    "q24_agg_grouping_sets" -> q24GroupingSets,
    "q25_agg_approx_distinct" -> q25ApproxDistinct,
    "q26_agg_percentile" -> q26Percentile,
    "q27_agg_pivot" -> q27Pivot,
    "q153_unpivot" -> q153Unpivot,
    "q28_agg_approx_percentile" -> q28ApproxPercentile,
    "q29_agg_stats" -> q29AggStats)

  val oracles: Map[String, String] = Map(
    "q174_agg_delta_merge" ->
      // THE merge contract: the oracle is the flat full-table GROUP BY
      // with no mention of the base/delta cutoff — a partial counted
      // twice, a day split across sides, or a non-exact sum merge all
      // surface as a hash mismatch against this
      """SELECT event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT date_trunc('day', ts)) AS n_days,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |  min(value) AS min_value,
        |  max(value) AS max_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*)
        |    AS avg_value
        |FROM events
        |GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST""".stripMargin,
    "q29_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "q27_agg_pivot" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_a,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_n,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_r
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q153_unpivot" ->
      // the portable UNION ALL spelling of UNPIVOT (engine defaults on
      // NULL exclusion differ; cells are coalesced to 0 on both sides)
      """WITH w AS (
        |  SELECT l_linestatus,
        |    coalesce(CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 0.0) AS qty_a,
        |    coalesce(CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 0.0) AS qty_n,
        |    coalesce(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 0.0) AS qty_r
        |  FROM lineitem GROUP BY l_linestatus)
        |SELECT l_linestatus, 'qty_a' AS measure, qty_a AS sum_qty FROM w
        |UNION ALL SELECT l_linestatus, 'qty_n', qty_n FROM w
        |UNION ALL SELECT l_linestatus, 'qty_r', qty_r FROM w
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q26_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "q20_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(9,4)))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(9,4))) * (1 + CAST(l_tax AS DECIMAL(9,4)))), 2) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST, 8 NULLS FIRST, 9 NULLS FIRST""".stripMargin,
    "q21_agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_parts,
        |  count(DISTINCT l_suppkey) AS nd_supps,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "q22_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    "q23_agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    "q24_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin)
}
