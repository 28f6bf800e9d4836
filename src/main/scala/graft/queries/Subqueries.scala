package graft.queries

import org.apache.spark.sql.functions._

/** Subquery surface [EXT]: IN / correlated EXISTS / scalar subqueries and
  * HAVING, via the SQL entry point — exercising Catalyst's subquery
  * decorrelation (RewritePredicateSubquery turns these into semi/anti
  * joins; a correlated scalar subquery becomes an aggregate + join). At
  * 100 TB that rewrite is the difference between one shuffle join and a
  * per-row subquery storm, so the golden-plan suite asserts the rewrite
  * actually happened. */
object Subqueries {

  /** One temp view per (table, sf dir): the dir tag keeps concurrent
    * callers on different scale-factor dirs from racing on a shared view
    * name within one session. */
  private def viewName(dir: String, table: String): String =
    s"sq_${table}_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Registers the views and hands their (dir-scoped) names to the SQL
    * builder. */
  private def withViews(spark: org.apache.spark.sql.SparkSession, dir: String,
      tables: Seq[String])(sql: Map[String, String] => String): org.apache.spark.sql.DataFrame = {
    val names = tables.map(tb => tb -> viewName(dir, tb)).toMap
    tables.foreach(tb => t(spark, dir, tb).createOrReplaceTempView(names(tb)))
    spark.sql(sql(names))
  }

  /** q43: uncorrelated IN subquery → left semi join after rewrite. */
  val q43SubqueryIn: Q = (spark, dir) =>
    orderAll(withViews(spark, dir, Seq("orders", "customer"))(v =>
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM ${v("orders")}
         |WHERE o_custkey IN (SELECT c_custkey FROM ${v("customer")} WHERE c_acctbal > 7000)
         |""".stripMargin))

  /** q44: correlated EXISTS with an inner predicate on the outer row. */
  val q44SubqueryExists: Q = (spark, dir) =>
    orderAll(withViews(spark, dir, Seq("customer", "orders"))(v =>
      s"""SELECT c_custkey, c_name
         |FROM ${v("customer")} c
         |WHERE EXISTS (SELECT 1 FROM ${v("orders")} o
         |              WHERE o.o_custkey = c.c_custkey
         |                AND o.o_totalprice > c.c_acctbal * 100)
         |""".stripMargin))

  /** q45: correlated scalar subquery (per-customer max order) + an
    * uncorrelated scalar subquery (global average) in one projection.
    *
    * Round-8 bench note: the close showed 0.62 → 1.31 s at sf0.1 within
    * one round. Profiled (5 reps, sf0.1): rep 1 = 5.27 s (JVM-cold),
    * reps 2-5 = 0.52-0.60 s steady — the doubling was cold-position
    * jitter inside a run whose back-to-back totals already swung 37%,
    * not a plan change (decorrelation still verified by PlanSpec).
    * Bench's warm1+min2 protocol (adopted round 9) retires this class
    * of false regression. */
  val q45SubqueryScalar: Q = (spark, dir) =>
    orderAll(withViews(spark, dir, Seq("customer", "orders"))(v =>
      s"""SELECT c_custkey,
         |  (SELECT max(o_totalprice) FROM ${v("orders")} o
         |   WHERE o.o_custkey = c.c_custkey) AS max_order,
         |  CAST((SELECT count(*) FROM ${v("orders")}) AS BIGINT) AS total_orders
         |FROM ${v("customer")} c
         |""".stripMargin))

  /** q46: GROUP BY + HAVING over an exact-decimal aggregate. */
  val q46Having: Q = (spark, dir) =>
    orderAll(withViews(spark, dir, Seq("orders"))(v =>
      s"""SELECT o_custkey, count(*) AS n,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
         |FROM ${v("orders")}
         |GROUP BY o_custkey
         |HAVING count(*) >= 8
         |""".stripMargin))

  /** q47: NOT IN — the null-aware anti join: NOT IN's three-valued
    * logic (any NULL in the subquery list annihilates the predicate)
    * cannot be a plain anti join; Catalyst's single-column NAAJ rewrite
    * plans it as a BroadcastHashJoin with isNullAwareAntiJoin=true
    * instead of a nested loop (PlanSpec asserts this). */
  val q47SubqueryNotIn: Q = (spark, dir) =>
    orderAll(withViews(spark, dir, Seq("orders", "customer"))(v =>
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM ${v("orders")}
         |WHERE o_custkey NOT IN (SELECT c_custkey FROM ${v("customer")} WHERE c_acctbal > 7000)
         |""".stripMargin))

  val defs: Map[String, Q] = Map(
    "q43_subquery_in" -> q43SubqueryIn,
    "q44_subquery_exists" -> q44SubqueryExists,
    "q45_subquery_scalar" -> q45SubqueryScalar,
    "q46_having" -> q46Having,
    "q47_subquery_not_in" -> q47SubqueryNotIn)

  val oracles: Map[String, String] = Map(
    "q43_subquery_in" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 7000)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q47_subquery_not_in" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 7000)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q44_subquery_exists" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > c.c_acctbal * 100)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "q45_subquery_scalar" ->
      """SELECT c_custkey,
        |  (SELECT max(o_totalprice) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_order,
        |  CAST((SELECT count(*) FROM orders) AS BIGINT) AS total_orders
        |FROM customer c
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q46_having" ->
      """SELECT o_custkey, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 8
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin)
}
