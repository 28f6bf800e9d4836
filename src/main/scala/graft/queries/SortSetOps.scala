package graft.queries

import org.apache.spark.sql.functions._

/** Sorts / top-k / set operations [EXT] (SURVEY.md §2.2).
  * q35 must plan as TakeOrderedAndProject (per-partition top-k + driver
  * merge of k·partitions rows — no global sort), which is the only sane
  * top-k at 100 TB. */
object SortSetOps {

  /** q35: top-100 orders by price, unique tiebreak for determinism. */
  val q35TopK: Q = (spark, dir) =>
    t(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** q40: UNION ALL of two tagged selections (bag semantics). */
  val q40Union: Q = (spark, dir) => {
    val c = t(spark, dir, "customer")
    val a = c.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"), lit("seg").as("src"))
    val b = c.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"), lit("bal").as("src"))
    orderAll(a.unionByName(b))
  }

  /** q41: INTERSECT (set semantics — distinct, like SQL). */
  val q41Intersect: Q = (spark, dir) => {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val withOrders = o.select(col("o_custkey").as("c_custkey"))
    val rich = c.filter(col("c_acctbal") > 2500).select(col("c_custkey"))
    orderAll(rich.intersect(withOrders))
  }

  /** q42: EXCEPT (set semantics). */
  val q42Except: Q = (spark, dir) => {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val withOrders = o.select(col("o_custkey").as("c_custkey"))
    orderAll(c.select(col("c_custkey")).except(withOrders))
  }

  val defs: Map[String, Q] = Map(
    "q35_topk" -> q35TopK,
    "q40_union" -> q40Union,
    "q41_intersect" -> q41Intersect,
    "q42_except" -> q42Except)

  val oracles: Map[String, String] = Map(
    "q35_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "q40_union" ->
      """SELECT c_custkey, 'seg' AS src FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |UNION ALL
        |SELECT c_custkey, 'bal' AS src FROM customer WHERE c_acctbal > 5000
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "q41_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 2500
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    "q42_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY 1 NULLS FIRST""".stripMargin)
}
