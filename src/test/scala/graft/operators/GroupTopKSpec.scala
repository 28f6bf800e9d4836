package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The map-side per-group top-k prefilter must be LOSSLESS for the exact
  * rank computed after it, and must actually bound what crosses the
  * shuffle — the two properties that make q96 scale. */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def rank(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .orderBy("g", "rk")
  }

  test("prefilter ∘ rank ≡ rank on the raw input (lossless candidate cut)") {
    // 4 groups × 250 rows scattered over 8 partitions, deterministic values
    val df = spark.range(0, 1000).repartition(8)
      .select(col("id"), pmod(col("id"), lit(4)).as("g"),
        pmod(col("id") * 7919, lit(997)).as("v"))
    val direct = rank(df).collect().toSeq
    val prefiltered = rank(
      GroupTopK.prefilter(df.toDF(), Seq("g"), Seq(("v", false), ("id", true)), 3))
      .collect().toSeq
    assert(prefiltered == direct, "prefilter changed the exact top-k result")
  }

  test("prefilter caps each group at k rows per partition (bounded shuffle input)") {
    val df = spark.range(0, 1000).repartition(5)
      .select(col("id"), lit(0L).as("g"), col("id").as("v")) // ONE hot group
    val kept = GroupTopK.prefilter(df.toDF(), Seq("g"), Seq(("v", false)), 3)
    val n = kept.count()
    assert(n <= 3L * 5, s"prefilter kept $n rows — more than k×partitions")
    // and the true top-3 survived the cut
    val top = kept.orderBy(col("v").desc).limit(3).collect().map(_.getLong(2)).toSeq
    assert(top == Seq(999L, 998L, 997L))
  }

  test("null sort values order nulls-first on ASC, last on DESC (Spark parity)") {
    val df = Seq((1L, "a", Some(5L)), (2L, "a", None), (3L, "a", Some(7L)))
      .toDF("id", "g", "v").repartition(1)
    val ascKeep = GroupTopK.prefilter(df, Seq("g"), Seq(("v", true)), 1)
      .collect().map(_.getLong(0)).toSeq
    assert(ascKeep == Seq(2L), "ASC must rank the null row first (NULLS FIRST)")
    val descKeep = GroupTopK.prefilter(df, Seq("g"), Seq(("v", false)), 2)
      .collect().map(_.getLong(0)).toSet
    assert(descKeep == Set(3L, 1L), "DESC must rank nulls last")
  }
}
