package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition pruning, static and dynamic — the other half of the
  * pushdown story (SURVEY.md §4.2 previously only documented it because
  * the shipped testdata is unpartitioned; this spec writes a partitioned
  * copy and proves both prunings fire). At 100 TB a date/year-partitioned
  * fact table plus these two mechanisms is the difference between
  * scanning one partition and scanning the lake. */
class PartitionPruningSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val partedDir: String = {
    val out = tmpDir("orders_by_year")
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(out)
    out
  }

  test("static pruning: a literal partition predicate reaches PartitionFilters") {
    val df = spark.read.parquet(partedDir)
      .filter(col("yr") === 1995)
      .select("o_orderkey")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("(yr"),
      s"partition filter not pushed:\n$p")
    // and the pruned read returns exactly the unpartitioned filter's rows
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(df.count() == expected)
  }

  test("dynamic pruning: a dim-filtered join prunes fact partitions at runtime") {
    // the qualifying years are only known AFTER the dim aggregate runs
    // (a literal dim filter would be constant-folded into a static
    // partition filter — verified: Catalyst does exactly that); DPP must
    // inject a dynamicpruning predicate into the fact scan instead
    val dim = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(year(col("o_orderdate")).as("dim_yr"))
      .agg(max(col("o_totalprice")).as("mx"))
      .filter(col("mx") > 100.0)
    val fact = spark.read.parquet(partedDir)
    val joined = fact.join(dim, fact("yr") === dim("dim_yr"))
      .select("o_orderkey", "yr")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$p")
    assert(joined.count() > 0)
  }
}
