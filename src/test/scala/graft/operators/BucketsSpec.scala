package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed-join co-location: the join over two same-bucketed tables must
  * plan WITHOUT shuffle exchanges (the point of bucketing at scale). */
class BucketsSpec extends SparkSpec {

  test("joining two same-bucketed tables plans with zero exchanges") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")

    Buckets.writeBucketed(li, "b_lineitem", "l_orderkey", numBuckets = 4)
    Buckets.writeBucketed(o, "b_orders", "o_orderkey", numBuckets = 4)
    // at this toy size Catalyst would broadcast instead (also shuffle-free
    // but not what we're demonstrating); force the SMJ path a 100 TB
    // large×large join would take
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Buckets.bucketedJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey", "o_orderkey")
      joined.collect() // finalize AQE plan
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")

      // and it returns the same rows as the plain (shuffling) join
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(joined.count() == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("ensureBucketed reattaches an existing layout instead of rewriting it") {
    val sf = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    try {
      Buckets.ensureBucketed(o, "eb_orders", "o_orderkey", numBuckets = 4)
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "eb_orders")
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      def mtimes = fs.listStatus(loc).map(s =>
        s.getPath.getName -> s.getModificationTime).toMap
      val before = mtimes
      // simulate the next session: catalog entry gone, files still there
      spark.sql("DROP TABLE eb_orders")
      assert(fs.exists(loc), "DROP TABLE must not delete the layout for this test")
      Buckets.ensureBucketed(o, "eb_orders", "o_orderkey", numBuckets = 4)
      assert(mtimes == before, "ensureBucketed rewrote files it should have reused")
      // the reattached table still carries the bucket spec: a self-join
      // with broadcast off plans without exchanges
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val t1 = spark.table("eb_orders")
        val t2 = spark.table("eb_orders")
        val j = t1.as("a").join(t2.as("b"),
          org.apache.spark.sql.functions.col("a.o_orderkey") ===
            org.apache.spark.sql.functions.col("b.o_orderkey"))
        assert(j.count() == o.count())
        val p = j.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange"), s"reattached bucket table shuffles:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql("DROP TABLE IF EXISTS eb_orders")
  }
}
