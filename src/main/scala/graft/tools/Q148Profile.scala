package graft.tools

import org.apache.spark.sql.SparkSession

/** q148 residual decomposition (round-13 verdict item 1b: "profile
  * q148's residual after GateIndexTable") — times each stage of the
  * incremental-label pipeline separately on a warm JVM so the solo
  * number has a breakdown, not just a total: the two memoized artifact
  * reads, the Δ-pair gating (band probe + verify join of the ingest
  * batch against the index), and the full query (adds the
  * affected-subgraph CC, the anti-join passthrough, and the dump sort).
  *
  * Usage: runMain graft.tools.Q148Profile [sfDir] [reps] */
object Q148Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rep(label: String)(f: => Long): Unit = (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[q148profile] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      graft.core.CacheScope.drain()
      System.gc()
    }
    // warm: builds the memoized LabelTable/GateIndexTable + JIT
    graft.queries.LlmOps.q148LabelIncremental(spark, sfDir).count()
    graft.core.CacheScope.drain(); System.gc()
    rep("label_table_read") {
      graft.queries.LlmOps.LabelTable.of(spark, sfDir).count()
    }
    rep("gate_index_read") {
      graft.queries.LlmOps.GateIndexTable.of(spark, sfDir).count()
    }
    rep("delta_gating") {
      graft.queries.LlmOps.q148Delta(spark, sfDir).count()
    }
    rep("full_q148") {
      graft.queries.LlmOps.q148LabelIncremental(spark, sfDir).count()
    }
    spark.stop()
  }
}
