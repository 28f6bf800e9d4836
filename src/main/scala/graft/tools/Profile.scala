package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: time selected queries repeatedly in one JVM to separate
  * codegen/encoder warmup from steady-state cost.
  * Usage: runMain graft.tools.Profile <sfDir> <query> [reps] */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      // drain per rep like Bench does — otherwise rep 2+ silently reuse
      // rep 1's scoped caches and "steady state" measures cache service,
      // not a full query execution on a warm JVM
      graft.core.CacheScope.drain()
      System.gc()
    }
    spark.stop()
  }
}
