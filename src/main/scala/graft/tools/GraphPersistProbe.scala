package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Diagnostic behind the graph persists' storage level (VERDICT r10
  * item 6): q115/q111 carry ~2× wall spread under co-tenant
  * memory-bandwidth contention, and serialized cache blocks were the
  * hypothesized mitigation. This interleaves q115 and q111 at
  * MEMORY_AND_DISK vs MEMORY_AND_DISK_SER within one JVM (contention
  * drift hits both arms equally); the decision reads from per-round
  * deltas. Outcome (2026-08-14, sf0.1): SER won q111 in all 5 rounds
  * (2.08–2.23 s vs 2.82–3.53 s) and tied q115 on mins while dodging
  * DISK's 11.99 s contention outlier — so SER became the default; see
  * GraphOps.GraphPersistLevel.
  * Usage: runMain graft.tools.GraphPersistProbe [sfDir] [reps] */
object GraphPersistProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(q: graft.queries.Q): Double = {
      val t0 = System.nanoTime()
      q(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.CacheScope.drain()
      System.gc()
      dt
    }
    val variants: Seq[(String, graft.queries.Q)] = Seq(
      "q115_disk" -> graft.queries.GraphOps.q115WithStrategy(
        graft.queries.GraphOps.MaxOrderWidth,
        graft.queries.GraphOps.BroadcastArcMax, StorageLevel.MEMORY_AND_DISK),
      "q115_ser" -> graft.queries.GraphOps.q115WithStrategy(
        graft.queries.GraphOps.MaxOrderWidth,
        graft.queries.GraphOps.BroadcastArcMax, StorageLevel.MEMORY_AND_DISK_SER),
      "q111_disk" -> graft.queries.GraphOps.q111WithStrategy(
        2, graft.queries.GraphOps.PrBroadcastMaxNodes, StorageLevel.MEMORY_AND_DISK),
      "q111_ser" -> graft.queries.GraphOps.q111WithStrategy(
        2, graft.queries.GraphOps.PrBroadcastMaxNodes, StorageLevel.MEMORY_AND_DISK_SER))
    variants.foreach { case (_, q) => run(q) } // warm round, untimed
    val walls = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    (1 to reps).foreach { i =>
      variants.foreach { case (name, q) =>
        val dt = run(q)
        walls(name) ::= dt
        println(f"[graphpersist] round $i $name%-10s ${dt}%.2f s")
      }
    }
    variants.foreach { case (name, _) =>
      val w = walls(name)
      println(f"[graphpersist] $name%-10s min ${w.min}%.2f s  mean ${w.sum / w.size}%.2f s")
    }
    spark.stop()
  }
}
