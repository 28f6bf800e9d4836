package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic behind q118's lift arithmetic (round-11, VERDICT r10 item
  * 4): times the q118 pipeline with the production DECIMAL(38,0)
  * saturating lift against (a) a naive BIGINT lift — wrap-UNSAFE at
  * ~1e12-token corpora, measurement only — and (b) no lift at all (the
  * pipeline floor: explode + two-phase pair count + marginal joins +
  * top-50). Variants interleave within each rep round so boot-level
  * contention drift hits all three equally; the decision reads from the
  * per-round DELTAS, not absolute walls.
  *
  * Measured 2026-08-14 on sf0.1 (5 interleaved rounds, warm JVM,
  * contended boot): floor ≈ decimal ≈ bigint within the round-to-round
  * noise — means 1.30 / 1.34 / 1.33 s, mins 1.06 / 1.25 / 1.29 s, and
  * per-round ordering flips (decimal beat bigint in 3 of 5 rounds).
  * The lift arithmetic runs on the cnt≥5-filtered AGGREGATED pair
  * table (~10⁴ rows at sf0.1, vocab-shaped at any SF), so its cost is
  * unmeasurable at the bench and the r9→r10 +0.5 s was contention, not
  * decimal. Decimal stays: wrap-safety to ~1e15-token corpora at zero
  * measured cost (see q118Collocations scaladoc).
  */
object Q118Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries._

    val liftDecimal = expr(
      """least(1000000000000L,
        |  (cast(cnt as decimal(38,0)) * total * 1000000)
        |    div (cast(cl as decimal(38,0)) * cr))""".stripMargin)
    val liftBigint = expr( // wraps once cnt*total*1e6 passes 2^63 — probe only
      "least(1000000000000L, (cnt * total * 1000000L) div (cl * cr))")

    def run(lift: Option[Column]): (Double, Long) = {
      val t0 = System.nanoTime()
      val c = graft.queries.TokenStats.bigramStream(t(spark, dir, "documents"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("cnt"))
        .scopedPersist
      val tot = c.agg(sum(col("cnt")).as("total"))
      val lm = c.groupBy(col("t1").as("lt")).agg(sum(col("cnt")).as("cl"))
      val rm = c.groupBy(col("t2").as("rt")).agg(sum(col("cnt")).as("cr"))
      val joined = c.filter(col("cnt") >= 5)
        .join(broadcast(lm), col("t1") === col("lt"))
        .join(broadcast(rm), col("t2") === col("rt"))
        .crossJoin(broadcast(tot))
      val scored = lift match {
        case Some(l) => joined
          .select(col("t1"), col("t2"), col("cnt"), l.as("lift_mic"))
          .orderBy(col("lift_mic").desc, col("cnt").desc, col("t1").asc, col("t2").asc)
        case None => joined
          .select(col("t1"), col("t2"), col("cnt"))
          .orderBy(col("cnt").desc, col("t1").asc, col("t2").asc)
      }
      val n = scored.limit(50).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.CacheScope.drain()
      System.gc()
      (dt, n)
    }

    val variants: Seq[(String, Option[Column])] = Seq(
      "floor_nolift" -> None,
      "decimal38" -> Some(liftDecimal),
      "bigint_naive" -> Some(liftBigint))
    // warm round, untimed
    variants.foreach { case (_, l) => run(l) }
    val walls = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    (1 to reps).foreach { i =>
      variants.foreach { case (name, l) =>
        val (dt, n) = run(l)
        walls(name) ::= dt
        println(f"[q118probe] round $i $name%-13s ${dt}%.2f s ($n rows)")
      }
    }
    variants.foreach { case (name, _) =>
      val w = walls(name)
      println(f"[q118probe] $name%-13s min ${w.min}%.2f s  mean ${w.sum / w.size}%.2f s")
    }
    spark.stop()
  }
}
