package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property pins for the Knuth hash family (`queries/package.scala`) —
  * the parity-critical arithmetic behind every deterministic
  * bucket/split/shard/sample/priority and both position schedules. The
  * DuckDB oracles pin the SQL twins at the gate SF over fixture ids;
  * these pin the Column spellings against an independent JVM model over
  * the WHOLE Long domain — in particular the negative ids the fixtures
  * never produce, which is exactly where a missing wrap in the pmod
  * dance would hide. */
class KnuthSpec extends SparkSpec {
  import spark.implicits._

  private val P = KnuthP
  private val C = KnuthC

  /** Independent model: floorMod is pmod's contract. Intermediates stay
    * exact — cm < 1e9, cm·C < 2.66e18 and cm² < 1e18, inside Long. */
  private def mixModel(c: Long): Long =
    math.floorMod(math.floorMod(c, P) * C, P)
  private def mix2Model(c: Long): Long = {
    val cm = math.floorMod(c, P)
    math.floorMod(math.floorMod(math.floorMod(cm * cm, P) + cm, P) * C, P)
  }

  private val edges = Seq(Long.MinValue, Long.MinValue + 1, -P - 1, -P,
    -P + 1, -C, -1L, 0L, 1L, P - 1, P, P + 1, C, Long.MaxValue - 1,
    Long.MaxValue)

  test("property: the Column spellings equal the JVM model over arbitrary longs (interpreted eval)") {
    // ScalaCheck generates the domain; evaluation rides ONE DataFrame
    // per modulus set with codegen forced OFF (factoryMode NO_CODEGEN),
    // so this really exercises the interpreted expression path the
    // codegen test below does not
    val gen = org.scalacheck.Gen.oneOf(
      org.scalacheck.Gen.chooseNum(Long.MinValue, Long.MaxValue),
      org.scalacheck.Gen.oneOf(edges))
    val sampled = org.scalacheck.Gen.listOfN(500, gen)
      .pureApply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(7L))
    val key = "spark.sql.codegen.factoryMode"
    spark.conf.set(key, "NO_CODEGEN")
    try {
      val rows = (sampled ++ edges).toDF("c")
        .select(col("c"), knuthMix(col("c")).as("mix"),
          knuthMix2(col("c")).as("mix2"),
          knuthBucket(col("c"), 2L).as("b2"),
          knuthBucket2(col("c"), 2L).as("c2"),
          knuthBucket(col("c"), 1000L).as("b1000"),
          knuthBucket2(col("c"), 1000L).as("c1000"))
        .collect()
      rows.foreach { r =>
        val c = r.getLong(0)
        assert(r.getLong(1) == mixModel(c), s"mix($c)")
        assert(r.getLong(2) == mix2Model(c), s"mix2($c)")
        assert(r.getLong(3) == math.floorMod(mixModel(c), 2L), s"bucket($c,2)")
        assert(r.getLong(4) == math.floorMod(mix2Model(c), 2L), s"bucket2($c,2)")
        assert(r.getLong(5) == math.floorMod(mixModel(c), 1000L), s"bucket($c,1000)")
        assert(r.getLong(6) == math.floorMod(mix2Model(c), 1000L), s"bucket2($c,1000)")
      }
    } finally spark.conf.unset(key)
  }

  test("codegen path matches the model over a seeded batch including the sign edges") {
    // one DataFrame → one codegen compile; seeded wide randoms + every
    // edge case, all four helpers at once
    val rnd = new scala.util.Random(7)
    val cases = (edges ++ Seq.fill(400)(rnd.nextLong())).toDF("c")
      .select(col("c"), knuthMix(col("c")).as("mix"),
        knuthMix2(col("c")).as("mix2"),
        knuthBucket(col("c"), 1000L).as("b1000"),
        knuthBucket2(col("c"), 8L).as("b8"))
    cases.collect().foreach { r =>
      val c = r.getLong(0)
      assert(r.getLong(1) == mixModel(c), s"mix($c)")
      assert(r.getLong(2) == mix2Model(c), s"mix2($c)")
      assert(r.getLong(3) == math.floorMod(mixModel(c), 1000L), s"bucket($c)")
      assert(r.getLong(4) == math.floorMod(mix2Model(c), 8L), s"bucket2($c)")
    }
  }

  test("knuthMix2Jvm is the JVM twin of knuthMix2, and q147's weight table is exactly the reduced scramble") {
    // the driver derives q147's weight literal with knuthMix2Jvm while
    // the oracle re-derives it in SQL — all spellings must agree or the
    // hash gate and the engine silently score with different models
    val gen = org.scalacheck.Gen.oneOf(
      org.scalacheck.Gen.chooseNum(Long.MinValue, Long.MaxValue),
      org.scalacheck.Gen.oneOf(edges))
    val prop = org.scalacheck.Prop.forAll(gen) { (c: Long) =>
      knuthMix2Jvm(c) == mix2Model(c)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
    assert(LlmOps.QcWeights.size == LlmOps.QcBuckets)
    LlmOps.QcWeights.zipWithIndex.foreach { case (w, b) =>
      assert(w == mix2Model(b.toLong) % 21 - 10, s"weight($b) = $w drifted")
      assert(w >= -10 && w <= 10, s"weight($b) = $w out of range")
    }
    // a degenerate table (all one sign) would make the gate vacuous
    assert(LlmOps.QcWeights.exists(_ > 0) && LlmOps.QcWeights.exists(_ < 0),
      "weight table lost both signs — the verdict can never split the corpus")
  }

  test("MinwisePanel.priority is the JVM twin of knuthMix on the whole Long domain") {
    // the kernel-side spelling (streaming/MinwisePanel.scala) must never
    // drift from the Column/SQL family — s94's stream≡batch proof
    // depends on it
    val gen = org.scalacheck.Gen.oneOf(
      org.scalacheck.Gen.chooseNum(Long.MinValue, Long.MaxValue),
      org.scalacheck.Gen.oneOf(edges))
    val prop = org.scalacheck.Prop.forAll(gen) { (c: Long) =>
      graft.streaming.MinwisePanel.priority(c) == mixModel(c)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
