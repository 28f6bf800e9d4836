package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native sorted-merge intersection kernel: both eval paths must
  * agree with `array_intersect` on every sorted-distinct input (the
  * only inputs the contract admits), including empty and null frames —
  * q115 swaps it in for exactly those inputs, so disagreement here is
  * a correctness bug there. */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random sorted-distinct arrays (no RNG in tests)
  private def arr(seed: Int, n: Int): Seq[Long] =
    (1 to n).map(i =>
      (org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashLong(i.toLong * 31 + seed, seed).toLong & 0xffffL))
      .distinct.sorted

  test("codegen path matches array_intersect on sorted-distinct arrays") {
    val cases = Seq(
      (arr(1, 50), arr(2, 60)),     // partial overlap via shared hash range
      (arr(3, 40), arr(3, 40)),     // identical
      (arr(4, 30), Seq.empty[Long]),// one side empty
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue), Seq(-1L, 1L, 2L)),
      (arr(5, 200), arr(6, 3)))     // asymmetric sizes
    val df = cases.toDF("a", "b")
      .select(
        SortedIntersect(col("a"), col("b")).as("got"),
        sort_array(array_intersect(col("a"), col("b"))).as("want"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"sorted_intersect diverged from array_intersect: $r")
    }
  }

  test("property: interpreted eval equals the Scala reference on arbitrary sorted-distinct arrays") {
    // the kernel's whole contract domain under ScalaCheck: any two
    // ascending-distinct long arrays (small value range forces dense
    // overlap; the wide generator exercises sign boundaries)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val dense = org.scalacheck.Gen.listOf(org.scalacheck.Gen.chooseNum(-40L, 40L))
    val wide = org.scalacheck.Gen.listOf(org.scalacheck.Gen.chooseNum(Long.MinValue, Long.MaxValue))
    def sortedDistinct(g: org.scalacheck.Gen[List[Long]]) = g.map(_.distinct.sorted)
    def refIntersect(a: List[Long], b: List[Long]): Seq[Long] = a.intersect(b)
    def kernel(a: List[Long], b: List[Long]): Seq[Long] =
      SortedIntersect(
        Literal(new GenericArrayData(a.toArray), ArrayType(LongType)),
        Literal(new GenericArrayData(b.toArray), ArrayType(LongType)))
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    Seq(dense, wide).foreach { g =>
      val prop = org.scalacheck.Prop.forAll(sortedDistinct(g), sortedDistinct(g)) {
        (a: List[Long], b: List[Long]) => kernel(a, b) == refIntersect(a, b)
      }
      val res = org.scalacheck.Test.check(
        org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
      assert(res.passed, res.status.toString)
    }
  }

  test("property: codegen path equals the HOF spelling over a seeded 200-case batch") {
    // all cases ride ONE DataFrame (one codegen compile, one job) —
    // the per-case cost that keeps ScalaCheck off the codegen path.
    // Deterministic seed; sizes 0–60, value range dialed per case so
    // overlap density sweeps sparse → dense
    val rnd = new scala.util.Random(42)
    val cases = (1 to 200).map { _ =>
      val range = 1L << rnd.nextInt(12) // value range 1..2048
      def mk() = List.fill(rnd.nextInt(60))(
        (rnd.nextLong() % range) - range / 2).distinct.sorted
      (mk(), mk())
    }
    val df = cases.toDF("a", "b")
      .select(
        SortedIntersect(col("a"), col("b")).as("got"),
        sort_array(array_intersect(col("a"), col("b"))).as("want"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"sorted_intersect diverged from the HOF spelling: $r")
    }
  }

  test("interpreted eval mirrors codegen; null input is null out") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val a = arr(7, 80); val b = arr(8, 90)
    val e = SortedIntersect(
      Literal(new GenericArrayData(a.toArray), ArrayType(LongType)),
      Literal(new GenericArrayData(b.toArray), ArrayType(LongType)))
    val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(got.toLongArray().toSeq == a.intersect(b).sorted)
    val withNull = SortedIntersect(
      Literal(null, ArrayType(LongType)),
      Literal(new GenericArrayData(b.toArray), ArrayType(LongType)))
    assert(withNull.eval(null) == null)
  }
}
