package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native membership-count kernel must agree with
  * `size(array_intersect(arr, probes))` — the formulation it replaces
  * for per-row-cost reasons — through BOTH eval paths. */
class SetHitCountSpec extends SparkSpec {
  import spark.implicits._

  test("codegen path ≡ size(array_intersect) on distinct-element arrays (property)") {
    val prop = org.scalacheck.Prop.forAll(
      org.scalacheck.Gen.listOf(org.scalacheck.Gen.choose(-50L, 50L)),
      org.scalacheck.Gen.listOf(org.scalacheck.Gen.choose(-50L, 50L))) {
      (arrRaw: List[Long], probesRaw: List[Long]) =>
        val arr = arrRaw.distinct
        val probes = probesRaw.distinct
        val want = arr.count(probes.toSet)
        val got = Seq(arr).toDF("a")
          .select(SetHitCount(col("a"), probes).as("hits"))
          .collect().head.getInt(0)
        got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("interpreted path and extreme values") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val probes = IndexedSeq(Long.MinValue, -1L, 0L, Long.MaxValue)
    val e = SetHitCount(Literal(null, ArrayType(LongType)), probes)
    assert(e.nullSafeEval(new GenericArrayData(
      Array(Long.MinValue, 7L, Long.MaxValue, 0L))) == 3)
    assert(e.nullSafeEval(new GenericArrayData(Array.empty[Long])) == 0)
    // empty probe set: every lookup misses, nothing throws
    val none = SetHitCount(Literal(null, ArrayType(LongType)), IndexedSeq.empty)
    assert(none.nullSafeEval(new GenericArrayData(Array(1L, 2L))) == 0)
  }
}
