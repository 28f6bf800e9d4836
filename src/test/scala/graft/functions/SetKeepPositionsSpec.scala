package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The set-complement position kernel must agree with the naive
  * filter-by-membership formulation through BOTH eval paths, and the
  * positions it returns must index the row's own array correctly. */
class SetKeepPositionsSpec extends SparkSpec {
  import spark.implicits._

  test("codegen path ≡ positions whose value misses the probe set (property)") {
    val prop = org.scalacheck.Prop.forAll(
      org.scalacheck.Gen.listOf(org.scalacheck.Gen.choose(-50L, 50L)),
      org.scalacheck.Gen.listOf(org.scalacheck.Gen.choose(-50L, 50L))) {
      (arrRaw: List[Long], probesRaw: List[Long]) =>
        val probes = probesRaw.distinct
        val want = arrRaw.zipWithIndex.collect {
          case (v, i) if !probes.contains(v) => i
        }
        val got = Seq(arrRaw).toDF("a")
          .select(SetKeepPositions(col("a"), probes).as("keep"))
          .collect().head.getSeq[Int](0).toList
        got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: interpreted eval equals the Scala reference at full ScalaCheck volume") {
    // the codegen property above is capped at 30 cases (a Spark job per
    // case); the interpreted path costs nothing, so run the same
    // contract at 300 — duplicates in BOTH the array and the probe list
    // included (the kernel sorts the probe table with duplicates and
    // binarySearch answers membership regardless)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val vals = org.scalacheck.Gen.listOf(org.scalacheck.Gen.chooseNum(-50L, 50L))
    val prop = org.scalacheck.Prop.forAll(vals, vals) {
      (arrRaw: List[Long], probesRaw: List[Long]) =>
        val want = arrRaw.zipWithIndex.collect {
          case (v, i) if !probesRaw.contains(v) => i
        }
        val e = SetKeepPositions(
          Literal(new GenericArrayData(arrRaw.toArray), ArrayType(LongType)),
          probesRaw.toIndexedSeq)
        val got = e.eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
        got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("interpreted path, order preservation, and extreme values") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val probes = IndexedSeq(Long.MinValue, 0L, Long.MaxValue)
    val e = SetKeepPositions(Literal(null, ArrayType(LongType)), probes)
    def run(a: Array[Long]): Seq[Int] =
      e.nullSafeEval(new GenericArrayData(a)).asInstanceOf[ArrayData]
        .toIntArray().toSeq
    assert(run(Array(Long.MinValue, 7L, Long.MaxValue, 0L, 7L)) == Seq(1, 4))
    assert(run(Array.empty[Long]) == Seq.empty)
    // empty probe set keeps everything, in order
    val none = SetKeepPositions(Literal(null, ArrayType(LongType)), IndexedSeq.empty)
    assert(none.nullSafeEval(new GenericArrayData(Array(5L, 5L, 1L)))
      .asInstanceOf[ArrayData].toIntArray().toSeq == Seq(0, 1, 2))
  }
}
