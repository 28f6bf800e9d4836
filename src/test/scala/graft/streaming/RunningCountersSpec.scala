package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalatest.funsuite.AnyFunSuite

/** The algebraic contract that makes q66 a valid oracle for s74: folding
  * a user's events through [[RunningCounters]] must give the same state
  * no matter how the stream chops them into micro-batches. Exact decimal
  * addition is associative, so this holds EXACTLY (it would only hold
  * approximately for double accumulation — the reason the state carries
  * BigDecimal). No SparkSession needed: the transition function is plain
  * code, which is the point of factoring it out. */
class RunningCountersSpec extends AnyFunSuite {

  private val decGen: Gen[java.math.BigDecimal] =
    Gen.chooseNum(-100000000L, 100000000L)
      .map(n => java.math.BigDecimal.valueOf(n, 4)) // DECIMAL(18,4)-shaped

  test("state fold is invariant to micro-batch boundaries (property)") {
    val prop = Prop.forAll(Gen.listOf(decGen), Gen.listOf(Gen.chooseNum(0, 50))) {
      (vs: List[java.math.BigDecimal], cuts: List[Int]) =>
        val oneShot = RunningCounters.fold(RunningCounters.zero, vs.iterator)
        // chop vs into micro-batches at the generated cut widths
        val batches = {
          val out = List.newBuilder[List[java.math.BigDecimal]]
          var rest = vs
          var ws = if (cuts.isEmpty) List(1) else cuts
          while (rest.nonEmpty) {
            val w = math.max(1, ws.head)
            ws = if (ws.tail.isEmpty) List(1) else ws.tail
            out += rest.take(w); rest = rest.drop(w)
          }
          out.result()
        }
        val chunked = batches.foldLeft(RunningCounters.zero)(
          (st, b) => RunningCounters.fold(st, b.iterator))
        chunked._1 == oneShot._1 && chunked._2.compareTo(oneShot._2) == 0
    }
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("per-event stepping equals whole-batch folding (q66's formulation)") {
    val vs = Seq(1.5, -2.25, 0.0001, 99999.9999)
      .map(java.math.BigDecimal.valueOf)
    val stepped = vs.foldLeft(RunningCounters.zero)(RunningCounters.step)
    val folded = RunningCounters.fold(RunningCounters.zero, vs.iterator)
    assert(stepped._1 == folded._1 && stepped._2.compareTo(folded._2) == 0)
  }
}
