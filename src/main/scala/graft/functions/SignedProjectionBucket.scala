package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native SRP bucket kernel: `srp_bucket(e)` → the signed-random-
  * projection bucket code of an `array<double>` embedding against a
  * FIXED ±1 matrix shipped with the expression.
  *
  * Exists because the composed formulation — one
  * `aggregate(zip_with(e, typedLit(w_b), _*_), 0.0, _+_)` per bit —
  * materializes an intermediate products array and an interpreted fold
  * PER BIT PER ROW (srpBits = 8 ⇒ 16 HOF evaluations/row), breaking
  * whole-stage codegen around the hottest projection in the ANN family
  * (q91/q92/q75 + the ScaleProbe geometry dials). Here the whole code
  * is one fused loop nest inside codegen: for each bit, a sequential
  * left-to-right dot product (BIT-IDENTICAL to the HOF fold's
  * accumulation order, so bucket codes — and the serialized-matrix
  * DuckDB oracles built on them — are preserved exactly), then
  * `sum > 0` sets bit b. The matrix rides the generated code as one
  * flattened double[] reference object, one copy per executor.
  *
  * Contract: `e.length == weights(b).length` for every b (embeddings
  * are fixed-dim — every on-contract input matches the HOF spelling
  * bit-for-bit). Off contract the two diverge by design: zip_with's
  * null-padding poisons the HOF sum (code 0); this kernel folds over
  * `min(len, dim)` and yields the partial-sum code — a documented
  * difference, not silent, and unreachable from the declared queries.
  */
case class SignedProjectionBucket(child: Expression,
    weights: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "srp_bucket"

  private val bits = weights.length
  private val dim = if (weights.isEmpty) 0 else weights.head.length
  require(weights.forall(_.length == dim), "ragged SRP weight matrix")

  // flattened row-major matrix, one copy per deserialized instance
  // (= per executor), shared by every row
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](bits * dim)
    var b = 0
    while (b < bits) {
      var i = 0
      while (i < dim) { a(b * dim + i) = weights(b)(i); i += 1 }
      b += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = math.min(e.numElements(), dim)
    var code = 0
    var b = 0
    while (b < bits) {
      var s = 0.0
      var i = 0
      while (i < n) { s += e.getDouble(i) * flat(b * dim + i); i += 1 }
      if (s > 0) code |= (1 << b)
      b += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val w = ctx.addReferenceObj("srpMatrix", flat, "double[]")
      val n = ctx.freshName("n"); val b = ctx.freshName("b")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      s"""
         |final int $n = java.lang.Math.min($e.numElements(), $dim);
         |int $code = 0;
         |for (int $b = 0; $b < $bits; $b++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $e.getDouble($i) * $w[$b * $dim + $i];
         |  }
         |  if ($s > 0) $code |= (1 << $b);
         |}
         |${ev.value} = $code;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignedProjectionBucket = copy(child = newChild)
}

object SignedProjectionBucket {
  /** Column-API entry: bucket code of `e` under the ±1 `weights` matrix. */
  def apply(e: Column, weights: Seq[Seq[Double]]): Column =
    ColumnBridge.column(SignedProjectionBucket(
      ColumnBridge.expression(e),
      weights.map(_.toIndexedSeq).toIndexedSeq))
}
