package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native set-complement position kernel: `set_keep_positions(arr)` →
  * the 0-based positions of an `array<bigint>` column whose values are
  * NOT in a FIXED probe set, shipped with the expression and sorted
  * ONCE per executor.
  *
  * The row-local REBUILD counterpart of [[SetHitCount]] (which only
  * counts): a caller holding parallel arrays — line texts and their
  * fingerprints, q109's shape — keeps exactly the surviving elements
  * with one `transform(element_at)` over the returned positions, so a
  * corpus-wide rewrite needs NO join back to the documents and NO
  * shuffle of document bodies. Same anti-pattern avoided as
  * SetHitCount: `array_intersect`/`array_position` against a literal
  * set rebuilds the probe hash table per row. Here the sorted probe
  * array rides the generated code as a reference object (one copy per
  * executor) and each row costs O(|arr| · log |probes|) binary
  * searches, allocation-bounded by the row's own array length, inside
  * whole-stage codegen.
  */
case class SetKeepPositions(child: Expression, probes: IndexedSeq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "set_keep_positions"

  // sorted probe table, built once per deserialized expression instance
  // (= once per executor), never per row
  @transient private lazy val sorted: Array[Long] = {
    val a = probes.toArray
    Arrays.sort(a)
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val tmp = new Array[Int](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (Arrays.binarySearch(sorted, arr.getLong(i)) < 0) { tmp(k) = i; k += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Arrays.copyOf(tmp, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val table = ctx.addReferenceObj("probeTable", sorted, "long[]")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val tmp = ctx.freshName("tmp")
      s"""
         |int[] $tmp = new int[$arr.numElements()];
         |int $k = 0;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (java.util.Arrays.binarySearch($table, $arr.getLong($i)) < 0) {
         |    $tmp[$k++] = $i;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($tmp, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SetKeepPositions =
    copy(child = newChild)
}

object SetKeepPositions {
  /** Column-API entry: positions of `arr`'s elements absent from `probes`. */
  def apply(arr: Column, probes: Seq[Long]): Column =
    ColumnBridge.column(
      SetKeepPositions(ColumnBridge.expression(arr), probes.toIndexedSeq))
}
