package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native membership-count kernel: `set_hit_count(arr)` → how many
  * elements of an `array<bigint>` column are present in a FIXED probe
  * set, shipped with the expression and sorted ONCE per executor.
  *
  * Exists because `array_intersect(arr, lit(probeSeq))` — the obvious
  * formulation — rebuilds the probe-set hash table PER ROW in both
  * Spark's interpreted and codegen paths (the literal is constant but
  * `ArrayIntersect` has no per-instance cache), making a membership scan
  * O(rows × probes): the decontamination gate (s82/q103) would scale
  * with eval-set size per document, precisely the superlinearity
  * SCALEPROBE.md exists to catch. Here the sorted probe array rides the
  * generated code as a reference object (one copy per executor, shared
  * by every row) and each row costs O(|arr| · log |probes|) binary
  * searches — allocation-free, inside whole-stage codegen.
  *
  * Input elements are assumed distinct per row (callers pass
  * `array_distinct`ed shingle fingerprints), so the count equals
  * `size(array_intersect(...))` exactly.
  */
case class SetHitCount(child: Expression, probes: IndexedSeq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "set_hit_count"

  // sorted probe table, built once per deserialized expression instance
  // (= once per executor), never per row
  @transient private lazy val sorted: Array[Long] = {
    val a = probes.toArray
    Arrays.sort(a)
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var hits = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (Arrays.binarySearch(sorted, arr.getLong(i)) >= 0) hits += 1
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val table = ctx.addReferenceObj("probeTable", sorted, "long[]")
      val i = ctx.freshName("i")
      val hits = ctx.freshName("hits")
      s"""
         |int $hits = 0;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (java.util.Arrays.binarySearch($table, $arr.getLong($i)) >= 0) $hits++;
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SetHitCount =
    copy(child = newChild)
}

object SetHitCount {
  /** Column-API entry: hits of `arr`'s elements in `probes`. */
  def apply(arr: Column, probes: Seq[Long]): Column =
    ColumnBridge.column(
      SetHitCount(ColumnBridge.expression(arr), probes.toIndexedSeq))
}
