package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge. Spark 4 moved `Column` onto the
  * connect-compatible `ColumnNode` representation and made the classic
  * converters `private[sql]`, so a library defining native expressions
  * (graft.functions.*) needs this one-file shim inside the `sql`
  * package to wrap them as user-facing Columns — the same door Spark's
  * own classic DSL uses (`org.apache.spark.sql.classic.ExpressionUtils`,
  * columnNodeSupport.scala). No Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
