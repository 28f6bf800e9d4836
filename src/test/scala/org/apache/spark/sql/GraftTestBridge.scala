package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Ascii
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.streaming.StreamingQuery

/** Test-only bridge into the sql package (the GraftBridge convention,
  * scoped to test sources): plan-shape pins need two things the public
  * API hides.
  *
  *  - [[lastExecutedPlan]]: a running streaming query's most recent
  *    micro-batch PHYSICAL plan. `StreamingQueryWrapper`/
  *    `StreamExecution` are private[sql]; `lastProgress` carries
  *    timings but not the plan, and ADVICE r14 wants the s102
  *    HOF-inlining pin asserted on the STREAM's executed plan, not
  *    only the batch twin's.
  *  - [[countAscii]]: Ascii expression nodes counted by TREE TRAVERSAL
  *    rather than regex over `plan.toString` — rendered plan strings
  *    are not a stable API (spark.sql.maxToStringFields truncation or
  *    AQE re-printing a subtree can elide or duplicate probes; ADVICE
  *    r14). The winnow pins count `winnowTokenCode`'s three ascii
  *    probes: a healthy plan carries the codes transform ONCE per
  *    frame (3 nodes); CollapseProject inlining multiplies them. */
object GraftTestBridge {

  def lastExecutedPlan(q: StreamingQuery): SparkPlan =
    q.asInstanceOf[execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan

  def countAscii(plan: SparkPlan): Int =
    plan.collect { case node =>
      node.expressions.map(_.collect { case _: Ascii => 1 }.sum).sum
    }.sum
}
