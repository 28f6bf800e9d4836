package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** Minimal bridge into the sql package: `Dataset.ofRows` is private[sql],
  * and it is the only supported way to wrap a custom LogicalPlan (the
  * graft AsOfJoin node) into a user-facing DataFrame. No Spark internals
  * are reimplemented here. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
