package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into the sql package: turn a Catalyst LogicalPlan
  * back into a DataFrame so specs can evaluate plan FRAGMENTS (e.g. the
  * child of a presentation Sort) that the public API doesn't expose. */
object GraftTestBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
