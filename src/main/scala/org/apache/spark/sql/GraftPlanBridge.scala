package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` is `private[sql]`; extension libraries that declare
  * custom logical plans conventionally bridge it from a file in the
  * `org.apache.spark.sql` package (the same pattern Delta/Sedona use).
  * This is the only member of the package we touch. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
