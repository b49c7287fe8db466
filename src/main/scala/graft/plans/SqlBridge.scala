// NOTE: this file deliberately lives in org.apache.spark.sql — the one
// sanctioned hop from a resolved LogicalPlan back into the public
// DataFrame API. `Dataset.ofRows` is `private[sql]`, and declaring a
// bridge inside the sql package is the established extension technique
// (used by Delta, Sedona, and most open-source Spark plan extensions).
// Nothing else in graft reaches into Spark internals this way.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
