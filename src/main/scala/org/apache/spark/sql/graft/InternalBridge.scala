package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** Minimal bridge to the `private[sql]` Dataset constructor: building
  * a DataFrame over a CUSTOM logical node (graft.plans.GroupedTopKNode)
  * has no public-API spelling, and `Dataset.ofRows` is the same entry
  * point Spark's own DataFrameReader/Catalog internals use. Scoped to
  * exactly one forwarding call; everything else in the engine stays on
  * the public surface.
  */
object InternalBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
