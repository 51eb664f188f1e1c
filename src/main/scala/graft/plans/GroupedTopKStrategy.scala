package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Plans `GroupedTopKNode` as partial → (exchange) → final, the
  * partial/final aggregation shape. Registered through
  * `graft.GraftExtensions` (`injectPlannerStrategy`) or per-session
  * via `spark.experimental.extraStrategies`.
  */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(groupExprs, ordering, k, child) =>
      GroupedTopKExec(groupExprs, ordering, k, partial = false,
        GroupedTopKExec(groupExprs, ordering, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}
