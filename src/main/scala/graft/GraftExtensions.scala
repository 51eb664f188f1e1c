package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.expressions.LongArrayDot

/** SparkSessionExtensions entry point: lets deployments register the
  * engine's custom expressions at session build time
  * (`spark.sql.extensions=graft.GraftExtensions`) instead of the
  * imperative `GraftFunctions.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("long_array_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
      exprs => LongArrayDot(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => graft.plans.BinnedIntervalJoinRule)
  }
}
