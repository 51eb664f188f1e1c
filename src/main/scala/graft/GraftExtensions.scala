package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.expressions._

/** SparkSessionExtensions entry point: lets deployments register the
  * engine's custom expressions at session build time
  * (`spark.sql.extensions=graft.GraftExtensions`) instead of the
  * imperative `GraftFunctions.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_],
        build: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
          org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), build))
    inject("long_array_dot", classOf[LongArrayDot],
      e => LongArrayDot(e(0), e(1)))
    inject("pq_encode", classOf[PqEncode], e => PqEncode(e(0), e(1)))
    inject("pq_luts", classOf[PqLuts], e => PqLuts(e(0), e(1)))
    inject("adc_dot", classOf[AdcDot], e => AdcDot(e(0), e(1)))
    inject("pq_codenorm", classOf[PqCodeNorm], e => PqCodeNorm(e(0), e(1)))
    inject("ivf_probe", classOf[IvfProbe], e => IvfProbe(e(0), e(1), e(2)))
    ext.injectOptimizerRule(_ => graft.plans.BinnedIntervalJoinRule)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
  }
}
