package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only probe living in `org.apache.spark.sql` so it can call the
  * `private[sql]` builder methods of [[SparkSessionExtensions]] — the
  * same entry points a real session uses when `spark.sql.extensions`
  * names `graft.GraftExtensions`. Lets the spec assert the injected
  * surface without tearing down the shared test session.
  */
object GraftExtensionsProbe {

  /** Applies [[graft.GraftExtensions]] to a fresh extensions object and
    * reports (registered graft function names, #optimizer rules,
    * #planner strategies) as the session builder would see them.
    */
  def probe(spark: SparkSession, candidates: Seq[String]): (Seq[String], Int, Int) = {
    val ext = new SparkSessionExtensions
    new _root_.graft.GraftExtensions().apply(ext)
    val reg = ext.registerFunctions(FunctionRegistry.builtin.clone())
    val registered = candidates.filter(n => reg.functionExists(FunctionIdentifier(n)))
    (registered, ext.buildOptimizerRules(spark).size, ext.buildPlannerStrategies(spark).size)
  }
}
