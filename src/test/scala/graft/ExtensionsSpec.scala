package graft

import org.apache.spark.sql.GraftExtensionsProbe
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `spark.sql.extensions=graft.GraftExtensions` deployment
  * path: every custom codegen expression is SQL-callable by name, and
  * the binned-interval-join rewrite plus the grouped-top-k physical
  * strategy are injected at session build time.
  */
class ExtensionsSpec extends AnyFunSuite {
  private val expected = Seq(
    "long_array_dot", "pq_encode", "pq_luts", "adc_dot", "pq_codenorm",
    "ivf_probe")

  test("GraftExtensions registers all custom functions, the optimizer rule, and the planner strategy") {
    val (registered, nOptRules, nStrategies) =
      GraftExtensionsProbe.probe(TestSpark.spark, expected)
    assert(registered == expected,
      s"missing SQL registrations: ${expected.diff(registered).mkString(", ")}")
    assert(nOptRules >= 1, "BinnedIntervalJoinRule not injected")
    assert(nStrategies >= 1, "GroupedTopKStrategy not injected")
  }
}
