package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every registered query returns rows on the smoke scale") {
    // q05 (anti join) may legitimately return few rows; everything
    // else must be non-empty at sf0.001.
    for ((name, q) <- Registry.all.toSeq.sortBy(_._1)) {
      val n = q.impl(spark, dir).count()
      assert(n >= 0, name)
      if (name != "q05_anti_join") assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("approx_count_distinct satisfies the 10% accuracy contract") {
    val rows = Registry.all("q51_approx_distinct").impl(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Boolean]("approx_ok"),
        s"${r.getString(0)}: exact=${r.getAs[Long]("exact_parts")}")
    }
  }

  test("approx_percentile satisfies the 5% accuracy contract") {
    val rows = Registry.all("q143_approx_quantile").impl(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Boolean]("approx_ok"),
        s"${r.getString(0)}: exact_micro=${r.getAs[Long]("exact_median_micro")}")
    }
  }
}
