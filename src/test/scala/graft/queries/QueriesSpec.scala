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

  test("approx_count_distinct is within 5% of exact") {
    val rows = Registry.all("q51_approx_distinct").impl(spark, dir).collect()
    for (r <- rows) {
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }
}
