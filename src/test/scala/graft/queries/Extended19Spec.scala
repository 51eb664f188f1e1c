package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Engine-invariant properties of the round-10 queries — the things
  * that must hold regardless of data scale, complementing the DuckDB
  * hash oracle (which pins the exact values).
  */
class Extended19Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q175: training loss strictly decreases across the GD epochs") {
    val rows = Registry.all("q175_linear_probe").impl(spark, dir)
      .orderBy("iter").collect()
    assert(rows.length == 3)
    val losses = rows.map(_.getAs[Long]("sse_e9"))
    assert(losses.sliding(2).forall { case Array(a, b) => b < a },
      s"loss not decreasing: ${losses.mkString(",")}")
    // fixed-point weights stay far inside 64 bits (no runaway step)
    for (r <- rows; c <- Seq("w0", "w1", "w2", "w3"))
      assert(math.abs(r.getAs[Long](c)) < 1000000000L, s"$c exploded")
  }

  test("q176: RRF fusion is exact-integer and rank-consistent") {
    val rows = Registry.all("q176_rrf_fusion").impl(spark, dir).collect()
    assert(rows.length == 20)
    for (r <- rows) {
      val rt = Option(r.getAs[java.lang.Long]("r_text")).map(_.longValue)
      val rv = Option(r.getAs[java.lang.Long]("r_vec")).map(_.longValue)
      assert(rt.nonEmpty || rv.nonEmpty, "fused doc in neither list")
      val expected = rt.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
        rv.map(x => 1000000000L / (60 + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_nano") == expected)
    }
    // output is sorted by fused score desc
    val scores = rows.map(_.getAs[Long]("rrf_nano"))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
    // a doc present in BOTH lists must outrank one with only a deeper
    // single-list rank — spot-check against the max single-list score
    val both = rows.filter(r => r.get(1) != null && r.get(2) != null)
    if (both.nonEmpty) {
      val bestBoth = both.map(_.getAs[Long]("rrf_nano")).max
      assert(bestBoth > 1000000000L / 61,
        "two-list doc should beat any rank-1 single-list doc")
    }
  }

  test("q177: quotas apportion the budget exactly") {
    val rows = Registry.all("q177_quota_alloc").impl(spark, dir).collect()
    val quotas = rows.map(_.getAs[Long]("quota"))
    assert(quotas.sum == 1000L, s"sum ${quotas.sum} != budget")
    for (r <- rows) {
      val n = r.getAs[Long]("n_cell")
      val q = r.getAs[Long]("quota")
      val taken = r.getAs[Long]("n_taken")
      assert(q >= 0 && taken == math.min(q, n),
        s"${r.getString(0)}/${r.getString(1)}: quota=$q n=$n taken=$taken")
    }
    // largest-remainder: every quota is floor or floor+1 of the ideal
    val total = rows.map(_.getAs[Long]("n_cell")).sum
    for (r <- rows) {
      val base = 1000L * r.getAs[Long]("n_cell") / total
      val q = r.getAs[Long]("quota")
      assert(q == base || q == base + 1,
        s"${r.getString(0)}/${r.getString(1)}: quota $q not in {$base, ${base + 1}}")
    }
  }
}
