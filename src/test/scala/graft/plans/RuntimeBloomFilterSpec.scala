package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Runtime row-level filtering (SURVEY.md §4 scale design): on a
  * shuffle join with a selective creation side, Catalyst injects a
  * `bloom_filter_agg`/`might_contain` pair so the big probe side is
  * pre-filtered *before* its shuffle — at 100 TB this is the
  * difference between shuffling the full fact table and shuffling the
  * ~matching fraction. The engine leaves the feature on its Spark
  * defaults; this spec pins that the injection actually fires for the
  * canonical selective-dimension shape and that results are unchanged.
  */
class RuntimeBloomFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("selective shuffle join gets a runtime bloom filter on the probe side") {
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      // toggled mid-test below — must be restored even if an assert
      // throws between the two set() calls, or every later test runs
      // with runtime bloom filters disabled
      "spark.sql.optimizer.runtime.bloomFilter.enabled")
      .map(k => k -> spark.conf.get(k))
    try {
      // force a shuffle join (no broadcast) and let the small scan
      // qualify as the application side at test scale
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val sel = spark.read.parquet(s"$dir/orders.parquet")
        .filter("o_totalprice > 490000")
      val joined = li.join(sel, li("l_orderkey") === sel("o_orderkey"))
        .groupBy("l_returnflag").count()

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        "runtime bloom filter not injected:\n" + plan.take(800))

      // semantics unchanged vs the same join with the filter disabled
      val withBloom = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = li.join(sel, li("l_orderkey") === sel("o_orderkey"))
        .groupBy("l_returnflag").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(withBloom == without && withBloom.nonEmpty)
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
