package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The engine's skew story for joins is AQE's runtime skew splitting
  * (SURVEY.md §4.2; salting covers aggregations — `operators.Salted`).
  * This pins the mechanism: a join with one pathologically hot key is
  * re-planned at runtime with the skewed partition split
  * (`skew=true` on the SortMergeJoin), thresholds scaled down to make
  * local data "large".
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // At test scale every partition is under the coalesce advisory
      // size, so CoalesceShufflePartitions (which runs first) would
      // wrap the stage in a coalesced AQEShuffleRead that the skew
      // rule no longer matches. Production-sized partitions are above
      // the advisory size and never hit this; disabling coalesce here
      // isolates the skew mechanism under test.
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 1 carries 2M rows (with a payload column so the map output
      // is unambiguously above the skew threshold); keys 2..61 ~300 each
      val left = spark.range(2000000).select(lit(1L).as("k"), col("id").as("v"))
        .union(spark.range(18000)
          .select((col("id") % 60 + 2).as("k"), col("id").as("v")))
      val right = spark.range(62).select(col("id").as("k"), (col("id") * 10).as("w"))
      // global aggregate: no hash-distribution requirement downstream,
      // so OptimizeSkewedJoin is free to split the hot partition (a
      // per-key aggregate right after the join would pin the join
      // output's partitioning and veto the split — Spark only breaks
      // that with forceOptimizeSkewedJoin)
      val joined = left.join(right, "k").agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.head.getLong(0) == 2000000L + 18000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE did not mark the skewed join:\n" + finalPlan.take(1200))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
