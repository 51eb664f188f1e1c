package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Dynamic partition pruning: when a partitioned fact table joins a
  * filtered dimension, the fact scan must carry a runtime
  * `dynamicpruning` partition filter — at 100 TB this is the
  * difference between scanning one partition and scanning the table.
  * (Static pruning is pinned by PlanSpec/ZOrderSpec; this pins the
  * runtime variant Catalyst inserts for join-derived predicates.)
  */
class DppSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a filtered dimension join prunes the fact table's partitions at runtime") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = graft.TestSpark.scratchDir("dpp") + "/fact"
    (1L to 20000L).map(i => (s"p${i % 8}", i)).toDF("part_key", "v")
      .write.partitionBy("part_key").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim side must carry an explicit selective predicate that
    // SURVIVES optimization — a filter over a LocalRelation is
    // constant-folded away (ConvertToLocalRelation), erasing the
    // predicate DPP's insertion heuristic keys on — so the dim is a
    // parquet-backed read with the filter applied on top
    val dimDir = graft.TestSpark.scratchDir("dpp") + "/dim"
    Seq(("p3", "keep"), ("p7", "drop")).toDF("part_key", "tag")
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")
    val confs = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // aggregate the DATA column: a fact scan whose every data column
      // is pruned away costs ~nothing, so DPP's benefit estimate would
      // (correctly) decline to insert the filter
      val joined = fact.join(dim, "part_key").groupBy("tag")
        .agg(org.apache.spark.sql.functions.sum("v").as("sv"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        "fact scan has no runtime partition filter:\n" + plan.take(800))

      // and the pruned plan still computes the right answer:
      // sum of i in [1, 20000] with i % 8 == 3
      val rows = joined.collect()
      val expected = (1L to 20000L).filter(_ % 8 == 3).sum
      assert(rows.length === 1 && rows.head.getLong(1) === expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
