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
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString + "/fact"
    (1L to 20000L).map(i => (s"p${i % 8}", i)).toDF("part_key", "v")
      .write.partitionBy("part_key").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Seq(("p3", "keep")).toDF("part_key", "tag")

    val joined = fact.join(dim, "part_key").groupBy("tag").count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "fact scan has no runtime partition filter:\n" + plan.take(800))

    // and the pruned plan still computes the right answer
    val rows = joined.collect()
    assert(rows.length === 1 && rows.head.getLong(1) === 2500L)
  }
}
