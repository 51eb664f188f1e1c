package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The optimizer rule must (a) leave equi joins alone, (b) rewrite
  * pure overlap joins into the binned Generate+equi-join form, and
  * (c) produce exactly the naive join's result set.
  */
class BinnedIntervalJoinRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def intervals(pfx: String) = {
    val rng = new scala.util.Random(7)
    (0 until 300).map { i =>
      val s = rng.nextInt(100000).toLong
      (i.toLong, s, s + rng.nextInt(3000).toLong)
    }.toDF(s"${pfx}_id", s"${pfx}_s", s"${pfx}_e")
  }

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(BinnedIntervalJoinRule)
    try f
    finally spark.experimental.extraOptimizations = Nil
  }

  test("pure overlap join is rewritten to binned form and matches naive results") {
    val a = intervals("a")
    val b = intervals("b")
    val cond = col("a_s") <= col("b_e") && col("b_s") <= col("a_e")
    val naive = a.join(b, cond).select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet

    withRule {
      spark.conf.set("spark.graft.intervalJoin.binWidth", "2048")
      val rewritten = a.join(b, cond).select("a_id", "b_id")
      val optimized = rewritten.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_lbin"),
        "rule did not fire:\n" + optimized.take(800))
      val physical = rewritten.queryExecution.executedPlan.toString
      assert(!physical.contains("CartesianProduct")
        && !physical.contains("BroadcastNestedLoopJoin"),
        "binned join still plans as a product:\n" + physical.take(800))
      assert(rewritten.as[(Long, Long)].collect().toSet === naive)
    }
  }

  test("joins with an equi conjunct are left untouched") {
    val a = intervals("a").withColumn("k", col("a_id") % 3)
    val b = intervals("b").withColumn("k2", col("b_id") % 3)
    val cond = col("k") === col("k2") &&
      col("a_s") <= col("b_e") && col("b_s") <= col("a_e")
    withRule {
      val df = a.join(b, cond)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("__graft_lbin"),
        "rule fired on an equi join:\n" + optimized.take(800))
    }
  }
}
