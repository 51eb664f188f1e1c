package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins [[ShuffleHygiene]]'s three levers in the default suite (the
  * decade audits exercise them at scale behind GRAFT_PERF; this is
  * the ungated contract): `retainedShuffleBytes` sees a completed
  * shuffle's files, `reclaim` frees them once the owning plan is
  * unreachable, and `parquetBarrier` preserves rows while cutting
  * lineage (the re-read plan carries no exchange).
  */
class ShuffleHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("reclaim frees a dead shuffle's files; live shuffles survive") {
    // quiesce other suites' dead references first so the measured
    // delta below is this test's own shuffle
    ShuffleHygiene.reclaim(spark)
    val before = ShuffleHygiene.retainedShuffleBytes(spark)
    // scope the chain so the frame (and its ShuffleDependency) is
    // unreachable after the collect
    def runChain(): Long =
      (1L to 200000L).toDF("x")
        .repartition(8, col("x"))
        .groupBy(col("x") % 1000).agg(count(lit(1)))
        .count()
    assert(runChain() === 1000L)
    val during = ShuffleHygiene.retainedShuffleBytes(spark)
    assert(during > before,
      s"a completed shuffle must retain files ($during <= $before)")
    // parallel suites share this session and may land their own
    // shuffles between measurements — retry until the drop is visible
    val dropped = (1 to 5).exists { _ =>
      ShuffleHygiene.reclaim(spark)
      ShuffleHygiene.retainedShuffleBytes(spark) < during
    }
    assert(dropped,
      s"reclaim must free the dead chain's shuffle files " +
        s"(before=$before during=$during, no drop after 5 attempts)")
  }

  test("parquetBarrier preserves rows and cuts lineage") {
    val dir = graft.TestSpark.scratchDir("hygiene_barrier")
    val shuffled = (1L to 10000L).toDF("x")
      .groupBy(col("x") % 100).agg(sum("x").as("s"))
    val cut = ShuffleHygiene.parquetBarrier(shuffled, dir)
    // same rows
    assert(cut.agg(sum("s")).head.getLong(0) ===
      shuffled.agg(sum("s")).head.getLong(0))
    // the re-read's plan is a bare scan of the barrier dir — no
    // exchange survives the lineage cut
    val plan = cut.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"barrier output must not re-plan the upstream shuffle:\n$plan")
    assert(cut.inputFiles.forall(_.contains("hygiene_barrier")))
  }
}
