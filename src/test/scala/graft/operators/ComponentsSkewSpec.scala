package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Skew guard for min-label propagation: once a giant component
  * dominates, most rows carry the same label, so the pointer-doubling
  * self-join (`component === __c`) concentrates on one key. AQE's
  * skew-join handling splits such partitions at cluster scale; this
  * spec pins the unit-scale contract — a graph whose giant component
  * holds ~85% of nodes still converges inside the pointer-doubling
  * round bound, produces exact labels, and completes without a
  * runaway round (wall-clock cap), with the AQE skew thresholds
  * forced low enough that the skew path is eligible.
  */
class ComponentsSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("giant component (~85% of nodes) converges exactly within bounded wall-clock") {
    val skewConfs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val saved = skewConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hub-and-chains giant: node 0 fans out into 50 chains of 80
      // nodes (worst case for propagation depth, hottest possible
      // label key), plus 350 isolated pairs as the minority.
      val chains = for {
        c <- 0 until 50
        i <- 0 until 80
      } yield {
        val id = 1L + c * 80 + i
        if (i == 0) (0L, id) else (id - 1, id)
      }
      val pairs = (0 until 350).map(i => (10000L + 2 * i, 10001L + 2 * i))
      val edges = (chains ++ pairs).toDF("a", "b")

      val t0 = System.nanoTime()
      // diameter ≈ 160 → pointer doubling needs ~8 rounds; 16 is the
      // regression guard (require(converged) throws past it)
      val labels = Components.connectedComponents(edges, "a", "b", maxIterations = 16,
          localThreshold = 0) // skew behavior is a distributed-tier property
        .as[(Long, Long)].collect().toMap
      val secs = (System.nanoTime() - t0) / 1e9

      assert(labels.size == 4001 + 700)
      assert(labels.count(_._2 == 0L) == 4001, "giant component mislabeled")
      assert((0 until 350).forall(i => labels(10001L + 2 * i) == 10000L + 2 * i),
        "minority pairs mislabeled")
      assert(secs < 90.0,
        f"giant-component run took $secs%.1f s — straggler round suspected")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
