package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins [[OccupancySweep.exactStratified]] — the bounded-peak EXACT
  * decade-pricing sweep (VERDICT r19 #1) — against the plain
  * in-memory aggregation it replaces at scale: identical per-config
  * (candPairs, totalRows) on a corpus with planted duplicate
  * structure, across outer-pass × inner-stratum shapes (including
  * strata that come back empty), and with the full default grid
  * {2,3,4,6} whose 15 (bands, band) tags exercise the sign-bit tag
  * range of the packed encoding.
  */
class OccupancySweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 12
  private val Grid = Seq(2, 3, 4, 6)

  /** Signatures of a small corpus with exact-dup and near-dup
    * structure (every 7th doc copies doc i−7; every 5th substitutes
    * one token), so band buckets carry real multiplicities.
    */
  private def sigs(n: Int) = {
    val docs = (0 until n).map { i =>
      val base =
        if (i % 7 == 3 && i >= 7) (i - 7) else i
      val toks = (0 until 12).map(j => s"tok${(base * 31 + j * 7) % 97}")
      val mutated =
        if (i % 5 == 1) toks.updated(6, s"sub$i") else toks
      (i.toLong, mutated.mkString(" "))
    }.toDF("doc_id", "text")
      .withColumn("t", split(col("text"), " "))
    MinHashLsh.signaturesFromTokens(docs, "doc_id", "t", 3, K)
  }

  /** The reference answer: plain groupBy over the same packed frame. */
  private def naive(packed: org.apache.spark.sql.DataFrame,
      cfgOf: Long => Int): Map[Int, (Long, Long)] =
    packed.groupBy("packed").agg(count(lit(1)).as("m"))
      .as[(Long, Long)].collect()
      .groupBy { case (p, _) => cfgOf(p) }
      .map { case (cfg, rows) =>
        cfg -> (rows.map { case (_, m) => m * (m - 1) / 2 }.sum,
          rows.map(_._2).sum)
      }

  test("stratified sweep equals the in-memory sweep, all shapes") {
    val s = sigs(600).persist()
    try {
      val (packed, cfgOf) = MinHashLsh.packedGridKeys(s, K, Grid)
      val expected = naive(packed, cfgOf)
      // the corpus must make the comparison non-trivial
      assert(expected(6)._1 > 0L, "planted dups must collide somewhere")
      assert(expected.values.forall(_._2 > 0L))
      for ((outer, inner) <- Seq((1, 1), (1, 4), (2, 3), (3, 1))) {
        val scratch = graft.TestSpark.scratchDir(s"occsweep_${outer}_$inner")
        val got = OccupancySweep.exactStratified(spark,
          () => MinHashLsh.packedGridKeys(s, K, Grid)._1,
          cfgOf, outer, inner, scratch, aggPartitions = 8)
        assert(got === expected,
          s"outer=$outer inner=$inner diverged from the exact sweep")
        // transient scratch must be fully reclaimed
        assert(!new java.io.File(scratch).exists() ||
          new java.io.File(scratch).list().isEmpty)
      }
    } finally { s.unpersist(); () }
  }

  test("sign-bit tags: the grid's high (bands, band) pairs pack negative and round-trip") {
    val s = sigs(120)
    val (packed, cfgOf) = MinHashLsh.packedGridKeys(s, K, Grid)
    val vals = packed.as[Long].collect()
    assert(vals.exists(_ < 0L),
      "15 tags over a 60-bit key must use the sign bit — none seen")
    // decode must agree with the construction: tag index ranges over
    // the grid in declaration order (2 bands, then 3, 4, 6)
    val tagCfg = Seq.fill(2)(2) ++ Seq.fill(3)(3) ++ Seq.fill(4)(4) ++
      Seq.fill(6)(6)
    vals.foreach { p =>
      val tag = (p >>> OccupancySweep.MinHashTagShift).toInt
      assert(cfgOf(p) === tagCfg(tag))
    }
  }

  test("empty frame and single-doc frame degenerate cleanly") {
    val s = sigs(1)
    val (_, cfgOf) = MinHashLsh.packedGridKeys(s, K, Grid)
    val got = OccupancySweep.exactStratified(spark,
      () => MinHashLsh.packedGridKeys(s, K, Grid)._1,
      cfgOf, 1, 2, graft.TestSpark.scratchDir("occsweep_one"),
      aggPartitions = 4)
    // one doc: every config contributes its band rows, zero pairs
    assert(got === Grid.map(b => b -> (0L, b.toLong)).toMap)
    val empty = sigs(1).filter(lit(false))
    val (_, cfgOf2) = MinHashLsh.packedGridKeys(empty, K, Grid)
    val gotEmpty = OccupancySweep.exactStratified(spark,
      () => MinHashLsh.packedGridKeys(empty, K, Grid)._1,
      cfgOf2, 1, 2, graft.TestSpark.scratchDir("occsweep_empty"),
      aggPartitions = 4)
    assert(gotEmpty.isEmpty)
  }

  test("stratified sweep reproduces the SketchGen pricing-path values") {
    // the decade-pricing caller: in-flight sketches of the virtual
    // ScaleGen corpus — the stratified sweep must equal the plain
    // sweep over the same generator output (the small-n anchor of the
    // 500M run's machinery)
    val n = 20000L
    val gen = graft.tools.SketchGen.minhashSignatures(spark, n, slices = 8)
      .persist()
    try {
      val (packed, cfgOf) = MinHashLsh.packedGridKeys(gen, K, Grid)
      val expected = naive(packed, cfgOf)
      val got = OccupancySweep.exactStratified(spark,
        () => MinHashLsh.packedGridKeys(gen, K, Grid)._1,
        cfgOf, 1, 4, graft.TestSpark.scratchDir("occsweep_gen"),
        aggPartitions = 8)
      assert(got === expected)
      // totalRows = n_docs × bands per config
      assert(got(2)._2 === n * 2 && got(6)._2 === n * 6)
    } finally { gen.unpersist(); () }
  }
}
