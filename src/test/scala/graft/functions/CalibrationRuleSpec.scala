package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Cross-family pin of the ONE calibration selection rule (see
  * ARCHITECTURE.md "Calibration selection rules"): every `calibrate*`
  * picks the HIGHEST-RECALL config whose exact sweep load fits the
  * per-doc pair budget, and falls back to the LOWEST-LOAD config when
  * none fits. Each family reaches recall through a different knob
  * direction — more bands (MinHash), fewer planes per band
  * (hyperplane), narrower bit width (SimHash) — so a grid or
  * comparator change that silently inverted any one rule would flip
  * exactly one of these assertions.
  *
  * Two shared corpora pin both ends of every direction:
  *  - ALL-UNIQUE: every config's load fits a generous budget → the
  *    selection must sit at the highest-recall end of the grid;
  *  - ALL-IDENTICAL (50 copies): every config's load blows any
  *    real budget → the selection must sit at the lowest-load end.
  */
class CalibrationRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Budget = 20L

  private def uniqueDocs(n: Int) = (0 until n).map(i =>
    (i.toLong, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i"))
    .toDF("doc_id", "text")
    .withColumn("t", TextFns.tokens(col("text")))

  private def identicalDocs(n: Int) = (0 until n).map(i =>
    (i.toLong, "boilerplate footer repeated verbatim on every page"))
    .toDF("doc_id", "text")
    .withColumn("t", TextFns.tokens(col("text")))

  test("MinHash bands: recall knob is MORE bands; fallback is fewest") {
    val grid = Seq(2, 3, 4, 6)
    val sigsU = MinHashLsh.signaturesFromTokens(uniqueDocs(10), "doc_id", "t", 3, 12)
    assert(MinHashLsh.calibrateBands(sigsU, "doc_id", 12, grid, Budget)
      === grid.max, "all-fitting corpus must select the most bands")
    val sigsI = MinHashLsh.signaturesFromTokens(identicalDocs(50), "doc_id", "t", 3, 12)
    assert(MinHashLsh.calibrateBands(sigsI, "doc_id", 12, grid, Budget)
      === grid.min, "nothing-fits corpus must fall back to the fewest bands")
  }

  test("SimHash width: recall knob is NARROWER bands; fallback is widest") {
    val grid = SimHash.DefaultWidthGrid
    def sigsOf(docs: org.apache.spark.sql.DataFrame) = docs
      .select(col("doc_id"), explode(col("t")).as("tok")).distinct()
      .groupBy("doc_id").agg(SimHash.simhashAgg(col("tok")).as("sh"))
    assert(SimHash.calibrateWidth(sigsOf(uniqueDocs(10)), "sh", grid, Budget)
      === grid.min, "all-fitting corpus must select the narrowest width")
    assert(SimHash.calibrateWidth(sigsOf(identicalDocs(50)), "sh", grid, Budget)
      === grid.max, "nothing-fits corpus must fall back to the widest width")
  }

  test("hyperplane planes: recall knob is FEWER planes; fallback is most") {
    graft.functions.expressions.GraftFunctions.register(spark)
    val (bands, dim, grid) = (4, 8, Seq(2, 4, 6, 8))
    def vecsOf(embed: Int => Array[Float]) = (0 until 10)
      .map(i => (i.toLong, embed(i))).toDF("vec_id", "embedding")
      .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
      .withColumn("nsq", VecFns.dotQFast(col("vq"), col("vq")))
    val unique = vecsOf(i =>
      Array.tabulate(dim)(j => ((i * 31 + j * 17) % 13 - 6).toFloat / 6f))
    val (pU, _) = graft.operators.EmbedNearDup.calibratedPairs(
      unique, "vec_id", bands, grid, dim, 0.4, Budget)
    assert(pU === grid.min, "all-fitting corpus must select the fewest planes")
    // 50 identical vectors: one bucket of 50 per band in EVERY config
    val same = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(dim)(j => (j % 5 - 2).toFloat / 2f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
      .withColumn("nsq", VecFns.dotQFast(col("vq"), col("vq")))
    // round 17: the fused path EXTENDS on overshoot before falling
    // back — a nothing-fits corpus (identical vectors collide at any
    // p) now sweeps the extension rungs up to PlaneCap and lands on
    // the cap, not the original grid max; the standalone selector
    // keeps the in-grid fallback rule
    val (pI, _) = graft.operators.EmbedNearDup.calibratedPairs(
      same, "vec_id", bands, grid, dim, 0.4, Budget)
    assert(pI === graft.operators.EmbedNearDup.PlaneCap,
      "nothing-fits corpus must extend to the cap before falling back")
    assert(graft.operators.EmbedNearDup.calibratePlanes(
      same, bands, grid, dim, Budget) === grid.max,
      "the sweep-only selector keeps the in-grid widest fallback")
  }
}
