package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}
import graft.corpus.Curation

/** Pins the calibration→execution loop: the config q186 executes is
  * the one the q185 calibration selects, and the executed dedup is
  * the fixed-config dedup at that selection.
  */
class Extended23Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q186 executes exactly the band config q185 selects") {
    val sel185 = Registry.all("q185_minhash_calibration").impl(spark, dir)
      .filter(col("selected") === 1L)
      .select("bands").as[Long].collect()
    assert(sel185.length === 1)
    val bands186 = Registry.all("q186_calibrated_neardup").impl(spark, dir)
      .select("bands").distinct().as[Long].collect()
    assert(bands186.toSeq === Seq(sel185.head))
  }

  test("q187 executes exactly the plane config q184 selects") {
    val sel184 = Registry.all("q184_band_calibration").impl(spark, dir)
      .filter(col("selected") === 1L)
      .select("planes_per_band").as[Long].collect()
    assert(sel184.length === 1)
    val planes187 = Registry.all("q187_calibrated_embed_neardup")
      .impl(spark, dir)
      .select("planes").distinct().as[Long].collect()
    assert(planes187.toSeq === Seq(sel184.head))
    spark.catalog.clearCache()
  }

  test("degenerate corpus: calibration fallback + hot-bucket guard compose") {
    // 3000 identical docs: every (band, key) bucket of every config
    // holds the whole corpus, so no config fits the budget → the
    // calibration falls back to the fewest-bands config, and the
    // executed join's LshGuard chain-links the degenerate bucket
    // (est = 1.0 runs) instead of building O(m²) pairs — the dedup
    // must still collapse the corpus to exactly one survivor
    val docs = spark.range(3000)
      .selectExpr("id AS doc_id",
        "'alpha beta gamma delta epsilon zeta' AS text")
      .transform(Curation.withTokens())
    val (bands, kept) =
      Curation.calibratedNearDup(pairsPerDocBudget = 5L)(docs)
    assert(bands === 2, "no config fits — expected the fewest-bands fallback")
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(0L))
    spark.catalog.clearCache()
  }

  test("calibratedNearDup == nearDupFilter at the selected config") {
    val docs = Tables.docsParallel(spark, dir).transform(Curation.withTokens())
    val (b, kept) = Curation.calibratedNearDup()(docs)
    val fixed = Curation.nearDupFilter(bands = b)(docs)
    assert(kept.select("doc_id").as[Long].collect().toSet ===
      fixed.select("doc_id").as[Long].collect().toSet)
    spark.catalog.clearCache()
  }
}
