package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Referee for the round-16 sublinear store-id contract: the
  * per-trigger cross-batch id check must stay ~flat while the landed
  * store grows a DECADE (sf1's 50 k docs → sf10's 500 k).
  * GRAFT_PERF-gated:
  *
  *   GRAFT_PERF=1 sbt "testOnly graft.streaming.IdCheckScaleSpec"
  *
  * What makes it flat, by construction: the check anti-joins the
  * batch against the [[IdLedger]]'s touched id buckets (~1000 ids per
  * bucket at any corpus size, [[NearDupIngest.bucketCountFor]]) plus
  * compaction-bounded L0 runs — an 8-doc batch touches ≤ 8 buckets of
  * either decade's layout. The round-15 shape (anti-join against the
  * full store id column) scanned 10× the bytes at sf10.
  */
class IdCheckScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gated(): Unit =
    assume(sys.env.contains("GRAFT_PERF"), "set GRAFT_PERF=1 to run")

  /** A compacted store holding the given corpus' doc ids — landed as
    * one batch and folded through the production compaction (which
    * builds the bucketed id base at the corpus-derived bucket count).
    */
  private def buildLedger(name: String, srcDir: String): String = {
    val store = TestSpark.scratchPath(name).resolve("store").toString
    val ids = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("doc_id"))
    CorpusIngest.ingestBatch(ids, 0L, store, "doc_id")
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    store
  }

  private def medianCheck(store: String, batch: DataFrame,
      runs: Int): Double = {
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      batch.join(
        IdLedger.priorIds(batch, "doc_id", store, excludeBatch = 99L).get,
        Seq("doc_id"), "left_anti").count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    times(times.size / 2)
  }

  test("id-check time ~flat across a decade of store growth (sf1 -> sf10)") {
    gated()
    val (sf1, sf10) = ("bench/sfgen/sf1", "bench/sfgen/sf10")
    assume(new java.io.File(s"$sf1/documents.parquet").exists() &&
      new java.io.File(s"$sf10/documents.parquet").exists(),
      "regenerate bench/sfgen via graft.tools.ScaleGen")
    val small = buildLedger("icss_sf1", sf1)
    val big = buildLedger("icss_sf10", sf10)
    // the decade re-bucketed: per-bucket id volume stays ~constant
    assert(IdLedger.config(spark, small).map(_._1).contains(64))
    assert(IdLedger.config(spark, big).map(_._1).contains(512))
    // one fixed 8-id batch: half re-delivered ids, half novel
    val batch = ((0L until 4L) ++ (9000000L until 9000004L))
      .toDF("doc_id").persist()
    batch.count()
    medianCheck(small, batch, 2) // JIT/codegen warmup, discarded
    val tSmall = medianCheck(small, batch, 5)
    val tBig = medianCheck(big, batch, 5)
    info(f"id check vs 50k-id store: $tSmall%.3f s; vs 500k: $tBig%.3f s")
    batch.unpersist(blocking = false)
    // a decade of store growth may not cost the id check more than 2x
    // (+0.25 s absolute floor for scheduling noise); the round-15
    // full-scan shape reads ~10x the id bytes here
    assert(tBig <= tSmall * 2.0 + 0.25,
      f"id check not flat across the decade: $tSmall%.3f s -> $tBig%.3f s")
    spark.catalog.clearCache()
  }
}
