package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextFns

/** Referee for the round-15 sublinear-probe contract: per-batch probe
  * time against a standing index must stay ~flat while the index
  * grows a DECADE (sf1's 50 k docs → sf10's 500 k). GRAFT_PERF-gated:
  *
  *   GRAFT_PERF=1 sbt "testOnly graft.streaming.NearDupProbeScaleSpec"
  *
  * What makes it flat, by construction: the probe prunes the index
  * and occupancy-sidecar scans to the batch's touched band-key
  * buckets, and [[NearDupIngest.bucketCountFor]] scales the bucket
  * count with corpus size (~1000 docs/bucket), so a small batch's
  * touched-bucket bytes are ~constant across decades — 50 k docs lay
  * out at 64 buckets and 500 k at 512, and an 8-doc batch touches at
  * most 32 of either. A linear-in-index probe (the round-14 shape:
  * full-index occupancy aggregation + unpruned scan) grows ~10× here.
  */
class NearDupProbeScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gated(): Unit =
    assume(sys.env.contains("GRAFT_PERF"), "set GRAFT_PERF=1 to run")

  private def buildIndex(name: String, srcDir: String): String = {
    val idx = TestSpark.scratchPath(name).resolve("idx").toString
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("__t", TextFns.tokens(col("text")))
    val n = docs.count()
    NearDupIngest.writeIndex(docs, idx, tokensCol = "__t",
      buckets = NearDupIngest.bucketCountFor(n))
    idx
  }

  private def medianProbe(idx: String, sigs: DataFrame, runs: Int): Double = {
    val times = (1 to runs).map { i =>
      val t0 = System.nanoTime()
      NearDupIngest.probeDupIds(sigs, 1000000L + i, idx, "doc_id", 12, 4,
        0.5, 1000).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    times(times.size / 2)
  }

  test("probe time ~flat across a decade of index growth (sf1 -> sf10)") {
    gated()
    val (sf1, sf10) = ("bench/sfgen/sf1", "bench/sfgen/sf10")
    assume(new java.io.File(s"$sf1/documents.parquet").exists() &&
      new java.io.File(s"$sf10/documents.parquet").exists(),
      "regenerate bench/sfgen via graft.tools.ScaleGen")
    val idxSmall = buildIndex("npss_sf1", sf1)
    val idxBig = buildIndex("npss_sf10", sf10)
    assert(NearDupIngest.indexBucketCount(spark, idxSmall) === 64)
    assert(NearDupIngest.indexBucketCount(spark, idxBig) === 512)
    // one fixed 8-doc delta batch, signatures pre-materialized so the
    // referee times the PROBE (scan + hot detection + band join), not
    // the batch's own signature pass
    val delta = (0 until 8).map(i =>
      (5000000L + i, s"probe$i alpha$i beta$i gamma$i delta$i " +
        s"epsilon$i zeta$i eta$i theta$i iota$i"))
      .toDF("doc_id", "text")
      .withColumn("__t", TextFns.tokens(col("text")))
    val sigs = graft.functions.MinHashLsh.signaturesFromTokens(
      delta, "doc_id", "__t", 3, 12).persist()
    sigs.count()
    medianProbe(idxSmall, sigs, 2) // JIT/codegen warmup, discarded
    val tSmall = medianProbe(idxSmall, sigs, 5)
    val tBig = medianProbe(idxBig, sigs, 5)
    info(f"probe vs 50k-doc index: $tSmall%.3f s; vs 500k-doc index: $tBig%.3f s")
    sigs.unpersist(blocking = false)
    // a decade of index growth may not cost the probe more than 2x
    // (+0.25 s absolute floor for scheduling noise); the linear
    // round-14 shape measured ~10x here
    assert(tBig <= tSmall * 2.0 + 0.25,
      f"probe not flat across the decade: $tSmall%.3f s -> $tBig%.3f s")
    spark.catalog.clearCache()
  }

  test("probe time ~flat at the THIRD decade (sf1 -> sf100, 5M docs)") {
    gated()
    val (sf1, sf100) = ("bench/sfgen/sf1", "bench/sfgen/sf100")
    assume(new java.io.File(s"$sf1/documents.parquet").exists() &&
      new java.io.File(s"$sf100/documents.parquet").exists(),
      "generate the third decade: runMain graft.tools.ScaleGen" +
        " bench/sfgen/sf100 5000000 2000000")
    val idxSmall = buildIndex("npss3_sf1", sf1)
    val idxHuge = buildIndex("npss3_sf100", sf100)
    assert(NearDupIngest.indexBucketCount(spark, idxSmall) === 64)
    assert(NearDupIngest.indexBucketCount(spark, idxHuge) === 8192)
    val delta = (0 until 8).map(i =>
      (9000000L + i, s"probe$i alpha$i beta$i gamma$i delta$i " +
        s"epsilon$i zeta$i eta$i theta$i iota$i"))
      .toDF("doc_id", "text")
      .withColumn("__t", TextFns.tokens(col("text")))
    val sigs = graft.functions.MinHashLsh.signaturesFromTokens(
      delta, "doc_id", "__t", 3, 12).persist()
    sigs.count()
    medianProbe(idxSmall, sigs, 2) // warmup, discarded
    val tSmall = medianProbe(idxSmall, sigs, 5)
    val tHuge = medianProbe(idxHuge, sigs, 5)
    info(f"probe vs 50k-doc index: $tSmall%.3f s; vs 5M-doc index: $tHuge%.3f s")
    sigs.unpersist(blocking = false)
    // TWO decades of index growth, same flatness bar
    assert(tHuge <= tSmall * 2.0 + 0.25,
      f"probe not flat across two decades: $tSmall%.3f s -> $tHuge%.3f s")
    spark.catalog.clearCache()
  }
}
