package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextFns

/** Pins the streaming near-dup ingest contract: batch-b probes the
  * index as it stood BEFORE the batch, landed docs grow the index for
  * later batches, replayed batches are no-ops for both store and
  * index, and duplicate-blindness within one micro-batch.
  */
class NearDupIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val A = "alpha beta gamma delta epsilon zeta eta theta"
  private val B = "one two three four five six seven eight nine"

  private def ws(name: String) = {
    val base = graft.TestSpark.scratchPath(name)
    (base.resolve("idx").toString, base.resolve("store").toString)
  }

  private def ingest(batch: Seq[(Long, String)], id: Long,
      idx: String, store: String): Unit =
    NearDupIngest.ingestBatch(batch.toDF("doc_id", "text"), id, idx, store,
      "doc_id", "text", 0.5, 3, 12, 4, 1000)

  private def landedIds(store: String): Seq[Long] =
    spark.read.parquet(store).select("doc_id").as[Long].collect().sorted.toSeq

  test("delta near-dup of the standing corpus is dropped; novel doc lands") {
    val (idx, store) = ws("ndi_basic")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    ingest(Seq((1L, A), (2L, B)), 0L, idx, store)
    assert(landedIds(store) == Seq(2L))
  }

  test("landed docs grow the index: batch 1 dedups against batch 0's delta") {
    val (idx, store) = ws("ndi_grow")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    ingest(Seq((1L, B)), 0L, idx, store) // novel — lands and indexes
    ingest(Seq((2L, B)), 1L, idx, store) // dup of batch 0's doc 1
    assert(landedIds(store) == Seq(1L))
  }

  test("replayed batch id is a no-op for store AND index") {
    val (idx, store) = ws("ndi_replay")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    ingest(Seq((1L, B)), 0L, idx, store)
    val storeRows = spark.read.parquet(store).count()
    val idxRows = spark.read.parquet(idx).count()
    ingest(Seq((1L, B)), 0L, idx, store) // checkpoint replay
    assert(spark.read.parquet(store).count() == storeRows)
    assert(spark.read.parquet(idx).count() == idxRows)
  }

  test("calibrated index build: sidecar geometry drives consistent probes") {
    val (idx, store) = ws("ndi_calib")
    val corpus = (0L until 40L)
      .map(i => (100L + i, if (i % 2 == 0) A else B))
      .toDF("doc_id", "text")
      .withColumn("t", TextFns.tokens(col("text")))
    val bands = NearDupIngest.writeIndexCalibrated(corpus, idx)
    // the sidecar must round-trip the geometry the index was built at
    assert(NearDupIngest.indexConfig(spark, idx).contains((12, bands, 3)))
    // the selection must equal the shared calibration operator's on
    // the identical signatures (one rule, two entry points)
    val sigs = graft.functions.MinHashLsh.signaturesFromTokens(
      corpus, "doc_id", "t", 3, 12)
    assert(bands === graft.functions.MinHashLsh.calibrateBands(
      sigs, "doc_id", 12, Seq(2, 3, 4, 6), 20L))
    // probing at the sidecar geometry rejects a dup of the corpus
    NearDupIngest.ingestBatch(Seq((1L, A), (2L,
        "unrelated words entirely fresh content nothing shared here"))
        .toDF("doc_id", "text"),
      0L, idx, store, "doc_id", "text", 0.5, 3, 12, bands, 1000)
    assert(landedIds(store) == Seq(2L))
    // startCalibrated refuses an index without a sidecar
    val bare = graft.TestSpark.scratchPath("ndi_nocfg").resolve("idx").toString
    NearDupIngest.writeIndex(corpus, bare)
    val e = intercept[RuntimeException] {
      // the sidecar check runs before the stream starts, so the
      // source (any constructible one) is never consumed
      NearDupIngest.startCalibrated(
        spark.readStream.schema(corpus.drop("t").schema).parquet(bare),
        bare, store)
    }
    assert(e.getMessage.contains(NearDupIngest.ConfigFile))
  }

  test("startCalibrated end-to-end: sidecar geometry drives a real stream") {
    val basePath = graft.TestSpark.scratchPath("ndi_calib_stream")
    val (idx, store, in) = (basePath.resolve("idx").toString,
      basePath.resolve("store").toString, basePath.resolve("in").toString)
    val corpus = (0L until 40L)
      .map(i => (100L + i, if (i % 2 == 0) A else B))
      .toDF("doc_id", "text")
      .withColumn("t", TextFns.tokens(col("text")))
    NearDupIngest.writeIndexCalibrated(corpus, idx)
    // delta: one near-dup of the standing corpus, one novel doc —
    // delivered through an actual file stream so the whole positional
    // geometry hand-off (sidecar -> start -> ingestBatch) is exercised
    Seq((1L, A), (2L,
        "unrelated words entirely fresh content nothing shared here"))
      .toDF("doc_id", "text").write.parquet(in)
    val docsSchema = corpus.drop("t").schema
    NearDupIngest.startCalibrated(
      spark.readStream.schema(docsSchema).parquet(in), idx, store)
      .awaitTermination()
    assert(landedIds(store) == Seq(2L))
  }

  test("degenerate index bucket: capped representatives still reject dups") {
    val (idx, store) = ws("ndi_guard")
    // three identical standing docs share every band key — with
    // maxBucket = 1 the probe sees one representative per bucket,
    // which is sufficient for the collides-with-corpus decision
    NearDupIngest.writeIndex(
      Seq((100L, A), (101L, A), (102L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    NearDupIngest.ingestBatch(Seq((1L, A), (2L, B)).toDF("doc_id", "text"),
      0L, idx, store, "doc_id", "text", 0.5, 3, 12, 4, maxBucket = 1)
    assert(landedIds(store) == Seq(2L))
  }

  test("crash window store-landed-but-not-indexed: replay completes the index") {
    val (idx, store) = ws("ndi_crashwin")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    // simulate a crash between the store landing and the index append:
    // batch 0 exists in the store only
    CorpusIngest.ingestBatch(Seq((1L, B)).toDF("doc_id", "text"), 0L,
      store, "doc_id")
    val idxBefore = spark.read.parquet(idx).count()
    ingest(Seq((1L, B)), 0L, idx, store) // checkpoint replay
    // the replay must append doc 1's band keys (4 bands) without
    // re-landing it, restoring index ⊇ landed-docs
    assert(landedIds(store) == Seq(1L))
    assert(spark.read.parquet(idx).count() == idxBefore + 4)
    // a later near-dup of doc 1 is now correctly rejected
    ingest(Seq((2L, B)), 1L, idx, store)
    assert(landedIds(store) == Seq(1L))
  }

  test("re-delivered id with changed text neither lands nor indexes") {
    val (idx, store) = ws("ndi_phantom")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    ingest(Seq((1L, B)), 0L, idx, store)
    val idxAfter0 = spark.read.parquet(idx).count()
    // id 1 re-arrives with novel content: the store's exact-id dedup
    // drops it, so its new signature must NOT enter the index
    // (indexing content that never landed would reject future docs
    // against phantom text)
    val C = "zeta eta theta iota kappa lambda mu nu xi"
    ingest(Seq((1L, C)), 1L, idx, store)
    assert(landedIds(store) == Seq(1L))
    assert(spark.read.parquet(idx).count() == idxAfter0)
    // content C itself never indexed: a new doc with text C lands
    ingest(Seq((2L, C)), 2L, idx, store)
    assert(landedIds(store) == Seq(1L, 2L))
  }

  test("duplicate-blind within one micro-batch: both near-dups land") {
    val (idx, store) = ws("ndi_inbatch")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    // docs 1 and 2 duplicate each other but not the standing corpus —
    // the documented same-batch race: both land, both index
    ingest(Seq((1L, B), (2L, B)), 0L, idx, store)
    assert(landedIds(store) == Seq(1L, 2L))
    // a later delta matching them IS dropped (they indexed)
    ingest(Seq((3L, B)), 1L, idx, store)
    assert(landedIds(store) == Seq(1L, 2L))
  }
}
