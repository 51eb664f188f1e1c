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
    // startCalibrated refuses an index without a sidecar (a foreign
    // index dir — every in-repo build records its geometry now)
    val bare = graft.TestSpark.scratchPath("ndi_nocfg").resolve("idx").toString
    NearDupIngest.writeIndex(corpus, bare)
    assert(new java.io.File(bare, NearDupIngest.ConfigFile).delete())
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

  test("crash window with an EMPTY landed leaf: replay completes inference-free") {
    // an all-dups batch lands zero rows — its committed leaf can hold
    // the _SUCCESS marker and no part files at all. A replay that
    // crashed before the index append must complete from that leaf's
    // id column WITHOUT schema inference (which refuses a file-less
    // directory); the completion appends an empty L0 run.
    val (idx, store) = ws("ndi_emptyleaf")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    CorpusIngest.landPrepared(
      Seq((9L, B)).toDF("doc_id", "text"), 0L, store)
    // strip the part files, keep the marker — the on-disk shape of a
    // zero-row job commit
    new java.io.File(s"$store/batch_id=0").listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .foreach(f => assert(f.delete()))
    assert(CorpusIngest.batchLeafLive(spark, store, 0L))
    val idxBefore = spark.read.parquet(idx).count()
    ingest(Seq((9L, B)), 0L, idx, store) // replay — must not throw
    assert(spark.read.parquet(idx).count() == idxBefore,
      "an empty landed leaf completes with an empty index run")
    assert(CorpusIngest.batchLanded(spark, idx, 0L))
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

  test("probe reads only the batch's touched buckets of the index") {
    val (idx, _) = ws("ndi_prune")
    NearDupIngest.writeIndex(
      Seq((100L, A), (101L, B)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    val sigs = graft.functions.MinHashLsh.signaturesFromTokens(
      Seq((1L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))),
      "doc_id", "t", 3, 12)
    // the batch's own touched-bucket set, recomputed independently
    val expected = graft.functions.MinHashLsh.bandKeys(sigs, "doc_id", 12, 4)
      .select(NearDupIngest.bucketOf(col("key"), 64).as("bkt"))
      .distinct().as[Int].collect().toSet
    def bktsOf(files: Seq[String]): Set[Int] =
      files.flatMap("bkt=(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toInt))
        .toSet
    // the pruning unit reads exactly the touched leaf dirs
    val pruned = NearDupIngest.readTouchedBuckets(spark, idx,
      expected.toSeq :+ NearDupIngest.UnbucketedRun, 0L)
    assert(pruned.nonEmpty)
    val scanned = bktsOf(pruned.get.inputFiles.toSeq)
    val onDisk = bktsOf(new java.io.File(s"$idx/batch_id=-1").listFiles()
      .map(_.getName).toSeq)
    assert(scanned.nonEmpty && scanned.subsetOf(expected),
      s"pruned read scanned buckets $scanned beyond the touched set $expected")
    // doc B's buckets exist on disk but are not read (pruning is real)
    assert((onDisk -- expected).nonEmpty,
      "fixture degenerate: every on-disk bucket was touched")
    // and the probe built on it still finds the dup
    val dup = NearDupIngest.probeDupIds(sigs, 0L, idx,
      "doc_id", 12, 4, 0.5, 1000)
    assert(dup.as[Long].collect().toSeq == Seq(1L))
  }

  test("non-default bucket count: config round-trips and probes stay correct") {
    val (idx, store) = ws("ndi_buckets")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx, buckets = 256)
    assert(NearDupIngest.indexBucketCount(spark, idx) === 256)
    ingest(Seq((1L, A), (2L, B)), 0L, idx, store)
    assert(landedIds(store) == Seq(2L))
    // appended partitions bucket with the index's recorded count too:
    // a later dup of the landed doc is still rejected
    ingest(Seq((3L, B)), 1L, idx, store)
    assert(landedIds(store) == Seq(2L))
    // the layout scaling rule: ~1000 docs per bucket, power-of-two
    assert(NearDupIngest.bucketCountFor(4999) === 64)
    assert(NearDupIngest.bucketCountFor(70000) === 128)
    assert(NearDupIngest.bucketCountFor(500000) === 512)
  }

  test("compaction folds batch partitions: probe identical, replay still no-op") {
    val (idx, store) = ws("ndi_compact")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    val C = "red orange yellow green blue indigo violet ultraviolet infra"
    ingest(Seq((1L, B)), 0L, idx, store)
    ingest(Seq((2L, C)), 1L, idx, store)
    ingest(Seq((3L, "completely different novel words appear here again ok")),
      2L, idx, store)
    def probeSet(): Seq[Long] = {
      // dups of corpus doc, batch-0's doc, batch-1's doc + one novel
      val sigs = graft.functions.MinHashLsh.signaturesFromTokens(
        Seq((11L, A), (12L, B), (13L, C),
          (14L, "nothing here matches anything at all truly fresh text"))
          .toDF("doc_id", "text")
          .withColumn("t", TextFns.tokens(col("text"))),
        "doc_id", "t", 3, 12)
      NearDupIngest.probeDupIds(sigs, 99L, idx, "doc_id", 12, 4, 0.5, 1000)
        .as[Long].collect().sorted.toSeq
    }
    val before = probeSet()
    assert(before == Seq(11L, 12L, 13L))
    val storeRows = landedIds(store)
    NearDupIngest.compactIndex(spark, idx, keepRecentBatches = 1)
    // layout moved: only the base partition and the newest batch remain
    // live, the folded ids answer through the merged sidecar
    assert(CorpusIngest.listedBatchIds(spark, idx) == Set(-1L, 2L))
    assert(CorpusIngest.mergedBatchIds(spark, idx) == Set(0L, 1L))
    assert(CorpusIngest.existingBatchIds(spark, idx)
      .intersect(Set(0L, 1L, 2L)) == Set(0L, 1L, 2L))
    // probe results are a pure function of index content — unchanged
    assert(probeSet() == before)
    // a checkpoint replay of a folded batch is still a no-op
    val idxRows = spark.read.parquet(idx).count()
    ingest(Seq((1L, B)), 0L, idx, store)
    assert(landedIds(store) == storeRows)
    assert(spark.read.parquet(idx).count() == idxRows)
    // idempotent: a second compaction changes nothing
    assert(NearDupIngest.compactIndex(spark, idx, keepRecentBatches = 1)
      .isEmpty)
    assert(probeSet() == before)
  }

  test("recalibration policy: no-op below growth, baseline reset, rebuild on drift") {
    val (idx, store) = ws("ndi_recal")
    val texts = Seq(A, B,
      "red orange yellow green blue indigo violet ultraviolet infra",
      "north south east west up down left right center")
    val corpus = texts.zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      .withColumn("t", TextFns.tokens(col("text")))
    val bands0 = NearDupIngest.writeIndexCalibrated(corpus, idx)
    assert(bands0 === 6) // 4 unique docs: zero candidate pairs, max bands fits
    assert(NearDupIngest.calibrationDocCount(spark, idx).contains(4L))
    // below the growth threshold: nothing happens
    assert(NearDupIngest.maybeRecalibrate(spark, idx).isEmpty)
    assert(NearDupIngest.calibrationDocCount(spark, idx).contains(4L))
    // grow past 2x with one batch of 30 SAME-TEXT docs (duplicate-blind
    // within a batch: all land, all index) — a degenerate cluster that
    // prices every grid config over the 20-pairs/doc budget
    val boiler = "boilerplate footer text repeated verbatim on every single page"
    NearDupIngest.ingestBatch(
      (0L until 30L).map(i => (i, boiler)).toDF("doc_id", "text"),
      0L, idx, store, "doc_id", "text", 0.5, 3, 12, bands0, 1000)
    assert(NearDupIngest.indexedDocCount(spark, idx, bands0) === 34L)
    // drifted: the sweep over the index's own signatures selects the
    // fewest-bands fallback (2) and the index rebuilds at it
    assert(NearDupIngest.maybeRecalibrate(spark, idx).contains(2))
    assert(NearDupIngest.indexConfig(spark, idx).contains((12, 2, 3)))
    assert(NearDupIngest.calibrationDocCount(spark, idx).contains(34L))
    assert(NearDupIngest.indexedDocCount(spark, idx, 2) === 34L)
    // the rebuild collapsed batch 0's lineage into the base — its id
    // must survive in the merged-ids sidecar, so a checkpoint replay
    // of batch 0 stays a no-op instead of double-indexing its docs
    assert(CorpusIngest.existingBatchIds(spark, idx).contains(0L),
      "folded batch ids must survive a recalibration rebuild")
    val rowsAfterRebuild = spark.read.parquet(idx).count()
    NearDupIngest.ingestBatch(
      (0L until 30L).map(i => (i, boiler)).toDF("doc_id", "text"),
      0L, idx, store, "doc_id", "text", 0.5, 3, 12, 2, 1000)
    assert(spark.read.parquet(idx).count() === rowsAfterRebuild,
      "replaying a folded batch must not append a duplicate L0 run")
    // probes at the new sidecar geometry still reject dups of BOTH the
    // original corpus and the appended batch
    NearDupIngest.ingestBatch(
      Seq((200L, A), (201L, boiler), (202L,
        "entirely new sentence with nothing shared anywhere else today"))
        .toDF("doc_id", "text"),
      1L, idx, store, "doc_id", "text", 0.5, 3, 12, 2, 1000)
    assert(landedIds(store).contains(202L))
    assert(!landedIds(store).contains(200L) && !landedIds(store).contains(201L))
    // a second check right after: baseline was reset to 34, no drift
    assert(NearDupIngest.maybeRecalibrate(spark, idx).isEmpty)
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

  test("PhaseTimes is scoped per store: two ingests don't conflate (ADVICE r19)") {
    val (idxA, storeA) = ws("ndi_phases_a")
    val (idxB, storeB) = ws("ndi_phases_b")
    NearDupIngest.PhaseTimes.reset()
    Seq((idxA, storeA), (idxB, storeB)).foreach { case (idx, store) =>
      NearDupIngest.writeIndex(
        Seq((100L, A)).toDF("doc_id", "text")
          .withColumn("t", TextFns.tokens(col("text"))), idx)
      ingest(Seq((1L, B)), 0L, idx, store)
    }
    val a = NearDupIngest.PhaseTimes.snapshotFor(storeA)
    val b = NearDupIngest.PhaseTimes.snapshotFor(storeB)
    assert(a.getOrElse("store_landing", 0L) > 0L &&
      b.getOrElse("store_landing", 0L) > 0L,
      s"each store accumulates its own phases: a=$a b=$b")
    // the merged (single-stream-harness) view sums across keys
    assert(NearDupIngest.PhaseTimes.snapshot.getOrElse("store_landing", 0L) ===
      a.getOrElse("store_landing", 0L) + b.getOrElse("store_landing", 0L))
    // resetting one stream's totals leaves the other's intact
    NearDupIngest.PhaseTimes.reset(storeA)
    assert(NearDupIngest.PhaseTimes.snapshotFor(storeA).isEmpty)
    assert(NearDupIngest.PhaseTimes.snapshotFor(storeB) === b)
  }

  test("band-key schema version: written by builds, legacy layouts fail fast") {
    val (idx, store) = ws("ndi_keyschema")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    // every build path records the current key representation
    val cfg = Lsm.readSidecar(spark, idx, NearDupIngest.ConfigFile).get
    assert(Lsm.jsonLong(cfg, "keySchema")
      .contains(NearDupIngest.BandKeySchemaVersion))
    // and the index key column really is the 60-bit numeric form
    assert(spark.read.parquet(idx).schema("key").dataType
      === org.apache.spark.sql.types.LongType)
    ingest(Seq((1L, B)), 0L, idx, store)
    assert(landedIds(store) == Seq(1L))
    // a pre-migration sidecar (no keySchema field — every v1 index)
    // must be REJECTED by probe/append, compaction, and recalibration:
    // numeric probes against string keys silently match nothing, so
    // failing fast is the only safe read of such a layout
    Lsm.writeSidecar(spark, idx, NearDupIngest.ConfigFile,
      """{"k": 12, "bands": 4, "shingleWidth": 3, "buckets": 64}""")
    for (op <- Seq[() => Any](
        () => ingest(Seq((2L, B)), 1L, idx, store),
        () => NearDupIngest.compactIndex(spark, idx),
        () => NearDupIngest.maybeRecalibrate(spark, idx))) {
      val e = intercept[RuntimeException](op())
      assert(e.getMessage.contains("band-key schema"),
        s"expected the key-schema fail-fast, got: ${e.getMessage}")
    }
    // an explicit v1 stamp is equally rejected
    Lsm.writeSidecar(spark, idx, NearDupIngest.ConfigFile,
      """{"k": 12, "bands": 4, "shingleWidth": 3, "buckets": 64,""" +
        """ "keySchema": 1}""")
    val e = intercept[RuntimeException](ingest(Seq((3L, B)), 2L, idx, store))
    assert(e.getMessage.contains("band-key schema"))
    // nothing landed through any rejected path
    assert(landedIds(store) == Seq(1L))
  }
}
