package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

import java.nio.file.Files

/** Pins the incremental-ingest contract: cross-batch dedup, in-batch
  * dedup, and idempotent replay (the exactly-once mechanism for a
  * non-transactional foreachBatch sink), plus the end-to-end stream
  * wiring over a file source.
  */
class CorpusIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def store(): String =
    graft.TestSpark.scratchPath("ingest_store").resolve("corpus").toString

  test("cross-batch and in-batch duplicate ids never re-land") {
    val dir = store()
    val b0 = Seq((1L, "one"), (2L, "two"), (2L, "two-dup")).toDF("doc_id", "text")
    CorpusIngest.ingestBatch(b0, 0L, dir, "doc_id")
    val b1 = Seq((2L, "two-again"), (3L, "three")).toDF("doc_id", "text")
    CorpusIngest.ingestBatch(b1, 1L, dir, "doc_id")
    val landed = spark.read.parquet(dir)
    assert(landed.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // id 2 landed from batch 0, not re-landed by batch 1
    assert(landed.filter(col("doc_id") === 2).select("batch_id")
      .as[Long].head() == 0L)
  }

  test("replaying a landed batch id is a no-op (idempotent recovery)") {
    val dir = store()
    val b0 = Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
    CorpusIngest.ingestBatch(b0, 0L, dir, "doc_id")
    val before = spark.read.parquet(dir).count()
    CorpusIngest.ingestBatch(b0, 0L, dir, "doc_id") // checkpoint replay
    assert(spark.read.parquet(dir).count() == before)
    assert(CorpusIngest.existingBatchIds(spark, dir) == Set(0L))
  }

  test("replay re-lands into a crashed write's orphan leaf dir") {
    // a direct-to-leaf write that died mid-job leaves the partition
    // dir behind holding only its hidden _temporary staging content;
    // listedBatchIds reads that as "not landed", so the replay MUST be
    // able to write into the existing dir (mode overwrite) instead of
    // throwing "path already exists" and crash-looping the stream
    val dir = store()
    CorpusIngest.ingestBatch(
      Seq((1L, "one")).toDF("doc_id", "text"), 0L, dir, "doc_id")
    val orphan = java.nio.file.Paths.get(dir, "batch_id=1", "_temporary")
    Files.createDirectories(orphan)
    assert(!CorpusIngest.existingBatchIds(spark, dir).contains(1L),
      "a _temporary-only leaf must read as not landed")
    CorpusIngest.ingestBatch(
      Seq((2L, "two")).toDF("doc_id", "text"), 1L, dir, "doc_id")
    assert(spark.read.parquet(dir).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    assert(CorpusIngest.existingBatchIds(spark, dir) == Set(0L, 1L))
  }

  test("a mid-job-commit crash (parts present, no _SUCCESS) reads as not landed") {
    // FileOutputCommitter v1 promotes task dirs one rename at a time
    // and writes _SUCCESS only at successful JOB commit — a crash in
    // that window leaves part files behind without the marker. Such a
    // leaf must read as NOT landed (the unpromoted rows are lost and
    // only a replay can restore them); "any data file present" would
    // skip the replay and silently drop them.
    val dir = store()
    CorpusIngest.ingestBatch(
      Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text"), 0L, dir, "doc_id")
    assert(CorpusIngest.existingBatchIds(spark, dir) == Set(0L))
    Files.delete(java.nio.file.Paths.get(dir, "batch_id=0", "_SUCCESS"))
    assert(!CorpusIngest.existingBatchIds(spark, dir).contains(0L),
      "a marker-less leaf with part files must read as not landed")
    assert(!CorpusIngest.batchLanded(spark, dir, 0L))
    // the replay overwrites the partial leaf and restores the marker
    CorpusIngest.ingestBatch(
      Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text"), 0L, dir, "doc_id")
    assert(CorpusIngest.existingBatchIds(spark, dir) == Set(0L))
    assert(spark.read.parquet(dir).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("landing self-heals the marker when the committer writes none") {
    // marksuccessfuljobs=false is common object-store advice; without
    // the self-heal every landed leaf would read as NOT landed forever
    // (replays re-land, prior-id dedup sees an empty store)
    val dir = store()
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val prev = conf.get(key)
    conf.set(key, "false")
    try {
      CorpusIngest.ingestBatch(
        Seq((1L, "one")).toDF("doc_id", "text"), 0L, dir, "doc_id")
      assert(CorpusIngest.batchLanded(spark, dir, 0L),
        "the landing must touch its own marker when the committer wrote none")
      assert(CorpusIngest.existingBatchIds(spark, dir) == Set(0L))
    } finally {
      if (prev == null) conf.unset(key) else conf.set(key, prev)
    }
  }

  test("store schema can evolve between batches (mergeSchema read)") {
    val dir = store()
    CorpusIngest.ingestBatch(
      Seq((1L, "one")).toDF("doc_id", "text"), 0L, dir, "doc_id")
    // later shards carry an extra column (e.g. a quality score added
    // mid-campaign) — landing must not fail, and a merged read sees
    // both generations with nulls where the old rows predate the field
    CorpusIngest.ingestBatch(
      Seq((2L, "two", 0.9)).toDF("doc_id", "text", "quality"), 1L, dir, "doc_id")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq ==
      Seq("batch_id", "doc_id", "quality", "text"))
    val byId = merged.select("doc_id", "quality")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(byId == Map(1L -> None, 2L -> Some(0.9)))
  }

  test("backfillMarkers: pre-marker-era leaves become visible; staged/partial ones do not") {
    val dir = store()
    CorpusIngest.ingestBatch(
      Seq((1L, "one")).toDF("doc_id", "text"), 0L, dir, "doc_id")
    CorpusIngest.ingestBatch(
      Seq((2L, "two")).toDF("doc_id", "text"), 1L, dir, "doc_id")
    val fs = Lsm.fileSystem(spark, dir)
    // simulate a pre-round-16 table: strip the markers maintenance
    // would have relied on (old code promoted leaves by rename, no
    // marker anywhere)
    for (b <- Seq(0L, 1L))
      Lsm.delete(fs, new org.apache.hadoop.fs.Path(s"$dir/batch_id=$b/_SUCCESS"))
    assert(CorpusIngest.listedBatchIds(spark, dir).isEmpty,
      "unmarked pre-era leaves must read as uncommitted before migration")
    // a NEW-code crashed write (staging residue) must NOT be backfilled
    val crashed = new org.apache.hadoop.fs.Path(s"$dir/batch_id=7")
    fs.mkdirs(new org.apache.hadoop.fs.Path(crashed, "_temporary/0"))
    val part = fs.create(
      new org.apache.hadoop.fs.Path(crashed, "part-00000.parquet"), true)
    part.write(Array[Byte](80, 65, 82, 49)); part.close()
    val backfilled = CorpusIngest.backfillMarkers(spark, dir)
    assert(backfilled.size == 2, s"expected 2 backfills, got $backfilled")
    assert(CorpusIngest.listedBatchIds(spark, dir) == Set(0L, 1L))
    assert(!CorpusIngest.batchLeafLive(spark, dir, 7L),
      "a leaf with staging residue must stay uncommitted after migration")
  }

  test("storeFrame in a fold's commit-then-drop window: duplicates, never loss (ADVICE r19)") {
    // The race storeFrame's list-first ordering defends: a fold
    // commits gen N+1 (containing batch B's rows) and only then drops
    // B's partition. Freeze the store IN that window — gen 1
    // committed, batch 2 still live, merged-ids not yet recorded —
    // and the whole-store accessor must return every id (batch-2 rows
    // possibly twice: live dir ∪ new base), never a snapshot missing
    // them.
    val dir = store()
    CorpusIngest.ingestBatch(Seq((1L, "one"), (2L, "two"))
      .toDF("doc_id", "text"), 0L, dir, "doc_id")
    CorpusIngest.ingestBatch(Seq((3L, "three")).toDF("doc_id", "text"),
      1L, dir, "doc_id")
    CorpusIngest.ingestBatch(Seq((4L, "four")).toDF("doc_id", "text"),
      2L, dir, "doc_id")
    CorpusIngest.compactStore(spark, dir, "doc_id", keepRecentBatches = 1)
    val fs = Lsm.fileSystem(spark, dir)
    assert(Lsm.committedGens(fs, dir) == Seq(0L))
    // manually advance the fold to its post-commit-pre-drop instant
    Lsm.foldBatchesGen(spark, dir, Seq(2L),
      _.dropDuplicates(Seq("doc_id")), Seq.empty, mergeSchema = true)
    assert(Lsm.committedGens(fs, dir) == Seq(0L, 1L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "batch_id=2")),
      "window under test: folded batch still live")
    val mid = CorpusIngest.storeFrame(spark, dir)
    assert(mid.select("doc_id").distinct().as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L),
      "a reader in the commit-then-drop window must see every id")
    // id 4 may legitimately appear twice (live batch + new base) —
    // that is the documented harmless degradation, and the id-keyed
    // ingest probe collapses it
    assert(mid.filter(col("doc_id") === 4L).count() >= 1L)
    // the fold completes; the steady-state snapshot is duplicate-free
    CorpusIngest.recordMergedBatchIds(spark, dir, Set(2L))
    Lsm.dropBatches(spark, dir, Seq(2L))
    val after = CorpusIngest.storeFrame(spark, dir)
    assert(after.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("stream end-to-end: file-source micro-batches land deduped") {
    val src = graft.TestSpark.scratchDir("ingest_src")
    val dir = store()
    Seq((10L, "a"), (11L, "b"), (10L, "a-dup")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(src)
    val q = CorpusIngest.start(stream, dir)
    q.awaitTermination(60000)
    assert(spark.read.parquet(dir).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(10L, 11L))
  }
}
