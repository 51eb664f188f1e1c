package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextFns

/** Pins the id-ledger contract (the round-16 sublinear store-id
  * check): touched-bucket prior-id probes over live partitions + the
  * folded-id base with replay exclusion, store compaction (ledger
  * fold first, coverage invariant, merged-ids alignment), the
  * foreign-compaction fallback, bucket growth riding the fold, and
  * schema-evolution safety.
  */
class IdLedgerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val A = "alpha beta gamma delta epsilon zeta eta theta"
  private val B = "one two three four five six seven eight nine"
  private val C = "red orange yellow green blue indigo violet ultraviolet infra"

  private def ws(name: String) = {
    val base = graft.TestSpark.scratchPath(name)
    (base.resolve("idx").toString, base.resolve("store").toString)
  }

  private def ingest(batch: Seq[(Long, String)], id: Long,
      idx: String, store: String): Unit =
    NearDupIngest.ingestBatch(batch.toDF("doc_id", "text"), id, idx, store,
      "doc_id", "text", 0.5, 3, 12, 4, 1000)

  // reads through the resolved-path accessor: compactStore folds
  // generationally by default since round 19, so the base lives under
  // the marker-committed generation root a plain table scan skips
  private def landedIds(store: String): Seq[Long] =
    CorpusIngest.storeFrame(spark, store)
      .select("doc_id").as[Long].collect().sorted.toSeq

  private def seedIndex(idx: String): Unit =
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)

  private def survivors(batch: org.apache.spark.sql.DataFrame,
      store: String, exclude: Long): Set[Long] =
    IdLedger.priorIds(batch, "doc_id", store, exclude) match {
      case Some(prior) => batch.join(prior, Seq("doc_id"), "left_anti")
        .as[Long].collect().toSet
      case None => batch.as[Long].collect().toSet
    }

  test("live partitions are the id L0 runs: priorIds with replay exclusion") {
    val (_, store) = ws("ldg_live")
    CorpusIngest.ingestBatch(
      Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text"), 0L, store, "doc_id")
    CorpusIngest.ingestBatch(
      Seq((3L, "three")).toDF("doc_id", "text"), 1L, store, "doc_id")
    val batch = Seq(2L, 3L, 5L).toDF("doc_id")
    // all prior batches visible: 2 and 3 drop, 5 is new
    assert(survivors(batch, store, exclude = 9L) == Set(5L))
    // a replaying batch must not see its OWN partition (batch 1 holds
    // id 3, so 3 survives the replay's re-dedup)
    assert(survivors(batch, store, exclude = 1L) == Set(3L, 5L))
    // no store at all -> no prior ids
    val (_, fresh) = ws("ldg_freshstore")
    assert(IdLedger.priorIds(batch, "doc_id", fresh, 0L).isEmpty)
  }

  test("compactStore: contents identical, ledger covers folded ids, replays no-ops") {
    val (idx, store) = ws("ldg_compact")
    seedIndex(idx)
    ingest(Seq((1L, B)), 0L, idx, store)
    ingest(Seq((2L, C)), 1L, idx, store)
    ingest(Seq((3L, "completely different novel words appear here again ok")),
      2L, idx, store)
    val before = CorpusIngest.storeFrame(spark, store)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 1)
    // landed CONTENTS identical; lineage collapsed into the base
    assert(CorpusIngest.storeFrame(spark, store).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq == before)
    assert(CorpusIngest.listedBatchIds(spark, store) == Set(-1L, 2L))
    assert(CorpusIngest.mergedBatchIds(spark, store) == Set(0L, 1L))
    // the ledger base was built FIRST and covers the folded batches
    assert(IdLedger.config(spark, store).isDefined)
    assert(CorpusIngest.mergedBatchIds(spark, store)
      .subsetOf(IdLedger.mergedIds(spark, store)))
    // a checkpoint replay of a folded batch is a no-op everywhere
    val storeRows = landedIds(store)
    val idxRows = spark.read.parquet(idx).count()
    ingest(Seq((1L, B)), 0L, idx, store)
    assert(landedIds(store) == storeRows)
    assert(spark.read.parquet(idx).count() == idxRows)
    // idempotent: an immediately-repeated compaction is a no-op
    assert(CorpusIngest.compactStore(spark, store, "doc_id",
      keepRecentBatches = 1).isEmpty)
    // re-delivering a FOLDED batch's id in a new batch still dedups
    // (its id answers from the ledger base's touched buckets now)
    ingest(Seq((1L, "changed text sharing nothing with anything prior"),
      (9L, "more novel words that match nothing else anywhere today")),
      3L, idx, store)
    assert(landedIds(store) == Seq(1L, 2L, 3L, 9L))
  }

  test("foreign compaction: uncovered base falls back, next compact repairs") {
    val (_, store) = ws("ldg_foreign")
    CorpusIngest.ingestBatch(
      Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text"), 0L, store, "doc_id")
    CorpusIngest.ingestBatch(
      Seq((3L, "three")).toDF("doc_id", "text"), 1L, store, "doc_id")
    // simulate a compaction that did NOT fold the ledger (a foreign
    // tool): fold the store directly through the Lsm machinery
    Lsm.foldBatches(spark, store, Seq(0L),
      _.dropDuplicates(Seq("doc_id")), Seq("batch_id"), mergeSchema = true)
    CorpusIngest.recordMergedBatchIds(spark, store, Set(0L))
    Lsm.dropBatches(spark, store, Seq(0L))
    assert(IdLedger.config(spark, store).isEmpty)
    // the fallback scans the store base's id column — correct answers
    val batch = Seq(1L, 3L, 5L).toDF("doc_id")
    assert(survivors(batch, store, exclude = 9L) == Set(5L))
    // the next compactStore folds the ledger and restores coverage
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    assert(IdLedger.config(spark, store).isDefined)
    assert(CorpusIngest.mergedBatchIds(spark, store)
      .subsetOf(IdLedger.mergedIds(spark, store)))
    assert(survivors(batch, store, exclude = 9L) == Set(5L))
  }

  test("compactStore folds evolved schemas without losing columns") {
    val (_, store) = ws("ldg_evolve")
    CorpusIngest.ingestBatch(
      Seq((1L, "one")).toDF("doc_id", "text"), 0L, store, "doc_id")
    CorpusIngest.ingestBatch(
      Seq((2L, "two", 0.9)).toDF("doc_id", "text", "score"),
      1L, store, "doc_id")
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    val folded = CorpusIngest.storeFrame(spark, store)
    assert(folded.columns.toSet == Set("doc_id", "text", "score", "batch_id"))
    assert(folded.filter(col("doc_id") === 2).select("score")
      .as[Double].head() == 0.9)
    assert(folded.filter(col("doc_id") === 1).select("score")
      .as[java.lang.Double].head() == null)
  }

  test("compactStore folds committed EMPTY leaves (marker, zero files)") {
    // an all-dups trigger lands a zero-row committed partition; a
    // maintenance run over a stretch of such batches must fold them
    // without schema inference (which refuses file-less directories)
    val (_, store) = ws("ldg_emptyfold")
    CorpusIngest.ingestBatch(
      Seq((1L, "one")).toDF("doc_id", "text"), 0L, store, "doc_id")
    CorpusIngest.landPrepared(
      Seq((2L, "two")).toDF("doc_id", "text"), 1L, store)
    // strip batch 1's part files, keep the marker — the on-disk shape
    // of a zero-row job commit
    new java.io.File(s"$store/batch_id=1").listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .foreach(f => assert(f.delete()))
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    assert(landedIds(store) == Seq(1L))
    assert(CorpusIngest.mergedBatchIds(spark, store) == Set(0L, 1L))
    // prior-id probes still answer over the folded base
    val batch = Seq(1L, 7L).toDF("doc_id")
    assert(survivors(batch, store, exclude = 9L) == Set(7L))
  }

  test("bucket count grows with the corpus across folds") {
    val (_, store) = ws("ldg_grow")
    // 70 k ids: bucketCountFor targets ~1000 ids/bucket -> 128 buckets
    CorpusIngest.ingestBatch(
      spark.range(70000).select(col("id").as("doc_id"),
        concat(lit("doc "), col("id")).as("text")),
      0L, store, "doc_id")
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    assert(IdLedger.config(spark, store).map(_._1).contains(128))
    // probes answer at the grown layout
    val batch = Seq(69999L, 123456789L).toDF("doc_id")
    assert(survivors(batch, store, exclude = 99L) == Set(123456789L))
    // a later fold re-derives the count from the grown corpus
    CorpusIngest.ingestBatch(
      Seq((900001L, "more")).toDF("doc_id", "text"), 1L, store, "doc_id")
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    assert(IdLedger.config(spark, store).map(_._1).contains(128))
    assert(survivors(Seq(900001L, 5555555L).toDF("doc_id"), store, 99L)
      == Set(5555555L))
  }

  test("fold commits a marker-committed generation: base, config, coverage atomic") {
    import org.apache.hadoop.fs.Path
    val (_, store) = ws("ldg_gen")
    CorpusIngest.ingestBatch(
      Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text"), 0L, store, "doc_id")
    CorpusIngest.ingestBatch(
      Seq((3L, "three")).toDF("doc_id", "text"), 1L, store, "doc_id")
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    val ldir = IdLedger.dir(store)
    val fs = Lsm.fileSystem(spark, ldir)
    assert(Lsm.committedGens(fs, ldir) == Seq(0L))
    val gen = Lsm.genPath(ldir, 0L)
    // everything a probe resolves travels INSIDE the committed
    // generation — bucket count, coverage record, and the base they
    // describe can never disagree
    assert(fs.exists(new Path(gen, "_SUCCESS")))
    assert(fs.exists(new Path(gen, IdLedger.ConfigFile)))
    assert(fs.exists(new Path(gen, CorpusIngest.MergedBatchesFile)))
    // the legacy layout never materializes for a ledger born generational
    assert(!fs.exists(new Path(ldir, s"batch_id=${Lsm.BaseBatch}")))
    assert(!fs.exists(new Path(ldir, IdLedger.ConfigFile)))
    assert(!fs.exists(new Path(ldir, CorpusIngest.MergedBatchesFile)))
    assert(IdLedger.mergedIds(spark, store) == Set(0L, 1L))
    // second fold: gen 1 commits, gen 0 retained for in-flight readers
    CorpusIngest.ingestBatch(
      Seq((4L, "four")).toDF("doc_id", "text"), 2L, store, "doc_id")
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    assert(Lsm.committedGens(fs, ldir) == Seq(0L, 1L))
    // third fold: gen 2 commits, gen 0 is GC'd
    CorpusIngest.ingestBatch(
      Seq((5L, "five")).toDF("doc_id", "text"), 3L, store, "doc_id")
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    assert(Lsm.committedGens(fs, ldir) == Seq(1L, 2L))
    assert(survivors(Seq(1L, 4L, 5L, 77L).toDF("doc_id"), store, 99L)
      == Set(77L))
  }

  test("the fold's parquet job cannot commit a generation early") {
    // the generational commit's ordering (base files, then sidecars,
    // then marker) depends on the writer option suppressing the
    // parquet job's own _SUCCESS — pin that the option propagates
    val dir = graft.TestSpark.scratchPath("ldg_nomark").toString
    Seq(1L).toDF("doc_id")
      .write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(dir)
    val fs = Lsm.fileSystem(spark, dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")),
      "marksuccessfuljobs=false must reach the write job's committer")
  }

  test("legacy (pre-generational) ledger migrates on its first fold") {
    import org.apache.hadoop.fs.Path
    val (_, store) = ws("ldg_legacy")
    CorpusIngest.ingestBatch(
      Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text"), 0L, store, "doc_id")
    CorpusIngest.ingestBatch(
      Seq((3L, "three")).toDF("doc_id", "text"), 1L, store, "doc_id")
    // store compacted under pre-round-17 code: base partition in the
    // table, batch 0 recorded merged
    Lsm.foldBatches(spark, store, Seq(0L),
      _.dropDuplicates(Seq("doc_id")), Seq("batch_id"), mergeSchema = true)
    CorpusIngest.recordMergedBatchIds(spark, store, Set(0L))
    Lsm.dropBatches(spark, store, Seq(0L))
    // hand-build the matching pre-round-17 LEDGER layout: bucketed
    // base at batch_id=-1, config + merged sidecars at the root
    val ldir = IdLedger.dir(store)
    val fs = Lsm.fileSystem(spark, ldir)
    Seq(1L, 2L).toDF("doc_id")
      .withColumn("bkt", IdLedger.bucketOf(col("doc_id"), 8))
      .withColumn("batch_id", lit(Lsm.BaseBatch))
      .repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("batch_id", "bkt").parquet(ldir)
    CorpusIngest.markCommitted(spark, s"$ldir/batch_id=${Lsm.BaseBatch}")
    Lsm.writeSidecar(spark, ldir, IdLedger.ConfigFile,
      """{"buckets": 8, "idCol": "doc_id"}""")
    Lsm.writeSidecar(spark, ldir, CorpusIngest.MergedBatchesFile,
      """{"merged": [0]}""")
    // legacy resolution answers before any generational fold runs
    assert(IdLedger.config(spark, store).contains((8, "doc_id")))
    assert(IdLedger.mergedIds(spark, store) == Set(0L))
    assert(survivors(Seq(1L, 3L, 55L).toDF("doc_id"), store, 99L)
      == Set(55L))
    // first fold migrates: legacy base read as the base source, gen 0
    // committed. The legacy layout is NOT GC'd yet — it gets the same
    // one-fold retention grace as a superseded generation, because a
    // probe that resolved it just before gen 0's marker landed may
    // still be scanning those files on a copy-semantics store. It is
    // shadowed (never consulted) the moment gen 0 exists.
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    assert(Lsm.committedGens(fs, ldir) == Seq(0L))
    assert(fs.exists(new Path(ldir, s"batch_id=${Lsm.BaseBatch}")),
      "legacy base must survive the migration fold (one-fold GC grace)")
    assert(fs.exists(new Path(ldir, IdLedger.ConfigFile)))
    assert(IdLedger.mergedIds(spark, store) == Set(0L, 1L))
    assert(survivors(Seq(1L, 2L, 3L, 55L).toDF("doc_id"), store, 99L)
      == Set(55L))
    // the NEXT fold retires it (mirroring predecessor-generation GC)
    CorpusIngest.ingestBatch(
      Seq((4L, "four")).toDF("doc_id", "text"), 2L, store, "doc_id")
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    assert(Lsm.committedGens(fs, ldir) == Seq(0L, 1L))
    assert(!fs.exists(new Path(ldir, s"batch_id=${Lsm.BaseBatch}")))
    assert(!fs.exists(new Path(ldir, IdLedger.ConfigFile)))
    assert(survivors(Seq(1L, 2L, 3L, 4L, 55L).toDF("doc_id"), store, 99L)
      == Set(55L))
  }

  test("stale legacy state left by a crashed GC is shadowed, never trusted") {
    val (_, store) = ws("ldg_shadow")
    CorpusIngest.ingestBatch(
      Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text"), 0L, store, "doc_id")
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    val ldir = IdLedger.dir(store)
    // the crash window: generation committed, GC never ran — stale
    // root sidecars sit alongside the live generation
    Lsm.writeSidecar(spark, ldir, IdLedger.ConfigFile,
      """{"buckets": 1, "idCol": "doc_id"}""")
    Lsm.writeSidecar(spark, ldir, CorpusIngest.MergedBatchesFile,
      """{"merged": [777]}""")
    // resolution goes through the newest generation only: probing at
    // the stale bucket count would prune away landed ids
    assert(IdLedger.config(spark, store).exists(_._1 != 1))
    assert(!IdLedger.mergedIds(spark, store).contains(777L))
    assert(survivors(Seq(1L, 2L, 55L).toDF("doc_id"), store, 99L)
      == Set(55L))
  }
}
