package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** A TRUE two-thread probe-vs-fold interleaving (VERDICT r18 #4): the
  * round-18 TOCTOU fix pinned [[IdLedger.priorIds]] to ONE resolved
  * generation for config, coverage, and bucket leaves, but was spec'd
  * only by resolution-shape tests. This spec drives the exact race on
  * the copy-semantics filesystem: a concurrent
  * [[IdLedger.foldFromStore]] commits a generation with a RE-DERIVED
  * (grown) bucket count in the window between the probe's config read
  * and its leaf read — [[IdLedger.midProbeHook]], the seam at that
  * precise point, releases the fold thread and joins it before the
  * probe continues.
  *
  * Pre-fix shape (each of config/coverage/leaves independently
  * resolving the newest generation — verified red by temporarily
  * re-deriving the leaf path after the hook): the probe computes its
  * touched buckets at the OLD count (64) but lists the NEW layout
  * (128 buckets), so every probed id whose 128-bucket differs from
  * its 64-bucket set is pruned away — landed ids missed, duplicates
  * re-landed. Pinned (HEAD): the probe reads the pinned generation's
  * leaves — retained through exactly one further fold — and misses
  * nothing.
  */
class IdLedgerRaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fold committing a re-bucketed generation mid-probe: pinned probe misses no id") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftcopyfs.impl", classOf[GraftCopyFs].getName)
    val store =
      s"graftcopyfs://${graft.TestSpark.scratchPath("ldg_race")}/store"
    // gen 0: 1000 folded ids at the 64-bucket floor
    CorpusIngest.ingestBatch(
      spark.range(1000).select(col("id").as("doc_id"),
        concat(lit("doc "), col("id")).as("text")),
      0L, store, "doc_id")
    CorpusIngest.compactStore(spark, store, "doc_id", keepRecentBatches = 0)
    assert(IdLedger.config(spark, store).map(_._1).contains(64))
    // a live batch big enough that the NEXT ledger fold re-derives a
    // grown bucket count (70k ids -> 128 buckets)
    CorpusIngest.ingestBatch(
      spark.range(100000, 170000).select(col("id").as("doc_id"),
        concat(lit("doc "), col("id")).as("text")),
      1L, store, "doc_id")
    // probe ids chosen ADVERSARIALLY for the pre-fix shape: folded
    // gen-0 ids whose 128-bucket is NOT their 64-bucket (the murmur3
    // hash's bit 6 is set), so stale-count pruning against the new
    // layout would miss every one of them
    val adversarial = spark.range(1000)
      .select(col("id").as("doc_id"))
      .withColumn("b64", IdLedger.bucketOf(col("doc_id"), 64))
      .withColumn("b128", IdLedger.bucketOf(col("doc_id"), 128))
      .filter(col("b64") =!= col("b128"))
      .select("doc_id").as[Long].take(20).toSeq
    assert(adversarial.size == 20,
      "need 20 ids whose 64- and 128-bucket assignments differ")
    val batch = (adversarial :+ 999999L).toDF("doc_id")
    // the fold thread: parked until the probe reaches the seam, then
    // commits gen 1 at the re-derived 128-bucket layout while the
    // probe waits, and hands control back
    val foldError = new java.util.concurrent.atomic.AtomicReference[Throwable]
    IdLedger.midProbeHook = () => {
      val folder = new Thread(() =>
        try IdLedger.foldFromStore(spark, store, "doc_id", Seq(1L))
        catch { case t: Throwable => foldError.set(t) })
      folder.start()
      folder.join()
    }
    try {
      val survivors = batch.join(
        IdLedger.priorIds(batch, "doc_id", store, excludeBatch = 99L).get,
        Seq("doc_id"), "left_anti").as[Long].collect().toSet
      assert(foldError.get() == null,
        s"concurrent fold failed: ${foldError.get()}")
      assert(survivors == Set(999999L),
        s"pinned probe missed landed ids: ${survivors - 999999L}")
    } finally IdLedger.midProbeHook = () => ()
    // the fold really committed the re-bucketed generation mid-probe
    assert(IdLedger.config(spark, store).map(_._1).contains(128))
    val ldir = IdLedger.dir(store)
    assert(Lsm.committedGens(Lsm.fileSystem(spark, ldir), ldir)
      == Seq(0L, 1L),
      "gen 0 must be retained one fold for the in-flight probe")
    // and a fresh (post-fold) probe at the new layout still answers
    val after = batch.join(
      IdLedger.priorIds(batch, "doc_id", store, excludeBatch = 99L).get,
      Seq("doc_id"), "left_anti").as[Long].collect().toSet
    assert(after == Set(999999L))
  }
}
