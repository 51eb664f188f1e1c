package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Continuous corpus ingestion with exact dedup against everything
  * already landed — the streaming form of the training-data intake
  * step: new document shards arrive, already-seen doc ids (re-crawls,
  * re-delivered shards) must not re-enter the corpus, and a replayed
  * micro-batch after a failure must not double-land rows.
  *
  * Spark-first shape: `foreachBatch` + an append-only parquet store
  * partitioned by `batch_id`.
  *
  *  - *Cross-batch dedup* is a left-anti join of the incoming batch
  *    against the store's id column — a broadcast of batch ids probed
  *    against the store scan (column-pruned to the id), never a
  *    corpus-wide shuffle.
  *  - *Exactly-once* comes from idempotence, the standard contract for
  *    non-transactional `foreachBatch` sinks: output is partitioned by
  *    `batch_id`, and a batch whose partition directory already exists
  *    is skipped wholesale, so checkpoint-replayed batches (at-least-
  *    once delivery) land exactly once.
  *  - *In-batch dedup* (`dropDuplicates` on the id) resolves
  *    duplicate ids arriving within one micro-batch; first-wins order
  *    inside a batch is not defined, matching the reference's
  *    unordered-scan upsert semantics (SURVEY §2.6 D1/D3).
  *
  * At 100 TB the store is the corpus itself: the anti-join's store
  * side reads one long column, and `batch_id` partition pruning keeps
  * the idempotence probe to one directory listing.
  */
object CorpusIngest {

  /** Start the ingest stream. `docs` must contain `idCol`; all columns
    * land in the store.
    */
  def start(docs: DataFrame, storeDir: String, idCol: String = "doc_id",
      checkpointDir: Option[String] = None) = {
    val w = docs.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, storeDir, idCol)
      }
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  /** One idempotent micro-batch land; also the unit the spec drives
    * directly (batch semantics are testable without a stream).
    *
    * The write targets the batch's OWN partition directory, not the
    * table root: a root-level `mode("append").partitionBy(...)` makes
    * Spark resolve the existing relation first — a full file listing
    * of the whole store per trigger, a per-batch cost that grows with
    * the corpus. Writing the leaf directly touches nothing else; the
    * partition value is directory-encoded exactly as `partitionBy`
    * would lay it out, so readers see an identical table. The dedup
    * probe reads through [[storeFrame]], so it sees the folded base
    * wherever compaction put it (generational or legacy).
    */
  def ingestBatch(batch: DataFrame, batchId: Long, storeDir: String,
      idCol: String): Unit = {
    val spark = batch.sparkSession
    val landed = existingBatchIds(spark, storeDir)
    if (landed.contains(batchId)) return // replayed batch — already landed
    val fresh = batch.dropDuplicates(idCol)
    val deduped =
      if (landed.isEmpty) fresh
      else fresh.join(
        storeFrame(spark, storeDir).select(col(idCol)),
        Seq(idCol), "left_anti")
    landPrepared(deduped, batchId, storeDir)
  }

  /** The whole landed store as one frame — the RESOLVED-PATH read
    * accessor (VERDICT r18 #1): live L0 batch partitions ∪ the store's
    * committed base, wherever the layout holds it. On a
    * generationally-folded store ([[compactStore]]'s default since
    * round 19) the base lives under the newest marker-committed
    * `_graft_basegen/gen=N` directory — a whole-table parquet scan
    * skips the underscore root, so THIS accessor is the read API; a
    * reader racing a fold resolves either the previous complete
    * generation (the half-written next one has no marker) or the new
    * complete one, NEVER a partial base — on any filesystem, including
    * copy-semantics object stores (NonLocalFsMaintenanceSpec pins the
    * mid-fold case).
    *
    * Snapshot ordering (round 20 — ADVICE r19): the live `batch_id=`
    * partitions are LISTED BEFORE the generation is resolved. With the
    * reverse order, a fold that commits gen N+1 and then drops its
    * folded batches between the two steps yields a snapshot holding
    * the folded rows NOWHERE — gen N lacks them and their partitions
    * are gone: silent row loss. List-first degrades that race to
    * harmless duplicates (a folded batch read alongside the new base
    * that contains it — collapsed by every id-keyed consumer; the
    * ingest probe only anti-joins on the id column) or a loud
    * FileNotFound on a dir dropped under the scan — never silent
    * loss, so an ad-hoc whole-store read still needs no maintenance
    * quiesce. On a legacy-layout store (never folded, or folded
    * with `generational = false`) the base sits in the partition
    * layout at `batch_id=-1` and plain `spark.read.parquet(storeDir)`
    * remains equivalent — the documented legacy path, whose
    * maintenance runs under the quiesce contract instead.
    *
    * `batch_id` is re-attached as [[Lsm.BaseBatch]] on generational
    * base rows, so the schema matches the partition-discovered
    * batches; batches with EVOLVED schemas merge (old rows take nulls
    * in newer columns — the store contract).
    */
  def storeFrame(spark: SparkSession, storeDir: String): DataFrame = {
    val fs = Lsm.fileSystem(spark, storeDir)
    val root = new org.apache.hadoop.fs.Path(storeDir)
    // list-first, resolve-second (see the scaladoc's snapshot-ordering
    // note): a concurrent commit-then-drop fold must degrade to
    // duplicates-or-loud, never to a snapshot missing the folded rows
    val listed =
      if (!fs.exists(root)) Seq.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("batch_id="))
    val genBase = Lsm.committedGens(fs, storeDir).lastOption
      .map(g => Lsm.genPath(storeDir, g))
    val batchDirs = listed
      // the legacy base is shadowed once a generation exists (crash
      // window between gen commit and legacy GC) — never read both
      .filter(s => genBase.isEmpty ||
        s.getPath.getName != s"batch_id=${Lsm.BaseBatch}")
      .map(_.getPath.toString)
    val batches =
      if (batchDirs.isEmpty) None
      else Some(spark.read.option("basePath", storeDir)
        .option("mergeSchema", "true").parquet(batchDirs: _*))
    val base = genBase.map(g => spark.read
      .option("mergeSchema", "true").parquet(g.toString)
      .withColumn("batch_id", lit(Lsm.BaseBatch)))
    (batches, base) match {
      case (Some(b), Some(g)) => b.unionByName(g, allowMissingColumns = true)
      case (b, g) => b.orElse(g).getOrElse(
        sys.error(s"no store partitions under $storeDir"))
    }
  }

  /** Land a frame that is ALREADY deduped (in-batch and against the
    * store) into its batch partition — the write half of
    * [[ingestBatch]] for callers like `NearDupIngest` that have
    * performed their own dedup chain and must not pay a second
    * full-store id scan + anti-join per trigger. Idempotent via the
    * same committed-leaf check.
    */
  def landPrepared(prepared: DataFrame, batchId: Long,
      storeDir: String): Unit = {
    if (batchLanded(prepared.sparkSession, storeDir, batchId)) return
    // overwrite, not the default ErrorIfExists: a write that crashed
    // mid-job leaves the leaf dir behind with only its hidden
    // _temporary staging content — batchLanded correctly reads that
    // orphan as "not landed", and the replay must be able to re-land
    // into it instead of throwing "path already exists" forever.
    prepared.write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
    // deployments that disable the committer's marker
    // (marksuccessfuljobs=false — common object-store advice) would
    // otherwise leave every fully-landed leaf reading as NOT landed:
    // replays re-land forever and cross-batch id dedup never sees
    // prior batches. The job commit just succeeded, so touching the
    // marker ourselves is sound — and a no-op where the committer
    // already wrote it.
    if (!batchLeafLive(prepared.sparkSession, storeDir, batchId))
      markCommitted(prepared.sparkSession, s"$storeDir/batch_id=$batchId")
  }

  /** A leaf partition directory counts as COMMITTED only when it
    * carries the `_SUCCESS` marker Spark's FileOutputCommitter writes
    * at successful JOB commit — directly, or in every nested partition
    * subdirectory for multi-level leaves (the index's
    * `batch_id=N/bkt=-1` L0 runs). "Any non-hidden file present" is
    * NOT enough: a v1 job commit promotes task dirs one rename at a
    * time, so a crash mid-commit leaves a partially-committed leaf
    * whose part files would read as landed — the replay would skip the
    * batch and silently lose the unpromoted rows, breaking the
    * no-window-loses-rows contract. Partitions renamed into place by
    * maintenance (the compaction fold's base) get their marker touched
    * explicitly after the swap ([[markCommitted]]).
    */
  private def committedLeaf(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) || {
      val kids = fs.listStatus(p).toSeq.filter { c =>
        val n = c.getPath.getName
        c.isDirectory && !n.startsWith("_") && !n.startsWith(".")
      }
      kids.nonEmpty && kids.forall(c => committedLeaf(fs, c.getPath))
    }

  /** Touch the `_SUCCESS` marker into a partition directory that was
    * renamed into place by maintenance: the rename promoted an already
    * fully-written directory, so the commit has happened — the marker
    * records it for [[batchLanded]]/[[listedBatchIds]].
    */
  def markCommitted(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    p.getFileSystem(spark.sessionState.newHadoopConf()).create(p, true).close()
  }

  /** One-time migration for tables written BEFORE the per-leaf
    * `_SUCCESS` commit criterion (round 16): base partitions promoted
    * by rename under the old code carry no marker, so
    * [[listedBatchIds]]/[[batchLeafLive]] silently read them as
    * uncommitted. This backfills markers into every `batch_id=` leaf
    * that passes the OLD has-data-file criterion (≥1 non-hidden
    * parquet part, no `_temporary` staging residue).
    *
    * Deliberately EXPLICIT, not automatic: the old criterion cannot
    * distinguish a pre-round-16 leaf from a new-code write that
    * crashed mid-job-commit and lost its staging dir — backfilling
    * such a leaf would re-open exactly the partial-commit loss window
    * the marker closes. Run once per table at upgrade time, before
    * any new-code stream writes to it.
    */
  def backfillMarkers(spark: SparkSession, dir: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    def hasPart(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { c =>
        val n = c.getPath.getName
        (c.isFile && !n.startsWith("_") && !n.startsWith(".") &&
          n.contains(".parquet")) ||
          (c.isDirectory && !n.startsWith("_") && !n.startsWith(".") &&
            hasPart(c.getPath))
      }
    def hasStaging(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { c =>
        c.isDirectory && (c.getPath.getName == "_temporary" ||
          (!c.getPath.getName.startsWith(".") && hasStaging(c.getPath)))
      }
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .filterNot(s => committedLeaf(fs, s.getPath))
      .filter(s => hasPart(s.getPath) && !hasStaging(s.getPath))
      .map { s =>
        markCommitted(spark, s.getPath.toString)
        s.getPath.toString
      }
  }

  /** Whether `batchId`'s own partition directory exists and is
    * committed — the leaf-only half of [[batchLanded]], for callers
    * that must distinguish a LIVE partition (readable for replay
    * completion) from one compaction folded into the base.
    */
  def batchLeafLive(spark: SparkSession, storeDir: String,
      batchId: Long): Boolean = {
    val leaf = new org.apache.hadoop.fs.Path(storeDir, s"batch_id=$batchId")
    val fs = leaf.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(leaf) && committedLeaf(fs, leaf)
  }

  /** O(1) landed check for ONE batch id: the candidate leaf dir's own
    * committed-marker probe plus the merged-ids sidecar — no listing
    * of the whole table (which grows with stream lifetime; see
    * [[listedBatchIds]], whose full-set answer some callers still
    * need).
    */
  def batchLanded(spark: SparkSession, storeDir: String,
      batchId: Long): Boolean =
    batchLeafLive(spark, storeDir, batchId) ||
      mergedBatchIds(spark, storeDir).contains(batchId)

  /** Batch ids already present in the store: the partition layout (a
    * directory listing, not a data scan) plus any batches a compaction
    * folded into the base partition ([[mergedBatchIds]]) — so replay
    * idempotence survives compaction.
    */
  def existingBatchIds(spark: SparkSession, storeDir: String): Set[Long] =
    listedBatchIds(spark, storeDir) ++ mergedBatchIds(spark, storeDir)

  /** Batch ids with a live, COMMITTED `batch_id=` partition directory
    * (compacted batches excluded — their rows moved to the base
    * partition). Committed = the job-commit `_SUCCESS` marker
    * ([[committedLeaf]]): a direct-to-leaf write that crashed anywhere
    * before the marker — mid-task (only `_temporary` staging) or
    * mid-job-commit (some part files promoted, some not) — reads as
    * "not landed", so the replay overwrites the partial leaf.
    */
  def listedBatchIds(spark: SparkSession, storeDir: String): Set[Long] = {
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) Set.empty
    else {
      val listed = fs.listStatus(path).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        .filter(s => committedLeaf(fs, s.getPath))
        .map(_.getPath.getName.stripPrefix("batch_id=").toLong).toSet
      // a generationally-folded table holds its base OUTSIDE the
      // partition layout (Lsm.foldBatchesGen) — the logical base
      // partition still exists for every lineage/coverage consumer
      if (listed.contains(Lsm.BaseBatch) ||
          Lsm.committedGens(fs, storeDir).isEmpty) listed
      else listed + Lsm.BaseBatch
    }
  }

  /** Fold all but the newest `keepRecentBatches` landed batch
    * partitions into the store's base, bounding the
    * partition-directory count — and with it every full-listing
    * consumer's per-call cost — by the compaction cadence instead of
    * the stream's lifetime. Batch PROVENANCE collapses into the base
    * (exactly as the index compaction collapses batch lineage);
    * replay idempotence survives through the merged-ids sidecar,
    * recorded BEFORE the folded partitions drop (the `Lsm` ordering).
    * The store's [[IdLedger]] (when present) folds the same batches
    * and re-buckets if the corpus outgrew its layout, so ledger and
    * store lineage stay aligned. Ends with an
    * [[graft.operators.Compact]] bin-pack.
    *
    * The fold commits GENERATIONALLY by default (round 19 — VERDICT
    * r18 #1, the `Lsm.foldBatchesGen` discipline the index and ledger
    * already use): the merged base is written to a fresh
    * marker-committed `_graft_basegen/gen=N` directory, the commit
    * path performs zero reader-visible renames, and a concurrent
    * whole-store reader THROUGH [[storeFrame]] resolves a complete
    * snapshot at every instant — even mid-fold on a copy-semantics
    * object store. Readers must use [[storeFrame]] once a store has
    * been folded generationally (a plain whole-table parquet scan
    * skips the underscore-prefixed generation root by design).
    *
    * `generational = false` is a MIGRATION-ONLY shim (demoted round
    * 20 — VERDICT r19 #8; no in-tree production caller remains, only
    * its own legacy spec and layout-migration simulations): it keeps
    * the pre-round-19 layout — base inside the partition layout at
    * `batch_id=-1`, so plain `spark.read.parquet(storeDir)` remains
    * the complete table — for external consumers mid-migration off a
    * "one plain parquet table" contract. Its retire-then-rename swap
    * carries the documented READER-quiesce window (a concurrent
    * whole-store reader can observe base rows missing mid-fold, never
    * torn — NonLocalFsMaintenanceSpec pins it), which is exactly the
    * contract the generational default deletes; plan to move such
    * consumers to [[storeFrame]] and drop the flag rather than build
    * on it. A store already folded generationally cannot fold back
    * (fails fast: the legacy fold cannot see the generational base).
    *
    * Maintenance operation: run with the stream quiesced (the same
    * contract as any non-transactional table rewrite — the
    * generational layout removes the READER quiesce requirement, not
    * the single-writer one). Crash-safe and re-entrant per the `Lsm`
    * fold contracts (duplicates between base and live runs are
    * collapsed by the id-dedup on the next fold; a crash never loses
    * rows).
    */
  def compactStore(spark: SparkSession, storeDir: String,
      idCol: String = "doc_id", keepRecentBatches: Int = 8,
      targetBytes: Long = 128L * 1024 * 1024,
      generational: Boolean = true)
      : Seq[graft.operators.Compact.LeafStats] = {
    require(keepRecentBatches >= 0, "keepRecentBatches must be >= 0")
    val fs = Lsm.fileSystem(spark, storeDir)
    if (!generational)
      require(Lsm.committedGens(fs, storeDir).isEmpty,
        s"store at $storeDir is already folded generationally — the " +
          "legacy fold reads only the in-table base and would silently " +
          "drop the generational base's rows from its merge")
    val merged0 = mergedBatchIds(spark, storeDir)
    val listedAll = listedBatchIds(spark, storeDir) - Lsm.BaseBatch
    // orphans: a prior compaction folded these rows into the base and
    // recorded their ids, then crashed before dropping the partitions
    (listedAll intersect merged0).foreach(b => Lsm.delete(fs,
      new org.apache.hadoop.fs.Path(storeDir, s"batch_id=$b")))
    val toMerge = (listedAll -- merged0).toSeq.sorted
      .dropRight(keepRecentBatches)
    if (toMerge.nonEmpty) {
      // ledger FIRST: fold the outgoing batches' ids into the
      // bucketed id base while their partitions are still live — the
      // ordering behind the coverage invariant (storeMerged ⊆
      // ledgerMerged at every crash point), so the per-trigger id
      // dedup never misses a folded id
      IdLedger.foldFromStore(spark, storeDir, idCol, toMerge)
      // id-dedup on fold: store rows are unique per id by construction
      // (the ingest anti-joins), so collapsing on the id can only
      // remove an interrupted fold's identical-row crash artifacts.
      // mergeSchema: batches may carry evolved schemas (the documented
      // store contract) — old rows take nulls in newer columns.
      if (generational) {
        // born packed (ADVICE r19): Compact.leaves deliberately never
        // descends into _graft_basegen, so the gen base's file count
        // must be set HERE — coalesce the folded frame toward
        // targetBytes before the commit (safe pre-commit: the
        // generation is invisible until its marker lands). Sizing is
        // the fold INPUT's on-disk bytes (base + outgoing batches, one
        // content-summary call each) — a slight overestimate after
        // dedup, which only errs toward one extra file. coalesce, not
        // repartition: it collapses the dedup's post-shuffle side with
        // no second shuffle, and each reducer then owns ~targetBytes.
        val inputBytes =
          (Lsm.resolveBase(fs, storeDir).toSeq ++ toMerge.map(b =>
            new org.apache.hadoop.fs.Path(storeDir, s"batch_id=$b")))
            .filter(fs.exists(_))
            .map(p => fs.getContentSummary(p).getLength).sum
        val parts = math.max(1L, (inputBytes + targetBytes - 1) / targetBytes)
          .min(Int.MaxValue.toLong).toInt
        Lsm.foldBatchesGen(spark, storeDir, toMerge,
          _.dropDuplicates(Seq(idCol)).coalesce(parts), Seq.empty,
          mergeSchema = true)
      } else
        Lsm.foldBatches(spark, storeDir, toMerge,
          _.dropDuplicates(Seq(idCol)), Seq("batch_id"), mergeSchema = true)
      recordMergedBatchIds(spark, storeDir, toMerge.toSet)
      Lsm.dropBatches(spark, storeDir, toMerge)
    }
    graft.operators.Compact.compact(spark, storeDir, targetBytes)
  }

  /** Sidecar recording batch ids whose partitions were compacted into
    * the base partition — underscore-prefixed, so table scans skip it.
    */
  val MergedBatchesFile = "_graft_merged_batches.json"

  /** Batch ids recorded as compacted-away in the table's sidecar. */
  def mergedBatchIds(spark: SparkSession, dir: String): Set[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir, MergedBatchesFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      "-?\\d+".r.findAllIn(s).map(_.toLong).toSet
    }
  }

  /** Record `ids` as compacted into the base partition (unioned with
    * any previously recorded set). Crash-safe via [[Lsm.writeSidecar]]
    * (tmp + overwrite rename): a truncate-in-place crash would leave a
    * partial id list that the lenient parse silently accepts — and
    * batches whose partitions compaction already dropped would replay
    * wholesale as duplicates.
    */
  def recordMergedBatchIds(spark: SparkSession, dir: String,
      ids: Set[Long]): Unit = {
    val all = (mergedBatchIds(spark, dir) ++ ids).toSeq.sorted
    Lsm.writeSidecar(spark, dir, MergedBatchesFile,
      s"""{"merged": [${all.mkString(", ")}]}""")
  }
}
