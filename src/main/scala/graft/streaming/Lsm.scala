package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared maintenance machinery for the LSM-shaped batch tables
  * (`batch_id=` partitioned: the near-dup index, its id ledger, the
  * landed corpus store): the fold that collapses per-batch L0
  * partitions into the base partition, and the filesystem primitives
  * the swaps are built from.
  *
  * Everything goes through the Hadoop `FileSystem` resolved from the
  * table path, so maintenance runs against any registered scheme —
  * file:, hdfs:, or an object-store connector — not just the local
  * filesystem (the pre-round-16 `requireLocalFs` limitation). Rename
  * atomicity is the filesystem's own contract: atomic on HDFS and
  * local, a non-atomic copy on stores without native rename.
  *
  * Every LSM-shaped table now commits its fold through
  * marker-committed immutable base GENERATIONS ([[foldBatchesGen]];
  * VERDICT r18 #1 extended it to the landed store): zero
  * reader-visible renames in the commit path, so a concurrent reader
  * on a copy-semantics store resolves a complete base at every
  * instant (the catalog-pointer commit the round-16 doc recommended,
  * pinned by NonLocalFsMaintenanceSpec's copy-semantics cases). The
  * per-trigger probes (index + ledger) race nothing, and a
  * whole-store reader through `CorpusIngest.storeFrame` — the
  * resolved-path accessor — needs no quiesce either: it lists live
  * batches BEFORE resolving the generation, so racing a fold's
  * commit-then-drop degrades to duplicates-or-loud, never silent row
  * loss (the storeFrame scaladoc's snapshot-ordering note). The
  * retire-then-rename [[foldBatches]] survives only as the
  * MIGRATION-ONLY shim behind `compactStore(generational = false)`
  * (round 20 — VERDICT r19 #8: no in-tree production caller; external
  * consumers still on the "one plain parquet table" contract use it
  * while moving to `storeFrame`): that fold never LOSES rows (every
  * crash window keeps both copies on disk under recoverable names)
  * but its swap has the documented reader-quiesce window on
  * no-native-rename stores.
  */
private[streaming] object Lsm {

  /** Batch id of the base (folded) partition. */
  val BaseBatch: Long = -1L

  /** Root of the GENERATIONAL base layout ([[foldBatchesGen]]):
    * underscore-prefixed, so whole-table parquet scans never see it —
    * readers resolve the live base through [[resolveBase]]. Each fold
    * writes a complete new `gen=<N>` directory and COMMITS it by
    * touching its `_SUCCESS` marker; nothing in the commit path is a
    * rename, so the swap is safe on object stores whose rename is a
    * non-atomic copy (the round-16 Lsm doc's catalog-pointer
    * recommendation, realized as marker-committed generations: a
    * pointer FILE swap would itself be the non-atomic step on such
    * stores, where "highest gen with a marker" needs no mutation of
    * shared state at all).
    */
  val GenRootName = "_graft_basegen"

  def genRoot(dir: String): Path = new Path(dir, GenRootName)

  def genPath(dir: String, g: Long): Path = new Path(genRoot(dir), s"gen=$g")

  /** Committed base generations under `dir`, ascending (committed =
    * the generation directory carries its `_SUCCESS` marker; a fold
    * that crashed mid-write left no marker and its partial directory
    * is invisible until the next fold clobbers it).
    */
  def committedGens(fs: FileSystem, dir: String): Seq[Long] = {
    val root = genRoot(dir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
      .filter(g => fs.exists(new Path(genPath(dir, g), "_SUCCESS")))
      .sorted
  }

  /** The live committed base: the highest committed generation, else
    * the legacy in-table `batch_id=-1` partition (the pre-generational
    * layout doubles as gen zero, so existing tables resolve with no
    * migration step).
    */
  def resolveBase(fs: FileSystem, dir: String): Option[Path] =
    committedGens(fs, dir).lastOption.map(genPath(dir, _)).orElse {
      val legacy = new Path(dir, s"batch_id=$BaseBatch")
      if (fs.exists(legacy)) Some(legacy) else None
    }

  def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Recursive delete; no-op when the path is absent. */
  def delete(fs: FileSystem, p: Path): Unit = {
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Direct small-file create (overwrite), NO tmp+rename: for writes
    * into a directory no reader can resolve yet (an uncommitted base
    * generation — invisible until its marker exists), where the
    * torn-write crash window is already covered by the next fold's
    * clobber and keeping the commit path rename-free is the contract
    * the copy-semantics specs machine-check. Live sidecars that a
    * reader CAN be holding go through [[writeSidecar]] instead.
    */
  def createFile(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    ()
  }

  /** Rename requiring the destination ABSENT first. Hadoop `rename`
    * into an existing directory NESTS the source inside it (HDFS
    * semantics) and returns true — a silent wrong-location outcome
    * posix `renameTo` could not produce — so every swap checks
    * absence explicitly before renaming.
    */
  def renameStrict(fs: FileSystem, src: Path, dst: Path,
      context: String): Unit = {
    require(!fs.exists(dst), s"rename target already exists: $dst ($context)")
    require(fs.rename(src, dst), s"rename failed: $src -> $dst ($context)")
  }

  /** Rewrite `dir`'s base partition as base ∪ `toMerge` (each row
    * passed through `reAgg` — dedup/re-bucket for an index, identity
    * for a store), then swap it in. The combined frame is fully
    * written to a sibling before any live directory moves; the swap
    * is retire-then-rename, so at every instant all rows exist on
    * disk (old base at the retired path until the new one is in
    * place; L0 rows in their live dirs throughout). A crash mid-window
    * leaves duplicates, never losses.
    *
    * The merged L0 partitions are left IN PLACE: the caller must
    * record their ids in the merged-ids sidecar FIRST and only then
    * [[dropBatches]] them — the reverse order's crash window (L0 gone,
    * ids unrecorded) would let checkpoint replays re-append duplicate
    * runs.
    *
    * `partitionCols` must start with `batch_id`; a bucketed table
    * passes `Seq("batch_id", "bkt")` and re-buckets inside `reAgg`.
    * Tables whose batches may have EVOLVED schemas (a corpus store
    * gaining columns mid-campaign) must pass `mergeSchema = true`, or
    * the fold's read would sample one file's schema and silently drop
    * the other generations' columns.
    */
  def foldBatches(spark: SparkSession, dir: String, toMerge: Seq[Long],
      reAgg: DataFrame => DataFrame, partitionCols: Seq[String],
      mergeSchema: Boolean = false): Unit = {
    require(partitionCols.headOption.contains("batch_id"),
      s"partitionCols must start with batch_id, got $partitionCols")
    val fs = fileSystem(spark, dir)
    val dst = new Path(dir, s"batch_id=$BaseBatch")
    val retired = new Path(dir + ".base-retired")
    // recovery preamble: a crash between the base-retire and the
    // rename-in leaves the live base absent with the old one intact
    // at the retired path — restore it before folding, or this fold
    // would silently lose every pre-crash base row
    if (!fs.exists(dst) && fs.exists(retired))
      renameStrict(fs, retired, dst, "base recovery")
    val ids = toMerge :+ BaseBatch
    val merged = reAgg(spark.read
      .option("mergeSchema", mergeSchema.toString).parquet(dir)
      .filter(col("batch_id").isin(ids: _*))
      .drop("batch_id"))
    val tmp = new Path(dir + ".merge-tmp")
    delete(fs, tmp)
    merged.withColumn("batch_id", lit(BaseBatch))
      .write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(tmp.toString)
    val src = new Path(tmp, s"batch_id=$BaseBatch")
    // the partitioned job's _SUCCESS sits at tmp's ROOT; touch the
    // base partition's own marker INSIDE tmp so it rides the rename —
    // marking after the swap left a crash window where the promoted
    // base read as uncommitted and every folded id went invisible to
    // the prior-id probes until the next maintenance run
    if (fs.exists(src))
      CorpusIngest.markCommitted(spark, src.toString)
    delete(fs, retired)
    if (fs.exists(dst))
      renameStrict(fs, dst, retired, "base retire")
    if (fs.exists(src))
      renameStrict(fs, src, dst, s"previous base intact at $retired")
    delete(fs, retired)
    delete(fs, tmp)
  }

  /** The generational counterpart of [[foldBatches]] (the index
    * table's fold — VERDICT r16 #5): rewrite the base as
    * resolved-base ∪ `toMerge`, written to a brand-new
    * `_graft_basegen/gen=<N+1>` directory and committed by touching
    * its marker. The commit path performs ZERO renames and never
    * mutates a directory a reader could be resolving: a reader that
    * resolved gen N keeps a complete, immutable base for the whole
    * fold (the previous generation is retained through one more fold
    * before GC), and a reader arriving mid-fold resolves gen N because
    * the half-written N+1 has no marker. On an object store whose
    * rename is a non-atomic copy this is the difference between "a
    * mid-swap reader sees a partial base listing" and "a mid-swap
    * reader cannot observe the new generation at all until it is
    * complete".
    *
    * Crash windows: mid-write → unmarked partial gen, clobbered by the
    * next fold; after commit, before legacy/old-gen GC → two committed
    * bases on disk, readers resolve the newest, next fold GCs. As with
    * [[foldBatches]], merged L0 partitions are left in place — record
    * their ids in the merged-ids sidecar, then [[dropBatches]].
    *
    * `subPartitionCols` are the layout's columns BELOW batch_id (the
    * index passes `Seq("bkt")`; the landed store passes none);
    * `batch_id` itself does not exist in the generational layout —
    * readers re-attach it as a literal. Tables whose batches may have
    * EVOLVED schemas (the corpus store) pass `mergeSchema = true`:
    * the L0 read merges file schemas and the base union tolerates
    * missing columns on either side (old rows take nulls in newer
    * columns — the foldBatches contract).
    */
  def foldBatchesGen(spark: SparkSession, dir: String, toMerge: Seq[Long],
      reAgg: DataFrame => DataFrame, subPartitionCols: Seq[String],
      mergeSchema: Boolean = false): Unit = {
    val fs = fileSystem(spark, dir)
    // migration preamble: restore a pre-generational crash state (live
    // base retired under the old rename discipline, never renamed back)
    val legacy = new Path(dir, s"batch_id=$BaseBatch")
    val retired = new Path(dir + ".base-retired")
    if (!fs.exists(legacy) && committedGens(fs, dir).isEmpty &&
        fs.exists(retired))
      renameStrict(fs, retired, legacy, "base recovery (legacy layout)")
    val l0 = spark.read.option("basePath", dir)
      .option("mergeSchema", mergeSchema.toString)
      .parquet(toMerge.map(b => s"$dir/batch_id=$b"): _*)
      .drop("batch_id")
    val combined = resolveBase(fs, dir) match {
      case None => l0
      case Some(p) =>
        val base = spark.read.option("basePath", p.toString)
          .option("mergeSchema", mergeSchema.toString)
          .parquet(p.toString).drop("batch_id") // legacy carries none of
        // the gen layout's columns beyond data + subPartitionCols; the
        // drop is a no-op there and strips the partition col on legacy
        if (mergeSchema) l0.unionByName(base, allowMissingColumns = true)
        else l0.unionByName(base.select(l0.columns.map(col): _*))
    }
    val gens = committedGens(fs, dir)
    val next = gens.lastOption.getOrElse(-1L) + 1
    val target = genPath(dir, next)
    delete(fs, target) // clobber an unmarked partial from a crashed fold
    reAgg(combined)
      .write.mode("overwrite").partitionBy(subPartitionCols: _*)
      .parquet(target.toString)
    // the parquet job's own _SUCCESS at the gen root IS the commit;
    // touch it explicitly for marker-disabled committers
    CorpusIngest.markCommitted(spark, target.toString)
    // GC superseded bases: all generations but the new one and its
    // predecessor (retained one fold for in-flight readers), and —
    // only from the SECOND generational fold on — the legacy in-table
    // partition. The deferred legacy GC mirrors that retention (the
    // IdLedger.foldFromStore rationale): a reader that resolved the
    // legacy base just before gen 0's marker landed may still be
    // scanning it on a copy-semantics store, and every resolution
    // path shadows it the moment a generation exists.
    if (next >= 1) delete(fs, legacy)
    (gens :+ next).dropRight(2).foreach(g => delete(fs, genPath(dir, g)))
  }

  /** Drop the given live batch partitions (after their ids are safely
    * in the merged sidecar).
    */
  def dropBatches(spark: SparkSession, dir: String, ids: Seq[Long]): Unit = {
    val fs = fileSystem(spark, dir)
    ids.foreach(b => delete(fs, new Path(dir, s"batch_id=$b")))
  }

  /** Read a small JSON sidecar file under the table dir; None when
    * absent.
    */
  def readSidecar(spark: SparkSession, dir: String,
      name: String): Option[String] = {
    val p = new Path(dir, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      Some(try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close())
    }
  }

  /** Crash-safe sidecar write: the JSON goes to a tmp path and is
    * renamed over the live file (atomic OVERWRITE rename through
    * FileContext where the scheme has an AbstractFileSystem binding),
    * so a reader always sees either the old or the new complete JSON —
    * never a truncated half-write that would silently parse to
    * defaults. Schemes without a FileContext binding fall back to
    * delete-then-rename, whose crash window leaves the sidecar MISSING,
    * never corrupt. What "missing" means is the consumer's contract:
    * `CorpusIngest.mergedBatchIds` reads an absent sidecar as the
    * empty set (it cannot fail fast — a never-compacted table with an
    * initial base legitimately has no sidecar), so in that window
    * already-folded batches replay wholesale as duplicate L0 runs,
    * which the next fold's dedup collapses — duplicates, never losses,
    * the same degradation as every other crash window here.
    */
  def writeSidecar(spark: SparkSession, dir: String, name: String,
      json: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(dir, name)
    val tmp = new Path(dir, name + ".tmp")
    val fs = p.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8"))
    finally out.close()
    // checksum-shadow hygiene on checksummed filesystems: if the live
    // file carries a .crc (written by a checksum-enabled fs) but the
    // tmp does not (checksums disabled this session), a rename-over
    // would leave the OLD crc describing the NEW bytes — every later
    // read throws ChecksumException. Drop the stale shadow first.
    val tmpCrc = new Path(dir, s".$name.tmp.crc")
    val liveCrc = new Path(dir, s".$name.crc")
    if (!fs.exists(tmpCrc) && fs.exists(liveCrc)) fs.delete(liveCrc, false)
    try org.apache.hadoop.fs.FileContext
      .getFileContext(fs.makeQualified(p).toUri, conf)
      .rename(fs.makeQualified(tmp), fs.makeQualified(p),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(p)) fs.delete(p, false)
        require(fs.rename(tmp, p), s"rename failed: $tmp -> $p")
    }
    // a rename path that moved only the data file leaves the tmp's
    // shadow stranded (and stale) — drop it
    if (fs.exists(tmpCrc)) fs.delete(tmpCrc, false)
    ()
  }

  /** First integer field named `name` in a sidecar JSON string. */
  def jsonLong(s: String, name: String): Option[Long] =
    s""""$name"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toLong)

  /** First string field named `name` in a sidecar JSON string. */
  def jsonStr(s: String, name: String): Option[String] =
    (s""""$name"\\s*:\\s*"([^"]*)"""").r.findFirstMatchIn(s)
      .map(_.group(1))
}
