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
  * local, a non-atomic copy on stores without native rename — there
  * the retire-then-rename discipline still never LOSES rows (every
  * crash window keeps both copies on disk under recoverable names),
  * but a production object-store deployment should front the swap
  * with a catalog pointer commit (Iceberg/Delta-style) so concurrent
  * readers never observe the in-between listing.
  */
private[streaming] object Lsm {

  /** Batch id of the base (folded) partition. */
  val BaseBatch: Long = -1L

  def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Recursive delete; no-op when the path is absent. */
  def delete(fs: FileSystem, p: Path): Unit = {
    if (fs.exists(p)) fs.delete(p, true)
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
    * delete-then-rename, whose crash window leaves the sidecar MISSING
    * (a loud fail-fast on the next read), never corrupt.
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
