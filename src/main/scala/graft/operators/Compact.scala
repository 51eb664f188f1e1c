package graft.operators

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the
  * `OPTIMIZE`-shaped maintenance operator a continuously-ingesting
  * store needs (streaming/CorpusIngest's idempotent batch landing and
  * the reference-shaped per-species reloads both accrete small files;
  * at 100 TB a scan's task count and listing cost track the FILE
  * count, not the byte count, so unbounded small files degrade every
  * downstream query).
  *
  * Strategy: walk the table's leaf directories (a leaf = a directory
  * holding parquet part files, i.e. the table root or one
  * `key=value` partition dir), and for each leaf whose file count
  * exceeds ceil(bytes / targetBytes) rewrite just that leaf with
  * `coalesce(targetFiles)` — a narrow, shuffle-free rewrite (bin-pack
  * by coalescing read splits), never a whole-table job. Leaves
  * already at their target are untouched, so a second run is a no-op
  * (idempotent) and a partitioned table compacts incrementally.
  *
  * All file operations go through the Hadoop `FileSystem` resolved
  * from the table path, so the rewrite runs against any registered
  * scheme (file:, hdfs:, an object-store connector). The swap is
  * write-to-sibling then per-file rename within the same filesystem —
  * atomic on HDFS/local, a copy on stores without native rename; on a
  * real object-store deployment this step would ride the catalog's
  * atomic commit (Iceberg/Delta snapshot swap), and readers of the
  * table directory must be quiesced during the swap — the same
  * contract as Spark's own non-transactional overwrite.
  */
object Compact {

  /** One leaf's before/after accounting. */
  final case class LeafStats(
      path: String, filesBefore: Int, filesAfter: Int, bytes: Long)

  private def isParquetPart(s: FileStatus): Boolean = {
    val n = s.getPath.getName
    s.isFile && !n.startsWith("_") && !n.startsWith(".") &&
      (n.endsWith(".parquet") || n.contains(".parquet"))
  }

  /** Leaf dirs under `root` that directly contain parquet part files.
    * Hidden/metadata subtrees (underscore- or dot-prefixed: a table's
    * `_graft_basegen` generations, its `_graft_ids` ledger,
    * `_temporary` staging) are never descended into — committed base
    * generations are IMMUTABLE by contract (`Lsm.foldBatchesGen`), so
    * an in-place repack would break the rename-free commit guarantee;
    * they are born packed by their own fold's repartition instead.
    */
  private def leaves(fs: FileSystem, root: Path): Seq[Path] =
    if (!fs.getFileStatus(root).isDirectory) Nil
    else {
      val children = fs.listStatus(root).toSeq
      val here = if (children.exists(isParquetPart)) Seq(root) else Nil
      here ++ children.filter { c =>
        val n = c.getPath.getName
        c.isDirectory && !n.startsWith("_") && !n.startsWith(".")
      }.map(_.getPath).flatMap(leaves(fs, _))
    }

  /** Compact every leaf of `tableDir` toward `targetBytes` per file.
    * Returns per-leaf stats (only for leaves that were rewritten).
    */
  def compact(
      spark: SparkSession,
      tableDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Seq[LeafStats] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    leaves(fs, root).flatMap { leaf =>
      val parts = fs.listStatus(leaf).toSeq.filter(isParquetPart)
      val bytes = parts.map(_.getLen).sum
      val target = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      if (parts.size <= target) None
      else {
        // Read ONLY this leaf (no partition discovery: the leaf's own
        // files are self-contained row groups); coalesce is a narrow
        // repack of read splits — no shuffle, no sort disturbance
        // beyond file concatenation order.
        val df = spark.read.parquet(parts.map(_.getPath.toString): _*)
        val tmp = new Path(leaf.getParent, s".${leaf.getName}.compact-tmp")
        if (fs.exists(tmp)) fs.delete(tmp, true)
        df.coalesce(target).write
          .mode("overwrite").parquet(tmp.toString)
        // swap: move the NEW files in first, delete the old parts
        // LAST. The reverse order's crash window left a leaf holding
        // only its _SUCCESS marker — which the batch-landed check
        // reads as committed, so the rows (alive only in the hidden
        // tmp) would be silently lost to every reader. This order's
        // crash window duplicates rows instead (old + new coexist),
        // which the next table fold's id-dedup collapses — duplicates,
        // never losses. Part names can't collide: each write job
        // embeds its own UUID.
        val moved = fs.listStatus(tmp).toSeq.filter(isParquetPart)
        moved.foreach { f =>
          val dest = new Path(leaf, f.getPath.getName)
          require(!fs.exists(dest), s"part name collision: $dest")
          require(fs.rename(f.getPath, dest),
            s"rename failed: ${f.getPath} -> $dest")
        }
        // old parts drop last (a checksummed FS drops its .crc
        // shadows with them)
        parts.foreach(p => fs.delete(p.getPath, false))
        fs.delete(tmp, true)
        Some(LeafStats(leaf.toString, parts.size, moved.size, bytes))
      }
    }
  }
}
