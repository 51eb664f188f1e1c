package graft.operators

import java.io.File

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
  * The swap is write-to-sibling-then-rename within the same
  * filesystem. On a real object store this step would ride the
  * catalog's atomic commit (Iceberg/Delta snapshot swap); the
  * filesystem rename here is the single-writer local analogue, and
  * readers of the table directory must be quiesced during the swap —
  * the same contract as Spark's own non-transactional overwrite.
  */
object Compact {

  /** One leaf's before/after accounting. */
  final case class LeafStats(
      path: String, filesBefore: Int, filesAfter: Int, bytes: Long)

  private def isParquetPart(f: File): Boolean = {
    val n = f.getName
    f.isFile && !n.startsWith("_") && !n.startsWith(".") &&
      (n.endsWith(".parquet") || n.contains(".parquet"))
  }

  /** Leaf dirs under `root` that directly contain parquet part files. */
  private def leaves(root: File): Seq[File] =
    if (!root.isDirectory) Nil
    else {
      val children = Option(root.listFiles()).map(_.toSeq).getOrElse(Nil)
      val here = if (children.exists(isParquetPart)) Seq(root) else Nil
      here ++ children.filter(_.isDirectory).flatMap(leaves)
    }

  /** Compact every leaf of `tableDir` toward `targetBytes` per file.
    * Returns per-leaf stats (only for leaves that were rewritten).
    */
  def compact(
      spark: SparkSession,
      tableDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Seq[LeafStats] = {
    require(targetBytes > 0, "targetBytes must be positive")
    leaves(new File(tableDir)).flatMap { leaf =>
      val parts = leaf.listFiles().toSeq.filter(isParquetPart)
      val bytes = parts.map(_.length()).sum
      val target = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      if (parts.size <= target) None
      else {
        // Read ONLY this leaf (no partition discovery: the leaf's own
        // files are self-contained row groups); coalesce is a narrow
        // repack of read splits — no shuffle, no sort disturbance
        // beyond file concatenation order.
        val df = spark.read.parquet(parts.map(_.getAbsolutePath): _*)
        val tmp = new File(leaf.getParentFile, s".${leaf.getName}.compact-tmp")
        if (tmp.exists()) delete(tmp)
        df.coalesce(target).write
          .mode("overwrite").parquet(tmp.getAbsolutePath)
        // swap: drop old part files (and their LocalFS .crc shadows),
        // move new ones in, drop tmp
        parts.foreach { p =>
          new File(p.getParentFile, s".${p.getName}.crc").delete()
          p.delete()
        }
        val moved = tmp.listFiles().toSeq.filter(isParquetPart)
        moved.foreach { f =>
          val dest = new File(leaf, f.getName)
          require(f.renameTo(dest), s"rename failed: $f -> $dest")
        }
        delete(tmp)
        Some(LeafStats(leaf.getAbsolutePath, parts.size,
          moved.size, bytes))
      }
    }
  }

  private def delete(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }
}
