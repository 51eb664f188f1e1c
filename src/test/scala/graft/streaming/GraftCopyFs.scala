package graft.streaming

import org.apache.hadoop.fs.Path

/** A non-local-scheme `FileSystem` whose `rename` is a NON-ATOMIC
  * recursive copy-then-delete — the object-store semantics the Lsm
  * doc warns about (no native rename; a "rename" is O(data) and a
  * concurrent lister observes every intermediate state). Every rename
  * is also counted by destination path, so a spec can assert that a
  * commit path is rename-FREE under the table's generational root
  * (`Lsm.foldBatchesGen`'s contract: marker-committed generations
  * never move, so copy-semantics rename cannot corrupt the swap).
  */
class GraftCopyFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftcopyfs:///")

  private def copyRec(src: Path, dst: Path): Unit = {
    val st = getFileStatus(src)
    if (st.isDirectory) {
      mkdirs(dst)
      listStatus(src).foreach(c => copyRec(c.getPath,
        new Path(dst, c.getPath.getName)))
    } else {
      val in = open(src)
      val out = create(dst, true)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536)
      finally { in.close(); out.close() }
    }
  }

  override def rename(src: Path, dst: Path): Boolean = {
    GraftCopyFs.renames.add(src.toString + " -> " + dst.toString)
    if (!exists(src)) return false
    // HDFS rename-into-existing-dir semantics (nest inside), matched
    // so renameStrict's absence precondition stays meaningful
    val target =
      if (exists(dst) && getFileStatus(dst).isDirectory)
        new Path(dst, src.getName)
      else dst
    copyRec(src, target)
    delete(src, true)
    true
  }
}

object GraftCopyFs {
  /** Every rename issued through the scheme (src -> dst strings). */
  val renames = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def renamesUnder(fragment: String): Seq[String] = {
    val it = renames.iterator()
    val b = Seq.newBuilder[String]
    while (it.hasNext) { val r = it.next(); if (r.contains(fragment)) b += r }
    b.result()
  }
}
