package graft.streaming

/** A Hadoop `FileSystem` with a NON-`file:` scheme, backed by the
  * local disk (`RawLocalFileSystem` with only the URI overridden) —
  * the standard trick (Spark's own test suite uses it for checkpoint
  * and committer coverage) for proving a code path resolves every
  * file operation through the Hadoop `FileSystem` API rather than
  * `java.io.File`: any leftover `java.io` call against a
  * `graftfs://` path would see a nonexistent local path and fail (or
  * silently no-op), while Hadoop-routed calls work normally.
  *
  * Registered per-test via
  * `hadoopConfiguration.set("fs.graftfs.impl", ...)`.
  */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
