package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Explicit shuffle-lifecycle points for long multi-stage chains.
  *
  * Spark only deletes a shuffle's map files when the owning
  * `ShuffleDependency` is garbage-collected and the ContextCleaner
  * processes its weak reference — so a chain that runs
  * sweep → selection → band join → audit inside one JVM retains every
  * stage's shuffle files until exit. At the fourth measured decade
  * (50 M docs) that high-water mark exceeded a 252 GB box's free disk
  * (round-17 post-mortem), and on a cluster the same retention is
  * executor-disk pressure: each executor holds its share of every
  * stage's map outputs for the application's lifetime unless
  * something drops the references.
  *
  * Two levers, both reference-driven (no private Spark API):
  *
  *  - [[reclaim]] — after a stage's results are COLLECTED (or
  *    otherwise no longer reachable through any live plan), a GC pass
  *    lets the ContextCleaner enqueue the dead ShuffleDependencies
  *    and delete their files. Callers must actually drop the frames
  *    (let them go out of scope / overwrite the vals) first; the GC
  *    hint does nothing for a plan that is still referenced.
  *  - [[parquetBarrier]] — cut LINEAGE: persist a frame's rows to
  *    parquet and return the re-read, so the upstream plan (and every
  *    shuffle it holds) becomes unreachable even though the data
  *    lives on. The columnar file is typically far smaller than the
  *    shuffle files that produced it. This is the per-stage
  *    checkpoint a 100 TB pipeline would place between its signature
  *    pass and its band join.
  *
  * [[retainedShuffleBytes]] measures the current high-water mark (sum
  * of `shuffle_*` file sizes under the JVM's block-manager dirs), so
  * chains can log before/after evidence instead of guessing.
  */
object ShuffleHygiene {

  /** GC + settle passes that give the ContextCleaner a chance to
    * reap shuffles whose dependencies just became unreachable. The
    * cleaner runs on its own thread off a weak-ref queue, so a bounded
    * wait (not just one System.gc) is needed before the files are
    * actually unlinked; three rounds with a short pause reclaimed the
    * full dead set in every measured run.
    */
  def reclaim(spark: SparkSession, rounds: Int = 3, pauseMs: Long = 400L): Unit = {
    var i = 0
    while (i < rounds) {
      System.gc()
      Thread.sleep(pauseMs)
      i += 1
    }
  }

  /** Materialize `df` to `dir` and return the re-read frame — the
    * lineage cut. Callers should reassign their reference to the
    * returned frame and then [[reclaim]]; the staging dir is theirs
    * to delete once the chain no longer reads it.
    */
  def parquetBarrier(df: DataFrame, dir: String): DataFrame = {
    df.write.mode("overwrite").parquet(dir)
    df.sparkSession.read.parquet(dir)
  }

  /** Bytes currently held by shuffle files under this JVM's block-
    * manager directories (local / single-box measurement; on a
    * cluster the same number lives per-executor). Scans
    * `blockmgr-*` trees under the configured local dirs for
    * `shuffle_*` files.
    */
  def retainedShuffleBytes(spark: SparkSession): Long = {
    val dirs = sys.env.get("SPARK_LOCAL_DIRS")
      .orElse(spark.conf.getOption("spark.local.dir"))
      .map(_.split(",").toSeq)
      .getOrElse(Seq(System.getProperty("java.io.tmpdir")))
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else if (f.getName.startsWith("shuffle_")) f.length()
      else 0L
    dirs.map(new java.io.File(_)).filter(_.isDirectory).map { root =>
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("blockmgr-"))
        .map(walk).sum
    }.sum
  }
}
