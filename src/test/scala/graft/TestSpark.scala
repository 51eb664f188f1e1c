package graft

import org.apache.spark.sql.SparkSession

object TestSpark {
  /** Spec scratch dirs go on tmpfs when available: a just-written
    * parquet re-read from /tmp occasionally threw ChecksumException
    * under parallel suites (disk-cache flakiness); /dev/shm sidesteps
    * it and matches graft.Bench's scratch policy.
    */
  def scratchPath(prefix: String): java.nio.file.Path = {
    val base = Seq("/dev/shm", sys.props("java.io.tmpdir"))
      .find(p => new java.io.File(p).canWrite)
      .getOrElse(sys.props("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(base), prefix)
  }

  def scratchDir(prefix: String): String = scratchPath(prefix).toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", scratchDir("graft_wh"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
}
