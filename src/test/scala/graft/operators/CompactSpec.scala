package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fileCount(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).map(_.count(f =>
      f.isFile && !f.getName.startsWith(".") &&
        f.getName.contains(".parquet"))).getOrElse(0)

  test("compaction collapses a small-file leaf, preserves data, and is idempotent") {
    import spark.implicits._
    val dir = graft.TestSpark.scratchDir("compact") + "/t"
    (1L to 10000L).toDF("id").repartition(64)
      .write.parquet(dir)
    assert(fileCount(dir) === 64)
    val before = spark.read.parquet(dir).as[Long].collect().sorted

    val stats = Compact.compact(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(stats.map(_.path) === Seq(new java.io.File(dir).getAbsolutePath))
    assert(stats.head.filesBefore === 64 && stats.head.filesAfter === 1)
    assert(fileCount(dir) === 1)
    val after = spark.read.parquet(dir).as[Long].collect().sorted
    assert(after === before, "compaction changed the data")

    // already at target → untouched
    assert(Compact.compact(spark, dir, 512L * 1024 * 1024).isEmpty)
  }

  test("partitioned tables compact per leaf and leave compacted leaves alone") {
    import spark.implicits._
    val dir = graft.TestSpark.scratchDir("compactp") + "/t"
    (1L to 4000L).map(i => (i % 2, i)).toDF("k", "id")
      .repartition(16).write.partitionBy("k").parquet(dir)
    assert(fileCount(s"$dir/k=0") === 16 && fileCount(s"$dir/k=1") === 16)
    val before = spark.read.parquet(dir)
      .select("k", "id").as[(Long, Long)].collect().sorted

    val stats = Compact.compact(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(stats.size === 2 && stats.forall(_.filesAfter === 1))
    assert(fileCount(s"$dir/k=0") === 1 && fileCount(s"$dir/k=1") === 1)
    val after = spark.read.parquet(dir)
      .select("k", "id").as[(Long, Long)].collect().sorted
    assert(after === before, "partitioned compaction changed the data")
  }

  test("a leaf larger than one target file splits into the computed bin count") {
    import spark.implicits._
    val dir = graft.TestSpark.scratchDir("compactb") + "/t"
    // ~ a few hundred KB of parquet over 32 files
    (1L to 200000L).toDF("id").repartition(32).write.parquet(dir)
    val bytes = Option(new java.io.File(dir).listFiles()).get
      .filter(f => !f.getName.startsWith(".") && f.getName.contains(".parquet"))
      .map(_.length()).sum
    val target = bytes / 3
    val stats = Compact.compact(spark, dir, targetBytes = target)
    val expected = math.ceil(bytes.toDouble / target).toInt
    assert(stats.head.filesAfter === expected,
      s"expected $expected bins for $bytes bytes at $target")
    assert(spark.read.parquet(dir).count() === 200000L)
  }
}
