package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Z-order layout claim, proven by fence counting: with files
  * laid out by a range partition on the Morton key, a predicate on
  * EITHER dimension prunes most files via min/max stats, while the
  * single-column sort layout only prunes its own column — a
  * y-predicate against an x-sorted layout has to open every file.
  * (Files stand in for row groups: each is one sorted run with its
  * own min/max fences, exactly the granularity parquet skipping
  * uses.)
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Files64 = 64

  /** 512×512 grid: every (x, y) combination once. */
  private def grid: DataFrame =
    spark.range(512L * 512)
      .select((col("id") % 512).as("x"), expr("id div 512").as("y"))
      .withColumn("z", ZOrder.morton16(col("x"), col("y")))

  /** Per-file (min, max) fences of both dims. */
  private def fences(dir: String): Seq[(Long, Long, Long, Long)] =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .select("x0", "x1", "y0", "y1")
      .as[(Long, Long, Long, Long)].collect().toSeq

  private def hits(f: Seq[(Long, Long, Long, Long)],
      bx: (Long, Long), by: (Long, Long)): Int =
    f.count { case (x0, x1, y0, y1) =>
      x0 <= bx._2 && x1 >= bx._1 && y0 <= by._2 && y1 >= by._1
    }

  test("z-ordered layout prunes on both dims; x-sort only prunes x") {
    val base = graft.TestSpark.scratchDir("graft_zorder")
    // Deterministic stand-in for a range partition on the sort key:
    // 64 equal-width key buckets, one file each. (repartitionByRange
    // draws its reservoir-sample seed from the RDD id, which depends
    // on whatever ran earlier on the shared test session — sampled
    // bounds can merge two buckets and drop a file, flaking the
    // fence counts. Explicit buckets pin the layout.)
    grid.withColumn("b", expr("x div 8"))
      .repartition(1).sortWithinPartitions("x", "y")
      .write.partitionBy("b").parquet(s"$base/by_x")
    grid.withColumn("b", expr("z div 4096"))
      .repartition(1).sortWithinPartitions("z")
      .write.partitionBy("b").parquet(s"$base/by_z")
    val fx = fences(s"$base/by_x")
    val fz = fences(s"$base/by_z")
    assert(fx.size == Files64 && fz.size == Files64)

    val all = (0L, 511L)
    val band = (200L, 215L) // 16 of 512 values, ~3% selectivity

    // y-only predicate: x-sort layout cannot prune AT ALL (every file
    // spans the full y range); the z tiling opens a small fraction.
    assert(hits(fx, all, band) == Files64)
    assert(hits(fz, all, band) <= Files64 / 4,
      s"z layout read ${hits(fz, all, band)} files for a y band")

    // x-only predicate: both layouts prune (z somewhat coarser).
    assert(hits(fx, band, all) <= 4)
    assert(hits(fz, band, all) <= Files64 / 4)

    // box predicate on both dims: the z tiling is the only layout
    // whose fences compose multiplicatively.
    val boxZ = hits(fz, band, (100L, 115L))
    assert(boxZ <= 4, s"z layout read $boxZ files for a 16x16 box")

    // fences are not vacuous: both layouts return identical rows
    val q = (df: DataFrame) => df.filter(
      col("x").between(band._1, band._2) &&
        col("y").between(100, 115)).count()
    assert(q(spark.read.parquet(s"$base/by_x")) == 16L * 16)
    assert(q(spark.read.parquet(s"$base/by_z")) == 16L * 16)
  }

  test("morton16 is a bijection on the 16-bit grid and prefix-local") {
    // bijective on the test grid: distinct codes == distinct points
    assert(grid.select("z").distinct().count() == 512L * 512)
    // locality: the four cells of any aligned 2x2 block share the
    // code prefix (z div 4) — the tiling property the layout uses
    val quad = grid.filter(col("x") < 64 && col("y") < 64)
      .groupBy(expr("x div 2").as("cx"), expr("y div 2").as("cy"))
      .agg(countDistinct(expr("z div 4")).as("prefixes"))
      .agg(max("prefixes").as("m"))
      .as[Long].head()
    assert(quad == 1L, s"2x2 block spanned $quad z-prefixes")
  }
}
