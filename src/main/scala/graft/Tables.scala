package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Access to the harness parquet tables (TESTDATA.md) plus session knobs
  * shared by every entry point.
  *
  * Scale note: all reads go through `spark.read.parquet` so Catalyst gets
  * predicate pushdown / column pruning on the scan; callers must never
  * collect a table to the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // `events` carries TIMESTAMP(NANOS), which Spark 4 rejects unless
    // nanos are read as raw longs — set it on every events read so a
    // query is self-contained (not dependent on an earlier query in
    // the session having set it). See `events` below.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `documents` ships as one small parquet file → one input
    * partition, which would serialize the CPU-heavy fan-out work
    * (shingle explode × k md5 aggregations) onto a single core. A
    * round-robin repartition to the core count before the fan-out
    * distributes it; the shuffled payload (the raw docs) is tiny
    * relative to the exploded intermediate. The repartition is
    * CONDITIONAL on the scan actually being under-split: on a real
    * multi-file 100 TB layout the scan's own splits provide the
    * parallelism and an unconditional repartition would be a
    * corpus-sized shuffle for nothing. The probe reads the planned
    * split count (file listing, no job).
    */
  def docsParallel(spark: SparkSession, dir: String): DataFrame =
    parallelized(spark, load(spark, dir, "documents"))

  /** Same single-file→single-partition hazard for `embeddings`: the
    * brute-force / bucketed similarity joins stream this side through
    * a broadcast join, so its partition count IS the join's
    * parallelism — one input file would put the whole O(N·dim)
    * scoring loop on one core.
    */
  def embeddingsParallel(spark: SparkSession, dir: String): DataFrame =
    parallelized(spark, load(spark, dir, "embeddings"))

  private def parallelized(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(2, target / 2)) df
    else df.repartition(target)
  }

  /** The `events` table carries parquet TIMESTAMP(NANOS) which Spark 4
    * rejects by default. We read nanos as raw longs
    * (`spark.sql.legacy.parquet.nanosAsLong`) and derive epoch-micros
    * with floor division — exactly DuckDB's ns→us truncation, so the
    * oracle comparison is integer-exact and completely timezone-free.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("us", expr("ts div 1000"))
  }
}
