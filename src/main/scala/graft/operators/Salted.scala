package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (SURVEY.md §4 / 100 TB design note).
  *
  * AQE's skew-join splitting covers joins, but a pathologically hot
  * aggregation key still funnels into one reducer. `aggregateSkewed`
  * runs any *algebraic* aggregation in two phases: partial aggregate
  * on (keys, salt) — spreading each hot key over `saltBuckets`
  * reducers — then final re-aggregation on the keys. Callers provide
  * the per-phase expressions (e.g. partial `count` → final `sum`,
  * partial `sum` → final `sum`, partial `min` → final `min`).
  */
object Salted {

  /** @param partialAggs aggregations applied per (keys, salt)
    * @param finalAggs re-aggregations applied per keys over the
    *                  partial results (referencing partial aliases)
    */
  def aggregateSkewed(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
