package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key partial-aggregate
  * state table (count / quantized sum / min / max) that absorbs append
  * batches by MERGING partials — the store-side pattern that turns
  * "nightly full rescan of 100 TB" into "merge today's delta".
  *
  * Exactness contract: the summed measure is quantized to long
  * micro-units at `init`, so merge order can never change a bit
  * (long addition is associative/commutative); min/max/count merge
  * trivially. `finalize` derives avg via integer division. This is
  * the same mergeable-summary discipline as the Misra–Gries and bloom
  * operators: state size is O(|keys|), independent of batch count.
  *
  * Every step is a plain hash aggregation on the key — partial
  * (map-side) + final, one shuffle per call; a merge of K states
  * unions K O(|keys|) tables, not the underlying data.
  */
object IncrementalAgg {

  /** Build the partial state for one batch: one hash agg on `keys`. */
  def init(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val vMicro: Column =
      expr(s"CAST(round($valueCol * 1000000) AS BIGINT)")
    batch.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(vMicro).as("sum_micro"),
      min(vMicro).as("min_micro"),
      max(vMicro).as("max_micro"))
  }

  /** Merge any number of state tables into one (associative). */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge of zero states")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(
        sum("n").as("n"),
        sum("sum_micro").as("sum_micro"),
        min("min_micro").as("min_micro"),
        max("max_micro").as("max_micro"))
  }

  /** Derive the presentable aggregate from a state table. */
  def finalize(state: DataFrame): DataFrame =
    state.select(
      state.columns.filterNot(
        Set("n", "sum_micro", "min_micro", "max_micro")).map(col) ++ Seq(
        col("n"),
        col("sum_micro"),
        expr("sum_micro div n").as("avg_micro"),
        col("min_micro"),
        col("max_micro")): _*)
}
