package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Exact global ranking at scale: range-repartition + per-partition
  * offsets — the scale path a partition-less `row_number()` window
  * cannot take (a global window funnels the entire input through one
  * task; see q69's scaladoc).
  *
  * Shape: one range shuffle (`repartitionByRange` samples boundaries
  * so partitions are balanced), an in-partition sort, one lightweight
  * per-partition count job, then a single streaming pass that adds
  * `offset(partition) + local position`. No global sort on one task,
  * no second full-data shuffle (a `Window.partitionBy(partition_id)`
  * formulation would add a hash exchange of the whole input).
  *
  * Determinism: ranks are reproducible iff `sortCols` is a total order
  * (include a tiebreaker key). Spark's RangePartitioner sends all rows
  * equal to a boundary key to the same partition, so ties never split
  * across partitions.
  */
object GlobalRank {

  /** Append a 1-based exact global rank by `sortCols`.
    *
    * @param numPartitions range partitions (defaults to the session's
    *                      shuffle parallelism)
    */
  def withRank(df: DataFrame, sortCols: Seq[Column], rankCol: String = "rank",
      numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val ranged = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // Both the count job and the ranking pass consume the SAME RDD
    // value, so the range shuffle's map output is written once and its
    // stage skipped on the second job — no persist() (which would leak
    // cached blocks to library callers and cannot fit 100 TB anyway).
    val rangedRdd = ranged.rdd
    val sizes = rangedRdd
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect().toMap
    val numParts = sizes.keys.foldLeft(0)(math.max) + 1
    val offsets = new Array[Long](numParts)
    var acc = 0L
    var i = 0
    while (i < numParts) { offsets(i) = acc; acc += sizes.getOrElse(i, 0L); i += 1 }
    val schema = ranged.schema.add(rankCol, LongType, nullable = false)
    val ranked = rangedRdd.mapPartitionsWithIndex { case (p, it) =>
      var r = offsets(p)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    spark.createDataFrame(ranked, schema)
  }
}
