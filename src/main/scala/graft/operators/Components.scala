package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation with pointer
  * doubling — the distributed union-find used to collapse
  * near-duplicate candidate pairs (LSH output) into dedup clusters.
  *
  * Each round every node takes the minimum label among itself and its
  * neighbors (propagation), then replaces its label with its label's
  * label (the pointer-doubling shortcut: labels are node ids, so
  * `label(label(u))` is defined). Propagation alone converges in
  * O(component diameter) rounds; the shortcut roughly doubles the
  * propagated distance each round, giving O(log diameter) — a
  * 200-node path graph converges in ~9 rounds instead of ~200
  * (pinned by ComponentsAsOfSpec). Each round is two equi-joins + one
  * aggregation, all shuffling on the node id, so the partitioning is
  * reused across rounds. `localCheckpoint` truncates lineage per
  * round (same plan-growth control as `Closure`).
  */
object Components {

  /** @param edges undirected edges as (`aCol`, `bCol`) rows
    * @param maxIterations convergence bound: covers any component of
    *        diameter ≲ 2^maxIterations (pointer doubling), so the
    *        default 32 is effectively unbounded; the `require` below
    *        only guards against a logic regression
    * @return (node, component) — component = min node id reachable
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIterations: Int = 32): DataFrame = {
    val sym = edges.select(col(aCol).as("x"), col(bCol).as("y"))
      .union(edges.select(col(bCol).as("x"), col(aCol).as("y")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("x").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()

    // Labels only ever decrease, so for NUMERIC node ids the exact
    // (decimal, overflow-free) sum of all labels strictly decreases
    // until the fixpoint — a one-scalar aggregation per round replaces
    // a join-based changed-rows check. For non-numeric ids (string doc
    // ids) the cast would yield null and declare convergence after one
    // round, so those fall back to the changed-rows check.
    val numericIds =
      edges.schema(aCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
      edges.schema(bCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]

    def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("component").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)))
        .head.getDecimal(0)

    def anyLabelChanged(prev: DataFrame, next: DataFrame): Boolean =
      !next.join(prev.select(col("node"), col("component").as("__prev")), "node")
        .filter(col("component") =!= col("__prev"))
        .isEmpty

    var prevSum = if (numericIds) labelSum(labels) else null
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "y"), "y")
        .select(col("x").as("node"), col("component"))
      val propagated = labels.union(viaNeighbors)
        .groupBy("node").agg(min("component").as("component"))
      // Pointer-doubling shortcut: component := label(component).
      // Labels are node ids, so the lookup is a self-join; the
      // coalesce is only for safety (every label is a node).
      val next = propagated
        .join(propagated.select(col("node").as("__c"),
          col("component").as("__cc")), col("component") === col("__c"), "left")
        .select(col("node"),
          coalesce(col("__cc"), col("component")).as("component"))
        .localCheckpoint()
      if (numericIds) {
        val nextSum = labelSum(next)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
      } else {
        converged = !anyLabelChanged(labels, next)
      }
      labels = next
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIterations iterations")
    labels
  }
}
