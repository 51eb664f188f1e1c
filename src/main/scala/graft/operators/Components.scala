package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * distributed union-find used to collapse near-duplicate candidate
  * pairs (LSH output) into dedup clusters.
  *
  * Each round every node takes the minimum label among itself and its
  * neighbors; convergence in O(component diameter) rounds. Each round
  * is one equi-join + one aggregation — both shuffles on the node id,
  * so the partitioning is reused across rounds. `localCheckpoint`
  * truncates lineage per round (same plan-growth control as
  * `Closure`). For graphs with giant components the classic
  * large-star/small-star contraction halves the rounds, but LSH
  * near-dup clusters are shallow (duplicates of one document), where
  * plain propagation already converges in 2–3 rounds.
  */
object Components {

  /** @param edges undirected edges as (`aCol`, `bCol`) rows
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
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "y"), "y")
        .select(col("x").as("node"), col("component"))
      val next = labels.union(viaNeighbors)
        .groupBy("node").agg(min("component").as("component"))
        .localCheckpoint()
      // Min-propagation is monotone: converged iff no label shrank.
      converged = next
        .join(labels.withColumnRenamed("component", "__old"), Seq("node"))
        .filter(col("component") =!= col("__old"))
        .isEmpty
      labels = next
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIterations iterations")
    labels
  }
}
