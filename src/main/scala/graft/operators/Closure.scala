package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed transitive closure (SURVEY.md §2.8 A1): the reference
  * materializes the full ancestor→descendant closure of the ontology
  * `is_a` DAG in one Python heap (`import_ontology.py:97-145`). Here it
  * is a driver-coordinated *semi-naive* fixpoint: each iteration joins
  * only the newest frontier against the edge set, so work per round is
  * O(|new pairs|), not O(|closure|). `localCheckpoint` truncates
  * lineage so the plan doesn't grow with depth; iterations converge in
  * O(graph depth) rounds.
  *
  * At scale: `edges` is usually dimension-sized (ontology ≈ 10^5 rows)
  * — broadcast it so every round is a broadcast join with no shuffle of
  * the growing closure.
  */
object Closure {

  /** @param edges DataFrame with direct-edge columns (`parentCol`, `childCol`)
    * @return closure as (`ancestor`, `descendant`) — all transitive pairs
    */
  def transitiveClosure(
      edges: DataFrame,
      parentCol: String = "parent",
      childCol: String = "child",
      broadcastEdges: Boolean = true,
      maxIterations: Int = 64): DataFrame = {
    val e0 = edges.select(col(parentCol).as("parent"), col(childCol).as("child"))
    val e = if (broadcastEdges) broadcast(e0) else e0

    val base = e0
      .select(col("parent").as("ancestor"), col("child").as("descendant"))
      .distinct()
      .localCheckpoint()
    // Accumulate checkpointed frontier frames; the anti-join target is
    // their (lazy) union — each frame is already materialized, so the
    // union is shallow and the whole closure is never re-materialized
    // per round (one job per iteration instead of three).
    var frames = List(base)
    var frontier = base
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      val sofar = frames.reduce(_ union _)
      val next = frontier
        .join(e, frontier("descendant") === e("parent"))
        .select(frontier("ancestor"), e("child").as("descendant"))
        .distinct()
        .join(sofar, Seq("ancestor", "descendant"), "left_anti")
        .localCheckpoint()
      if (next.isEmpty) converged = true
      else {
        frames ::= next
        frontier = next
      }
      iter += 1
    }
    require(converged, s"transitiveClosure did not converge in $maxIterations iterations")
    frames.reduce(_ union _)
  }

  /** A2 — per-ancestor distinct transitive descendant counts
    * (reference `import_ontology.py:141-145`).
    */
  def descendantCounts(closure: DataFrame): DataFrame =
    closure.groupBy("ancestor").agg(count("*").as("n_descendants"))
}
