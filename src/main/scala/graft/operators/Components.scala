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
    * @param localThreshold edge sets at or below this row count are
    *        solved driver-side (one bounded collect + in-heap
    *        union-find, then re-parallelized) — same size-tiering as
    *        `Closure`. Near-dup pair graphs at dedup thresholds are
    *        tiny next to the corpus that produced them, and the
    *        distributed fixpoint pays O(log diameter) rounds of
    *        two-joins-plus-agg scheduling latency that dwarf the work
    *        at that size. The probe is an incremental `take(n+1)` that
    *        doubles as the collect when the set fits, so a huge
    *        pair set is never scanned past the cap; unlike closure,
    *        components output is bounded by the input (≤ 2·|edges|
    *        nodes), so no separate output cap is needed. Set 0 to
    *        force the distributed path.
    * @return (node, component) — component = min node id reachable
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIterations: Int = 32,
      localThreshold: Int = 200000): DataFrame = {
    val e0 = edges.select(col(aCol).as("x"), col(bCol).as("y"))
    if (localThreshold > 0) {
      // ONE incremental take replaces the former limit(n+1).count()
      // probe + full collect pair, which executed the whole upstream
      // pair dataflow (LSH band join + distinct) twice per call —
      // take(n+1) returning ≤ n rows IS the full edge set, handed
      // straight to the union-find (r21; probe-only cost above the cap
      // is unchanged: take stops at n+1 rows)
      val head = e0.take(localThreshold + 1)
      if (head.length <= localThreshold) {
        localComponents(e0, head) match {
          case Some(labeled) => return labeled
          case None => // null endpoints — defer to the distributed path
        }
      }
    }
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

  /** Metadata-tier components: the edge set fits on the driver
    * (caller-bounded probe), so run union-find with path compression
    * in one heap and re-parallelize the labeling. Labels are min node
    * ids under the natural ordering — identical to the distributed
    * `min("component")` for the numeric/string id types the engine
    * uses. Returns None on null endpoints: their semantics are defined
    * by the distributed path's SQL joins (null never matches, but null
    * nodes keep a row), and the fallback keeps that single source of
    * truth instead of re-implementing it.
    */
  private def localComponents(e0: DataFrame,
      collected: Array[org.apache.spark.sql.Row]): Option[DataFrame] = {
    val spark = e0.sparkSession
    val pairs = collected.map(r => (r.get(0), r.get(1)))
    if (pairs.exists { case (a, b) => a == null || b == null }) return None

    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent(c) = r; c = nxt
      }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    @inline def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    val minOfRoot = scala.collection.mutable.HashMap.empty[Any, Any]
    parent.keys.foreach { n =>
      val r = find(n)
      minOfRoot.get(r) match {
        case Some(m) => if (lt(n, m)) minOfRoot(r) = n
        case None => minOfRoot(r) = n
      }
    }
    val dt = e0.schema("x").dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", dt, nullable = true),
      org.apache.spark.sql.types.StructField("component", dt, nullable = true)))
    val rows = parent.keys.toSeq.map(n =>
      org.apache.spark.sql.Row(n, minOfRoot(find(n))))
    Some(spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(rows.size / 10000, 32))), schema))
  }
}
