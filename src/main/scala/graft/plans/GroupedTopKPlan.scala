package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Logical marker for "keep the first k rows per group under
  * `ordering`" — the whole-operator Catalyst path (SURVEY §4.3 /
  * builder option (c)): a custom logical node, planned by
  * `GroupedTopKStrategy` into a PARTIAL + FINAL pair of physical
  * operators exactly like partial/final aggregation.
  *
  * Why a native operator instead of a window: `row_number() OVER
  * (PARTITION BY g ORDER BY o)` plans as Exchange → full SORT of
  * every group's rows → filter rank ≤ k. The native operator keeps a
  * bounded k-row heap per group on both sides of the exchange —
  * O(groups · k) memory, no sort, and the partial side prunes each
  * map partition to ≤ k rows per group BEFORE the shuffle (top-k is a
  * semilattice: global top-k ⊆ union of per-partition top-k), so the
  * exchange moves O(partitions · groups · k) rows instead of the
  * whole table. The caller's ordering should be a total order (add a
  * unique id tiebreak) for deterministic results.
  *
  * Memory envelope: each task holds O(distinct groups in its
  * partition · k) rows — the same order as a hash aggregate's map,
  * but WITHOUT spill support. For pathological group-cardinality ×
  * large-k workloads prefer the aggregation-based grouped top-k
  * (`operators` GroupedTopK family), which rides Spark's spilling
  * aggregation machinery.
  */
final case class GroupedTopKNode(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKNode =
    copy(child = newChild)
}

/** Physical per-partition bounded-heap top-k. `partial = true` runs
  * map-side with no distribution requirement; `partial = false`
  * requires clustering on the group keys (Spark inserts the hash
  * exchange), so each group's surviving candidates meet in one
  * partition for the exact final cut.
  */
final case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def nodeName: String =
    if (partial) "GroupedTopKPartial" else "GroupedTopKFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprsB = groupExprs
    val orderingB = ordering
    val childOutput = child.output
    val kB = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprsB, childOutput)
      val cmp = RowOrdering.create(orderingB, childOutput)
      // per group: a max-heap under `cmp` of the kept rows, so the
      // worst kept row is at the head and evicts in O(log k)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[UnsafeRow](
            cmp.on[UnsafeRow](identity)))
        if (heap.size < kB) {
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (cmp.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      // emit each group's survivors best-first (ascending under cmp)
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}
