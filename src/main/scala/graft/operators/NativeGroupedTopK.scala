package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.graft.InternalBridge

import graft.plans.{GroupedTopKNode, GroupedTopKStrategy}

/** Public API over the native grouped top-k physical operator
  * (graft.plans.GroupedTopKPlan): first k rows per group under the
  * given column ordering, executed as bounded per-group heaps on both
  * sides of one hash exchange — never a per-group sort, and the
  * map-side partial prunes the shuffle to ≤ k rows per (partition,
  * group).
  *
  * The ordering should be total (include a unique tiebreak column)
  * for deterministic output. Output columns = input columns, best
  * row first within each group.
  */
object NativeGroupedTopK {

  /** @param orderBy (column, ascending?) pairs, highest priority first */
  def topK(
      df: DataFrame,
      groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(n: String) = analyzed.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val ordering = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending) }
    InternalBridge.ofRows(spark,
      GroupedTopKNode(groupCols.map(attr), ordering, k, analyzed))
  }
}
