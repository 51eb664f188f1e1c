package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Symmetric-relation materialization (SURVEY.md §2.7 U1/U2): the
  * reference stores both directions of inherently symmetric pairs
  * (`import_synteny_blocks.py:100-115`, `import_homologs.py:134-141`)
  * so lookups never need OR-predicates. 2× storage for shuffle-free,
  * direction-free reads — the right trade at scale too.
  *
  * `union` of a projection is narrow (no shuffle); dedup, when wanted,
  * is the caller's explicit `distinct()`.
  */
object Symmetrize {

  /** Append a copy of `df` with each (a,b) column pair swapped. */
  def symmetrize(df: DataFrame, swaps: Seq[(String, String)]): DataFrame = {
    val swapMap = swaps.flatMap { case (a, b) => Seq(a -> b, b -> a) }.toMap
    val swapped = df.select(df.columns.toSeq.map(c => col(swapMap.getOrElse(c, c)).as(c)): _*)
    df.unionByName(swapped)
  }
}
