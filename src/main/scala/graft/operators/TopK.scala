package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k (SURVEY.md §2.10 "sort / limit / top-k"): ranked
  * window + filter. Catalyst executes this as one hash shuffle on the
  * group keys followed by an in-partition sort; with AQE, skewed groups
  * are split. For global top-k prefer `orderBy(...).limit(k)`, which
  * Spark runs as per-partition partial top-k + single-reduce merge —
  * no full sort at scale.
  */
object TopK {

  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      order: Seq[Column],
      k: Int,
      rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }
}
