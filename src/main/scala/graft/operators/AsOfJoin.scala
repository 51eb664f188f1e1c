package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row at or
  * before the left row's time, per key.
  *
  * Implemented with the union + carry-forward-window formulation
  * rather than a range join: tag both inputs, union them, and within
  * each key partition ordered by (time, tag) carry the last-seen
  * right payload forward with `last(..., ignoreNulls)`. One shuffle on
  * the key, one in-partition sort — O(n log n) per key and no
  * candidate blow-up, which is what makes it hold at 100 TB where a
  * naive `r.time <= l.time` range join would be quadratic per key.
  * Right rows at exactly the left row's timestamp sort first (tag 0
  * before tag 1), so the match is inclusive (>=), matching DuckDB's
  * ASOF JOIN semantics.
  */
object AsOfJoin {

  /** @param leftDf rows to enrich; must contain `keys` + `lTime`
    * @param rightDf lookup stream; must contain `keys` + `rTime`
    * @param payloadCols rightDf columns carried to matched left rows
    *                    in the `asof_match` struct, keeping their
    *                    native types
    * @return left rows that have a match, plus `asof_match` struct
    */
  def lastBefore(
      leftDf: DataFrame,
      rightDf: DataFrame,
      keys: Seq[String],
      lTime: String,
      rTime: String,
      payloadCols: Seq[String]): DataFrame =
    asOf(leftDf, rightDf, keys, lTime, rTime, payloadCols, forward = false)

  /** Forward as-of: for each left row, the *earliest* right row at or
    * after the left row's time, per key. Same carry-forward window as
    * `lastBefore` but traversed in descending time order, so the
    * carried value is the smallest right time ≥ the left time.
    */
  def firstAfter(
      leftDf: DataFrame,
      rightDf: DataFrame,
      keys: Seq[String],
      lTime: String,
      rTime: String,
      payloadCols: Seq[String]): DataFrame =
    asOf(leftDf, rightDf, keys, lTime, rTime, payloadCols, forward = true)

  private def asOf(
      leftDf: DataFrame,
      rightDf: DataFrame,
      keys: Seq[String],
      lTime: String,
      rTime: String,
      payloadCols: Seq[String],
      forward: Boolean): DataFrame = {
    val keyCols = keys.map(col)
    val lExtra = leftDf.columns.filterNot(c => keys.contains(c) || c == lTime).toSeq
    // Payload struct keeps the right side's native column types — no
    // stringification, nothing for the caller to cast back.
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => rightDf.schema(c)))

    val lAligned = leftDf.select(
      keyCols ++ Seq(col(lTime).cast("long").as("__t"), lit(1).as("__tag"),
        lit(null).cast(payloadType).as("__payload")) ++ lExtra.map(col): _*)
    val rAligned = rightDf.select(
      keyCols ++ Seq(col(rTime).cast("long").as("__t"), lit(0).as("__tag"),
        struct(payloadCols.map(c => col(c).as(c)): _*).as("__payload"))
        ++ lExtra.map(c => lit(null).cast(leftDf.schema(c).dataType).as(c)): _*)

    // Backward: ascending time, right rows (tag 0) before left rows at
    // equal time → inclusive >=. Forward: descending time; at equal
    // time tag still ascends, so right rows are seen first → inclusive
    // <=.
    val timeOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(timeOrder, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lAligned.unionByName(rAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1 && col("__match").isNotNull)
      .select(keyCols ++ Seq(col("__t").as(lTime)) ++ lExtra.map(col)
        :+ col("__match").as("asof_match"): _*)
  }
}
