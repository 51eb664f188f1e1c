package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup / upsert semantics of the reference's three SQLite conflict
  * modes (SURVEY.md §2.6; reference `import_synteny_blocks.py:83`,
  * `import_homologs.py:114`, `import_genes_exons.py:120-126`,
  * `import_features.py:203-211`).
  *
  * D1/D3 run as ONE hash aggregation — `min`/`max` of a
  * `struct(ord…, full row)` per key — instead of the former
  * exchange + per-partition sort + row_number window (r21, guide
  * §2.3 "aggregate before you shuffle"): the partial aggregate
  * combines map-side, so the shuffle carries at most one row per
  * (map task, key) rather than every input row, and the sort is gone
  * entirely. Struct comparison is lexicographic by field with nulls
  * ordered first — exactly `ORDER BY … ASC NULLS FIRST` under `min`
  * and `ORDER BY … DESC NULLS LAST` under `max`, Spark's window
  * defaults, so winners are identical to the window form wherever the
  * ordering keys are unique per key group; on full ties the pick is
  * deterministic (whole-row extremum) where the window's was
  * scan-order-dependent. AQE handles skewed key groups.
  */
object Dedup {

  /** D1 — `INSERT OR REPLACE`: last write (by `ord`) wins per key. */
  def lastWins(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame =
    pick(df, keys, ord, useMax = true)

  /** D3 — `INSERT`-and-skip-dup: first write (by `ord`) wins per key. */
  def keepFirst(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame =
    pick(df, keys, ord, useMax = false)

  private def pick(df: DataFrame, keys: Seq[String], ord: Seq[Column],
      useMax: Boolean): DataFrame = {
    val ordered = struct(
      ord.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+
        struct(df.columns.map(col): _*).as("__row"): _*)
    df.groupBy(keys.map(col): _*)
      .agg((if (useMax) max(ordered) else min(ordered)).as("__pick"))
      .select(df.columns.map(c => col(s"__pick.__row.`$c`").as(c)): _*)
  }

  /** D2 — plain `INSERT` with PK: any duplicate key aborts the load
    * (reference rolls back the whole file transaction). Implemented
    * as an in-plan guard: a per-key window count feeds `assert_true`,
    * so the job fails at materialization time — the Spark analog of
    * "the transaction aborts" — without an extra eager driver action.
    */
  def assertNoDuplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__dupcnt", count(lit(1)).over(w))
      .withColumn("__dupchk", assert_true(col("__dupcnt") === 1,
        concat(lit(s"duplicate primary key on (${keys.mkString(",")}): "),
          concat_ws(",", keys.map(c => col(c).cast("string")): _*))))
      .filter(col("__dupchk").isNull)
      .drop("__dupcnt", "__dupchk")
  }
}
