package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup / upsert semantics of the reference's three SQLite conflict
  * modes (SURVEY.md §2.6; reference `import_synteny_blocks.py:83`,
  * `import_homologs.py:114`, `import_genes_exons.py:120-126`,
  * `import_features.py:203-211`).
  *
  * All three are a single hash-partition shuffle on the key columns; at
  * 100 TB the window variant is preferred over `dropDuplicates` when an
  * explicit ordering must win, because `dropDuplicates` keeps an
  * arbitrary row. AQE handles skewed key groups.
  */
object Dedup {

  /** D1 — `INSERT OR REPLACE`: last write (by `ord`) wins per key. */
  def lastWins(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame =
    pick(df, keys, ord.map(_.desc))

  /** D3 — `INSERT`-and-skip-dup: first write (by `ord`) wins per key. */
  def keepFirst(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame =
    pick(df, keys, ord.map(_.asc))

  private def pick(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
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
