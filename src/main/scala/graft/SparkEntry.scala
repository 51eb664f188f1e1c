package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query lives in `graft.queries.Registry` as a Spark
  * implementation plus (where ANSI-SQL-expressible) a DuckDB oracle
  * over the same parquet tables, with identical column names/aliases
  * in both (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.all("q02_join_agg").impl(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.view.mapValues(_.impl).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Registry.all.collect {
      case (name, q) if q.oracle.isDefined =>
        name -> flat(q.oracle.get)
    }

  /** Full oracle map for a concrete data dir: the static SQL plus the
    * data-dependent-but-deterministic generated oracles (ANN queries
    * embed their trained codebooks as literals — see `Q.oracleGen`).
    * `Verify` dumps THIS map so the ANN trio hash-checks too.
    */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] =
    oracleSql ++ Registry.all.collect {
      case (name, q) if q.oracleGen.isDefined =>
        name -> flat(q.oracleGen.get(spark, sfDir))
    }

  private def flat(sql: String): String =
    sql.linesIterator.map(_.trim).mkString(" ").trim
}
