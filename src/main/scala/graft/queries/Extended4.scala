package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.GlobalRank

/** Fourth extension batch (round 3): exact global ranking at scale via
  * `GlobalRank` (range-repartition + per-partition offsets), and the
  * two reference-implied index lookups over the ETL layout (symbol
  * search, ordered exon-of-gene retrieval) — see EtlQueries for the
  * fixture-based ETL queries themselves.
  */
object Extended4 {

  val queries: Map[String, Q] = Map(
    // ---- exact global rank without a global window: the scale path
    // promised at q69 — one range shuffle + per-partition offsets; a
    // partition-less row_number() over the same data would serialize
    // the whole table through one task -------------------------------
    "q89_global_rank" -> Q(
      impl = (s, d) => {
        val orders = Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        GlobalRank.withRank(orders,
            Seq(col("o_totalprice"), col("o_orderkey")), "rank")
          .select(col("o_orderkey"), col("o_totalprice"), col("rank"))
          .orderBy("rank")
      },
      oracle = Some("""
        SELECT o_orderkey, o_totalprice,
               CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                 AS BIGINT) AS rank
        FROM orders ORDER BY rank"""))
  )
}
