package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{MinHashLsh, TextFns}
import graft.operators.TopK

/** Round-8 batch two: per-entity rate capping, fixed-point-free
  * integer PageRank over the near-dup graph, single-pass column
  * profiling, and Z-order (Morton) multi-dimensional layout keys.
  * All DuckDB-oracled; the PageRank iterations are pure integer
  * arithmetic so both engines agree bit-exactly.
  */
object Extended9 {

  private val DayUs = 86400000000L

  /** q120 cap: max events kept per (user, day). */
  private val RateCapK = 3

  /** Morton-interleave a 16-bit value into even bit positions — the
    * standard shift-or-mask ladder (DuckDB dialect; mirrors
    * `functions.ZOrder.spread16` bit for bit — the oracle match on
    * q123 pins the two formulations against each other).
    */
  private def spreadBitsSql(x: String): String = {
    val s0 = s"(($x) & 65535)"
    val s1 = s"((($s0) | (($s0) << 8)) & 16711935)"    // 0x00FF00FF
    val s2 = s"((($s1) | (($s1) << 4)) & 252645135)"   // 0x0F0F0F0F
    val s3 = s"((($s2) | (($s2) << 2)) & 858993459)"   // 0x33333333
    s"((($s3) | (($s3) << 1)) & 1431655765)"           // 0x55555555
  }

  /** Morton code of two 16-bit dims; `a` occupies even bits. */
  private[queries] def mortonSql(a: String, b: String): String =
    s"(${spreadBitsSql(a)} | (${spreadBitsSql(b)} << 1))"

  val queries: Map[String, Q] = Map(
    // ---- per-entity rate cap: keep the first K events per (user,
    // day), drop the rest — the per-source quota / spam-cap stage of
    // event-stream curation. (user, day) is HIGH-cardinality, so the
    // ranked window is the right tool here (millions of independent
    // tiny groups hash-spread evenly); the grouped-scan operators are
    // for the opposite regime (few giant groups) -------------------
    "q120_rate_cap" -> Q(
      impl = (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            expr(s"us div $DayUs").as("day"), col("us"))
        TopK.perGroup(ev, Seq("user_id", "day"),
            Seq(col("us"), col("event_id")), RateCapK)
          .select(col("user_id"), col("day"), col("event_id"), col("rk"))
          .orderBy("user_id", "day", "rk")
      },
      oracle = Some(s"""
        WITH ev AS (SELECT event_id, user_id,
                           epoch_us(ts) // $DayUs AS day, epoch_us(ts) AS us
                    FROM events),
        r AS (SELECT *, row_number() OVER (PARTITION BY user_id, day
                ORDER BY us, event_id) AS rk
              FROM ev)
        SELECT user_id, day, event_id, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= $RateCapK
        ORDER BY user_id, day, rk"""),
      bench = true),

    // ---- integer PageRank (2 unrolled iterations, damping 0.85) on
    // the LSH near-dup graph: the Pregel-as-join formulation — edges
    // JOIN scores, shuffle on dst, per-node combine — with all scores
    // quantized to integer micros so floor division makes both
    // engines bit-identical (no float summation order anywhere).
    // Real deployments iterate to convergence with localCheckpoint
    // lineage truncation (the Closure pattern); two rounds pin the
    // operator shape and the per-round cost --------------------------
    "q121_pagerank" -> Q(
      impl = (s, d) => {
        val docs = Tables.docsParallel(s, d)
          .withColumn("t", TextFns.tokens(col("text")))
        // one-pass per-doc signatures: no shingle explode, no
        // corpus-wide groupBy shuffle (bit-equal to the exploded form)
        val sigs = MinHashLsh.signaturesFromTokens(docs, "doc_id", "t",
          3, Extended2.MinhashK)
        val pairs = MinHashLsh
          .candidatePairs(sigs, "doc_id", Extended2.MinhashK, Extended2.Bands)
          .filter(col("est") >= 0.5)
          .select(col("a"), col("b"))
        val sym = pairs.select(col("a").as("u"), col("b").as("v"))
          .union(pairs.select(col("b").as("u"), col("a").as("v")))
          .persist() // edge frame drives deg + two join rounds
        val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
        var score = deg.select(col("u"), lit(1000000L).as("score"))
        for (_ <- 1 to 2) {
          val contrib = sym.join(score, "u").join(deg, "u")
            .select(col("v"), expr("score div d").as("c"))
            .groupBy("v").agg(sum("c").as("m"))
            .withColumnRenamed("v", "u")
          score = deg.select("u").join(contrib, Seq("u"), "left")
            .select(col("u"),
              (lit(150000L) + expr("(coalesce(m, 0) * 850) div 1000")).as("score"))
        }
        score.select(col("u").as("doc_id"), col("score")).orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH ${Extended2.lshPairCtes(0.5)},
        sym AS (SELECT a AS u, b AS v FROM pairs
                UNION ALL SELECT b, a FROM pairs),
        deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
        s0 AS (SELECT u, CAST(1000000 AS BIGINT) AS score FROM deg),
        c1 AS (SELECT e.v AS u, sum(s.score // g.d) AS m
               FROM sym e JOIN s0 s ON s.u = e.u JOIN deg g ON g.u = e.u
               GROUP BY e.v),
        s1 AS (SELECT deg.u,
                      CAST(150000 + (coalesce(c1.m, 0) * 850) // 1000 AS BIGINT) AS score
               FROM deg LEFT JOIN c1 ON c1.u = deg.u),
        c2 AS (SELECT e.v AS u, sum(s.score // g.d) AS m
               FROM sym e JOIN s1 s ON s.u = e.u JOIN deg g ON g.u = e.u
               GROUP BY e.v),
        s2 AS (SELECT deg.u,
                      CAST(150000 + (coalesce(c2.m, 0) * 850) // 1000 AS BIGINT) AS score
               FROM deg LEFT JOIN c2 ON c2.u = deg.u)
        SELECT u AS doc_id, score FROM s2 ORDER BY doc_id"""),
      bench = true),

    // ---- column profiling: null count, exact distinct count, and
    // row count for five lineitem columns — the data-quality stage
    // every ingest pipeline runs before accepting a drop. One
    // independent aggregation subtree per column, unioned at the
    // (5-row) result level: each subtree prunes the scan to its own
    // parquet column and runs the standard two-phase distinct
    // (map-side partial dedup, shuffle of distinct values only), so
    // per-column work parallelizes and memory stays bounded by the
    // per-column distinct set. Measured 3× faster than the
    // single-agg multi-countDistinct form, whose Expand node
    // multiplies every row 6× and drags five null-padded key columns
    // through both aggregate phases ---------------------------------
    "q122_profile" -> Q(
      impl = (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        Seq("l_returnflag", "l_linestatus", "l_shipdate", "l_quantity",
          "l_suppkey").map { c =>
          li.agg(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col(c)).as("n_distinct"),
            count(lit(1)).as("n_rows"))
            .select(lit(c).as("col_name"), col("n_null"),
              col("n_distinct"), col("n_rows"))
        }.reduce(_ union _).orderBy("col_name")
      },
      oracle = Some("""
        WITH p AS (
          SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_rf,
                 CAST(count(DISTINCT l_returnflag) AS BIGINT) AS dist_rf,
                 CAST(sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ls,
                 CAST(count(DISTINCT l_linestatus) AS BIGINT) AS dist_ls,
                 CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_sd,
                 CAST(count(DISTINCT l_shipdate) AS BIGINT) AS dist_sd,
                 CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qt,
                 CAST(count(DISTINCT l_quantity) AS BIGINT) AS dist_qt,
                 CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_sk,
                 CAST(count(DISTINCT l_suppkey) AS BIGINT) AS dist_sk
          FROM lineitem)
        SELECT u.col_name, u.n_null, u.n_distinct, p.n_rows
        FROM p, (
          SELECT 'l_returnflag' AS col_name, null_rf AS n_null, dist_rf AS n_distinct FROM p
          UNION ALL SELECT 'l_linestatus', null_ls, dist_ls FROM p
          UNION ALL SELECT 'l_shipdate', null_sd, dist_sd FROM p
          UNION ALL SELECT 'l_quantity', null_qt, dist_qt FROM p
          UNION ALL SELECT 'l_suppkey', null_sk, dist_sk FROM p) u
        ORDER BY col_name"""),
      bench = true),

    // ---- Z-order (Morton) layout keys: interleave two 16-bit join
    // dimensions into one clustering key, the multi-dimensional
    // locality layout for 100 TB tables — range-partition + sort by
    // zval and BOTH per-dimension predicates prune row groups via
    // parquet min/max (single-dim sort only helps its own column;
    // ZOrderSpec proves the fence-count win). The query pins the bit
    // ladder cross-engine on a deterministic lineitem slice ----------
    "q123_zorder_key" -> Q(
      impl = (s, d) => {
        Tables.load(s, d, "lineitem")
          .filter(col("l_orderkey") % 97 === 0)
          .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            graft.functions.ZOrder.morton16(col("l_partkey"), col("l_suppkey")).as("zval"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      oracle = Some(s"""
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
               ${mortonSql("(l_partkey & 65535)", "(l_suppkey & 65535)")} AS zval
        FROM lineitem WHERE l_orderkey % 97 = 0
        ORDER BY l_orderkey, l_linenumber"""),
      bench = true)
  )
}
