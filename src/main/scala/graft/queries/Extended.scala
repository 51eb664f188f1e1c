package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsOfJoin
import graft.streaming.EventStream

/** Extended operator coverage: as-of join, JSON extraction, pivot,
  * datetime functions, frame-based running windows, and stateful
  * streaming sessionization.
  */
object Extended {

  private val DayUs = 86400000000L
  // q53 banded-LSH geometry: 16 hyperplanes in 4 bands of 4 bits.
  private val NearDupBands = 4
  private val NearDupPlanesPerBand = 4
  private val EmbDim = 64

  /** Quantized-vector CTEs for the near-dup oracle (same construction
    * as VectorQueries).
    */
  private def quantCtesForDup: String = s"""
        f AS (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings),
        qv AS (SELECT vec_id, i,
                      CAST(round(CAST(x AS DOUBLE) * ${graft.functions.VecFns.Scale}) AS BIGINT) AS e
               FROM f),
        norms AS (SELECT vec_id, CAST(sum(e * e) AS BIGINT) AS nsq
                  FROM qv GROUP BY vec_id)"""

  val queries: Map[String, Q] = Map(
    // ---- as-of join: last prior click before each purchase ---------
    "q34_asof_join" -> Q(
      impl = (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"), col("us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("cid"), col("us").as("cus"))
        AsOfJoin.lastBefore(purchases, clicks, Seq("user_id"),
            lTime = "us", rTime = "cus", payloadCols = Seq("cid", "cus"))
          .select(
            col("pid"),
            col("asof_match.cid").as("cid"),
            (col("us") - col("asof_match.cus")).as("gap_us"))
          .orderBy("pid")
      },
      oracle = Some("""
        WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS pus
                   FROM events WHERE event_type = 'purchase'),
             c AS (SELECT event_id AS cid, user_id AS cu, epoch_us(ts) AS cus
                   FROM events WHERE event_type = 'click')
        SELECT pid, cid, pus - cus AS gap_us
        FROM p ASOF JOIN c ON p.user_id = c.cu AND p.pus >= c.cus
        ORDER BY pid"""),
      bench = true),

    // ---- JSON extraction from the props column ---------------------
    "q35_json_extract" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
            min("k").as("min_k"), max("k").as("max_k"))
          .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
               CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- pivot: per-day event-type count matrix --------------------
    "q36_pivot" -> Q(
      impl = (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val pivoted = Tables.events(s, d)
          .withColumn("day", expr(s"us div $DayUs"))
          .groupBy("day")
          .pivot("event_type", types)
          .count()
        // pivot yields null for absent combinations; the oracle's
        // FILTER-aggregation yields 0 — align on 0.
        pivoted.select(
            col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("day")
      },
      oracle = Some(s"""
        SELECT (epoch_us(ts) // $DayUs) AS day,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
               CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
        FROM events GROUP BY 1 ORDER BY day""")),

    // ---- datetime scalar functions ---------------------------------
    "q37_datetime" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "orders")
          .groupBy(
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"))
          .agg(count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("total"))
          .orderBy("y", "m"),
      oracle = Some("""
        SELECT CAST(year(o_orderdate) AS INT) AS y,
               CAST(month(o_orderdate) AS INT) AS m,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY 1, 2 ORDER BY y, m""")),

    // ---- frame-based running window (exact integer running sum).
    // l_quantity is the last ORDER BY key because the harness data
    // contains duplicated (suppkey, shipdate, orderkey, linenumber)
    // rows with different quantities — without it the window order is
    // not total and each engine picks its own prefix-sum order for
    // the tied pair ---------------------------------------------------
    "q38_window_running" -> Q(
      impl = (s, d) => {
        val orderCols = Seq("l_shipdate", "l_orderkey", "l_linenumber",
          "l_quantity").map(col)
        val w = Window.partitionBy("l_suppkey")
          .orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, 0)
        Tables.load(s, d, "lineitem")
          .select(
            col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            row_number().over(
              Window.partitionBy("l_suppkey").orderBy(orderCols: _*))
              .cast("long").as("rn"),
            sum(col("l_quantity").cast("long")).over(w).as("running_qty"))
          .orderBy("l_suppkey", "rn")
      },
      oracle = Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(sum(CAST(l_quantity AS BIGINT)) OVER w AS BIGINT) AS running_qty
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY l_suppkey, rn"""),
      bench = true),

    // ---- left outer join with null-preserving aggregation ----------
    "q50_left_join" -> Q(
      impl = (s, d) => {
        val bigOrders = Tables.load(s, d, "orders")
          .filter(col("o_totalprice") > 300000)
        Tables.load(s, d, "customer")
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_big_orders"),
            round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("big_total"))
          .orderBy("c_custkey")
      },
      oracle = Some("""
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_big_orders,
               round(coalesce(sum(o_totalprice), 0), 2) AS big_total
        FROM customer
        LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000)
          ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey""")),

    // ---- approximate distinct (HLL sketch). Engines' sketches differ
    // numerically, so the oracle checks the *contract* instead: each
    // engine's own approx_count_distinct must land within 10% of the
    // exact count (Spark's default rsd is 5%, DuckDB's HLL ~1.6%) —
    // the exact count and the pass/fail boolean are hash-comparable --
    "q51_approx_distinct" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(approx_count_distinct("l_partkey").as("__approx"),
            countDistinct("l_partkey").as("exact_parts"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("__approx") - col("exact_parts"))
              <= col("exact_parts") * 0.10).as("approx_ok"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
                 <= count(DISTINCT l_partkey) * 0.10 AS approx_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- BPE-ish regex tokenization --------------------------------
    "q52_bpe_tokens" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "documents")
          .select(col("doc_id"),
            size(regexp_extract_all(lower(col("text")),
              lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
              .cast("long").as("n_bpe_tokens"))
          .orderBy("doc_id"),
      oracle = Some("""
        SELECT doc_id,
               len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
                 AS n_bpe_tokens
        FROM documents ORDER BY doc_id""")),

    // ---- embedding-cosine near-duplicate pairs (banded hyperplane
    // LSH candidates + exact verify — the 100 TB shape: candidate
    // generation is an equi-join on (band, key), never an all-pairs
    // broadcast; scores of examined pairs are exact. The oracle
    // replicates the identical band construction in SQL (the q31
    // pattern), so results hash-match by construction. The exact
    // quadratic baseline survives as the guarded
    // EmbedNearDup.allPairs, recall-checked in VectorSpec ------------
    "q53_embed_neardup" -> Q(
      impl = (s, d) => {
        graft.functions.expressions.GraftFunctions.register(s)
        import graft.functions.VecFns
        val all = Tables.embeddingsParallel(s, d)
          .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
          .withColumn("nsq", VecFns.dotQFast(col("vq"), col("vq")))
        graft.operators.EmbedNearDup.bandedPairs(all, "vec_id",
            bands = NearDupBands, planesPerBand = NearDupPlanesPerBand,
            dim = EmbDim, minCos = 0.4)
          .orderBy("a", "b")
      },
      oracle = Some {
        val nPlanes = NearDupBands * NearDupPlanesPerBand
        val weightRows = (for {
          j <- 0 until nPlanes
          i <- 1 to EmbDim
        } yield s"($j,$i,${graft.functions.VecFns.hyperplaneWeight(j, i - 1)})")
          .mkString(",")
        val pw = (0 until NearDupPlanesPerBand)
          .map(m => s"($m,${1L << m})").mkString(",")
        s"""
        WITH $quantCtesForDup,
        w(j, i, wt) AS (VALUES $weightRows),
        pw(m, pv) AS (VALUES $pw),
        proj AS (
          SELECT qv.vec_id, w.j, CAST(sum(qv.e * w.wt) AS BIGINT) AS p
          FROM qv JOIN w ON qv.i = w.i GROUP BY 1, 2),
        bk AS (
          SELECT vec_id, j // $NearDupPlanesPerBand AS band,
                 CAST(sum(CASE WHEN p >= 0 THEN pv ELSE 0 END) AS BIGINT) AS key
          FROM proj JOIN pw ON pw.m = j % $NearDupPlanesPerBand
          GROUP BY 1, 2),
        pairs AS (
          SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
          FROM bk x JOIN bk y
            ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
        dots AS (
          SELECT p.a, p.b, CAST(sum(xa.e * xb.e) AS BIGINT) AS dot
          FROM pairs p
            JOIN qv xa ON xa.vec_id = p.a
            JOIN qv xb ON xb.vec_id = p.b AND xb.i = xa.i
          GROUP BY 1, 2),
        cosv AS (
          SELECT a, b, round(CAST(dot AS DOUBLE)
            / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))), 6) AS cos_r
          FROM dots
            JOIN norms na ON na.vec_id = a
            JOIN norms nb ON nb.vec_id = b)
        SELECT a, b, cos_r FROM cosv WHERE cos_r >= 0.4 ORDER BY a, b"""
      }),

    // ---- sliding windows via Spark's native window() ----------------
    "q55_window_sliding" -> Q(
      impl = (s, d) => {
        val SlideUs = 900000000L
        Tables.events(s, d)
          .withColumn("__ts", timestamp_micros(col("us")))
          .groupBy(window(col("__ts"), "1800 seconds", "900 seconds"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("v"))
          .select(unix_micros(col("window.start")).as("w_start_us"),
            col("event_type"), col("n"), col("v"))
          .orderBy("w_start_us", "event_type")
      },
      oracle = Some {
        val S = 900000000L
        s"""
        WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
        w2 AS (
          SELECT (us // $S) * $S AS w_start_us, event_type, value FROM e
          UNION ALL
          SELECT ((us // $S) - 1) * $S AS w_start_us, event_type, value FROM e)
        SELECT w_start_us, event_type, CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 3) AS v
        FROM w2 GROUP BY 1, 2 ORDER BY w_start_us, event_type"""
      }),

    // ---- cube (full grouping-sets lattice) -------------------------
    "q56_cube" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n_rows"),
            round(sum("l_quantity"), 2).as("sum_qty"))
          .orderBy(asc_nulls_first("l_returnflag"),
            asc_nulls_first("l_linestatus")),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---- exact interpolated percentiles (bit-identical both engines)
    "q57_percentile" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
            round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"))
          .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- stateful streaming sessionization (flatMapGroupsWithState)
    "q39_stream_sessionize" -> Q(
      impl = (s, d) => EventStream.sessionCountsStateful(s, d),
      oracle = Some("""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        m AS (
          SELECT user_id,
                 CASE WHEN lag(us) OVER w IS NULL
                        OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions
        FROM m GROUP BY user_id ORDER BY user_id"""))
  )
}
