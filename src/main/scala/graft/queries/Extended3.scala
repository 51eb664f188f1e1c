package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.GroupedTopK

/** Third extension batch: the remaining join shapes (full outer,
  * null-safe equality) and SQL subquery forms (correlated EXISTS,
  * scalar subquery), plus deterministic per-group stratified sampling.
  */
object Extended3 {

  /** Typed row for the cogroup query. */
  final case class Ev(user_id: Long, us: Long)

  val queries: Map[String, Q] = Map(
    // ---- typed cogroup (KeyValueGroupedDataset.cogroup): per user,
    // clicks strictly inside the [first purchase, last purchase] span
    // — imperative per-key logic over two co-partitioned streams, the
    // Dataset API's escape hatch when a join won't express it --------
    "q86_cogroup" -> Q(
      impl = (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("us")).as[Ev]
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us")).as[Ev]
        purchases.groupByKey(_.user_id)
          .cogroup(clicks.groupByKey(_.user_id)) { (uid, ps, cs) =>
            val pTimes = ps.map(_.us).toSeq
            if (pTimes.isEmpty) Iterator.empty
            else {
              val lo = pTimes.min
              val hi = pTimes.max
              val n = cs.count(c => c.us > lo && c.us < hi)
              Iterator.single((uid, n.toLong))
            }
          }
          .toDF("user_id", "n_clicks_between")
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH p AS (SELECT user_id, min(epoch_us(ts)) AS lo,
                          max(epoch_us(ts)) AS hi
                   FROM events WHERE event_type = 'purchase'
                   GROUP BY user_id),
             c AS (SELECT user_id, epoch_us(ts) AS us FROM events
                   WHERE event_type = 'click')
        SELECT p.user_id,
               CAST(count(c.us) FILTER (c.us > p.lo AND c.us < p.hi)
                 AS BIGINT) AS n_clicks_between
        FROM p LEFT JOIN c ON p.user_id = c.user_id
        GROUP BY p.user_id ORDER BY p.user_id""")),

    // ---- full outer join: suppliers vs customers per nation --------
    "q77_full_outer" -> Q(
      impl = (s, d) => {
        val sup = Tables.load(s, d, "supplier")
          .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_sup"))
          .filter(col("nk") % 2 === 0)
        val cust = Tables.load(s, d, "customer")
          .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
          .filter(col("nk") % 3 === 0)
        sup.withColumnRenamed("nk", "s_nk")
          .join(cust.withColumnRenamed("nk", "c_nk"),
            col("s_nk") === col("c_nk"), "full_outer")
          .select(
            coalesce(col("s_nk"), col("c_nk")).as("nationkey"),
            coalesce(col("n_sup"), lit(0L)).as("n_sup"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"))
          .orderBy("nationkey")
      },
      oracle = Some("""
        WITH s AS (SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_sup
                   FROM supplier GROUP BY 1 HAVING (nk % 2) = 0),
             c AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_cust
                   FROM customer GROUP BY 1 HAVING (nk % 3) = 0)
        SELECT coalesce(s.nk, c.nk) AS nationkey,
               coalesce(n_sup, 0) AS n_sup,
               coalesce(n_cust, 0) AS n_cust
        FROM s FULL OUTER JOIN c ON s.nk = c.nk
        ORDER BY nationkey""")),

    // ---- null-safe equality join (<=> / IS NOT DISTINCT FROM) ------
    "q78_nullsafe_join" -> Q(
      impl = (s, d) => {
        // trait_id-style nullable key: orders clerk digit, nulled for
        // a deterministic slice — null keys must MATCH under <=>
        val o = Tables.load(s, d, "orders")
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 7 === 0, lit(null).cast("long"))
              .otherwise(col("o_orderkey") % 5).as("grp"))
        val ref = s.range(5).select(col("id").as("grp"))
          .unionByName(s.range(1).select(lit(null).cast("long").as("grp")))
          .withColumn("label",
            coalesce(col("grp").cast("string"), lit("none")))
        o.join(ref, o("grp") <=> ref("grp"))
          .groupBy("label").agg(count(lit(1)).as("n"))
          .orderBy("label")
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN NULL
                      ELSE o_orderkey % 5 END AS grp
          FROM orders),
        ref AS (SELECT unnest(range(5)) AS grp UNION ALL SELECT NULL),
        lab AS (SELECT grp, coalesce(CAST(grp AS VARCHAR), 'none') AS label
                FROM ref)
        SELECT label, CAST(count(*) AS BIGINT) AS n
        FROM o JOIN lab ON o.grp IS NOT DISTINCT FROM lab.grp
        GROUP BY label ORDER BY label""")),

    // ---- correlated EXISTS subquery (Catalyst rewrites to semi join)
    "q79_exists_subquery" -> Q(
      impl = (s, d) => {
        Tables.load(s, d, "customer").createOrReplaceTempView("__cust")
        Tables.load(s, d, "orders").createOrReplaceTempView("__ord")
        s.sql("""
          SELECT c_mktsegment, count(*) AS n_with_urgent
          FROM __cust
          WHERE EXISTS (SELECT 1 FROM __ord
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
          GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      },
      oracle = Some("""
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_with_urgent
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- scalar subquery: orders above their segment's average -----
    "q80_scalar_subquery" -> Q(
      impl = (s, d) => {
        Tables.load(s, d, "customer").createOrReplaceTempView("__cust2")
        Tables.load(s, d, "orders").createOrReplaceTempView("__ord2")
        s.sql("""
          SELECT c_mktsegment,
                 count(*) AS n_above,
                 round(min(o_totalprice), 2) AS min_above
          FROM __ord2 JOIN __cust2 ON o_custkey = c_custkey
          WHERE o_totalprice > (SELECT avg(o_totalprice) FROM __ord2)
          GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      },
      oracle = Some("""
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_above,
               round(min(o_totalprice), 2) AS min_above
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- higher-order array functions over embeddings: transform /
    // filter / aggregate on the vector column, all inside codegen —
    // the declarative path for per-vector feature engineering --------
    "q87_vector_stats" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "embeddings")
          .select(col("vec_id"),
            graft.functions.VecFns.quantize(col("embedding")).as("vq"))
          .select(col("vec_id"),
            size(col("vq")).cast("long").as("dim"),
            aggregate(col("vq"), lit(0L), (acc, x) => acc + x).as("sum_q"),
            size(filter(col("vq"), _ > 0)).cast("long").as("n_pos"),
            array_max(col("vq")).as("max_q"),
            array_min(col("vq")).as("min_q"))
          .orderBy("vec_id"),
      oracle = Some(s"""
        WITH q AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * ${graft.functions.VecFns.Scale})
                        AS BIGINT)) AS vq
          FROM embeddings)
        SELECT vec_id,
               len(vq) AS dim,
               CAST(list_sum(vq) AS BIGINT) AS sum_q,
               len(list_filter(vq, x -> x > 0)) AS n_pos,
               CAST(list_max(vq) AS BIGINT) AS max_q,
               CAST(list_min(vq) AS BIGINT) AS min_q
        FROM q ORDER BY vec_id""")),

    // ---- winnowing document fingerprints (MOSS-style): hash every
    // word 4-gram, slide a 5-gram window over the hash sequence, keep
    // the window minimum (ties → rightmost = smallest position works
    // identically in both engines via (hash, -pos) ordering), distinct
    // per doc. Robust local fingerprints for plagiarism/overlap
    // detection — selection is a windowed min, one shuffle on doc_id -
    "q84_winnowing" -> Q(
      impl = (s, d) =>
        // one-pass winnowing (round 18): gram hashes, full-window
        // (h, -pos) min, and the per-doc distinct all run locally in
        // Curation.winnowFingerprints — map-only where the windowed
        // form shuffled the full gram stream by doc_id first (parity
        // pinned by WinnowOnePassSpec; the oracle replays the
        // declarative construction unchanged)
        graft.corpus.Curation.winnowFingerprints(
          Tables.docsParallel(s, d)
            .select(col("doc_id"),
              graft.functions.TextFns.tokens(col("text")).as("t")),
          "doc_id", "t", 4, 5)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_fp"), min("fp").as("min_fp"),
            max("fp").as("max_fp"))
          .orderBy("doc_id"),
      oracle = Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 1))) AS i
                FROM toks),
        g AS (SELECT doc_id, i - 1 AS pos,
                     CAST('0x' || substr(md5(
                       t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                     ), 1, 12) AS BIGINT) AS h
              FROM idx WHERE i + 3 <= len(t)),
        wm AS (SELECT doc_id, pos,
                      min(struct_pack(h := h, np := -pos)) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin,
                      count(*) OVER (PARTITION BY doc_id) AS n_grams
               FROM g),
        fp AS (SELECT DISTINCT doc_id, wmin.h AS fp
               FROM wm WHERE pos <= n_grams - 5)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
               min(fp) AS min_fp, max(fp) AS max_fp
        FROM fp GROUP BY doc_id ORDER BY doc_id""")),

    // ---- native session_window (batch): per-session event counts ---
    "q85_session_window" -> Q(
      impl = (s, d) =>
        Tables.events(s, d)
          .withColumn("__ts", timestamp_micros(col("us")))
          .groupBy(col("user_id"),
            session_window(col("__ts"), "1800 seconds"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("s_start_us"),
            col("n_events"))
          .orderBy("user_id", "s_start_us"),
      oracle = Some("""
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        m AS (SELECT user_id, us,
                     CASE WHEN lag(us) OVER w IS NULL
                            OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0
                     END AS new_s
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        s AS (SELECT user_id, us, sum(new_s) OVER (
                PARTITION BY user_id ORDER BY us
                ROWS UNBOUNDED PRECEDING) AS sid
              FROM m)
        SELECT user_id, min(us) AS s_start_us, CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, sid ORDER BY user_id, s_start_us""")),

    // ---- RANGE window frames + rank-family functions: per-user
    // 5-minute trailing event count (range frame over event time),
    // percent_rank and cume_dist over the user's value ordering ------
    "q83_range_frame" -> Q(
      impl = (s, d) => {
        val byTime = Window.partitionBy("user_id").orderBy("us")
          .rangeBetween(-300000000L, 0)
        val byValue = Window.partitionBy("user_id")
          .orderBy("value", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("us"), col("value"))
          .withColumn("n_5min", count(lit(1)).over(byTime))
          .withColumn("pr", round(percent_rank().over(byValue), 6))
          .withColumn("cd", round(cume_dist().over(byValue), 6))
          .select("user_id", "event_id", "n_5min", "pr", "cd")
          .orderBy("user_id", "event_id")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value
                   FROM events)
        SELECT user_id, event_id,
               CAST(count(*) OVER (
                 PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_5min,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
        ORDER BY user_id, event_id""")),

    // ---- deterministic stratified sampling: first-3-by-hash-order
    // per stratum — the engine-portable form of per-group reservoir
    // sampling (rank by md5(id), not by a stateful RNG). Scale shape:
    // a `row_number` window partitioned by the ~5 event types would
    // fully sort each stratum in ONE task (5 tasks × 20 TB at the
    // 100 TB target); `GroupedTopK` instead prunes to ≤ k candidates
    // per input partition (narrow), then merges inside a hash agg —
    // no partition-wide sort keyed on the stratum ---------------------
    "q81_stratified_sample" -> Q(
      impl = (s, d) => {
        val ev = Tables.load(s, d, "events")
          .select(col("event_type"), col("event_id"))
        GroupedTopK.withRowNumber(ev, "event_type",
            Seq(md5(col("event_id").cast("string")), col("event_id")),
            k = 3, rankCol = "rk")
          .select("event_type", "event_id", "rk")
          .orderBy("event_type", "rk")
      },
      oracle = Some("""
        WITH r AS (
          SELECT event_type, event_id,
                 row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rk
          FROM events)
        SELECT event_type, event_id, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= 3 ORDER BY event_type, rk"""))
  )
}
