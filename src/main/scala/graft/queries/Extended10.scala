package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFns, VecFns}
import graft.functions.expressions.GraftFunctions

/** Round-8 batch three: product-analytics event operators (ordered
  * funnel, cohort retention), two corpus-curation stages (per-source
  * percentile quality gate, SemDeDup-style LSH-bucket representative
  * selection), and an information-theoretic source profile (token
  * entropy in integer micro-nats).
  *
  * Determinism notes follow the engine-wide contract: counts and
  * quantized sums are integers (associative under any partitioning);
  * the one transcendental (ln in q128) is quantized per *distinct*
  * (count, total) pair before any summation, so no float ever crosses
  * an aggregation boundary.
  */
object Extended10 {

  private val DayUs = 86400000000L

  /** q126: docs below their source's p25 length are dropped. */
  private val GateQ = 0.25

  val queries: Map[String, Q] = Map(
    // ---- ordered funnel: users who did view, then click strictly
    // after their first view, then purchase strictly after that first
    // qualifying click. Each stage is one hash aggregation on user_id
    // (high-cardinality → even spread) plus one user-keyed equi-join
    // against the prior stage; the surviving-user frames shrink
    // monotonically, so AQE turns the later joins into broadcasts.
    // Never a per-user event-sequence sort ---------------------------
    "q124_funnel" -> Q(
      impl = (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("us"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("us").as("t1"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("us") > col("t1"))
          .groupBy("user_id").agg(min("us").as("t2"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("us") > col("t2"))
          .groupBy("user_id").agg(min("us").as("t3"))
        v.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("1_view"))
          .unionByName(
            c.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("2_click")))
          .unionByName(
            p.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("3_purchase")))
          .select(col("stage"), col("n_users"))
          .orderBy("stage")
      },
      oracle = Some(s"""
        WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        v AS (SELECT user_id, min(us) AS t1 FROM ev
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.us) AS t2
              FROM ev e JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.us > v.t1
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.us) AS t3
              FROM ev e JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.us > c.t2
              GROUP BY e.user_id)
        SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
        UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p
        ORDER BY stage"""),
      bench = true),

    // ---- cohort retention: cohort = a user's first active day; one
    // cell per (cohort, day-offset) counting users still active. The
    // distinct-activity frame and the first-day frame are both single
    // hash shuffles on user_id; the final cell aggregation is a
    // shuffle on the (cohort, offset) grid — thousands of cells at
    // any corpus size, so the heavy lifting stays on the user key ----
    "q125_retention" -> Q(
      impl = (s, d) => {
        val act = Tables.events(s, d)
          .select(col("user_id"), expr(s"us div $DayUs").as("day"))
          .distinct()
        val first = act.groupBy("user_id").agg(min("day").as("cohort"))
        act.join(first, "user_id")
          .select(col("cohort"), (col("day") - col("cohort")).as("offset"))
          .groupBy("cohort", "offset").agg(count(lit(1)).as("n_users"))
          .orderBy("cohort", "offset")
      },
      oracle = Some(s"""
        WITH act AS (SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day
                     FROM events),
        f AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id)
        SELECT f.cohort, act.day - f.cohort AS offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM act JOIN f ON f.user_id = act.user_id
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      bench = true),

    // ---- per-source percentile quality gate: keep docs at or above
    // their source's p25 length — the "drop the bottom quartile of
    // each source" curation stage, with the cutoff computed per
    // source (a global cutoff would gut short-form sources). The
    // cutoff table is one row per source → broadcast back; Spark's
    // exact `percentile` ≡ DuckDB's quantile_cont (pinned by q57) ----
    "q126_quality_gate" -> Q(
      impl = (s, d) => {
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val cut = docs.groupBy("source")
          .agg(expr(s"percentile(n_chars, $GateQ)").as("cut"))
        docs.join(broadcast(cut), "source")
          .filter(col("n_chars") >= col("cut"))
          .select(col("doc_id"), col("source"), col("n_chars"))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH cut AS (SELECT source, quantile_cont(n_chars, $GateQ) AS cut
                     FROM documents GROUP BY source)
        SELECT d.doc_id, d.source, d.n_chars
        FROM documents d JOIN cut ON cut.source = d.source
        WHERE d.n_chars >= cut.cut
        ORDER BY d.doc_id"""),
      bench = true),

    // ---- SemDeDup-style representative selection: embeddings are
    // hashed into hyperplane-LSH buckets (the q31 construction), each
    // bucket elects the member closest to its centroid, the rest are
    // near-duplicates to drop. Division-free: minimizing the true
    // L2-to-mean is equivalent to minimizing Σ_i (cnt·e_i − se_i)²
    // (scale by cnt²), so centroid and distances stay exact integers
    // — no float, no truncate-vs-floor division divergence. Shape:
    // one posexplode (narrow), two hash shuffles on (bucket, i) and
    // (bucket, vec_id), one struct-min per bucket. The bucket key is
    // the partition unit — at 100 TB the bucket count (2^nPlanes ×
    // growable band splits) is tuned so a bucket's members fit a
    // task, and the argmin never materializes an all-pairs join ------
    "q127_bucket_medoid" -> Q(
      impl = (s, d) => {
        GraftFunctions.register(s)
        val emb = Tables.embeddingsParallel(s, d)
          .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
          .withColumn("bucket",
            VecFns.lshBucket(col("vq"), VectorQueries.LshNPlanes, VectorQueries.LshDim))
        val comp = emb.select(col("bucket"), col("vec_id"),
          posexplode(col("vq")).as(Seq("i0", "e")))
          .withColumn("i", col("i0") + 1).drop("i0")
        val cent = comp.groupBy("bucket", "i")
          .agg(sum("e").as("se"), count(lit(1)).as("cnt"))
        val dist = comp.join(cent, Seq("bucket", "i"))
          .withColumn("dt",
            (col("cnt") * col("e") - col("se")) * (col("cnt") * col("e") - col("se")))
          .groupBy("bucket", "vec_id").agg(sum("dt").as("dist2"))
        dist.groupBy("bucket")
          .agg(min(struct(col("dist2"), col("vec_id"))).as("m"),
            count(lit(1)).as("n_members"))
          .select(col("bucket"), col("m.vec_id").as("rep_id"),
            col("m.dist2").as("dist2"), col("n_members"))
          .orderBy("bucket")
      },
      oracle = Some(s"""
        WITH ${VectorQueries.quantCtes},
        ${VectorQueries.lshBucketCtes},
        cent AS (
          SELECT b.bucket, qv.i, CAST(sum(qv.e) AS BIGINT) AS se,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM qv JOIN buckets b ON b.vec_id = qv.vec_id
          GROUP BY 1, 2),
        dist AS (
          SELECT b.bucket, qv.vec_id,
                 CAST(sum((c.cnt * qv.e - c.se) * (c.cnt * qv.e - c.se)) AS BIGINT) AS dist2
          FROM qv
            JOIN buckets b ON b.vec_id = qv.vec_id
            JOIN cent c ON c.bucket = b.bucket AND c.i = qv.i
          GROUP BY 1, 2),
        r AS (
          SELECT bucket, vec_id, dist2,
                 row_number() OVER (PARTITION BY bucket ORDER BY dist2, vec_id) AS rk,
                 CAST(count(*) OVER (PARTITION BY bucket) AS BIGINT) AS n_members
          FROM dist)
        SELECT bucket, vec_id AS rep_id, dist2, n_members
        FROM r WHERE rk = 1 ORDER BY bucket"""),
      bench = true),

    // ---- per-source token entropy: Shannon entropy of each source's
    // unigram distribution, in integer micro-nats. H = Σ (c/n)·ln(n/c)
    // is computed as Σ c·q(c,n) over per-TYPE integer terms, where
    // q = round(ln(n/c)·1e6) is quantized BEFORE summation — each q
    // depends only on the (c, n) integer pair, so both engines
    // quantize identical doubles and the running sum is pure long
    // arithmetic (order-independent). ln(n/c) ≥ 0 → the final floor
    // division agrees with Spark's truncating div. A diversity /
    // dedup-health profile per source: one explode + two hash
    // shuffles, both keyed on (source, token) then source -----------
    "q128_source_entropy" -> Q(
      impl = (s, d) => {
        val tok = Tables.docsParallel(s, d)
          .withColumn("t", TextFns.tokens(col("text")))
          .select(col("source"), explode(col("t")).as("tok"))
        val cnt = tok.groupBy("source", "tok").agg(count(lit(1)).as("c"))
        val tot = cnt.groupBy("source")
          .agg(sum("c").as("n"), count(lit(1)).as("n_types"))
        cnt.join(tot, "source")
          .withColumn("term", col("c") *
            expr("CAST(round(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000) AS BIGINT)"))
          .groupBy("source").agg(sum("term").as("ts"))
          .join(tot, "source")
          .select(col("source"), expr("ts div n").as("entropy_unats"),
            col("n_types"), col("n").as("n_tokens"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                     FROM documents),
        cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
                FROM tok GROUP BY 1, 2),
        tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
                       CAST(count(*) AS BIGINT) AS n_types
                FROM cnt GROUP BY 1),
        terms AS (
          SELECT cnt.source,
                 cnt.c * CAST(round(ln(CAST(tot.n AS DOUBLE) / CAST(cnt.c AS DOUBLE)) * 1000000) AS BIGINT) AS term
          FROM cnt JOIN tot ON tot.source = cnt.source),
        s AS (SELECT source, CAST(sum(term) AS BIGINT) AS ts FROM terms GROUP BY 1)
        SELECT s.source, s.ts // tot.n AS entropy_unats, tot.n_types,
               tot.n AS n_tokens
        FROM s JOIN tot ON tot.source = s.source
        ORDER BY s.source"""),
      bench = true)
  )
}
