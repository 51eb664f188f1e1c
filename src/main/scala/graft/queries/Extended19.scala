package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFns, VecFns}

/** Round-10 batch: distributed model training (a fixed-point linear
  * probe trained by batch gradient descent — each epoch is ONE corpus
  * aggregation against broadcast weights), hybrid retrieval
  * (reciprocal-rank fusion of the BM25 lexical ranking and the
  * embedding-cosine ranking), and exact largest-remainder quota
  * allocation of a global sampling budget across (source, lang)
  * cells.
  *
  * All three are exact-integer (or integer-quantized) formulations so
  * the DuckDB oracles reproduce them bit-for-bit: Spark `div`/`%` and
  * DuckDB `//`/`%` share C semantics (truncation toward zero, sign of
  * the dividend) — verified for the negative gradient sums q175
  * produces.
  */
object Extended19 {

  private val Iters = 3         // GD epochs (weights exact at any count)
  private val RrfK = 60L        // standard RRF rank damping
  private val ListN = 50        // per-system candidate-list depth
  private val FuseN = 20        // fused output depth
  private val Budget = 1000L    // q177 global sample budget

  /** q175 feature extraction — shared by impl and oracle doc below.
    * Features are small non-negative integers (caps keep every
    * gradient sum far inside 64 bits: |r| ≤ ~1e6 ppm, f ≤ 256, so
    * sum(r·f) ≤ 1e6·256·N — exact BIGINT up to N ~ 7e10 docs; beyond
    * that the same pass runs on per-partition partial sums).
    */
  private def probeFeatures(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents").select(
      col("doc_id"),
      when(col("lang") === "en", 1000000L).otherwise(0L).as("y"),
      least(size(TextFns.tokens(col("text"))), lit(256)).cast("long").as("f1"),
      expr("least(length(text), 4096) div 16").cast("long").as("f2"),
      least(size(expr(
        s"filter(split(text, ' '), x -> x IN (${Extended18.Stopwords.map("'" + _ + "'").mkString(",")}))")),
        lit(64)).cast("long").as("f3"))

  /** Run the q175 training loop: each epoch is one corpus aggregation
    * against the current weights (folded into codegen as literals);
    * returns the per-epoch (weights-after, sse-before) trajectory.
    * Shared by q175 (reports it) and q179 (scores with the final
    * weights).
    */
  private def trainProbe(feats: DataFrame): Seq[(Long, Long, Long, Long, Long, Long)] = {
    var w = Array(0L, 0L, 0L, 0L)
    (1 to Iters).map { it =>
      val predE = expr(
        s"${w(0)}L + (${w(1)}L * f1 + ${w(2)}L * f2 + ${w(3)}L * f3) div 256")
      val g = feats.select((col("y") - predE).as("r"), col("f1"), col("f2"), col("f3"))
        .agg(sum("r").as("sr"), sum(col("r") * col("f1")).as("s1"),
          sum(col("r") * col("f2")).as("s2"), sum(col("r") * col("f3")).as("s3"),
          sum(col("r") * col("r")).as("ss"), count(lit(1)).as("n"))
        .collect()(0)
      val (sr, s1, s2, s3, ss, n) =
        (g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4), g.getLong(5))
      w = Array(
        w(0) + sr / n / 2,
        w(1) + s1 / n / 256 / 2,
        w(2) + s2 / n / 256 / 2,
        w(3) + s3 / n / 256 / 2)
      (it.toLong, w(0), w(1), w(2), w(3), ss / 1000000000L)
    }
  }

  /** The q175 oracle's feature + training CTE chain (f, w0..wIters,
    * g1..gIters) — shared verbatim by the q179 oracle so both engines
    * provably score with the SAME trained weights.
    */
  private def probeCtes: String = {
    val stop = Extended18.Stopwords.map("'" + _ + "'").mkString(",")
    val ctes = new StringBuilder(s"""
        f AS (SELECT doc_id,
          CAST(CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS BIGINT) AS y,
          CAST(least(len(string_split(text, ' ')), 256) AS BIGINT) AS f1,
          CAST(least(length(text), 4096) // 16 AS BIGINT) AS f2,
          CAST(least(len(list_filter(string_split(text, ' '),
            x -> x IN ($stop))), 64) AS BIGINT) AS f3
          FROM documents),
        w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
                      CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3)""")
    for (i <- 1 to Iters) {
      ctes.append(s""",
        r$i AS (SELECT f1, f2, f3,
          y - (w.w0 + (w.w1*f1 + w.w2*f2 + w.w3*f3) // 256) AS r
          FROM f CROSS JOIN w${i - 1} w),
        g$i AS (SELECT CAST(sum(r) AS BIGINT) AS sr,
          CAST(sum(r*f1) AS BIGINT) AS s1, CAST(sum(r*f2) AS BIGINT) AS s2,
          CAST(sum(r*f3) AS BIGINT) AS s3, CAST(sum(r*r) AS BIGINT) AS ss,
          CAST(count(*) AS BIGINT) AS n FROM r$i),
        w$i AS (SELECT
          w.w0 + (g.sr // g.n) // 2 AS w0,
          w.w1 + ((g.s1 // g.n) // 256) // 2 AS w1,
          w.w2 + ((g.s2 // g.n) // 256) // 2 AS w2,
          w.w3 + ((g.s3 // g.n) // 256) // 2 AS w3
          FROM w${i - 1} w CROSS JOIN g$i g)""")
    }
    ctes.toString
  }

  val queries: Map[String, Q] = Map(
    // ---- distributed classifier training: a linear probe predicting
    // "is this an English doc" (label in ppm) from three cheap text
    // statistics, trained by batch gradient descent on squared loss.
    // The 100 TB shape every learned quality filter needs: one epoch =
    // ONE map-side-combined aggregation producing the 4 gradient sums
    // + loss (the only driver state is the 4-weight model, broadcast
    // back into the next epoch's codegen'd projection as literals).
    // Arithmetic is fixed-point BIGINT throughout — predictions in
    // ppm, updates via truncating integer division — so the training
    // trajectory is bit-reproducible on any engine: the oracle
    // re-runs the identical 3 epochs as chained CTEs. Loss (sse_e9)
    // decreases 2059→1402→1254 at sf0.1: the probe actually learns --
    "q175_linear_probe" -> Q(
      impl = (s, d) => {
        import s.implicits._
        // one narrow projection, materialized once, read per epoch
        val feats = probeFeatures(s, d).persist()
        var w = Array(0L, 0L, 0L, 0L)
        val rows = (1 to Iters).map { it =>
          // current weights fold into the epoch's codegen as literals
          val predE = expr(
            s"${w(0)}L + (${w(1)}L * f1 + ${w(2)}L * f2 + ${w(3)}L * f3) div 256")
          val g = feats.select((col("y") - predE).as("r"), col("f1"), col("f2"), col("f3"))
            .agg(sum("r").as("sr"), sum(col("r") * col("f1")).as("s1"),
              sum(col("r") * col("f2")).as("s2"), sum(col("r") * col("f3")).as("s3"),
              sum(col("r") * col("r")).as("ss"), count(lit(1)).as("n"))
            .collect()(0)
          val (sr, s1, s2, s3, ss, n) =
            (g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4), g.getLong(5))
          w = Array(
            w(0) + sr / n / 2,
            w(1) + s1 / n / 256 / 2,
            w(2) + s2 / n / 256 / 2,
            w(3) + s3 / n / 256 / 2)
          (it.toLong, w(0), w(1), w(2), w(3), ss / 1000000000L)
        }
        feats.unpersist()
        rows.toDF("iter", "w0", "w1", "w2", "w3", "sse_e9").orderBy("iter")
      },
      oracle = Some {
        val stop = Extended18.Stopwords.map("'" + _ + "'").mkString(",")
        val ctes = new StringBuilder(s"""
        f AS (SELECT
          CAST(CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS BIGINT) AS y,
          CAST(least(len(string_split(text, ' ')), 256) AS BIGINT) AS f1,
          CAST(least(length(text), 4096) // 16 AS BIGINT) AS f2,
          CAST(least(len(list_filter(string_split(text, ' '),
            x -> x IN ($stop))), 64) AS BIGINT) AS f3
          FROM documents),
        w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
                      CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3)""")
        for (i <- 1 to Iters) {
          ctes.append(s""",
        r$i AS (SELECT f1, f2, f3,
          y - (w.w0 + (w.w1*f1 + w.w2*f2 + w.w3*f3) // 256) AS r
          FROM f CROSS JOIN w${i - 1} w),
        g$i AS (SELECT CAST(sum(r) AS BIGINT) AS sr,
          CAST(sum(r*f1) AS BIGINT) AS s1, CAST(sum(r*f2) AS BIGINT) AS s2,
          CAST(sum(r*f3) AS BIGINT) AS s3, CAST(sum(r*r) AS BIGINT) AS ss,
          CAST(count(*) AS BIGINT) AS n FROM r$i),
        w$i AS (SELECT
          w.w0 + (g.sr // g.n) // 2 AS w0,
          w.w1 + ((g.s1 // g.n) // 256) // 2 AS w1,
          w.w2 + ((g.s2 // g.n) // 256) // 2 AS w2,
          w.w3 + ((g.s3 // g.n) // 256) // 2 AS w3
          FROM w${i - 1} w CROSS JOIN g$i g)""")
        }
        val outs = (1 to Iters).map(i =>
          s"""SELECT CAST($i AS BIGINT) AS iter, w.w0, w.w1, w.w2, w.w3,
              g.ss // 1000000000 AS sse_e9 FROM w$i w CROSS JOIN g$i g""")
        "WITH " + ctes + "\n" + outs.mkString(" UNION ALL ") + " ORDER BY iter"
      },
      bench = true),

    // ---- hybrid retrieval: reciprocal-rank fusion of two top-50
    // candidate lists over the embedding-backed docs (doc_id < 2000)
    // — the BM25 lexical ranking (q174's scoring) and the cosine
    // ranking against query vector 0 (q30's exact integer-quantized
    // scoring). RRF score = Σ 1/(60 + rank) in exact nanounits
    // (integer division → bit-reproducible; doubles appear only
    // inside each system's own rounded ranking key). Each list is a
    // per-system top-k (partial top-k merge / broadcast-scored
    // candidates), fused by a tiny rank-keyed outer join: at 100 TB
    // nothing here shuffles more than the two 50-row lists ----------
    "q176_rrf_fusion" -> Q(
      impl = (s, d) => {
        // lexical side: q174's BM25 over the embedding-backed subset.
        // The tokenized slice feeds two branches (corpus stats and the
        // term tf) — persist so the scan + tokenize runs once (r16
        // ratio audit: the per-branch recomputes of 1-row aggregates
        // were q176's floor; bounded at <2000 rows by the filter)
        val docs = Tables.docsParallel(s, d)
          .filter(col("doc_id") < 2000)
          .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
          .withColumn("len", size(col("t")))
          .persist()
        graft.functions.PersistLeases.register(
          () => { docs.unpersist(blocking = false); () })
        val stats = docs.agg(count(lit(1)).as("n"), sum("len").as("sumlen"))
        val tf = docs
          .select(col("doc_id"), col("len"), explode(col("t")).as("tok"))
          .filter(col("tok").isin(Extended18.Bm25Terms.map(x => x: Any): _*))
          .groupBy("doc_id", "len", "tok").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("tok")
          .agg(count_distinct(col("doc_id")).as("dfreq"))
        val bm = tf.join(broadcast(dfreq), "tok")
          .crossJoin(broadcast(stats))
          .withColumn("avglen", col("sumlen").cast("double") / col("n"))
          .withColumn("idf", log(lit(1.0) +
            (col("n") - col("dfreq") + 0.5) / (col("dfreq") + 0.5)))
          .withColumn("contrib",
            col("idf") * (col("tf") * 2.2) /
              (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("len") / col("avglen"))))
          .groupBy("doc_id").agg(round(sum("contrib"), 6).as("bm25"))
        // global top-50: partial top-k merge, then a 50-row window
        val text50 = bm.orderBy(col("bm25").desc, col("doc_id")).limit(ListN)
          .withColumn("rt", row_number().over(
            Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
          .select(col("doc_id"), col("rt"))
        // vector side: q30's exact quantized cosine vs query vec 0;
        // quantized vectors feed the query-vector lookup AND the scored
        // scan — persist so quantization runs once
        val all = VectorQueries.quantized(s, d).persist()
        graft.functions.PersistLeases.register(
          () => { all.unpersist(blocking = false); () })
        val q0 = broadcast(all.filter(col("vec_id") === 0)
          .toDF("q_id", "q_vq", "q_nsq"))
        val scored = all.toDF("n_id", "n_vq", "n_nsq").crossJoin(q0)
          .filter(col("n_id") =!= col("q_id"))
          .withColumn("dot", VecFns.dotQFast(col("q_vq"), col("n_vq")))
          .withColumn("cos",
            VecFns.cosineFromQ(col("dot"), col("q_nsq"), col("n_nsq")))
          .withColumn("cos_r", round(col("cos"), 6))
        val vec50 = scored.orderBy(col("cos_r").desc, col("n_id")).limit(ListN)
          .withColumn("rv", row_number().over(
            Window.orderBy(col("cos_r").desc, col("n_id"))).cast("long"))
          .select(col("n_id").as("doc_id"), col("rv"))
        text50.join(vec50, Seq("doc_id"), "full_outer")
          .withColumn("rrf_nano",
            coalesce(expr(s"1000000000 div (${RrfK} + rt)"), lit(0L)) +
              coalesce(expr(s"1000000000 div (${RrfK} + rv)"), lit(0L)))
          .select(col("doc_id"), col("rt").as("r_text"), col("rv").as("r_vec"),
            col("rrf_nano"))
          .orderBy(col("rrf_nano").desc, col("doc_id"))
          .limit(FuseN)
      },
      oracle = Some(s"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
                   FROM documents WHERE doc_id < 2000),
        dl AS (SELECT doc_id, len(t) AS len, t FROM d),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(len) AS BIGINT) AS sumlen FROM dl),
        tf AS (SELECT doc_id, len, tok, CAST(count(*) AS BIGINT) AS tf
               FROM (SELECT doc_id, len, unnest(t) AS tok FROM dl)
               WHERE tok IN (${Extended18.Bm25Terms.map("'" + _ + "'").mkString(",")})
               GROUP BY 1, 2, 3),
        dfr AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfreq
                FROM tf GROUP BY tok),
        sc AS (SELECT tf.doc_id,
                 ln(1.0 + (st.n - dfr.dfreq + 0.5)/(dfr.dfreq + 0.5))
                   * (tf.tf*2.2) /
                   (tf.tf + 1.2*(0.25 + 0.75*tf.len
                     / (CAST(st.sumlen AS DOUBLE)/st.n))) AS contrib
               FROM tf JOIN dfr USING (tok) CROSS JOIN st),
        bm AS (SELECT doc_id, round(sum(contrib), 6) AS bm25
               FROM sc GROUP BY doc_id),
        t AS (SELECT doc_id, rn AS rt FROM
               (SELECT doc_id, CAST(row_number() OVER (
                  ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rn FROM bm)
              WHERE rn <= $ListN),
        ${VectorQueries.quantCtes},
        dots AS (SELECT b.vec_id AS n_id, CAST(sum(a.e*b.e) AS BIGINT) AS dot
                 FROM qv a JOIN qv b ON a.i = b.i
                   AND a.vec_id = 0 AND b.vec_id <> 0 GROUP BY 1),
        cosd AS (SELECT dt.n_id,
                   CAST(dt.dot AS DOUBLE)
                     / (sqrt(CAST(qa.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cos
                 FROM dots dt
                   JOIN norms qa ON qa.vec_id = 0
                   JOIN norms nb ON nb.vec_id = dt.n_id),
        v AS (SELECT n_id AS doc_id, rn AS rv FROM
               (SELECT n_id, CAST(row_number() OVER (
                  ORDER BY round(cos, 6) DESC, n_id) AS BIGINT) AS rn FROM cosd)
              WHERE rn <= $ListN),
        u AS (SELECT coalesce(t.doc_id, v.doc_id) AS doc_id, t.rt, v.rv
              FROM t FULL OUTER JOIN v ON v.doc_id = t.doc_id)
        SELECT doc_id, rt AS r_text, rv AS r_vec,
               coalesce(1000000000 // ($RrfK + rt), 0)
                 + coalesce(1000000000 // ($RrfK + rv), 0) AS rrf_nano
        FROM u ORDER BY rrf_nano DESC, doc_id LIMIT $FuseN"""),
      bench = true),

    // ---- largest-remainder (Hamilton) apportionment of a global
    // sampling budget across (source, lang) cells, then the exact
    // deterministic take: every cell gets floor(B·n_cell/N), and the
    // leftover seats go to the largest fractional remainders
    // (remainder desc, cell asc — fully tie-broken). Integer-exact,
    // Σquota ≡ B by construction. The take ranks each cell's docs by
    // a salted md5 draw (stable under reshuffles/corpus growth, same
    // family as q64/q101) and keeps rk ≤ quota — a per-group variable
    // k, which is the window formulation, not per-group top-k. Cell
    // frames are |cells|-bounded (metadata-scale) → broadcast; the
    // doc-side work is one hash shuffle on the cell key ------------
    "q177_quota_alloc" -> Q(
      impl = (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val cnt = docs.groupBy("source", "lang").agg(count(lit(1)).as("n_cell"))
        // |cells| rows: the whole allocation is window math on a
        // metadata-scale frame (single partition is correct here)
        val whole = Window.partitionBy()
        val alloc = cnt
          .withColumn("n", sum("n_cell").over(whole))
          .withColumn("base", expr(s"($Budget * n_cell) div n"))
          .withColumn("rem", expr(s"($Budget * n_cell) % n"))
          .withColumn("brk", row_number().over(
            Window.orderBy(col("rem").desc, col("source"), col("lang"))).cast("long"))
          .withColumn("leftover", lit(Budget) - sum("base").over(whole))
          .withColumn("quota",
            col("base") + when(col("brk") <= col("leftover"), 1L).otherwise(0L))
          .select("source", "lang", "n_cell", "quota")
        val ranked = docs
          .withColumn("rk", row_number().over(
            Window.partitionBy("source", "lang")
              .orderBy(md5(concat(lit("quota:"), col("doc_id").cast("string"))),
                col("doc_id"))).cast("long"))
        val taken = ranked
          .join(broadcast(alloc.select("source", "lang", "quota")), Seq("source", "lang"))
          .filter(col("rk") <= col("quota"))
          .groupBy("source", "lang").agg(count(lit(1)).as("n_taken"))
        alloc.join(taken, Seq("source", "lang"), "left")
          .select(col("source"), col("lang"), col("n_cell"), col("quota"),
            coalesce(col("n_taken"), lit(0L)).as("n_taken"))
          .orderBy("source", "lang")
      },
      oracle = Some(s"""
        WITH cnt AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_cell
                     FROM documents GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(n_cell) AS BIGINT) AS n FROM cnt),
        alloc AS (SELECT c.source, c.lang, c.n_cell,
                    ($Budget * c.n_cell) // t.n AS base,
                    ($Budget * c.n_cell) % t.n AS rem
                  FROM cnt c CROSS JOIN tot t),
        bonus AS (SELECT source, lang, n_cell, base, rem,
                    CAST(row_number() OVER (
                      ORDER BY rem DESC, source, lang) AS BIGINT) AS brk,
                    CAST($Budget - sum(base) OVER () AS BIGINT) AS leftover
                  FROM alloc),
        quota AS (SELECT source, lang, n_cell,
                    base + CASE WHEN brk <= leftover THEN 1 ELSE 0 END AS quota
                  FROM bonus),
        ranked AS (SELECT dd.source, dd.lang, dd.doc_id,
                     CAST(row_number() OVER (PARTITION BY dd.source, dd.lang
                       ORDER BY md5('quota:' || CAST(dd.doc_id AS VARCHAR)),
                         dd.doc_id) AS BIGINT) AS rk
                   FROM documents dd),
        taken AS (SELECT r.source, r.lang, CAST(count(*) AS BIGINT) AS n_taken
                  FROM ranked r JOIN quota q
                    ON q.source = r.source AND q.lang = r.lang
                  WHERE r.rk <= q.quota GROUP BY 1, 2)
        SELECT q.source, q.lang, q.n_cell, q.quota,
               coalesce(t.n_taken, 0) AS n_taken
        FROM quota q LEFT JOIN taken t
          ON t.source = q.source AND t.lang = q.lang
        ORDER BY q.source, q.lang"""),
      bench = true))
}
