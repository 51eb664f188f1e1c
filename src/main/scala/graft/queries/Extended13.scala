package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Components

/** Round-8 batch six: robust outlier detection (Tukey fences over the
  * exact percentile), a dedup-health histogram over the near-dup
  * cluster structure, and an in-engine train-and-predict showcase — a
  * char-trigram Naive Bayes language classifier whose training pass,
  * inference pass, and confusion matrix are all one declarative plan.
  */
object Extended13 {

  private val MinhashK = 12
  private val Bands = 4

  /** Per-document char-trigram counts keyed by packed long (3 × 21-bit
    * UTF-16 units — exact for the BMP; a non-BMP corpus would need
    * code-point iteration). Shared by q141's train and score passes.
    */
  private[queries] def triCounts(text: String): scala.collection.mutable.LongMap[Long] = {
    val m = new scala.collection.mutable.LongMap[Long]()
    var i = 0
    while (i + 3 <= text.length) {
      val g = (text.charAt(i).toLong << 42) |
        (text.charAt(i + 1).toLong << 21) | text.charAt(i + 2).toLong
      if (m.contains(g)) m.update(g, m(g) + 1L) else m.update(g, 1L)
      i += 1
    }
    m
  }

  val queries: Map[String, Q] = Map(
    // ---- Tukey-fence outliers: values above p75 + 1.5·IQR of their
    // event type. Exact `percentile` ≡ `quantile_cont` (parity pinned
    // by q57); the fence arithmetic is the same IEEE ops on the same
    // doubles in both engines, and only counts are emitted. The
    // percentile table is group-cardinality-sized → broadcast back --
    "q139_iqr_outliers" -> Q(
      impl = (s, d) => {
        val ev = Tables.events(s, d).select(col("event_type"), col("value"))
        val fences = ev.groupBy("event_type").agg(
          expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.75)").as("q3"))
        ev.join(broadcast(fences), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("value") > col("q3") + (col("q3") - col("q1")) * 1.5,
              1L).otherwise(0L)).as("n_outliers"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH f AS (SELECT event_type,
                          quantile_cont(value, 0.25) AS q1,
                          quantile_cont(value, 0.75) AS q3
                   FROM events GROUP BY 1)
        SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN e.value > f.q3 + (f.q3 - f.q1) * 1.5
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events e JOIN f ON f.event_type = e.event_type
        GROUP BY 1 ORDER BY 1"""),
      bench = true),

    // ---- dedup-health histogram: near-dup cluster sizes → how many
    // clusters of each size (the shape a curation run reports before
    // deciding collapse policy). Same candidate graph as q61; the
    // histogram is two tiny aggregations on top of the component
    // labels, so the scale path is exactly the Components operator's
    // (pointer-doubling, O(log diameter) rounds) -------------------
    "q140_cluster_histogram" -> Q(
      impl = (s, d) => {
        val docs = Tables.docsParallel(s, d)
          .withColumn("t", graft.functions.TextFns.tokens(col("text")))
        // one-pass per-doc signatures: no shingle explode, no
        // corpus-wide groupBy shuffle (bit-equal to the exploded form)
        val sigs = graft.functions.MinHashLsh
          .signaturesFromTokens(docs, "doc_id", "t", 3, MinhashK)
        val pairs = graft.functions.MinHashLsh.candidatePairs(sigs, "doc_id", MinhashK, Bands)
          .filter(col("est") >= 0.5)
        Components.connectedComponents(pairs, "a", "b")
          .groupBy("component").agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
          .orderBy("cluster_size")
      },
      oracle = Some(s"""
        WITH RECURSIVE ${Extended2.lshPairCtes(0.5)},
        sym AS (SELECT a AS x, b AS y FROM pairs
                UNION SELECT b, a FROM pairs),
        reach(node, lab) AS (
          SELECT x, x FROM sym
          UNION
          SELECT s.x, r.lab FROM sym s JOIN reach r ON r.node = s.y),
        comp AS (SELECT node, min(lab) AS component
                 FROM reach GROUP BY node),
        sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
                  FROM comp GROUP BY 1)
        SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
        FROM sizes GROUP BY 1 ORDER BY 1""")),

    // ---- char-trigram Naive Bayes language classifier, trained and
    // evaluated entirely in the engine: per-language trigram
    // log-likelihoods (Laplace-smoothed, quantized to integer
    // micro-nats per distinct count tuple — the q118/q128/q134
    // contract), per-doc argmax over the language scores, and the
    // actual-vs-predicted confusion matrix. Two-pass broadcast-model
    // shape: pass 1 aggregates (lang, gram) counts — the ONLY
    // corpus-sized shuffle, gram-keyed with map-side combine — and
    // collects the vocabulary-bounded model to the driver; pass 2
    // re-counts each doc's grams locally and scores all languages
    // against the broadcast model inside the same flatMap, so
    // inference is a narrow map-only stage (no per-gram model join,
    // no (doc, g) shuffle, nothing persisted). The model is
    // vocab×|langs| longs — trigram vocabularies are charset-bounded,
    // so the broadcast holds at corpus scale -------------------------
    "q141_charngram_langid" -> Q(
      impl = (s, d) => {
        import s.implicits._
        // Train and score passes share the repartitioned scan; persist
        // so the single-file text shuffle (docsParallel) happens once.
        val docs = Tables.docsParallel(s, d)
          .filter(length(col("text")) >= 3)
          .select(col("doc_id"), col("lang"), col("text"))
          .as[(Long, String, String)].persist()
        // Grams travel as PACKED LONGS (3 × 21-bit code points — exact
        // for the BMP): a primitive key deletes per-gram String
        // allocation and shrinks the one shuffle. Per-doc counting is
        // a genuinely imperative per-row loop (local hash map), hence
        // the typed flatMap, not a position-explode.
        // ONE training job: the (lang, gram) count table — vocabulary-
        // bounded — collects raw, and the Laplace-smoothed quantized
        // log-probs are computed on the driver. StrictMath.log IS
        // Spark's `ln` (UnaryLogExpression binds StrictMath.log) and
        // BigDecimal/HALF_UP is Spark's `round`, so the micro-nat
        // values are bit-identical to the expression formulation the
        // DuckDB oracle mirrors.
        val lgRows = docs
          .flatMap { case (_, lang, text) =>
            Extended13.triCounts(text).iterator.map { case (g, c) => (lang, g, c) }
          }
          .toDF("lang", "g", "c")
          .groupBy("lang", "g").agg(sum("c").as("cl"))
          .as[(String, Long, Long)].collect()
        def quant(x: Double): Long =
          java.math.BigDecimal.valueOf(x * 1000000)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        val nl = lgRows.groupMapReduce(_._1)(_._3)(_ + _)
        val v = lgRows.iterator.map(_._2).toSet.size.toLong
        val langs = nl.keys.toArray.sorted
        val langIdx = langs.zipWithIndex.toMap
        val q0Arr = langs.map(l => quant(StrictMath.log(1.0 / (nl(l) + v))))
        // gram → per-lang quantized log-prob, pre-filled with the
        // unseen penalty: score_l is then a single Σ c·arr(l) pass,
        // identical to matched-mass + unseen-mass·q0_l.
        val model = new scala.collection.mutable.LongMap[Array[Long]]()
        lgRows.foreach { case (l, g, cl) =>
          model.getOrElseUpdate(g, q0Arr.clone())(langIdx(l)) =
            quant(StrictMath.log((cl + 1).toDouble / (nl(l) + v).toDouble))
        }
        val bc = s.sparkContext.broadcast((langs, q0Arr, model))
        val preds = docs.map { case (_, lang, text) =>
          val (ls, q0a, mm) = bc.value
          val nLangs = ls.length
          val scores = new Array[Long](nLangs)
          val it = Extended13.triCounts(text).iterator
          while (it.hasNext) {
            val (g, c) = it.next()
            val arr = mm.getOrNull(g)
            val row = if (arr != null) arr else q0a
            var l = 0
            while (l < nLangs) { scores(l) += c * row(l); l += 1 }
          }
          // argmax, ties → lowest lang: strict > over ascending langs
          var best = 0; var l = 1
          while (l < nLangs) { if (scores(l) > scores(best)) best = l; l += 1 }
          (lang, ls(best))
        }.toDF("lang", "pred_lang")
        preds.groupBy("lang", "pred_lang")
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "pred_lang")
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, lang, text FROM documents
                   WHERE length(text) >= 3),
        idx AS (SELECT doc_id, lang, text,
                       unnest(range(1, length(text) - 1)) AS i
                FROM d),
        tg AS (SELECT doc_id, lang, substr(text, i, 3) AS g FROM idx),
        dtc AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
                FROM tg GROUP BY 1, 2),
        lg AS (SELECT lang, g, CAST(count(*) AS BIGINT) AS cl
               FROM tg GROUP BY 1, 2),
        pl AS (SELECT lang, CAST(sum(cl) AS BIGINT) AS nl FROM lg GROUP BY 1),
        v AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS v FROM lg),
        model AS (SELECT lg.lang AS ml, lg.g,
                    CAST(round(ln(CAST(lg.cl + 1 AS DOUBLE) / CAST(pl.nl + v.v AS DOUBLE))
                               * 1000000) AS BIGINT) AS q
                  FROM lg JOIN pl ON pl.lang = lg.lang, v),
        q0 AS (SELECT pl.lang AS ml,
                 CAST(round(ln(1.0 / CAST(pl.nl + v.v AS DOUBLE))
                            * 1000000) AS BIGINT) AS q0
               FROM pl, v),
        mm AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS m FROM dtc GROUP BY 1),
        matched AS (SELECT dtc.doc_id, model.ml,
                      CAST(sum(dtc.c * model.q) AS BIGINT) AS mq,
                      CAST(sum(dtc.c) AS BIGINT) AS mc
                    FROM dtc JOIN model ON model.g = dtc.g
                    GROUP BY 1, 2),
        scores AS (SELECT mm.doc_id, q0.ml,
                     coalesce(matched.mq, 0)
                       + (mm.m - coalesce(matched.mc, 0)) * q0.q0 AS score
                   FROM mm CROSS JOIN q0
                     LEFT JOIN matched ON matched.doc_id = mm.doc_id
                                      AND matched.ml = q0.ml),
        pred AS (SELECT doc_id, ml AS pred_lang,
                        row_number() OVER (PARTITION BY doc_id
                                           ORDER BY score DESC, ml) AS rk
                 FROM scores)
        SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
        FROM d JOIN pred p ON p.doc_id = d.doc_id AND p.rk = 1
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      bench = true),

    // ---- arbitrary-stateful streaming on the v2 API: per-user
    // cumulative spend monitor via `transformWithState` + ValueState
    // on the RocksDB state store (see streaming/StateV2.scala). Spend
    // accumulates in long micro-units, so the final emission per user
    // is batch-exact no matter how the input was micro-batched — the
    // oracle is the plain batch aggregation ------------------------
    "q142_stream_spend_monitor" -> Q(
      impl = (s, d) => graft.streaming.StateV2.spendTotals(s, d),
      oracle = Some("""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
                 AS spend_micro,
               sum(CAST(round(value * 1000000) AS BIGINT)) >= 500000000
                 AS alerted
        FROM events GROUP BY 1 ORDER BY user_id"""),
      bench = true),

    // ---- approximate-quantile accuracy contract (the q51 pattern for
    // quantile sketches): each engine runs its own mergeable quantile
    // sketch (Spark approx_percentile, DuckDB t-digest approx_quantile
    // — different algorithms, so raw outputs can't hash-match) and the
    // CONTRACT — approx within 5% of that engine's exact median — is
    // what both must satisfy, alongside the bit-identical quantized
    // exact value. The sketch is the 100 TB path: constant-size
    // partials under any merge tree, vs the exact percentile's
    // per-group value materialization ------------------------------
    "q143_approx_quantile" -> Q(
      impl = (s, d) =>
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(expr("approx_percentile(value, 0.5, 1000)").as("ap"),
            expr("percentile(value, 0.5)").as("ex"))
          .select(col("event_type"),
            (abs(col("ap") - col("ex")) <= abs(col("ex")) * 0.05 + 1e-9)
              .as("approx_ok"),
            expr("CAST(round(ex * 1000000) AS BIGINT)").as("exact_median_micro"))
          .orderBy("event_type"),
      oracle = Some("""
        SELECT event_type,
               abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
                 <= abs(quantile_cont(value, 0.5)) * 0.05 + 1e-9 AS approx_ok,
               CAST(round(quantile_cont(value, 0.5) * 1000000) AS BIGINT)
                 AS exact_median_micro
        FROM events GROUP BY 1 ORDER BY 1"""))
  )
}
