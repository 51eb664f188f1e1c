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
        val sh = Tables.docsParallel(s, d)
          .withColumn("t", graft.functions.TextFns.tokens(col("text")))
          .select(col("doc_id"),
            explode(graft.functions.TextFns.wordShinglesFromTokens(col("t"), 3)).as("sh"))
        val sigs = graft.functions.MinHashLsh.signatures(sh, "doc_id", "sh", MinhashK)
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
    // contract), per-doc argmax over the 5 language scores, and the
    // actual-vs-predicted confusion matrix. Shapes: the trigram
    // explode shuffles once on (lang, g) for training and once on
    // (doc, g) for inference; scoring joins doc grams to the model on
    // the gram key (high-cardinality); the doc×lang grid is a 5-row
    // broadcast; unmatched-gram mass uses the per-language unseen
    // log-prob so the sum is exact NB, not an approximation ---------
    "q141_charngram_langid" -> Q(
      impl = (s, d) => {
        val docs = Tables.docsParallel(s, d)
          .filter(length(col("text")) >= 3)
          .select(col("doc_id"), col("lang"), col("text"))
        // Per-doc trigram counting is a genuinely imperative per-row
        // loop (one pass over the chars, local hash map), so it runs
        // as a typed flatMap: each document's gram counts complete
        // inside its own row's processing, which deletes BOTH the
        // position-explode (whose Generate copies the full text once
        // per char position) and the corpus-wide (doc_id, g) shuffle
        // that re-assembled the counts — the two dominant costs of
        // the declarative form (observed ~3× end-to-end). Downstream
        // stays declarative on the ≤ distinct-grams-per-doc table.
        import s.implicits._
        // Grams travel as PACKED LONGS (3 × 21-bit code points — exact
        // for the BMP), not 3-char strings: the key is only ever
        // grouped/joined on, and a primitive key deletes the per-gram
        // String allocation here plus all downstream string
        // shuffle/persist bytes.
        val dtc = docs.select(col("doc_id"), col("lang"), col("text"))
          .as[(Long, String, String)]
          .flatMap { case (id, lang, text) =>
            val m = new scala.collection.mutable.LongMap[Long]()
            var i = 0
            while (i + 3 <= text.length) {
              val g = (text.charAt(i).toLong << 42) |
                (text.charAt(i + 1).toLong << 21) | text.charAt(i + 2).toLong
              if (m.contains(g)) m.update(g, m(g) + 1L) else m.update(g, 1L)
              i += 1
            }
            m.iterator.map { case (g, c) => (id, lang, g, c) }
          }
          .toDF("doc_id", "lang", "g", "c").persist()
        // lg fans out to THREE consumers (per-lang totals, the vocab
        // size, the model) — persist the tiny (lang, gram) table so
        // dtc is re-aggregated once, not three times
        val lg = dtc.groupBy("lang", "g").agg(sum("c").as("cl")).persist()
        val perLang = lg.groupBy("lang").agg(sum("cl").as("nl"))
        val v = lg.agg(count_distinct(col("g")).as("v"))
        val model = lg.join(broadcast(perLang), "lang").crossJoin(broadcast(v))
          .withColumn("q", expr("""
            CAST(round(ln(CAST(cl + 1 AS DOUBLE) / CAST(nl + v AS DOUBLE))
                       * 1000000) AS BIGINT)"""))
          .select(col("lang").as("ml"), col("g"), col("q"))
        val q0 = perLang.crossJoin(broadcast(v))
          .withColumn("q0", expr(
            "CAST(round(ln(1.0 / CAST(nl + v AS DOUBLE)) * 1000000) AS BIGINT)"))
          .select(col("lang").as("ml"), col("q0"))
        // The label set and the per-lang unseen-gram penalty are
        // metadata-scale (a handful of languages) — collect them and
        // pivot the model WIDE by language. Scoring then joins each
        // corpus gram row to ONE model row and aggregates per doc in
        // a single narrow pass, instead of fanning every gram row out
        // |langs|× through a (doc_id, lang) shuffle. At 1000 executors
        // the fan-out is the difference between shuffling N rows and
        // N·L rows; the pivot costs one |vocab|-row broadcast.
        val langs = perLang.select("lang").as[String].collect().sorted.toSeq
        val q0Map = q0.as[(String, Long)].collect().toMap
        val modelWide = model.groupBy("g").pivot("ml", langs).agg(first("q"))
        val joined = dtc.join(broadcast(modelWide), Seq("g"), "left")
        val perLangAggs = langs.flatMap { l =>
          Seq(sum(col(s"`$l`") * col("c")).as(s"mq_$l"),
            sum(when(col(s"`$l`").isNotNull, col("c")).otherwise(lit(0L)))
              .as(s"mc_$l"))
        } :+ sum("c").as("m")
        // doc→lang is functional, so grouping by (doc_id, lang) keeps
        // the true label on the scored row — the confusion matrix
        // falls out of a re-aggregation with NO join back to the
        // corpus (one fewer shuffle join than the tall formulation)
        val perDoc = joined.groupBy("doc_id", "lang")
          .agg(perLangAggs.head, perLangAggs.tail: _*)
        // score_l = matched-gram mass + unseen-gram mass·q0_l; argmax
        // with the same (score desc, lang asc) tie-break as the tall
        // formulation: min over (-score, lang) structs.
        val scoreStructs = langs.map { l =>
          struct(
            (-(coalesce(col(s"mq_$l"), lit(0L)) +
              (col("m") - col(s"mc_$l")) * lit(q0Map(l)))).as("ns"),
            lit(l).as("ml"))
        }
        perDoc
          .withColumn("p", array_min(array(scoreStructs: _*)))
          .groupBy(col("lang"), col("p.ml").as("pred_lang"))
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
