package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

/** Fifth extension batch (round 4): corpus-curation operators a
  * training-data pipeline runs before every release — benchmark
  * contamination detection and source-priority exact dedup.
  */
object Extended5 {

  // q96: the held-out "benchmark" source and the contamination flag
  // threshold. Declared before `queries`: the oracle SQL embeds these
  // at Map construction.
  // NB: sources are named src0..src19 (no zero padding) — "src00"
  // would silently select an empty eval set and make the whole check
  // vacuous.
  private val EvalSource = "src0"
  private val ContamThreshold = 0.1

  // q98/q99: the explicit pivot domain. Passing the value list is the
  // 100 TB form — without it Spark runs an extra distinct-values job
  // over the full input before it can even plan the aggregation.
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  val queries: Map[String, Q] = Map(
    // ---- benchmark contamination check: fraction of each training
    // document's distinct word-3-gram shingles that appear anywhere in
    // the held-out eval source — the standard pre-release test-set
    // leakage scan. Scale shape: each document's DISTINCT shingle set
    // is built inside a typed flatMap (per-doc hash set — the dedup
    // that used to be a corpus-wide shuffle completes locally, since
    // distinctness per (doc, shingle) never crosses documents), then
    // reduced to 64-bit xxhash64 keys — codegen'd native longs, 8-byte
    // shuffle keys — and the eval shingle set, tiny next to the
    // training corpus, is broadcast so the corpus-side scan never
    // shuffles for the probe. The hash is pure internal identity
    // (only counts are emitted), so the oracle compares raw shingle
    // strings — equal up to negligible 64-bit collisions ---------------
    "q96_contamination_check" -> Q(
      impl = (s, d) => {
        val sh = TextFns
          .distinctShinglesBySource(Tables.docsParallel(s, d), 3)
          .select(col("doc_id"), col("source"), xxhash64(col("shs")).as("h"))
          .persist() // feeds both the eval set and the training side
        val evalSh = sh.filter(col("source") === EvalSource)
          .select("h").distinct()
        val train = sh.filter(col("source") =!= EvalSource)
        val sizes = train.groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"))
        val hits = train.join(broadcast(evalSh), "h")
          .groupBy("doc_id").agg(count(lit(1)).as("__hits"))
        sizes.join(hits, Seq("doc_id"), "left")
          .withColumn("n_contam", coalesce(col("__hits"), lit(0L)))
          .withColumn("contam_frac",
            round(col("n_contam") / col("n_shingles"), 4))
          .withColumn("flagged", col("contam_frac") > ContamThreshold)
          .select("doc_id", "n_shingles", "n_contam", "contam_frac", "flagged")
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                      FROM documents),
        idx AS (SELECT doc_id, source, t,
                       unnest(range(1, greatest(len(t) - 1, 1))) AS i
                FROM toks),
        sh AS (SELECT DISTINCT doc_id, source,
                      t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS h
               FROM idx WHERE i + 2 <= len(t)),
        ev AS (SELECT DISTINCT h FROM sh WHERE source = '$EvalSource'),
        train AS (SELECT doc_id, h FROM sh WHERE source <> '$EvalSource'),
        sizes AS (SELECT doc_id, count(*) AS n FROM train GROUP BY 1),
        hits AS (SELECT t.doc_id, count(*) AS c
                 FROM train t JOIN ev e ON e.h = t.h GROUP BY 1)
        SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_shingles,
               CAST(coalesce(h.c, 0) AS BIGINT) AS n_contam,
               round(coalesce(h.c, 0) / s.n, 4) AS contam_frac,
               round(coalesce(h.c, 0) / s.n, 4) > $ContamThreshold AS flagged
        FROM sizes s LEFT JOIN hits h ON h.doc_id = s.doc_id
        ORDER BY s.doc_id""")),

    // ---- source-priority exact dedup: when identical content appears
    // in several sources, keep the copy from the most-trusted source
    // (curated beats crawl) — min over (priority, doc_id) per content
    // hash, doc_id as the total-order tiebreak. One hash-groupBy with
    // map-side partial agg; min_by carries only the winner, never the
    // copies -----------------------------------------------------------
    "q97_priority_dedup" -> Q(
      impl = (s, d) => {
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("source"), col("text"))
          .withColumn("prio",
            regexp_extract(col("source"), "(\\d+)$", 1).cast("long"))
        // composite scalar order key: (priority, doc_id) packed into
        // one BIGINT — doc_id is far below 10^12 at any harness SF
        val key = col("prio") * lit(1000000000000L) + col("doc_id")
        docs.groupBy(md5(col("text")).as("content_hash"))
          .agg(
            min_by(col("doc_id"), key).as("kept_doc"),
            min_by(col("source"), key).as("kept_source"),
            count(lit(1)).as("n_copies"))
          .orderBy("content_hash")
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, source, text,
                 CAST(regexp_extract(source, '(\d+)$', 1) AS BIGINT)
                   * 1000000000000 + doc_id AS k
          FROM documents)
        SELECT md5(text) AS content_hash,
               arg_min(doc_id, k) AS kept_doc,
               arg_min(source, k) AS kept_source,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM d GROUP BY 1 ORDER BY content_hash""")),

    // ---- pivot: per-user event-type count matrix. With the value
    // list supplied this is ONE hash aggregation (map-side partial +
    // final, no values-discovery job, no extra shuffle) — the wide
    // feature-matrix step before ML feature export ---------------------
    "q98_pivot_matrix" -> Q(
      impl = (s, d) => {
        val wide = Tables.load(s, d, "events")
          .groupBy("user_id")
          .pivot("event_type", EventTypes)
          .agg(count(lit(1)))
        EventTypes.foldLeft(wide) { (df, t) =>
          df.withColumn(s"n_$t", coalesce(col(t).cast("long"), lit(0L)))
        }
          .select(col("user_id") +: EventTypes.map(t => col(s"n_$t")): _*)
          .orderBy("user_id")
      },
      oracle = Some {
        val cols = EventTypes.map(t =>
          s"CAST(count(*) FILTER (event_type = '$t') AS BIGINT) AS n_$t")
          .mkString(",\n               ")
        s"""
        SELECT user_id,
               $cols
        FROM events GROUP BY 1 ORDER BY user_id"""
      }),

    // ---- unpivot (melt): the wide matrix back to long form — the
    // inverse transform, a narrow per-row expansion (no shuffle beyond
    // q98's agg) --------------------------------------------------------
    "q99_unpivot_melt" -> Q(
      impl = (s, d) => {
        val wide = Tables.load(s, d, "events")
          .groupBy("user_id")
          .pivot("event_type", EventTypes)
          .agg(count(lit(1)))
        val filled = EventTypes.foldLeft(wide) { (df, t) =>
          df.withColumn(s"n_$t", coalesce(col(t).cast("long"), lit(0L)))
        }.select(col("user_id") +: EventTypes.map(t => col(s"n_$t")): _*)
        filled.unpivot(
            Array(col("user_id")),
            EventTypes.map(t => col(s"n_$t")).toArray,
            "event_type", "n")
          .orderBy("user_id", "event_type")
      },
      oracle = Some {
        val wideCols = EventTypes.map(t =>
          s"CAST(count(*) FILTER (event_type = '$t') AS BIGINT) AS n_$t")
          .mkString(", ")
        val arms = EventTypes.map(t =>
          s"SELECT user_id, 'n_$t' AS event_type, n_$t AS n FROM w")
          .mkString("\n        UNION ALL ")
        s"""
        WITH w AS (SELECT user_id, $wideCols FROM events GROUP BY 1)
        $arms
        ORDER BY user_id, event_type"""
      })
  )
}
