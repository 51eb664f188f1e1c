package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{MinHashLsh, TextFns}

/** Round-8 batch seven: cross-source duplication audit (where does
  * near-duplicate mass flow between corpus sources), event path mining
  * (top ordered 3-step behavior sequences), and per-group equi-width
  * histograms — three reporting operators a curation/analytics run
  * ends with.
  */
object Extended14 {

  private val MinhashK = 12
  private val Bands = 4

  val queries: Map[String, Q] = Map(
    // ---- cross-source near-dup matrix: LSH candidate pairs (est ≥
    // 0.5, the q61 graph) mapped to their sources, counted per
    // unordered source pair — the "which sources copy from each
    // other" audit that decides dedup scope (within-source vs
    // global). The source lookup is a doc→source projection joined on
    // the pair endpoints (doc-keyed hash joins); pair volume is
    // LSH-bounded, never quadratic --------------------------------
    "q144_cross_source_dups" -> Q(
      impl = (s, d) => {
        val docs = Tables.docsParallel(s, d)
          .withColumn("t", TextFns.tokens(col("text")))
        // one-pass per-doc signatures: no shingle explode, no
        // corpus-wide groupBy shuffle (bit-equal to the exploded form)
        val sigs = MinHashLsh.signaturesFromTokens(docs, "doc_id", "t",
          3, MinhashK)
        val pairs = MinHashLsh.candidatePairs(sigs, "doc_id", MinhashK, Bands)
          .filter(col("est") >= 0.5)
        val src = Tables.load(s, d, "documents").select("doc_id", "source")
        pairs
          .join(src.toDF("a", "sa"), "a")
          .join(src.toDF("b", "sb"), "b")
          .select(least(col("sa"), col("sb")).as("s1"),
            greatest(col("sa"), col("sb")).as("s2"))
          .groupBy("s1", "s2").agg(count(lit(1)).as("n_pairs"))
          .orderBy("s1", "s2")
      },
      oracle = Some(s"""
        WITH ${Extended2.lshPairCtes(0.5)},
        src AS (SELECT doc_id, source FROM documents)
        SELECT least(x.source, y.source) AS s1,
               greatest(x.source, y.source) AS s2,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs p
          JOIN src x ON x.doc_id = p.a
          JOIN src y ON y.doc_id = p.b
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- event path mining: the 10 most frequent ordered 3-event
    // sequences. The sequence window partitions on user_id
    // (high-cardinality, so no giant task) with a total (us,
    // event_id) order — unique event ids make the lead deterministic
    // under timestamp ties. The global count shuffles on the 3-gram
    // key; the final top-10 is TakeOrdered ------------------------
    "q145_event_paths" -> Q(
      impl = (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("us"), col("event_id"))
          .withColumn("a", col("event_type"))
          .withColumn("b", lead("event_type", 1).over(w))
          .withColumn("c", lead("event_type", 2).over(w))
          .filter(col("c").isNotNull)
          .groupBy("a", "b", "c").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("a"), col("b"), col("c"))
          .limit(10)
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
                   FROM events),
        w AS (SELECT event_type AS a,
                lead(event_type, 1) OVER uw AS b,
                lead(event_type, 2) OVER uw AS c
              FROM e WINDOW uw AS (PARTITION BY user_id ORDER BY us, event_id))
        SELECT a, b, c, CAST(count(*) AS BIGINT) AS n
        FROM w WHERE c IS NOT NULL
        GROUP BY 1, 2, 3 ORDER BY n DESC, a, b, c LIMIT 10"""),
      bench = true),

    // ---- per-type equi-width value histogram (10 bins over the
    // type's own [min, max]): bounds are a group-cardinality-sized
    // broadcast back; bin assignment is pure per-row arithmetic on
    // identical doubles in both engines, and only integer counts are
    // emitted. The degenerate all-equal-values group (mx = mn) pins
    // everything to bin 0 ------------------------------------------
    "q146_value_histogram" -> Q(
      impl = (s, d) => {
        val ev = Tables.events(s, d).select(col("event_type"), col("value"))
        val bounds = ev.groupBy("event_type")
          .agg(min("value").as("mn"), max("value").as("mx"))
        ev.join(broadcast(bounds), "event_type")
          .withColumn("bin",
            when(col("mx") === col("mn"), 0L).otherwise(
              least(lit(9L), greatest(lit(0L),
                floor((col("value") - col("mn")) /
                  ((col("mx") - col("mn")) / 10.0)).cast("long")))))
          .groupBy("event_type", "bin").agg(count(lit(1)).as("n"))
          .orderBy("event_type", "bin")
      },
      oracle = Some("""
        WITH s AS (SELECT event_type, min(value) AS mn, max(value) AS mx
                   FROM events GROUP BY 1)
        SELECT e.event_type,
               CASE WHEN s.mx = s.mn THEN 0
                    ELSE CAST(least(9, greatest(0,
                      floor((e.value - s.mn) / ((s.mx - s.mn) / 10.0))))
                      AS BIGINT) END AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM events e JOIN s ON s.event_type = e.event_type
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- incremental aggregate maintenance end-to-end: the events
    // table split into three append batches, each reduced to its
    // per-key partial state, states merged and finalized — and the
    // result must equal the direct one-shot aggregate (the oracle).
    // At 100 TB the merge inputs are O(|keys|) state tables, so the
    // nightly update never rescans the base (operators.IncrementalAgg;
    // associativity is spec-pinned). avg's integer division assumes a
    // non-negative sum (events.value ≥ 0 at every SF) — the usual
    // truncate-vs-floor caveat of the engine-wide div contract ------
    "q147_incremental_agg" -> Q(
      impl = (s, d) => {
        import graft.operators.IncrementalAgg
        val ev = Tables.events(s, d)
        val batches = Seq(
          ev.filter(col("user_id") % 3 === 0),
          ev.filter(col("user_id") % 3 === 1),
          ev.filter(col("user_id") % 3 === 2))
        IncrementalAgg.finalize(IncrementalAgg.merge(
          batches.map(b => IncrementalAgg.init(b, Seq("event_type"), "value")),
          Seq("event_type")))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH q AS (SELECT event_type,
                          CAST(round(value * 1000000) AS BIGINT) AS vm
                   FROM events)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(vm) AS BIGINT) AS sum_micro,
               CAST(sum(vm) AS BIGINT) // count(*) AS avg_micro,
               min(vm) AS min_micro, max(vm) AS max_micro
        FROM q GROUP BY 1 ORDER BY 1"""),
      bench = true),

    // ---- the native grouped top-k operator end-to-end (custom
    // LogicalPlan + SparkStrategy + partial/final SparkPlan pair,
    // graft.plans.GroupedTopKPlan): 3 longest docs per source under a
    // total order. The plan is bounded heaps on both sides of ONE
    // hash exchange — no per-group sort, and the map-side partial
    // caps the shuffle at k rows per (partition, group); the window
    // SQL below is the ORACLE's formulation, not the plan ----------
    "q148_native_grouped_topk" -> Q(
      impl = (s, d) => {
        import graft.operators.NativeGroupedTopK
        NativeGroupedTopK.topK(
          Tables.load(s, d, "documents")
            .select(col("doc_id"), col("source"), col("n_chars")),
          Seq("source"), Seq(("n_chars", false), ("doc_id", true)), 3)
          .orderBy("source", "doc_id")
      },
      oracle = Some("""
        WITH r AS (SELECT doc_id, source, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY n_chars DESC, doc_id) AS rk
                   FROM documents)
        SELECT doc_id, source, n_chars FROM r WHERE rk <= 3
        ORDER BY source, doc_id"""),
      bench = true),

    // ---- tombstone delete propagation (right-to-be-forgotten sweep):
    // a deterministic delete-list (here: every doc whose md5 starts
    // with 'a' — standing in for an external tombstone table) is
    // anti-joined against the store; per-source retained/deleted
    // accounting comes out of the same pass. One hash shuffle on the
    // id key; at 100 TB the tombstone side is the small one →
    // broadcast anti join, and the rewrite composes with
    // `operators.Compact` for the physical file sweep --------------
    "q149_tombstone_sweep" -> Q(
      impl = (s, d) => {
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
        val tombstones = docs.filter(col("h").startsWith("a"))
          .select(col("doc_id").as("del_id"))
        val retained = docs
          .join(broadcast(tombstones), col("doc_id") === col("del_id"), "left_anti")
        // totals drive the output (left join) so a fully-deleted
        // source still reports, with n_retained = 0
        docs.groupBy("source").agg(count(lit(1)).as("n_total"))
          .join(retained.groupBy("source").agg(count(lit(1)).as("nr")),
            Seq("source"), "left")
          .select(col("source"),
            coalesce(col("nr"), lit(0L)).as("n_retained"),
            (col("n_total") - coalesce(col("nr"), lit(0L))).as("n_deleted"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH t AS (SELECT doc_id FROM documents
                   WHERE md5(text) LIKE 'a%'),
        r AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_retained
              FROM documents d
              WHERE d.doc_id NOT IN (SELECT doc_id FROM t)
              GROUP BY 1),
        a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_total
              FROM documents GROUP BY 1)
        SELECT a.source, coalesce(r.n_retained, 0) AS n_retained,
               a.n_total - coalesce(r.n_retained, 0) AS n_deleted
        FROM a LEFT JOIN r ON r.source = a.source
        ORDER BY a.source""")),

    // ---- sketch-merge distinct counts through a rollup: per-type AND
    // grand-total distinct users in one pass — the grand-total row is
    // the UNION of the per-type HLL sketches (mergeability is what
    // makes the sketch the 100 TB path; the exact rollup would carry
    // every user id to the coordinator of each grouping set). Each
    // engine runs its own sketch (Spark HLL++, DuckDB HLL) against
    // its own exact rollup; the 10% contract + exact counts must
    // hash-match (the q51/q143 pattern) ----------------------------
    "q150_sketch_rollup" -> Q(
      impl = (s, d) =>
        Tables.events(s, d)
          .rollup("event_type")
          .agg(approx_count_distinct(col("user_id"), 0.02).as("ap"),
            count_distinct(col("user_id")).as("exact_users"))
          .select(
            coalesce(col("event_type"), lit("ALL")).as("event_type"),
            col("exact_users"),
            (abs(col("ap") - col("exact_users")) <=
              col("exact_users") * 0.10).as("approx_ok"))
          .orderBy("event_type"),
      oracle = Some("""
        SELECT coalesce(event_type, 'ALL') AS event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
               abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
                 <= count(DISTINCT user_id) * 0.10 AS approx_ok
        FROM events GROUP BY ROLLUP (event_type)
        ORDER BY event_type"""))
  )
}
