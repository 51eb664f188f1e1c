package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{MinHashLsh, TextFns}
import graft.operators.Components
import graft.streaming.EventStream

/** Sixth extension batch (round 5): the remaining corpus-curation
  * shapes a training-data release pipeline runs — mixture-weighted
  * source sampling, near-dup clusters collapsed to a canonical
  * representative, unigram-LM quality scoring, stopword/boilerplate
  * scrubbing — plus the one streaming join family member the engine
  * didn't yet exercise (stream-static broadcast enrichment).
  */
object Extended6 {

  private val MinhashK = 12
  private val Bands = 4

  val queries: Map[String, Q] = Map(
    // ---- stream-static enrichment: events stream ⋈ broadcast
    // customer dim → per-(nation, type) stateful aggregate. No join
    // state store — the static side is re-planned per micro-batch —
    // so state is bounded by the aggregate's group count, not the
    // stream. Equals the batch join exactly --------------------------
    "q100_stream_static_enrich" -> Q(
      impl = (s, d) => EventStream.staticEnrichedCounts(s, d),
      oracle = Some("""
        SELECT c_nationkey, event_type,
               CAST(count(*) AS BIGINT) AS n, round(sum(value), 3) AS v
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2 ORDER BY c_nationkey, event_type""")),

    // ---- mixture-weighted deterministic sampling: each source gets a
    // target keep-rate (the training-mixture weight) and docs are kept
    // by an md5-prefix Bernoulli draw against that rate — reproducible
    // on any engine, no RNG state, embarrassingly parallel (pure
    // per-row predicate, no shuffle at all before the output sort).
    // The mixture-construction step of corpus assembly ---------------
    "q101_mixture_sample" -> Q(
      impl = (s, d) => {
        val docs = Tables.load(s, d, "documents")
        // explicit contract: sources without a trailing digit group are
        // excluded up front (both engines), instead of leaking through
        // divergent cast-of-empty-string semantics
        val rawSuffix = regexp_extract(col("source"), "(\\d+)$", 1)
        val suffix = rawSuffix.cast("long")
        val rate = (suffix % 4 + 1) / lit(8.0) // 0.125 | 0.25 | 0.375 | 0.5
        val draw = conv(substring(
            md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 6),
          16, 10).cast("double") / lit(16777216.0)
        docs.filter(rawSuffix =!= "").filter(draw < rate)
          .select(col("doc_id"), col("source"),
            round(rate, 3).as("target_rate"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id, source,
               round((CAST(regexp_extract(source, '(\d+)$', 1) AS BIGINT) % 4
                      + 1) / 8.0, 3) AS target_rate
        FROM documents
        WHERE regexp_extract(source, '(\d+)$', 1) <> ''
          AND CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 6)
                   AS BIGINT) / 16777216.0
              < (CAST(regexp_extract(source, '(\d+)$', 1) AS BIGINT) % 4 + 1)
                / 8.0
        ORDER BY doc_id""")),

    // ---- near-dup clusters → canonical representative: LSH pairs →
    // connected components (as q61), then per cluster keep the
    // highest-quality member (longest doc, doc_id tiebreak) — the
    // "collapse duplicates, keep the best copy" release step. Docs in
    // no pair are their own singleton cluster via left join +
    // coalesce, so the output partitions the corpus. min_by carries
    // one winner per group through the hash aggregation — no window,
    // no per-group sort ----------------------------------------------
    "q102_cluster_canonical" -> Q(
      impl = (s, d) => {
        val docs0 = Tables.docsParallel(s, d)
          .withColumn("t", TextFns.tokens(col("text")))
        val sigs =
          MinHashLsh.signaturesFromTokens(docs0, "doc_id", "t", 3, MinhashK)
        val pairs = MinHashLsh.candidatePairs(sigs, "doc_id", MinhashK, Bands)
          .filter(col("est") >= 0.5)
        val comp = Components.connectedComponents(pairs, "a", "b")
          .withColumnRenamed("node", "doc_id")
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("n_chars"))
        // (quality desc, doc_id asc) as a lexicographic struct key —
        // no packed-scalar range assumptions at any n_chars/doc_id
        val key = struct((-col("n_chars")).as("q"), col("doc_id").as("id"))
        docs.join(comp, Seq("doc_id"), "left")
          .withColumn("component", coalesce(col("component"), col("doc_id")))
          .groupBy("component")
          .agg(min(key).getField("id").as("kept_doc"),
            max("n_chars").as("kept_chars"),
            count(lit(1)).as("n_members"))
          .orderBy("component")
      },
      oracle = Some(s"""
        WITH RECURSIVE ${Extended2.lshPairCtes(0.5)},
        sym AS (SELECT a AS x, b AS y FROM pairs
                UNION SELECT b, a FROM pairs),
        reach(node, lab) AS (
          SELECT x, x FROM sym
          UNION
          SELECT s.x, r.lab FROM sym s JOIN reach r ON r.node = s.y),
        comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
        lab AS (SELECT d.doc_id,
                       coalesce(c.component, d.doc_id) AS component,
                       d.n_chars
                FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
        SELECT component,
               min({'q': -n_chars, 'id': doc_id}).id AS kept_doc,
               CAST(max(n_chars) AS BIGINT) AS kept_chars,
               CAST(count(*) AS BIGINT) AS n_members
        FROM lab GROUP BY 1 ORDER BY component""")),

    // ---- unigram-LM quality score (CCNet-style): corpus unigram
    // frequencies → per-doc mean token negative log-probability. Low
    // score = common filler, high = rare-token soup; the standard
    // cheap LM proxy for quality filtering. Vocab is corpus-bounded
    // (≪ corpus size) → broadcast; the scalar token total rides the
    // same broadcast. Two shuffles total (vocab build, per-doc agg) --
    "q103_unigram_logprob" -> Q(
      impl = (s, d) => {
        val toks = Tables.docsParallel(s, d)
          .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        val tot = toks.agg(count(lit(1)).as("tot"))
        toks.join(broadcast(vocab), "tok")
          .crossJoin(broadcast(tot))
          .groupBy("doc_id")
          .agg(round(avg(log(col("tot") / col("c"))), 4).as("nll"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                      FROM documents),
        v AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
        t AS (SELECT count(*) AS tot FROM toks)
        SELECT doc_id, round(avg(ln(tot / c)), 4) AS nll
        FROM toks JOIN v USING (tok) CROSS JOIN t
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- stopword/boilerplate scrub: drop the given token list,
    // re-join, account for what was removed. Pure per-row higher-order
    // array ops (filter + array_join) — codegen'd, zero shuffle before
    // the output sort. The template-removal step of web-corpus
    // cleaning, with the scrub list as a parameter -------------------
    "q104_boilerplate_scrub" -> Q(
      impl = (s, d) => {
        val docs = Tables.load(s, d, "documents")
        val t = TextFns.tokens(col("text"))
        val kept = filter(t, tok => !tok.isin("a", "the"))
        docs.select(col("doc_id"),
            (size(t) - size(kept)).cast("long").as("n_removed"),
            md5(array_join(kept, " ")).as("clean_hash"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH f AS (SELECT doc_id, string_split(text, ' ') AS t,
                          list_filter(string_split(text, ' '),
                                      tok -> tok NOT IN ('a', 'the')) AS kept
                   FROM documents)
        SELECT doc_id,
               CAST(len(t) - len(kept) AS BIGINT) AS n_removed,
               md5(array_to_string(kept, ' ')) AS clean_hash
        FROM f ORDER BY doc_id"""))
  )
}
