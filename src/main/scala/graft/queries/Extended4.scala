package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFns, VecFns}
import graft.operators.{Components, EmbedNearDup, GlobalRank, GroupedPrefixSum}

/** Fourth extension batch (round 3): exact global ranking at scale via
  * `GlobalRank` (range-repartition + per-partition offsets), and the
  * two reference-implied index lookups over the ETL layout (symbol
  * search, ordered exon-of-gene retrieval) — see EtlQueries for the
  * fixture-based ETL queries themselves.
  */
object Extended4 {

  // q92 banded-LSH geometry (same 16-plane family as q53). Declared
  // before `queries`: the oracle SQL embeds these at Map construction.
  private val DupBands = 4
  private val DupPlanesPerBand = 4
  private val EmbDim = 64
  // q93/q94 packing geometry: 4096-token windows, 20k-token budget
  // (same declare-before-the-Map rule).
  private val PackWindow = 4096L
  private val TokenBudget = 20000L
  // q95 repetition flag threshold (duplicate-shingle fraction).
  private val RepThreshold = 0.2

  val queries: Map[String, Q] = Map(
    // ---- exact global rank without a global window: the scale path
    // promised at q69 — one range shuffle + per-partition offsets; a
    // partition-less row_number() over the same data would serialize
    // the whole table through one task -------------------------------
    "q89_global_rank" -> Q(
      impl = (s, d) => {
        val orders = Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        GlobalRank.withRank(orders,
            Seq(col("o_totalprice"), col("o_orderkey")), "rank")
          .select(col("o_orderkey"), col("o_totalprice"), col("rank"))
          .orderBy("rank")
      },
      oracle = Some("""
        SELECT o_orderkey, o_totalprice,
               CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                 AS BIGINT) AS rank
        FROM orders ORDER BY rank""")),

    // ---- embedding near-dup clustering: the full scale-shape
    // composition — banded hyperplane LSH candidates (equi-join) →
    // exact cosine verify → pointer-doubling connected components.
    // The oracle replicates the band construction and clusters with a
    // recursive reachability CTE -------------------------------------
    "q92_embed_components" -> Q(
      impl = (s, d) => {
        graft.functions.expressions.GraftFunctions.register(s)
        val all = Tables.embeddingsParallel(s, d)
          .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
          .withColumn("nsq", VecFns.dotQFast(col("vq"), col("vq")))
        val pairs = EmbedNearDup.bandedPairs(all, "vec_id",
          bands = DupBands, planesPerBand = DupPlanesPerBand,
          dim = EmbDim, minCos = 0.45)
        Components.connectedComponents(pairs, "a", "b")
          .select(col("node").as("vec_id"), col("component"))
          .orderBy("vec_id")
      },
      oracle = Some {
        val nPlanes = DupBands * DupPlanesPerBand
        val weightRows = (for {
          j <- 0 until nPlanes
          i <- 1 to EmbDim
        } yield s"($j,$i,${VecFns.hyperplaneWeight(j, i - 1)})").mkString(",")
        val pw = (0 until DupPlanesPerBand)
          .map(m => s"($m,${1L << m})").mkString(",")
        s"""
        WITH RECURSIVE
        f AS (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings),
        qv AS (SELECT vec_id, i,
                      CAST(round(CAST(x AS DOUBLE) * ${VecFns.Scale}) AS BIGINT) AS e
               FROM f),
        norms AS (SELECT vec_id, CAST(sum(e * e) AS BIGINT) AS nsq
                  FROM qv GROUP BY vec_id),
        w(j, i, wt) AS (VALUES $weightRows),
        pw(m, pv) AS (VALUES $pw),
        proj AS (
          SELECT qv.vec_id, w.j, CAST(sum(qv.e * w.wt) AS BIGINT) AS p
          FROM qv JOIN w ON qv.i = w.i GROUP BY 1, 2),
        bk AS (
          SELECT vec_id, j // $DupPlanesPerBand AS band,
                 CAST(sum(CASE WHEN p >= 0 THEN pv ELSE 0 END) AS BIGINT) AS key
          FROM proj JOIN pw ON pw.m = j % $DupPlanesPerBand
          GROUP BY 1, 2),
        cand AS (
          SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
          FROM bk x JOIN bk y
            ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
        dots AS (
          SELECT c.a, c.b, CAST(sum(xa.e * xb.e) AS BIGINT) AS dot
          FROM cand c
            JOIN qv xa ON xa.vec_id = c.a
            JOIN qv xb ON xb.vec_id = c.b AND xb.i = xa.i
          GROUP BY 1, 2),
        pairs AS MATERIALIZED (
          SELECT a, b FROM dots
            JOIN norms na ON na.vec_id = a
            JOIN norms nb ON nb.vec_id = b
          WHERE round(CAST(dot AS DOUBLE)
            / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))), 6)
            >= 0.45),
        sym AS MATERIALIZED (SELECT a AS x, b AS y FROM pairs
                UNION SELECT b, a FROM pairs),
        reach(node, lab) AS (
          SELECT x, x FROM sym
          UNION
          SELECT s.x, r.lab FROM sym s JOIN reach r ON r.node = s.y)
        SELECT node AS vec_id, min(lab) AS component
        FROM reach GROUP BY node ORDER BY vec_id"""
      }),

    // ---- sequence packing (concat-and-chunk, the standard LLM
    // pretraining layout): documents are concatenated per source in
    // doc_id order and cut into fixed 4096-token windows; each doc is
    // assigned the window its first token lands in. Scale shape: a
    // running-sum window partitioned by the ~20 sources would
    // serialize each source through ONE task; `GroupedPrefixSum`
    // range-partitions on (source, doc_id) so a 10 TB source spans
    // many tasks, with per-partition partials + broadcast offsets
    // supplying the carry — the GlobalRank pattern generalized to
    // grouped running sums --------------------------------------------
    "q93_sequence_packing" -> Q(
      impl = (s, d) => {
        val toks = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("source"),
            TextFns.tokenCount(col("text")).cast("long").as("n_tok"))
        GroupedPrefixSum.withRunningSum(toks, "source", Seq(col("doc_id")),
            "n_tok", "cum_before", inclusive = false)
          .withColumn("bin", expr(s"cum_before div $PackWindow"))
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("bin_tokens"))
          .orderBy("source", "bin")
      },
      oracle = Some(s"""
        WITH t AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          FROM documents),
        c AS (
          SELECT source, n_tok,
                 CAST(coalesce(sum(n_tok) OVER (PARTITION BY source
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
          FROM t)
        SELECT source, cum_before // $PackWindow AS bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS bin_tokens
        FROM c GROUP BY 1, 2 ORDER BY source, bin""")),

    // ---- token-budget corpus sampling: per source, take documents in
    // deterministic hash order until a token budget is filled — the
    // standard "N tokens per domain" curation step. Hash order makes
    // the sample uniform and engine-reproducible; the running-sum
    // cutoff is per-source, so no global coordination. Same
    // `GroupedPrefixSum` scale shape as q93: range-partitioned on
    // (source, h, doc_id), never one task per source ------------------
    "q94_token_budget_sample" -> Q(
      impl = (s, d) => {
        val t = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("source"),
            TextFns.tokenCount(col("text")).cast("long").as("n_tok"))
          .withColumn("h", md5(concat(lit("budget|"), col("doc_id"))))
        GroupedPrefixSum.withRunningSum(t, "source",
            Seq(col("h"), col("doc_id")), "n_tok", "cum", inclusive = true)
          .filter(col("cum") <= TokenBudget)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sampled_tokens"))
          .orderBy("source")
      },
      oracle = Some(s"""
        WITH t AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                 md5('budget|' || doc_id) AS h
          FROM documents),
        c AS (
          SELECT source, n_tok,
                 CAST(sum(n_tok) OVER (PARTITION BY source
                   ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS cum
          FROM t)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS sampled_tokens
        FROM c WHERE cum <= $TokenBudget
        GROUP BY source ORDER BY source""")),

    // ---- repetition filter (Gopher-style quality signal): fraction
    // of duplicated word-3-gram shingles per document — high values
    // flag boilerplate/spam for removal. One explode + one groupBy,
    // shuffle on doc_id only ----------------------------------------
    "q95_repetition_filter" -> Q(
      impl = (s, d) => {
        val sh = Tables.docsParallel(s, d)
          .withColumn("t", TextFns.tokens(col("text")))
          .select(col("doc_id"),
            explode(TextFns.wordShinglesFromTokens(col("t"), 3)).as("sh"))
        sh.groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            countDistinct("sh").as("n_unique"))
          .withColumn("rep_ratio",
            round(lit(1.0) - col("n_unique") / col("n_shingles"), 4))
          .withColumn("flagged", col("rep_ratio") > RepThreshold)
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
        idx AS (SELECT doc_id, t,
                       unnest(range(1, greatest(len(t) - 1, 1))) AS i
                FROM toks),
        sh AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
               FROM idx WHERE i + 2 <= len(t)),
        agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
                       CAST(count(DISTINCT sh) AS BIGINT) AS n_unique
                FROM sh GROUP BY doc_id)
        SELECT doc_id, n_shingles, n_unique,
               round(1.0 - CAST(n_unique AS DOUBLE) / n_shingles, 4)
                 AS rep_ratio,
               round(1.0 - CAST(n_unique AS DOUBLE) / n_shingles, 4)
                 > $RepThreshold AS flagged
        FROM agg ORDER BY doc_id"""))
  )
}
