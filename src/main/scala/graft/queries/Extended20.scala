package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFns, VecFns}
import graft.operators.Ivf

/** Round-11 batch: the three curation stages the engine did not yet
  * cover head-on —
  *
  *  - q178 SemDeDup (Abbas et al. 2023): semantic dedup that bounds
  *    the quadratic by comparing only WITHIN k-means clusters of the
  *    embedding space. The published recipe verbatim: cluster, then
  *    prune near-duplicates inside each cluster. Candidate generation
  *    is an equi-join on the cell id — never all-pairs.
  *  - q179 sequence-length bucketing: the padding-waste accounting a
  *    training batch assembler runs before choosing bucket boundaries
  *    (pad-to-bucket vs pad-to-max).
  *  - q180 CCNet-style perplexity bucketing (Wenzek et al. 2020):
  *    score every doc with a corpus-trained unigram LM and split each
  *    language into head/middle/tail terciles by that score.
  *
  * Determinism: q178 rides the exact integer-quantized vector stack
  * (VecFns — long dots/norms, one double division per pair) and the
  * q54 coarse quantizer whose training is seeded and bit-reproducible,
  * so its oracle is *generated* with the retrained centroids baked in
  * (AnnOracles.semDedupOracle). q179 is pure integer arithmetic. q180
  * quantizes each token's surprisal to integer micro-nats
  * (round(ln(tot/c)·1e6) — same double on both engines from the same
  * two BIGINTs) so per-doc sums are associative longs, and tercile
  * assignment orders by (integer score, doc_id) — fully tie-broken.
  */
object Extended20 {

  /** q178 cluster count. Test-scale value; at corpus scale SemDeDup
    * runs k ≈ N/⟨cluster⟩ (the paper uses 50k clusters for 100M+
    * docs) — the within-cell quadratic is bounded by ⟨cluster⟩², and
    * cells are numerous enough to hash-partition evenly.
    */
  private val SemK = 16
  /** q178 cosine threshold in micro-units (0.30): chosen against the
    * synthetic embeddings' cosine distribution (99.5th pct ≈ 0.32) so
    * the drop set is non-trivial; production SemDeDup runs ≥ 0.9 on
    * real, strongly-clustered embeddings.
    */
  private val TauMicro = 300000L
  /** q179 power-of-two bucket edges; docs are clipped to the last
    * edge (the assembler's max sequence length).
    */
  private val Edges = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)
  /** q180 tercile count (CCNet's head/middle/tail). */
  private val NTiles = 3

  /** Smallest bucket edge ≥ n (n already clipped into range). */
  private def bucketOf(n: Column): Column =
    Edges.init.foldRight(lit(Edges.last): Column) { (e, rest) =>
      when(n <= e, lit(e)).otherwise(rest)
    }

  val queries: Map[String, Q] = Map(
    // ---- SemDeDup: k-means cells (the q54 coarse quantizer — seeded
    // sample + fixed-iteration Lloyd's, so training is deterministic),
    // then inside each cell drop every vector that has an EARLIER
    // (lower-id) neighbor at cosine ≥ tau. The deterministic
    // "dominated by an earlier vector" form of the paper's
    // within-cluster pruning: a single self-equi-join on the cell id,
    // exact integer cosines, no iteration. 100 TB shape: candidate
    // pairs are bucketed by cell (k scales with N, keeping ⟨cell⟩ —
    // and so the per-cell quadratic — constant), the join is one hash
    // shuffle on a numerous key, and the verdict per vector is a
    // distinct + left anti semi — no driver state beyond the k×dim
    // centroid table folded into codegen --------------------------
    "q178_semdedup" -> Q(
      impl = (s, d) => {
        val model = Ivf.train(
          Tables.load(s, d, "embeddings"), "embedding", k = SemK)
        val cells = VectorQueries.quantized(s, d)
          .withColumn("cell", Ivf.assignCell(col("vq"), model).cast("long"))
        val a = cells.select(col("cell"), col("vec_id").as("a_id"),
          col("vq").as("a_vq"), col("nsq").as("a_nsq"))
        val b = cells.select(col("cell"), col("vec_id").as("b_id"),
          col("vq").as("b_vq"), col("nsq").as("b_nsq"))
        val dropped = a.join(b, "cell")
          .filter(col("a_id") < col("b_id"))
          .filter(VecFns.cosineFromQ(
            VecFns.dotQFast(col("a_vq"), col("b_vq")),
            col("a_nsq"), col("b_nsq")) >= lit(TauMicro) / lit(1000000.0))
          .select(col("b_id")).distinct()
        cells.join(dropped, cells("vec_id") === dropped("b_id"), "left")
          .select(col("cell"), col("vec_id"), col("b_id").isNotNull.as("drp"))
          .groupBy("cell")
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(when(col("drp"), 1L).otherwise(0L)).as("n_dropped"),
            md5(array_join(
              transform(array_sort(collect_list(when(!col("drp"), col("vec_id")))),
                x => x.cast("string")),
              ",")).as("kept_hash"))
          .orderBy("cell")
      },
      oracle = None,
      oracleGen = Some((s, d) => AnnOracles.semDedupOracle(
        Ivf.train(Tables.load(s, d, "embeddings"), "embedding", k = SemK),
        TauMicro)),
      bench = true),

    // ---- sequence-length bucketing: clip token counts to the max
    // sequence length, snap each doc to the smallest power-of-two
    // bucket that holds it, and account the padding a pad-to-bucket
    // assembler wastes per bucket (vs the tokens actually carried).
    // One narrow codegen'd projection + one 9-key aggregation — the
    // whole query is a map-side-combined scan at any scale ----------
    "q179_pad_buckets" -> Q(
      impl = (s, d) => {
        val n = least(size(TextFns.tokens(col("text"))).cast("long"), lit(Edges.last))
        val docs = Tables.docsParallel(s, d)
          .select(n.as("n"), bucketOf(n).as("bucket"))
        docs.groupBy("bucket")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n").as("sum_tokens"),
            sum(col("bucket") - col("n")).as("pad_tokens"))
          .withColumn("waste_bp",
            expr("(10000 * pad_tokens) div (n_docs * bucket)"))
          .orderBy("bucket")
      },
      oracle = Some {
        val caseExpr = Edges.init.reverse.foldLeft(s"${Edges.last}") {
          (rest, e) => s"CASE WHEN n <= $e THEN $e ELSE $rest END"
        }
        s"""
        WITH d AS (SELECT least(CAST(len(string_split(text, ' ')) AS BIGINT),
                               ${Edges.last}) AS n
                   FROM documents),
        b AS (SELECT n, CAST($caseExpr AS BIGINT) AS bucket FROM d),
        g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n) AS BIGINT) AS sum_tokens,
                     CAST(sum(bucket - n) AS BIGINT) AS pad_tokens
              FROM b GROUP BY bucket)
        SELECT bucket, n_docs, sum_tokens, pad_tokens,
               (10000 * pad_tokens) // (n_docs * bucket) AS waste_bp
        FROM g ORDER BY bucket"""
      },
      bench = true),

    // ---- CCNet perplexity bucketing: train the q103 unigram LM on
    // the corpus itself, score every doc by mean token surprisal in
    // integer micro-nats (round(ln(tot/c)·1e6) per token — the same
    // double from the same two BIGINTs on every engine; long sums →
    // associative → partitioning-independent), then ntile(3) per
    // language over (score, doc_id) into head/middle/tail. Scale
    // shape: the vocabulary is a broadcast (heavy-hitter counts), the
    // scoring pass is one token-exploded aggregation, and the tercile
    // split is a per-language window — languages are numerous and
    // bounded in CCNet's setting, the high-cardinality side of the
    // grouped-scan rule ---------------------------------------------
    "q180_ppl_buckets" -> Q(
      impl = (s, d) => {
        val toks = Tables.docsParallel(s, d)
          .select(col("doc_id"), col("lang"),
            explode(TextFns.tokens(col("text"))).as("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        val tot = toks.agg(count(lit(1)).as("tot"))
        val scored = toks.join(broadcast(vocab), "tok")
          .crossJoin(broadcast(tot))
          // Portability note: unlike +/−/×/sqrt, ln is not IEEE-754
          // correctly-rounded-guaranteed, so this leans on JVM
          // Math.log and DuckDB's libm agreeing to the last bit on
          // ratios of small integers (they do on every platform we
          // run; a 1-ulp divergence at a round(x*1e6) halfway point
          // would flip a micro-nat). The integer-exact paths (q103/
          // q118 fixed-point NLL) are the engine-exact alternative.
          .withColumn("surp",
            round(log(col("tot") / col("c")) * 1e6, 0).cast("long"))
          .groupBy("doc_id", "lang")
          .agg(sum("surp").as("snll"), count(lit(1)).as("ntok"))
          .withColumn("score", expr("snll div ntok"))
        scored
          .withColumn("bucket", ntile(NTiles).over(
            Window.partitionBy("lang").orderBy(col("score"), col("doc_id")))
            .cast("long"))
          .groupBy("lang", "bucket")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("ntok").as("sum_tokens"),
            min("score").as("min_score"),
            max("score").as("max_score"))
          .orderBy("lang", "bucket")
      },
      oracle = Some(s"""
        WITH toks AS (SELECT doc_id, lang,
                             unnest(string_split(text, ' ')) AS tok
                      FROM documents),
        v AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
        t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM toks),
        sc AS (SELECT doc_id, lang,
                      CAST(sum(CAST(round(ln(tot / c) * 1000000, 0) AS BIGINT))
                        AS BIGINT) AS snll,
                      CAST(count(*) AS BIGINT) AS ntok
               FROM toks JOIN v USING (tok) CROSS JOIN t
               GROUP BY 1, 2),
        sb AS (SELECT lang, snll // ntok AS score, ntok,
                      CAST(ntile($NTiles) OVER (PARTITION BY lang
                        ORDER BY snll // ntok, doc_id) AS BIGINT) AS bucket
               FROM sc)
        SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ntok) AS BIGINT) AS sum_tokens,
               CAST(min(score) AS BIGINT) AS min_score,
               CAST(max(score) AS BIGINT) AS max_score
        FROM sb GROUP BY 1, 2 ORDER BY lang, bucket"""),
      bench = true))
}
