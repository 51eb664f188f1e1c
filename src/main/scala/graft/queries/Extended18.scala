package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFns, VecFns}

/** Round-9 batch: time-series smoothing (EWMA), deterministic epoch
  * sharding, a Johnson–Lindenstrauss distance-preservation audit of
  * the ±1 random projection used by the embedding LSH family,
  * per-source score calibration (cross-source-comparable quality
  * gates), and BM25 retrieval scoring.
  */
object Extended18 {

  private val Alpha = 0.3       // EWMA smoothing factor
  private val NShards = 32      // epoch shard count
  private val JlPlanes = 16     // projection dims for the JL audit
  private val Dim = 64          // embedding dims
  private[queries] val Stopwords = Seq("the", "a", "of", "and", "to")
  private[queries] val Bm25Terms = Seq("join", "window", "hash", "scan", "filter")

  val queries: Map[String, Q] = Map(
    // ---- per-customer EWMA of order totals: e_1 = x_1, e_i = α·x_i
    // + (1−α)·e_{i−1}, evaluated in closed form as one weighted sum
    // (w_i = α(1−α)^{N−i}, w_1 = (1−α)^{N−1}) so the whole smoothing
    // is two window columns + one groupBy — no per-row recursion.
    // Scale shape: groups are per-customer (many, small), where the
    // hash-partitioned WindowExec is already distributed (the q116
    // rule); the weighted sum rides the same partitioning -----------
    "q170_ewma" -> Q(
      impl = (s, d) => {
        val byTime = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val whole = Window.partitionBy("o_custkey")
        Tables.load(s, d, "orders")
          .select(col("o_custkey"), col("o_totalprice"),
            col("o_orderdate"), col("o_orderkey"))
          .withColumn("rn", row_number().over(byTime))
          .withColumn("nn", count(lit(1)).over(whole))
          .withColumn("wt",
            when(col("rn") === 1, pow(lit(1 - Alpha), col("nn") - 1))
              .otherwise(lit(Alpha) * pow(lit(1 - Alpha), col("nn") - col("rn"))))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice") * col("wt")), 2).as("ewma"))
          .orderBy("o_custkey")
      },
      oracle = Some(s"""
        WITH w AS (
          SELECT o_custkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS rn,
                 count(*) OVER (PARTITION BY o_custkey) AS nn
          FROM orders)
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice * CASE WHEN rn = 1
                 THEN pow(${1 - Alpha}, nn - 1)
                 ELSE $Alpha * pow(${1 - Alpha}, nn - rn) END), 2) AS ewma
        FROM w GROUP BY o_custkey ORDER BY o_custkey"""),
      bench = true),

    // ---- deterministic epoch sharding: every doc hashes to one of
    // NShards training shards via a seeded md5 bucket (the q163
    // construction — stable under reshuffles and corpus growth);
    // per-shard doc/token mass shows the stochastic balance a hash
    // shard gives. Pure per-row projection + one hash aggregation —
    // embarrassingly parallel at any scale ---------------------------
    "q171_epoch_shard" -> Q(
      impl = (s, d) => {
        val shard = conv(substring(
            md5(concat(lit("epoch0|"), col("doc_id"))), 1, 7), 16, 10)
          .cast("long") % NShards
        Tables.load(s, d, "documents")
          .select(col("doc_id"), shard.as("shard"),
            TextFns.tokenCount(col("text")).cast("long").as("n_tok"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
            min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
          .orderBy("shard")
      },
      oracle = Some(s"""
        WITH a AS (
          SELECT doc_id,
                 CAST('0x' || substr(md5('epoch0|' || doc_id), 1, 7) AS BIGINT)
                   % $NShards AS shard,
                 len(string_split(text, ' ')) AS n_tok
          FROM documents)
        SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM a GROUP BY shard ORDER BY shard"""),
      bench = true),

    // ---- Johnson–Lindenstrauss audit of the ±1 projection family:
    // project quantized embeddings 64→16 dims with the deterministic
    // hyperplane matrix, and measure how well squared distances
    // survive (ratio = |P(a−b)|²/16 ÷ |a−b|²; JL says ≈ 1). Pair set
    // = consecutive vec_ids (a deterministic O(N) probe, no N²). All
    // quantities integer until two divisions, so the audit hashes
    // exactly cross-engine. The op that certifies a projection before
    // the cheap 16-dim representation replaces the full vector in a
    // dedup/ANN tier -------------------------------------------------
    "q172_jl_audit" -> Q(
      impl = (s, d) => {
        graft.functions.expressions.GraftFunctions.register(s)
        val e = Tables.embeddingsParallel(s, d)
          .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
        val pairs = e.toDF("aid", "avq")
          .join(e.toDF("bid", "bvq"), col("bid") === col("aid") + 1)
          .withColumn("diff", zip_with(col("avq"), col("bvq"), (x, y) => x - y))
        val dq = VecFns.dotQFast(col("diff"), col("diff"))
        val dp = (0 until JlPlanes).map { j =>
          val w = typedlit((0 until Dim).map(i => VecFns.hyperplaneWeight(j, i)))
          val p = VecFns.dotQFast(col("diff"), w)
          p * p
        }.reduce(_ + _)
        pairs
          .withColumn("dq", dq).withColumn("dp", dp)
          .filter(col("dq") > 0)
          .withColumn("ratio",
            (col("dp").cast("double") / JlPlanes) / col("dq").cast("double"))
          .agg(count(lit(1)).as("n_pairs"),
            round(avg("ratio"), 6).as("mean_ratio"),
            round(min("ratio"), 6).as("min_ratio"),
            round(max("ratio"), 6).as("max_ratio"),
            sum(when(col("ratio").between(0.5, 2.0), 1L).otherwise(0L))
              .as("n_in_band"))
      },
      oracle = Some {
        val weightRows = (for {
          j <- 0 until JlPlanes
          i <- 1 to Dim
        } yield s"($j,$i,${VecFns.hyperplaneWeight(j, i - 1)})").mkString(",")
        s"""
        WITH ${VectorQueries.quantCtes},
        dv AS (
          SELECT a.vec_id AS aid, a.i, a.e - b.e AS de
          FROM qv a JOIN qv b ON b.vec_id = a.vec_id + 1 AND b.i = a.i),
        dq AS (SELECT aid, CAST(sum(de * de) AS BIGINT) AS dq
               FROM dv GROUP BY aid),
        ew(j, i, wt) AS (VALUES $weightRows),
        pj AS (
          SELECT dv.aid, ew.j, CAST(sum(dv.de * ew.wt) AS BIGINT) AS p
          FROM dv JOIN ew ON dv.i = ew.i GROUP BY 1, 2),
        dp AS (SELECT aid, CAST(sum(p * p) AS BIGINT) AS dp
               FROM pj GROUP BY aid),
        r AS (
          SELECT (CAST(dp AS DOUBLE) / $JlPlanes) / CAST(dq.dq AS DOUBLE) AS ratio
          FROM dq JOIN dp USING (aid) WHERE dq.dq > 0)
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               round(avg(ratio), 6) AS mean_ratio,
               round(min(ratio), 6) AS min_ratio,
               round(max(ratio), 6) AS max_ratio,
               CAST(sum(CASE WHEN ratio BETWEEN 0.5 AND 2.0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_in_band
        FROM r"""
      },
      bench = true),

    // ---- per-source score calibration: each source's quality-score
    // distribution maps to its own ECDF, making "top decile" mean the
    // same thing in every source before a global gate (raw thresholds
    // over-select verbose sources). Distributed shape: scores bucket
    // per (source, score) FIRST, the ordered prefix-sum window runs
    // over the aggregated bucket table (bounded: distinct scores per
    // source), never over raw docs — the q81-class per-group sort on
    // the full corpus never appears ----------------------------------
    "q173_score_calibration" -> Q(
      impl = (s, d) => {
        val docs = Tables.load(s, d, "documents")
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("source"),
            TextFns.stopwordRatio(col("text"), Stopwords).as("score"))
        val buckets = docs.groupBy("source", "score")
          .agg(count(lit(1)).as("cnt"))
        val cumW = Window.partitionBy("source").orderBy("score")
          .rowsBetween(Window.unboundedPreceding, 0)
        val totW = Window.partitionBy("source")
        buckets
          .withColumn("cum", sum("cnt").over(cumW))
          .withColumn("n", sum("cnt").over(totW))
          .withColumn("ecdf", col("cum").cast("double") / col("n"))
          .filter(col("ecdf") >= 0.9)
          .groupBy("source")
          .agg(max("n").as("n_docs"), sum("cnt").as("n_gated"),
            min("score").as("gate_score"),
            round(sum(col("score") * col("cnt")) / sum("cnt"), 6)
              .as("mean_gated"))
          .orderBy("source")
      },
      oracle = Some(s"""
        WITH sc AS (
          SELECT doc_id, source,
                 round(len(list_filter(string_split(text, ' '),
                   x -> x IN (${Stopwords.map("'" + _ + "'").mkString(",")})))
                   / len(string_split(text, ' ')), 4) AS score
          FROM documents WHERE length(text) > 0),
        b AS (SELECT source, score, CAST(count(*) AS BIGINT) AS cnt
              FROM sc GROUP BY 1, 2),
        e AS (
          SELECT source, score, cnt,
                 sum(cnt) OVER (PARTITION BY source ORDER BY score
                   ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(cnt) OVER (PARTITION BY source) AS n
          FROM b)
        SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
               CAST(sum(cnt) AS BIGINT) AS n_gated,
               min(score) AS gate_score,
               round(sum(score * cnt) / sum(cnt), 6) AS mean_gated
        FROM e WHERE CAST(cum AS DOUBLE) / n >= 0.9
        GROUP BY source ORDER BY source"""),
      bench = true),

    // ---- BM25 retrieval scoring for a fixed query over the corpus:
    // Robertson idf = ln(1 + (N−df+0.5)/(df+0.5)), k1 = 1.2, b = 0.75
    // with doc-length normalization against the corpus mean. Shapes:
    // the explode filters to the query terms IMMEDIATELY (the
    // high-cardinality token stream dies at the scan), term stats and
    // corpus stats are scalar-tiny → broadcast, scoring aggregates per
    // doc on one shuffle, and the final cut is orderBy+limit —
    // TakeOrdered, not a global sort. The ordering key is the ROUNDED
    // score (+ doc_id), so the top-20 set is engine-exact ------------
    "q174_bm25" -> Q(
      impl = (s, d) => {
        val docs = Tables.docsParallel(s, d)
          .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
          .withColumn("len", size(col("t")))
        val stats = docs.agg(count(lit(1)).as("n"),
          sum("len").as("sumlen"))
        val tf = docs
          .select(col("doc_id"), col("len"), explode(col("t")).as("tok"))
          .filter(col("tok").isin(Bm25Terms.map(x => x: Any): _*))
          .groupBy("doc_id", "len", "tok").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("tok")
          .agg(count_distinct(col("doc_id")).as("dfreq"))
        tf.join(broadcast(dfreq), "tok")
          .crossJoin(broadcast(stats))
          .withColumn("avglen",
            col("sumlen").cast("double") / col("n"))
          .withColumn("idf", log(lit(1.0) +
            (col("n") - col("dfreq") + 0.5) / (col("dfreq") + 0.5)))
          .withColumn("contrib",
            col("idf") * (col("tf") * 2.2) /
              (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("len") / col("avglen"))))
          .groupBy("doc_id")
          .agg(round(sum("contrib"), 6).as("bm25"),
            count(lit(1)).as("n_terms"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(20)
      },
      oracle = Some(s"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        dl AS (SELECT doc_id, len(t) AS len, t FROM d),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(len) AS BIGINT) AS sumlen FROM dl),
        tf AS (
          SELECT doc_id, len, tok, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, len, unnest(t) AS tok FROM dl)
          WHERE tok IN (${Bm25Terms.map("'" + _ + "'").mkString(",")})
          GROUP BY 1, 2, 3),
        df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfreq
               FROM tf GROUP BY tok),
        sc AS (
          SELECT tf.doc_id,
                 ln(1.0 + (st.n - df.dfreq + 0.5) / (df.dfreq + 0.5))
                   * (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (0.25 + 0.75 * tf.len
                     / (CAST(st.sumlen AS DOUBLE) / st.n))) AS contrib
          FROM tf JOIN df USING (tok) CROSS JOIN st)
        SELECT doc_id, round(sum(contrib), 6) AS bm25,
               CAST(count(*) AS BIGINT) AS n_terms
        FROM sc GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 20"""),
      bench = true))
}
