package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VecFns
import graft.functions.expressions.GraftFunctions
import graft.operators.TopK

/** Similarity search over the `embeddings` table: brute-force cosine
  * top-k (the exactness baseline) and a random-hyperplane LSH-bucketed
  * ANN (the scale path: candidate generation becomes an equi-join on a
  * bucket id instead of a cross join).
  *
  * All scores are exact: vectors are quantized to longs, dot products
  * and norms are integer sums (associative → partitioning-independent),
  * and the final cosine is a deterministic double expression. See
  * `VecFns`.
  */
object VectorQueries {

  private val NQueries = 20 // vec_id < 20 are the query vectors
  private val K = 5
  private val Dim = 64
  private val NPlanes = 8

  private[queries] def quantized(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    // Parallel read matters here: this frame is the *streamed* side of
    // every broadcast scoring join below, so its partition count is
    // the scoring parallelism (Tables.embeddingsParallel).
    Tables.embeddingsParallel(s, d)
      .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
      .withColumn("nsq", VecFns.dotQFast(col("vq"), col("vq")))
  }

  /** Shared oracle CTEs: element-wise quantized vectors + norms. */
  private[queries] def quantCtes: String = s"""
        f AS (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings),
        qv AS (SELECT vec_id, i,
                      CAST(round(CAST(x AS DOUBLE) * ${VecFns.Scale}) AS BIGINT) AS e
               FROM f),
        norms AS (SELECT vec_id, CAST(sum(e * e) AS BIGINT) AS nsq
                  FROM qv GROUP BY vec_id)"""

  /** Hyperplane-sign bucket ids in SQL — the exact integer mirror of
    * `VecFns.lshBucket` (same md5-derived ±1 weights, same bit
    * packing). Depends on `quantCtes`'s `qv`. Shared with q127's
    * bucket-centroid dedup so both oracles pin ONE construction.
    */
  private[queries] def lshBucketCtes: String = {
    val weightRows = (for {
      j <- 0 until NPlanes
      i <- 1 to Dim
    } yield s"($j,$i,${VecFns.hyperplaneWeight(j, i - 1)})").mkString(",")
    val powerRows = (0 until NPlanes).map(j => s"($j,${1L << j})").mkString(",")
    s"""
        w(j, i, wt) AS (VALUES $weightRows),
        pw(j, pv) AS (VALUES $powerRows),
        proj AS (
          SELECT qv.vec_id, w.j, CAST(sum(qv.e * w.wt) AS BIGINT) AS p
          FROM qv JOIN w ON qv.i = w.i GROUP BY 1, 2),
        buckets AS (
          SELECT vec_id,
                 CAST(sum(CASE WHEN p >= 0 THEN pv ELSE 0 END) AS BIGINT) AS bucket
          FROM proj JOIN pw ON proj.j = pw.j GROUP BY vec_id)"""
  }

  private[queries] val LshNPlanes: Int = NPlanes
  private[queries] val LshDim: Int = Dim

  private def rankedSelect: String = s"""
        scored AS (
          SELECT d.q_id, d.n_id,
                 CAST(d.dot AS DOUBLE)
                   / (sqrt(CAST(qa.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cos
          FROM dots d
            JOIN norms qa ON qa.vec_id = d.q_id
            JOIN norms nb ON nb.vec_id = d.n_id),
        ranked AS (
          SELECT q_id, n_id, cos, row_number() OVER (
            PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
          FROM scored)
        SELECT q_id, rk, n_id, round(cos, 6) AS cos_r
        FROM ranked WHERE rk <= $K ORDER BY q_id, rk"""

  val queries: Map[String, Q] = Map(
    // ---- IVF ANN (k-means coarse quantizer; the quantizer is data-
    // trained but deterministic, so the oracle re-trains the identical
    // model and bakes it into the SQL — see AnnOracles; recall vs
    // brute force additionally pinned by VectorSpec) ------------------
    "q54_ann_ivf" -> Q(
      impl = (s, d) => {
        val all = quantized(s, d)
        val model = graft.operators.Ivf.train(
          Tables.load(s, d, "embeddings"), "embedding", k = 16)
        val q = all.filter(col("vec_id") < NQueries)
        graft.operators.Ivf.search(all, q, "vec_id", model,
          nprobe = 6, topK = K)
      },
      oracle = None,
      oracleGen = Some((s, d) => AnnOracles.ivfOracle(
        graft.operators.Ivf.train(
          Tables.load(s, d, "embeddings"), "embedding", k = 16),
        NQueries, nprobe = 6, k = K))),

    // ---- brute-force cosine top-k ----------------------------------
    "q30_embed_knn" -> Q(
      impl = (s, d) => {
        val all = quantized(s, d)
        val q = broadcast(
          all.filter(col("vec_id") < NQueries).toDF("q_id", "q_vq", "q_nsq"))
        val v = all.toDF("n_id", "n_vq", "n_nsq")
        val scored = v.crossJoin(q)
          .filter(col("q_id") =!= col("n_id"))
          .withColumn("dot", VecFns.dotQFast(col("q_vq"), col("n_vq")))
          .withColumn("cos", VecFns.cosineFromQ(col("dot"), col("q_nsq"), col("n_nsq")))
        TopK.perGroup(scored, Seq("q_id"), Seq(col("cos").desc, col("n_id").asc), K)
          .select(col("q_id"), col("rk"), col("n_id"), round(col("cos"), 6).as("cos_r"))
          .orderBy("q_id", "rk")
      },
      oracle = Some(s"""
        WITH $quantCtes,
        dots AS (
          SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                 CAST(sum(a.e * b.e) AS BIGINT) AS dot
          FROM qv a JOIN qv b
            ON a.i = b.i AND a.vec_id < $NQueries AND a.vec_id <> b.vec_id
          GROUP BY 1, 2),
        $rankedSelect"""),
      bench = true),

    // ---- LSH-bucketed ANN ------------------------------------------
    "q31_ann_lsh" -> Q(
      impl = (s, d) => {
        val all = quantized(s, d)
          .withColumn("bucket", VecFns.lshBucket(col("vq"), NPlanes, Dim))
        val q = broadcast(
          all.filter(col("vec_id") < NQueries)
            .toDF("q_id", "q_vq", "q_nsq", "bucket"))
        val v = all.toDF("n_id", "n_vq", "n_nsq", "bucket")
        val cand = v.join(q, "bucket").filter(col("q_id") =!= col("n_id"))
        val scored = cand
          .withColumn("dot", VecFns.dotQFast(col("q_vq"), col("n_vq")))
          .withColumn("cos", VecFns.cosineFromQ(col("dot"), col("q_nsq"), col("n_nsq")))
        TopK.perGroup(scored, Seq("q_id"), Seq(col("cos").desc, col("n_id").asc), K)
          .select(col("q_id"), col("rk"), col("n_id"), round(col("cos"), 6).as("cos_r"))
          .orderBy("q_id", "rk")
      },
      oracle = Some {
        s"""
        WITH $quantCtes,
        $lshBucketCtes,
        cand AS (
          SELECT q.vec_id AS q_id, v.vec_id AS n_id
          FROM buckets q JOIN buckets v
            ON q.bucket = v.bucket AND q.vec_id < $NQueries AND q.vec_id <> v.vec_id),
        dots AS (
          SELECT c.q_id, c.n_id, CAST(sum(a.e * b.e) AS BIGINT) AS dot
          FROM cand c
            JOIN qv a ON a.vec_id = c.q_id
            JOIN qv b ON b.vec_id = c.n_id AND b.i = a.i
          GROUP BY 1, 2),
        $rankedSelect"""
      })
  )
}
