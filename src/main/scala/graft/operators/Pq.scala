package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VecFns
import graft.operators.TopK

/** Product quantization (PQ) approximate nearest neighbor — the
  * compressed-domain scale path for vector search: the embedding is
  * split into `m` subvectors, each subspace gets its own small k-means
  * codebook, and a vector is stored as `m` byte-sized codes instead of
  * the full float array. Query scoring is ADC (asymmetric distance
  * computation): the query precomputes one lookup table per subspace
  * (`q_m · c_mj` for every centroid j), and a corpus row's approximate
  * dot product is just `m` table lookups — no per-row float math and,
  * crucially, the corpus side of the scoring join carries only the
  * codes, a ~`dim·4/m`-fold shrink of what shuffles/broadcast-probes
  * at 100 TB.
  *
  * Scale shape mirrors [[Ivf]]: training collects a bounded
  * hash-ordered sample to the driver (one collect, sliced per
  * subspace); encode and ADC scoring are pure Column expressions over
  * literal codebooks, so the corpus never leaves whole-stage codegen;
  * the candidate shortlist is re-ranked with the exact quantized
  * cosine so emitted scores stay engine-reproducible integers-then-
  * one-division (see [[VecFns]]).
  */
object Pq {

  /** `books(mi)(j)` = quantized centroid j of subspace mi (subDim longs). */
  final case class Model(m: Int, subDim: Int, books: Seq[Seq[Seq[Long]]])

  /** Train per-subspace codebooks on the same deterministic sample
    * construction as [[Ivf.train]] (one collect; the seeded shuffle is
    * applied to full vectors before slicing, so subspace codebooks stay
    * aligned with the IVF quantizer trained at the same seed).
    */
  def train(data: DataFrame, vecCol: String, m: Int, k: Int,
      seed: Long = 42L, maxSample: Int = 100000, iters: Int = 15): Model =
    trainFromShuffled(Ivf.shuffledSample(data, vecCol, seed, maxSample), m, k, iters)

  private[operators] def trainFromShuffled(shuffled: IndexedSeq[Array[Double]],
      m: Int, k: Int, iters: Int): Model = {
    require(shuffled.length >= k, s"need >= $k vectors to train")
    val dim = shuffled.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val books = (0 until m).map { mi =>
      val sub = shuffled.map(v =>
        java.util.Arrays.copyOfRange(v, mi * subDim, (mi + 1) * subDim))
      Ivf.lloyd(sub, k, iters).toSeq
        .map(c => c.toSeq.map(x => math.round(x * VecFns.Scale)))
    }
    Model(m, subDim, books)
  }

  /** Train the IVF coarse quantizer and the PQ codebooks off ONE
    * sample collect — the natural entry point for [[searchIvfPq]],
    * which otherwise pays two identical corpus scans. Produces
    * bit-identical models to separate `Ivf.train` / `Pq.train` calls
    * at the same (seed, maxSample): both trainers consume the same
    * deterministic shuffled sequence.
    */
  def trainIvfPq(data: DataFrame, vecCol: String, coarseK: Int, m: Int,
      k: Int, seed: Long = 42L, maxSample: Int = 100000,
      iters: Int = 15): (Ivf.Model, Model) = {
    val shuffled = Ivf.shuffledSample(data, vecCol, seed, maxSample)
    (Ivf.trainFromShuffled(shuffled, coarseK, iters),
      trainFromShuffled(shuffled, m, k, iters))
  }

  /** The codebooks as ONE nested literal — every PQ column builder
    * hangs off this single node, so the whole encode/score surface is
    * a handful of Catalyst nodes instead of the multi-thousand-node
    * per-centroid tree the composable form produced (planning cost on
    * repeated runs dominated execution; see
    * [[graft.functions.expressions.PqEncode]]).
    */
  private def booksLit(model: Model): Column = typedlit(model.books)

  /** Codes array: per subspace, argmin_j ||x_m − c_mj||² (ties →
    * lowest centroid id), via the native `pq_encode` expression.
    *
    * PRECONDITION (all Column-level builders here): the graft native
    * functions must be registered on the session
    * (`GraftFunctions.register(spark)` / `GraftExtensions`) or
    * analysis fails with "undefined function". The DataFrame-level
    * [[search]]/[[searchIvfPq]] entry points register defensively.
    */
  def encode(vq: Column, model: Model): Column =
    call_function("pq_encode", vq, booksLit(model))

  /** Query-side ADC tables: `luts[mi][j] = q_mi · c_mij` (exact longs). */
  def queryLuts(vq: Column, model: Model): Column =
    call_function("pq_luts", vq, booksLit(model))

  /** ADC approximate dot product: `m` codegen'd table lookups. */
  def adcDot(luts: Column, codes: Column): Column =
    call_function("adc_dot", luts, codes)

  /** Reconstruction squared norm: Σ_m |c_m,code_m|² from a literal
    * per-subspace norm table (codes → longs, no vector math).
    */
  def codedNormSq(codes: Column, model: Model): Column =
    call_function("pq_codenorm", codes,
      typedlit(model.books.map(_.map(c => c.map(x => x * x).sum))))

  /** ANN search: ADC-scored shortlist of `rerank` candidates per query,
    * re-ranked by exact quantized cosine to the final `topK`.
    *
    * @param data    (`n_id`, `n_vq`, `n_nsq`) quantized corpus
    * @param queries (`q_id`, `q_vq`, `q_nsq`) query subset
    */
  def search(data: DataFrame, queries: DataFrame, model: Model,
      rerank: Int, topK: Int): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(data.sparkSession)
    // corpus → codes once; the scoring join streams (n_id, m codes)
    val coded = data.select(col("n_id"), encode(col("n_vq"), model).as("codes"))
    val q = broadcast(queries.select(
      col("q_id"), queryLuts(col("q_vq"), model).as("luts"), col("q_nsq")))
    val approx = coded.crossJoin(q)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("acos", VecFns.cosineFromQ(
        adcDot(col("luts"), col("codes")),
        col("q_nsq"), codedNormSq(col("codes"), model)))
    // bounded-heap native grouped top-k: the map side prunes to
    // ≤ rerank rows per (partition, query) BEFORE the exchange — no
    // per-query full sort materializes the scored corpus
    val cand = NativeGroupedTopK.topK(approx.select("q_id", "n_id", "acos"),
        Seq("q_id"), Seq(("acos", false), ("n_id", true)), rerank)
      .select("q_id", "n_id")
    // exact re-rank over the tiny shortlist (shortlist side broadcast:
    // nq·rerank rows probe the corpus scan, no corpus shuffle)
    val exact = broadcast(cand)
      .join(data, "n_id")
      .join(broadcast(queries), "q_id")
      .withColumn("cos", VecFns.cosineFromQ(
        VecFns.dotQFast(col("q_vq"), col("n_vq")), col("q_nsq"), col("n_nsq")))
    TopK.perGroup(exact, Seq("q_id"),
        Seq(col("cos").desc, col("n_id").asc), topK)
      .select(col("q_id"), col("rk"), col("n_id"),
        round(col("cos"), 6).as("cos_r"))
      .orderBy("q_id", "rk")
  }

  /** IVF-PQ search — the standard composition for billion-vector /
    * 100 TB search: the [[Ivf]] coarse quantizer turns the scoring
    * cross join into an equi-join on cell id (only `nprobe` cells'
    * vectors are touched per query), PQ's ADC lookup tables score the
    * survivors in the compressed domain (the inverted lists carry
    * codes, not vectors), and the exact re-rank restores true cosines
    * on the shortlist. Same output contract as [[search]].
    */
  def searchIvfPq(data: DataFrame, queries: DataFrame,
      coarse: Ivf.Model, model: Model, nprobe: Int,
      rerank: Int, topK: Int): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(data.sparkSession)
    val lists = data.select(col("n_id"),
      Ivf.assignCell(col("n_vq"), coarse).as("cell"),
      encode(col("n_vq"), model).as("codes"))
    val probed = broadcast(queries.select(
        col("q_id"), queryLuts(col("q_vq"), model).as("luts"), col("q_nsq"),
        explode(Ivf.probeCells(col("q_vq"), coarse, nprobe)).as("cell")))
    val approx = lists.join(probed, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("acos", VecFns.cosineFromQ(
        adcDot(col("luts"), col("codes")),
        col("q_nsq"), codedNormSq(col("codes"), model)))
    val cand = NativeGroupedTopK.topK(approx.select("q_id", "n_id", "acos"),
        Seq("q_id"), Seq(("acos", false), ("n_id", true)), rerank)
      .select("q_id", "n_id")
    val exact = broadcast(cand)
      .join(data, "n_id")
      .join(broadcast(queries), "q_id")
      .withColumn("cos", VecFns.cosineFromQ(
        VecFns.dotQFast(col("q_vq"), col("n_vq")), col("q_nsq"), col("n_nsq")))
    TopK.perGroup(exact, Seq("q_id"),
        Seq(col("cos").desc, col("n_id").asc), topK)
      .select(col("q_id"), col("rk"), col("n_id"),
        round(col("cos"), 6).as("cos_r"))
      .orderBy("q_id", "rk")
  }
}
