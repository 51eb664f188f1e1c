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
      seed: Long = 42L, maxSample: Int = 100000, iters: Int = 15): Model = {
    val sample = Ivf.hashOrderedSample(data, vecCol, seed, maxSample)
    require(sample.length >= k, s"need >= $k vectors to train")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val rng = new scala.util.Random(seed)
    val shuffled = rng.shuffle(sample.toSeq.zipWithIndex).map(_._1)
    val books = (0 until m).map { mi =>
      val sub = shuffled.map(v =>
        java.util.Arrays.copyOfRange(v, mi * subDim, (mi + 1) * subDim))
      Ivf.lloyd(sub, k, iters).toSeq
        .map(c => c.toSeq.map(x => math.round(x * VecFns.Scale)))
    }
    Model(m, subDim, books)
  }

  private def subVec(vq: Column, model: Model, mi: Int): Column =
    slice(vq, mi * model.subDim + 1, model.subDim)

  /** Codes array: per subspace, argmin_j ||x_m − c_mj||² via the same
    * (dist, id) struct-min trick as [[Ivf.assignCell]] (common |x_m|²
    * dropped — constant within a subspace's argmin).
    */
  def encode(vq: Column, model: Model): Column =
    array((0 until model.m).map { mi =>
      val scores = model.books(mi).zipWithIndex.map { case (c, j) =>
        val cNorm = c.map(x => x * x).sum
        struct(
          (lit(cNorm) - lit(2L) * VecFns.dotQFast(subVec(vq, model, mi), typedlit(c))).as("d"),
          lit(j).as("j"))
      }
      array_min(array(scores: _*)).getField("j")
    }: _*)

  /** Query-side ADC tables: `luts[mi][j] = q_mi · c_mij` (exact longs). */
  def queryLuts(vq: Column, model: Model): Column =
    array((0 until model.m).map { mi =>
      array(model.books(mi).map(c =>
        VecFns.dotQFast(subVec(vq, model, mi), typedlit(c))): _*)
    }: _*)

  /** ADC approximate dot product: `m` codegen'd array lookups. */
  def adcDot(luts: Column, codes: Column, model: Model): Column =
    (0 until model.m).map(mi =>
      element_at(element_at(luts, mi + 1), element_at(codes, mi + 1) + 1))
      .reduce(_ + _)

  /** Reconstruction squared norm: Σ_m |c_m,code_m|² from a literal
    * per-subspace norm table (codes → longs, no vector math).
    */
  def codedNormSq(codes: Column, model: Model): Column =
    (0 until model.m).map { mi =>
      val norms = model.books(mi).map(c => c.map(x => x * x).sum)
      element_at(typedlit(norms), element_at(codes, mi + 1) + 1)
    }.reduce(_ + _)

  /** ANN search: ADC-scored shortlist of `rerank` candidates per query,
    * re-ranked by exact quantized cosine to the final `topK`.
    *
    * @param data    (`n_id`, `n_vq`, `n_nsq`) quantized corpus
    * @param queries (`q_id`, `q_vq`, `q_nsq`) query subset
    */
  def search(data: DataFrame, queries: DataFrame, model: Model,
      rerank: Int, topK: Int): DataFrame = {
    // corpus → codes once; the scoring join streams (n_id, m codes)
    val coded = data.select(col("n_id"), encode(col("n_vq"), model).as("codes"))
    val q = broadcast(queries.select(
      col("q_id"), queryLuts(col("q_vq"), model).as("luts"), col("q_nsq")))
    val approx = coded.crossJoin(q)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("acos", VecFns.cosineFromQ(
        adcDot(col("luts"), col("codes"), model),
        col("q_nsq"), codedNormSq(col("codes"), model)))
    val cand = TopK.perGroup(approx, Seq("q_id"),
        Seq(col("acos").desc, col("n_id").asc), rerank)
      .select("q_id", "n_id")
    // exact re-rank over the tiny shortlist
    val exact = cand
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
    val lists = data.select(col("n_id"),
      Ivf.assignCell(col("n_vq"), coarse).as("cell"),
      encode(col("n_vq"), model).as("codes"))
    val probed = broadcast(queries.select(
        col("q_id"), queryLuts(col("q_vq"), model).as("luts"), col("q_nsq"),
        explode(Ivf.probeCells(col("q_vq"), coarse, nprobe)).as("cell")))
    val approx = lists.join(probed, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("acos", VecFns.cosineFromQ(
        adcDot(col("luts"), col("codes"), model),
        col("q_nsq"), codedNormSq(col("codes"), model)))
    val cand = TopK.perGroup(approx, Seq("q_id"),
        Seq(col("acos").desc, col("n_id").asc), rerank)
      .select("q_id", "n_id")
    val exact = cand
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
