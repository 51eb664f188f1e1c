package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VecFns

/** IVF (inverted-file) approximate nearest neighbor — the classic
  * scale path for vector search: a k-means coarse quantizer assigns
  * every vector to a cell; a query only scores vectors in its
  * `nprobe` nearest cells, turning the cross join into an equi-join
  * on cell id.
  *
  * Scale shape: training samples a bounded set to the driver (KMeans
  * on a sample is standard); assignment is a pure Column expression —
  * k quantized-centroid dot products via the codegen'd
  * `long_array_dot`, argmin via `array_min` over (distance, id)
  * structs — so the big table never leaves codegen. Search is
  * explode(nprobe cells) → equi-join on cell → exact scoring → top-k.
  */
object Ivf {

  final case class Model(centroidsQ: Seq[Seq[Long]]) {
    def k: Int = centroidsQ.size
  }

  /** Train the coarse quantizer: Lloyd's k-means on a bounded sample
    * collected to the driver. A coarse quantizer only needs a sample —
    * distributed iterative k-means would cost one Spark job per
    * iteration for no quality gain at this granularity.
    *
    * The sample is *hash-ordered*, not `limit`-ordered: a bare
    * `limit(n)` takes whatever partitions answer first — i.e. the file
    * head — so a sorted/clustered layout would train skewed centroids
    * and silently drop recall. Ordering by an md5 of the vector
    * contents (the q64 deterministic-sampling trick) makes the sample
    * uniform over the corpus regardless of physical layout, still
    * fully deterministic, and the orderBy+limit pair executes as a
    * distributed partial top-k (TakeOrdered), not a global sort.
    */
  def train(data: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      maxSample: Int = 100000, iters: Int = 15): Model =
    trainFromShuffled(shuffledSample(data, vecCol, seed, maxSample), k, iters)

  /** Train from an already collected-and-shuffled sample — lets a
    * caller composing two quantizers off the same sample (IVF-PQ, see
    * [[Pq.searchIvfPq]]) pay for ONE corpus scan + collect instead of
    * two identical ones.
    */
  private[operators] def trainFromShuffled(shuffled: IndexedSeq[Array[Double]],
      k: Int, iters: Int): Model = {
    require(shuffled.length >= k, s"need >= $k vectors to train")
    Model(lloyd(shuffled, k, iters).toSeq
      .map(c => c.toSeq.map(x => math.round(x * VecFns.Scale))))
  }

  /** The deterministic sample both quantizer trainers consume:
    * hash-ordered collect (see [[train]] scaladoc) + seeded in-heap
    * shuffle by a fresh `Random(seed)` — so every trainer handed the
    * same (data, seed, maxSample) sees the identical sequence.
    */
  private[operators] def shuffledSample(data: DataFrame, vecCol: String,
      seed: Long, maxSample: Int): IndexedSeq[Array[Double]] = {
    val sample = hashOrderedSample(data, vecCol, seed, maxSample)
    val rng = new scala.util.Random(seed)
    rng.shuffle(sample.toSeq.zipWithIndex).map(_._1).toIndexedSeq
  }

  /** Bounded uniform-over-the-corpus sample (see [[train]] scaladoc for
    * why hash-ordered, not `limit`-ordered). Shared with [[Pq.train]]
    * so both quantizers train on the identical sample.
    */
  private[operators] def hashOrderedSample(data: DataFrame, vecCol: String,
      seed: Long, maxSample: Int): Array[Array[Double]] =
    data
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("__h",
        md5(concat_ws(",", lit(seed), concat_ws(",", col("v").cast("array<string>")))))
      .orderBy("__h")
      .limit(maxSample)
      .select("v")
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /** Lloyd's iterations on an in-heap (already deterministically
    * shuffled) sample; first `k` rows seed the centers.
    *
    * The assignment pass is embarrassingly parallel, so it fans out
    * over FIXED-size chunks of the sample on the driver's cores, and
    * partial (sums, counts) merge in chunk order — the float-sum
    * order is a pure function of the sample, never of thread timing,
    * so trained centroids are bit-reproducible run to run. (This is
    * driver-local math over a bounded sample — the corpus itself is
    * never involved; see [[train]].)
    */
  private[operators] def lloyd(shuffled: Seq[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val dim = shuffled.head.length
    val sample = shuffled.toArray
    val chunks = sample.grouped(math.max(4096, sample.length / 32 + 1)).toArray
    var centers = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val cts = centers // stable capture for the closure
      val partials = Await.result(
        Future.traverse(chunks.toSeq) { chunk => Future {
          val sums = Array.fill(k)(new Array[Double](dim))
          val counts = new Array[Long](k)
          for (v <- chunk) {
            var best = 0; var bestD = Double.MaxValue
            var j = 0
            while (j < k) {
              var d = 0.0; var i = 0
              while (i < dim) { val t = v(i) - cts(j)(i); d += t * t; i += 1 }
              if (d < bestD) { bestD = d; best = j }
              j += 1
            }
            var i = 0
            while (i < dim) { sums(best)(i) += v(i); i += 1 }
            counts(best) += 1
          }
          (sums, counts)
        }}, Duration.Inf)
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      for ((ps, pc) <- partials; j <- 0 until k) {
        var i = 0
        while (i < dim) { sums(j)(i) += ps(j)(i); i += 1 }
        counts(j) += pc(j)
      }
      centers = Array.tabulate(k) { j =>
        if (counts(j) == 0) centers(j)
        else { val c = new Array[Double](dim)
          var i = 0
          while (i < dim) { c(i) = sums(j)(i) / counts(j); i += 1 }
          c }
      }
    }
    centers
  }

  /** Nearest cell per vector (for the inverted file), by
    * `|c_j|² − 2·v·c_j` (the common `|v|²` dropped — constant per
    * row). One native-expression node with the centroid table as a
    * single literal — the per-centroid struct/argmin tree made
    * Catalyst planning, not execution, the dominant cost on repeated
    * runs (see [[graft.functions.expressions.PqEncode]]).
    *
    * PRECONDITION (this and [[probeCells]]): the session must have the
    * graft native functions registered —
    * `GraftFunctions.register(spark)` or the `GraftExtensions`
    * session extension — or analysis fails with "undefined function
    * pq_encode". The DataFrame-level [[search]] entry point registers
    * defensively; Column-level builders cannot (no session in scope).
    */
  def assignCell(vq: Column, model: Model): Column =
    element_at(
      call_function("pq_encode", vq, typedlit(Seq(model.centroidsQ))), 1)

  /** The `nprobe` nearest cells per query vector, ascending by
    * (distance, cell id), as an array.
    */
  def probeCells(vq: Column, model: Model, nprobe: Int): Column =
    call_function("ivf_probe", vq, typedlit(model.centroidsQ), lit(nprobe))

  /** ANN search: top-k by exact quantized cosine among vectors in the
    * query's nprobe cells.
    * @param data (idCol, vq, nsq) quantized corpus
    * @param queries (idCol, vq, nsq) query subset
    */
  def search(data: DataFrame, queries: DataFrame, idCol: String,
      model: Model, nprobe: Int, topK: Int): DataFrame = {
    // defensive: assignCell/probeCells resolve graft-registered names
    graft.functions.expressions.GraftFunctions.register(data.sparkSession)
    val cells = data.withColumn("cell", assignCell(col("vq"), model))
      .toDF("n_id", "n_vq", "n_nsq", "cell")
    val probed = queries
      .withColumn("cell", explode(probeCells(col("vq"), model, nprobe)))
      .toDF("q_id", "q_vq", "q_nsq", "cell")
    val scored = cells.join(broadcast(probed), "cell")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", VecFns.cosineFromQ(
        VecFns.dotQFast(col("q_vq"), col("n_vq")), col("q_nsq"), col("n_nsq")))
    TopK.perGroup(scored, Seq("q_id"),
        Seq(col("cos").desc, col("n_id").asc), topK)
      .select(col("q_id"), col("rk"), col("n_id"),
        round(col("cos"), 6).as("cos_r"))
      .orderBy("q_id", "rk")
  }
}
