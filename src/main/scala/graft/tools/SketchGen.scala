package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-flight sketch frames for the VIRTUAL decade corpora — the
  * fifth-decade pricing machinery (VERDICT r18 #7).
  *
  * [[ScaleGen]]'s corpora are pure functions of the row id, so a
  * corpus that would not fit this box's disk as text (sf10000 = 500 M
  * docs ≈ 110 GB of parquet) still EXISTS as a generator — and the
  * calibration sweeps never need the text, only each document's
  * sketch. This object computes those sketches directly inside a
  * `mapPartitions` over `spark.range(n)`:
  *
  *  - [[minhashSignatures]] — bit-identical to
  *    `MinHashLsh.signaturesFromTokens(ScaleGen docs)`: the same
  *    28-bit md5-prefix base hash and (a·x+b) mod P component fold,
  *    with the md5 work amortized through a per-partition
  *    shingle→components cache (the decade vocabulary is ~10² tokens,
  *    so the trigram universe is small and hot — a few tens of
  *    thousands of digests per partition instead of one per shingle
  *    OCCURRENCE; the sf1000 text audit paid ~30 min of md5 for the
  *    same values).
  *  - [[simhash64Fingerprints]] — bit-identical to
  *    `SimHash64.fingerprintsFromTokens(ScaleGen docs)`: same 64-bit
  *    md5-prefix hash (cached the same way), same per-doc hash dedup,
  *    same majority vote.
  *  - [[quantizedVecs]] — `VecFns.quantize(ScaleGen embeddings)`
  *    without materializing the float vectors.
  *
  * Bit-identity to the materialized corpora is pinned per-id by
  * SketchGenSpec (sampled ids against the real operators over
  * ScaleGen text) — which makes a sweep over these frames THE sweep
  * over the corresponding decade corpus, not a model of it. The
  * vocabulary source defaults to [[ScaleGen.DefaultSrcDir]] (the one
  * shared constant — VERDICT r19 #6); a corpus generated from another
  * `srcDir` must pass the same dir here or the pin is void.
  */
object SketchGen {

  /** Default partition count for decade-scale generation: enough
    * slices that a 500 M-row pass balances and per-task aggregation
    * hash maps stay small.
    */
  val DefaultSlices = 256

  /** Deterministic id-sample membership for the SIXTH-decade
    * estimator (VERDICT r19 #7): keep id iff
    * `splitmix64(id) mod sampleMod == 0` — a hash draw, NOT `id mod
    * R`, because ScaleGen's planted dup partners sit at fixed id
    * OFFSETS (id−250, id−100) and a residue-class sample would keep
    * partners together with probability 1/R instead of the
    * independent 1/R² every unordered pair must have for
    * `pairs_full = R² · pairs_sampled` to be unbiased (each key's
    * sampled occupancy is Binomial(c, 1/R), so
    * E[C(c_s,2)] = C(c,2)/R² exactly — concentration-driven heavy
    * keys and c=2 dup pairs alike).
    */
  def inSample(id: Long, sampleMod: Long): Boolean =
    sampleMod <= 1L || {
      var z = id * -0x61c8864680b583ebL + 0x0b5e5bab3a3c9b1dL
      z = (z ^ (z >>> 30)) * -0x40a7b892e31b1a47L
      z = (z ^ (z >>> 27)) * -0x6b2fb644ecceee15L
      java.lang.Math.floorMod(z ^ (z >>> 31), sampleMod) == 0L
    }

  /** MinHash signatures (idCol `doc_id`, s0..s{k-1}) of the virtual
    * ScaleGen corpus of `n` docs.
    */
  def minhashSignatures(spark: SparkSession, n: Long, shingleWidth: Int = 3,
      k: Int = 12, slices: Int = DefaultSlices,
      srcDir: String = ScaleGen.DefaultSrcDir,
      sampleMod: Long = 1L): DataFrame = {
    import spark.implicits._
    import graft.functions.MinHashLsh.{P, aConst, bConst}
    val vocab = ScaleGen.vocabFrom(spark, srcDir)
    val as = (0 until k).map(aConst).toArray
    val bs = (0 until k).map(bConst).toArray
    val p = P
    val w = shingleWidth
    val kk = k
    val sm = sampleMod
    spark.range(0L, n, 1L, slices)
      .mapPartitions { it0 =>
        val it = it0.filter(id => inSample(id, sm))
        val md = java.security.MessageDigest.getInstance("MD5")
        val sb = new java.lang.StringBuilder
        // shingle → its k signature components, computed once per
        // DISTINCT shingle per partition (the vocab^w universe is
        // small and hot)
        val cache = new java.util.HashMap[String, Array[Long]]()
        it.flatMap { id =>
          val t = ScaleGen.docTokens(id, vocab)
          if (t.length < w) Iterator.empty
          else {
            val mins = Array.fill(kk)(Long.MaxValue)
            var i = 0
            while (i + w <= t.length) {
              sb.setLength(0)
              var o = 0
              while (o < w) {
                if (o > 0) sb.append(' ')
                sb.append(t(i + o))
                o += 1
              }
              val s = sb.toString
              var comps = cache.get(s)
              if (comps == null) {
                md.reset()
                val dg = md.digest(s.getBytes("UTF-8"))
                // first 7 hex chars of the digest == top 28 bits —
                // the signaturesFromTokens base hash, verbatim
                val x = (((dg(0) & 0xffL) << 20) | ((dg(1) & 0xffL) << 12) |
                  ((dg(2) & 0xffL) << 4) | ((dg(3) & 0xf0L) >> 4)) % p
                comps = new Array[Long](kk)
                var j = 0
                while (j < kk) {
                  comps(j) = (x * as(j) + bs(j)) % p
                  j += 1
                }
                cache.put(s, comps)
              }
              var j = 0
              while (j < kk) {
                if (comps(j) < mins(j)) mins(j) = comps(j)
                j += 1
              }
              i += 1
            }
            Iterator.single((id, mins))
          }
        }
      }
      .select(col("_1").as("doc_id") +:
        (0 until k).map(i => col("_2")(i).as(s"s$i")): _*)
  }

  /** SimHash64 fingerprints (`doc_id`, `sh`) of the virtual ScaleGen
    * corpus of `n` docs — `fingerprintsFromTokens` semantics: per-doc
    * dedup on the 64-bit md5-prefix hash, majority vote per bit.
    */
  def simhash64Fingerprints(spark: SparkSession, n: Long,
      shingleWidth: Int = 3, slices: Int = DefaultSlices,
      srcDir: String = ScaleGen.DefaultSrcDir,
      sampleMod: Long = 1L): DataFrame = {
    import spark.implicits._
    val vocab = ScaleGen.vocabFrom(spark, srcDir)
    val w = shingleWidth
    val sm = sampleMod
    spark.range(0L, n, 1L, slices)
      .mapPartitions { it0 =>
        val it = it0.filter(id => inSample(id, sm))
        val md = java.security.MessageDigest.getInstance("MD5")
        val sb = new java.lang.StringBuilder
        val cache = new java.util.HashMap[String, java.lang.Long]()
        val seen = new java.util.HashSet[java.lang.Long]
        val cnt = new Array[Int](64)
        it.flatMap { id =>
          val t = ScaleGen.docTokens(id, vocab)
          if (t.length < w) Iterator.empty
          else {
            seen.clear()
            java.util.Arrays.fill(cnt, 0)
            var tot = 0
            var i = 0
            while (i + w <= t.length) {
              sb.setLength(0)
              var o = 0
              while (o < w) {
                if (o > 0) sb.append(' ')
                sb.append(t(i + o))
                o += 1
              }
              val s = sb.toString
              var h = cache.get(s)
              if (h == null) {
                md.reset()
                val dg = md.digest(s.getBytes("UTF-8"))
                var v = 0L
                var y = 0
                while (y < 8) { v = (v << 8) | (dg(y) & 0xffL); y += 1 }
                h = java.lang.Long.valueOf(v)
                cache.put(s, h)
              }
              if (seen.add(h)) {
                tot += 1
                val v = h.longValue()
                var b = 0
                while (b < 64) {
                  cnt(b) += ((v >>> b) & 1L).toInt
                  b += 1
                }
              }
              i += 1
            }
            if (tot == 0) Iterator.empty
            else {
              var sh = 0L
              var b = 0
              while (b < 64) {
                if (2L * cnt(b) > tot) sh |= (1L << b)
                b += 1
              }
              Iterator.single((id, sh))
            }
          }
        }
      }
      .select(col("_1").as("doc_id"), col("_2").as("sh"))
  }

  /** Quantized embedding vectors (`vec_id`, `vq`) of the virtual
    * ScaleGen embedding table of `n` vectors — `VecFns.quantize`
    * applied to the generator's floats (round(x·10000) per component,
    * via the same double→float→double path the parquet round-trip
    * takes, so values match the materialized table exactly).
    */
  def quantizedVecs(spark: SparkSession, n: Long,
      slices: Int = DefaultSlices): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, slices)
      .mapPartitions { it =>
        it.map { id =>
          val v: Array[Float] =
            if (id % 300 == 23 && id >= 150) {
              val base = ScaleGen.unitGaussian(id - 150)
              val r = ScaleGen.rng(id, 5)
              val mixed = base.map(b => b + r.nextGaussian() / 8)
              val nrm = math.sqrt(mixed.map(x => x * x).sum)
              mixed.map(x => (x / nrm).toFloat)
            } else ScaleGen.unitGaussian(id).map(_.toFloat)
          // Spark round(x, 0) is HALF_UP BigDecimal rounding — match
          // it exactly (rint is HALF_EVEN and diverges on exact .5s)
          (id, v.map(x => java.math.BigDecimal.valueOf(x.toDouble * 10000)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()))
        }
      }
      .select(col("_1").as("vec_id"), col("_2").as("vq"))
  }
}
