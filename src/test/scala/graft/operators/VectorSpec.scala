package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.Registry

/** ANN quality: the approximate variants must recover a reasonable
  * fraction of the exact brute-force neighbors (recall@5), and the
  * custom codegen dot product must agree with the composable
  * higher-order formulation bit-for-bit.
  */
class VectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def neighborSets(name: String): Map[Long, Set[Long]] =
    Registry.all(name).impl(spark, dir).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap

  test("IVF ANN recall@5 vs brute force") {
    val exact = neighborSets("q30_embed_knn")
    val ivf = neighborSets("q54_ann_ivf")
    val recalls = exact.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"IVF mean recall@5 too low: $mean")
  }

  test("LSH ANN results are a subset of exact scoring semantics") {
    val exact = neighborSets("q30_embed_knn")
    val lsh = neighborSets("q31_ann_lsh")
    // every LSH neighbor must be a real vector with the same ranking
    // key space (sanity: ids exist in the corpus; recall informative)
    val recalls = exact.collect { case (q, truth) if lsh.contains(q) =>
      lsh(q).intersect(truth).size.toDouble / truth.size
    }
    assert(recalls.nonEmpty)
  }

  test("banded near-dup pairs are a subset of exact all-pairs, with identical scores") {
    import org.apache.spark.sql.functions._
    import graft.functions.VecFns
    graft.functions.expressions.GraftFunctions.register(spark)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
      .withColumn("nsq", VecFns.dotQFast(col("vq"), col("vq")))
    def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairs(EmbedNearDup.allPairs(vecs, "vec_id", minCos = 0.4))
    val banded = pairs(EmbedNearDup.bandedPairs(vecs, "vec_id",
      bands = 4, planesPerBand = 4, dim = 64, minCos = 0.4))
    // soundness: every banded pair is a true pair with the exact score
    banded.foreach { case (k, cos) =>
      assert(exact.get(k).contains(cos), s"pair $k: banded=$cos exact=${exact.get(k)}")
    }
    // recall: the band geometry must catch a usable share of the truth
    assert(exact.nonEmpty)
    val recall = banded.size.toDouble / exact.size
    assert(recall >= 0.3, s"banded near-dup recall too low: $recall")
  }

  test("allPairs refuses inputs above the small-N guard") {
    import org.apache.spark.sql.functions._
    import graft.functions.VecFns
    graft.functions.expressions.GraftFunctions.register(spark)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
      .withColumn("nsq", VecFns.dotQFast(col("vq"), col("vq")))
    val e = intercept[IllegalArgumentException] {
      EmbedNearDup.allPairs(vecs, "vec_id", minCos = 0.4, maxRows = 10).count()
    }
    assert(e.getMessage.contains("bandedPairs"))
  }

  test("plane_sign_mask band keys are bit-identical to the dot-expression keys") {
    import org.apache.spark.sql.functions._
    import graft.functions.VecFns
    graft.functions.expressions.GraftFunctions.register(spark)
    val vq = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
    // include a NULL vector: both forms must bucket it under key 0
    val df = vq.unionByName(
      vq.limit(1).select((col("vec_id") + 1000000).as("vec_id"),
        lit(null).cast("array<bigint>").as("vq")))
    // spans a word boundary at (bands=4, p=18): band 3 reads bits
    // 54..71 — the two-word extraction path
    for ((bands, p) <- Seq((4, 2), (4, 8), (4, 16), (4, 18), (3, 24))) {
      val mask = VecFns.planeSignMask(col("vq"), bands * p, 64)
      val diffs = df.withColumn("__mask", mask)
        .select((0 until bands).flatMap(b => Seq(
          VecFns.lshBandKey(col("vq"), b, p, 64).as(s"old$b"),
          VecFns.bandKeyFromMask(col("__mask"), b, p).as(s"new$b"))): _*)
        .filter((0 until bands).map(b =>
          col(s"old$b") =!= col(s"new$b")).reduce(_ || _))
        .count()
      assert(diffs === 0, s"bands=$bands p=$p")
    }
  }

  test("planeGridFor: ceiling ~log2(N), fixed grid at harness scales") {
    // small corpora keep today's 2/4/6/8 grid (oracle stability) ...
    for (n <- Seq(0L, 1L, 200L, 2000L, 2560L))
      assert(EmbedNearDup.planeGridFor(n) == Seq(2, 4, 6, 8), s"n=$n")
    // ... decade corpora extend it: p >= log2(bands*N / 2*budget)
    assert(EmbedNearDup.planeGridFor(200000L) == (2 to 16 by 2))
    assert(EmbedNearDup.planeGridFor(2000000L) == (2 to 18 by 2))
    // monotone in N, capped at 24 (16M cells/band)
    val grids = Seq(1L, 1000L, 100000L, 10000000L, Long.MaxValue / 8)
      .map(EmbedNearDup.planeGridFor(_).max)
    assert(grids == grids.sorted)
    assert(grids.last == 24)
    // the ceiling is exactly what makes the isotropic load fit: at the
    // derived pMax, bands*N/2^(pMax+1) <= budget (up to rounding)
    val n = 300000L
    val pMax = EmbedNearDup.planeGridFor(n, 4, 20L).max
    assert(4.0 * n / math.pow(2.0, pMax + 1) <= 20.0)
  }

  test("codegen long_array_dot equals composable zip_with/aggregate dot") {
    import org.apache.spark.sql.functions._
    import graft.functions.VecFns
    graft.functions.expressions.GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
    val diff = df
      .withColumn("a", VecFns.dotQ(col("vq"), col("vq")))
      .withColumn("b", VecFns.dotQFast(col("vq"), col("vq")))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff === 0)
  }
}
