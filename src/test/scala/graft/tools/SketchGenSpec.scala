package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.{MinHashLsh, SimHash64, TextFns}

/** Pins [[SketchGen]]'s in-flight sketches BIT-IDENTICAL to the
  * production operators over the materialized ScaleGen text — the
  * property that makes a fifth-decade pricing sweep over SketchGen
  * frames THE sweep over the corresponding decade corpus rather than
  * a model of it (Sf10000PricingSpec builds on this).
  *
  * The fixture spans every generator regime: unique docs, exact
  * copies (id % 500 == 7), and near-copies (id % 200 == 13).
  */
class SketchGenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 3000L

  /** The same virtual corpus, materialized as text through the same
    * ScaleGen functions the decade dirs were written with.
    */
  private lazy val textDocs = {
    val vocab = ScaleGen.vocabFrom(spark, "/root/testdata/sf0.1")
    spark.range(N)
      .map(id => (id, ScaleGen.docTokens(id, vocab).mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("t", TextFns.tokens(col("text")))
  }

  test("minhash sketches == signaturesFromTokens over the generated text") {
    val want = MinHashLsh
      .signaturesFromTokens(textDocs, "doc_id", "t", 3, 12)
      .collect().map(r => (r.getLong(0), (1 to 12).map(r.getLong).toSeq))
      .sortBy(_._1).toSeq
    val got = SketchGen.minhashSignatures(spark, N, slices = 8)
      .collect().map(r => (r.getLong(0), (1 to 12).map(r.getLong).toSeq))
      .sortBy(_._1).toSeq
    assert(want.size == N)
    assert(got === want)
  }

  test("simhash64 sketches == fingerprintsFromTokens over the generated text") {
    val want = SimHash64.fingerprintsFromTokens(textDocs, "doc_id", "t", 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val got = SketchGen.simhash64Fingerprints(spark, N, slices = 8)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(want.size == N)
    assert(got === want)
  }

  test("quantized vec sketches == quantize over the generated embeddings") {
    import graft.functions.VecFns
    val vecs = spark.range(N).map { id =>
      val v: Array[Float] =
        if (id % 300 == 23 && id >= 150) {
          val base = ScaleGen.unitGaussian(id - 150)
          val r = ScaleGen.rng(id, 5)
          val mixed = base.map(b => b + r.nextGaussian() / 8)
          val nrm = math.sqrt(mixed.map(x => x * x).sum)
          mixed.map(x => (x / nrm).toFloat)
        } else ScaleGen.unitGaussian(id).map(_.toFloat)
      (id, v)
    }.toDF("vec_id", "embedding")
    val want = vecs.select(col("vec_id"),
        VecFns.quantize(col("embedding")).as("vq"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val got = SketchGen.quantizedVecs(spark, N, slices = 8)
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(got === want)
  }

  test("sketches match the MATERIALIZED decade corpus (data-gated)") {
    // the decade dirs are written by ScaleGen itself; when one is
    // present, pin the sketch against its PARQUET text — the anchor
    // that rules out generator drift between the committed decade
    // referees and the sketch-based pricing rows
    val dir = "bench/sfgen/sf1"
    assume(new java.io.File(s"$dir/documents.parquet").exists(),
      s"generate the decade first: runMain graft.tools.ScaleGen $dir ...")
    val fromParquet = MinHashLsh.signaturesFromTokens(
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < N)
        .withColumn("t", TextFns.tokens(col("text"))),
      "doc_id", "t", 3, 12)
      .collect().map(r => (r.getLong(0), (1 to 12).map(r.getLong).toSeq))
      .sortBy(_._1).toSeq
    val got = SketchGen.minhashSignatures(spark, N, slices = 8)
      .collect().map(r => (r.getLong(0), (1 to 12).map(r.getLong).toSeq))
      .sortBy(_._1).toSeq
    assert(fromParquet.size == N)
    assert(got === fromParquet)
  }
}
