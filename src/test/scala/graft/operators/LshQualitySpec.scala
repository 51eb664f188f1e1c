package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.{MinHashLsh, TextFns}

/** Guards the MinHash hash-family quality, not just its determinism.
  * A correlated family (e.g. the h1 + i·h2 two-hash shortcut, where
  * every component shares nearly the same argmin shingle) still
  * hash-matches any oracle that replicates it — but its Jaccard
  * estimates are systematically inflated and LSH floods downstream
  * dedup with false candidates. This spec compares estimates against
  * TRUE Jaccard similarities on the harness corpus.
  */
class LshQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.01"

  private val K = 12
  private val Bands = 4

  test("high-confidence LSH estimates correspond to truly similar documents") {
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("t", TextFns.tokens(col("text")))
      .select(col("doc_id"),
        explode(TextFns.wordShinglesFromTokens(col("t"), 3)).as("sh"))
      .distinct()
      .persist()
    val sigs = MinHashLsh.signatures(sh, "doc_id", "sh", K)
    val cand = MinHashLsh.candidatePairs(sigs, "doc_id", K, Bands)
      .filter(col("est") >= 0.5)

    // true Jaccard per candidate pair
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val x = sh.toDF("a", "sh")
    val y = sh.toDF("b", "sh")
    val inter = x.join(y, "sh").filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    val jac = cand.join(inter, Seq("a", "b"), "left")
      .na.fill(0L, Seq("c"))
      .join(sizes.toDF("a", "na"), "a")
      .join(sizes.toDF("b", "nb"), "b")
      .withColumn("j", col("c") / (col("na") + col("nb") - col("c")))
      .select(col("est"), col("j"))
      .as[(Double, Double)].collect()

    assert(jac.nonEmpty, "corpus produced no est>=0.5 candidates")
    // every est>=0.5 candidate must be genuinely similar — a
    // correlated hash family fails this wholesale
    val falsePos = jac.count(_._2 < 0.2)
    assert(falsePos.toDouble / jac.length <= 0.1,
      s"${falsePos}/${jac.length} candidates with est>=0.5 have true J<0.2")
    // and the estimator must not be wildly biased on the truly similar
    val similar = jac.filter(_._2 >= 0.5)
    if (similar.nonEmpty) {
      val meanErr = similar.map { case (e, j) => e - j }.sum / similar.length
      assert(math.abs(meanErr) < 0.25, s"mean est-J bias $meanErr")
    }
    sh.unpersist()
  }
}
