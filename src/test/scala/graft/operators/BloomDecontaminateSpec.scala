package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Contract of the bloom decontamination gate: a superset of the
  * exact answer (zero false negatives — the safe direction) with a
  * bounded false-positive rate.
  */
class BloomDecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives; false positives within ~3x requested fpp") {
    // eval set: 1000 shingle hashes; corpus: 500 contaminated (in the
    // eval set) + 20000 clean
    val eval = (0L until 1000L).map(i => i * 7919L).toDF("h")
    val contaminated = (0L until 500L).map(i => (i, i * 7919L))
    val clean = (0L until 20000L).map(i => (1000L + i, 1000000007L + i * 13L))
    val corpus = (contaminated ++ clean).toDF("doc_id", "h")

    val flagged = BloomDecontaminate.flag(corpus, "h", eval, "h",
        expectedItems = 1000L, fpp = 0.01)
      .filter(col("maybe_contaminated"))
      .select("doc_id").as[Long].collect().toSet

    val trulyContaminated = contaminated.map(_._1).toSet
    assert(trulyContaminated.subsetOf(flagged),
      "bloom gate produced false negatives — decontamination unsafe")
    val fps = flagged.size - trulyContaminated.size
    assert(fps <= (20000 * 0.03).toInt,
      s"false-positive rate out of contract: $fps of 20000 clean rows flagged")
  }

  test("tier equivalence: bounded collect tier == distributed tier") {
    // the same eval/corpus through both tiers (collectCap forces the
    // distributed path when set below the eval size) must verify to
    // the identical exact answer, and both must auto-size
    val eval = (0L until 2000L).map(i => i * 104729L).toDF("h")
    val corpus = (0L until 5000L)
      .map(i => (i, if (i % 3 == 0) (i % 2000) * 104729L else -1L - i))
      .toDF("doc_id", "h")
    def run(cap: Int) = BloomDecontaminate
      .verifiedFlags(corpus, "h", eval, "h", collectCap = cap)
      .select("doc_id").as[Long].collect().toSet
    val bounded = run(cap = BloomDecontaminate.EvalCollectCap)
    val distributed = run(cap = 10)
    assert(bounded === distributed)
    val exact = (0L until 5000L).filter(_ % 3 == 0).toSet
    assert(bounded === exact)
  }

  test("per-doc gate flags exactly the docs holding flagged shingles") {
    val eval = Seq(42L).toDF("h")
    val corpus = Seq(
      (1L, 42L), (1L, 7L),  // doc 1: one contaminated shingle
      (2L, 8L), (2L, 9L)    // doc 2: clean (modulo FPs at fpp 1e-3)
    ).toDF("doc_id", "h")
    val docs = BloomDecontaminate.flagDocs(corpus, "doc_id", "h", eval, "h",
        expectedItems = 10L)
      .as[(Long, Boolean)].collect().toMap
    assert(docs(1L))
    // doc 2 is a 2-shingle FP check at fpp 1e-3 — astronomically safe
    assert(!docs(2L))
  }
}
