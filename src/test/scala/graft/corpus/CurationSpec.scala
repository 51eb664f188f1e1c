package graft.corpus

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.Registry

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("composed stages reproduce q58's inline pipeline exactly") {
    val composed = graft.Tables.docsParallel(spark, dir)
      .transform(Curation.withTokens())
      .transform(Curation.qualityFilter())
      .transform(Curation.exactDedup())
      .transform(Curation.nearDupFilter())
      .select("doc_id").orderBy("doc_id")
      .as[Long].collect().toSeq
    val inline = Registry.all("q58_corpus_pipeline").impl(spark, dir)
      .as[Long].collect().toSeq
    assert(composed == inline)
    assert(composed.nonEmpty)
  }

  test("decontaminate drops exactly the docs sharing a 3-gram with eval") {
    val docs = Seq(
      (1L, "a b c d e f"),      // shares "b c d" with eval
      (2L, "x y z w q r"),      // clean
      (3L, "p p b c d q")       // shares "b c d"
    ).toDF("doc_id", "text").transform(Curation.withTokens())
    val eval = Seq((100L, "m n b c d k")).toDF("doc_id", "text")
      .transform(Curation.withTokens())
    val kept = Curation.decontaminate(eval, expectedEvalShingles = 100L)(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("packSequences bins follow per-source running token offsets") {
    val docs = Seq(
      (1L, "s1", 60L), (2L, "s1", 60L), (3L, "s1", 60L), // offsets 0,60,120
      (9L, "s2", 10L))
      .toDF("doc_id", "source", "n_tok")
    val bins = Curation.packSequences(windowTokens = 100L)(docs)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 9L -> 0L))
  }

  test("tokenBudget caps each source's cumulative tokens deterministically") {
    val docs = (1L to 20L).map(i => (i, "s1", 10L)) :+ ((100L, "s2", 5L))
    val kept = Curation.tokenBudget(budget = 50L)(
        docs.toDF("doc_id", "source", "n_tok"))
      .select("doc_id", "source").as[(Long, String)].collect()
    val bySource = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // 5 docs × 10 tokens fill s1's 50-token budget; s2 keeps its only doc
    assert(bySource == Map("s1" -> 5, "s2" -> 1))
    // determinism: the same call keeps the same ids
    val again = Curation.tokenBudget(budget = 50L)(
        docs.toDF("doc_id", "source", "n_tok"))
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("nearDupCanonical keeps one representative per duplicate cluster") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),                 // cluster {1, 2}: 2 wins on length
      (2L, base + " extended"),
      (3L, "totally different content with no overlap whatsoever here now")
    ).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .transform(Curation.withTokens())
    val kept = Curation.nearDupCanonical(
        preferenceAsc = -col("n_chars"), threshold = 0.3)(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }
}
