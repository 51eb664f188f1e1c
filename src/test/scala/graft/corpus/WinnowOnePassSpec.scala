package graft.corpus

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TestSpark
import graft.functions.TextFns

/** Pins [[Curation.winnowFingerprints]] bit-equal to the declarative
  * q84 construction it replaces on the q84/q192/spanDedup path:
  * posexplode k-grams → 12-hex md5-prefix hash → doc_id-windowed
  * min(h, −pos) over full windows only → distinct per doc.
  */
class WinnowOnePassSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def declarative(docs: org.apache.spark.sql.DataFrame,
      k: Int, w: Int) = {
    val grams = docs
      .select(col("doc_id"), posexplode(
        TextFns.wordShinglesFromTokens(col("t"), k)))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("col")), 1, 12), 16, 10)
          .cast("long").as("h"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(0, w - 1)
    grams
      .withColumn("wmin",
        min(struct(col("h"), (-col("pos")).as("np"))).over(win))
      .withColumn("n_grams", count(lit(1)).over(
        Window.partitionBy("doc_id")))
      .filter(col("pos") <= col("n_grams") - w)
      .select(col("doc_id"), col("wmin.h").as("fp"))
      .distinct()
  }

  private def assertParity(docs: org.apache.spark.sql.DataFrame,
      k: Int, w: Int, expectNonEmpty: Boolean = true): Unit = {
    val want = declarative(docs, k, w)
      .as[(Long, Long)].collect().sorted.toSeq
    val got = Curation.winnowFingerprints(docs, "doc_id", "t", k, w)
      .as[(Long, Long)].collect().sorted.toSeq
    if (expectNonEmpty)
      assert(want.nonEmpty, "fixture produced no fingerprints — vacuous")
    assert(got === want)
  }

  test("sf0.001 corpus: one-pass == declarative at the q84 geometry") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
    assertParity(docs, k = 4, w = 5)
  }

  test("edge docs: short, boundary-length, null, tie-heavy") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),  // normal
      (2L, "a b c"),                // < k tokens: no grams
      (3L, "a b c d e f g h"),      // exactly k+w-1 tokens: one window
      (4L, "a b c d e f g"),        // k+w-2 tokens: grams but no window
      (5L, "x y x y x y x y x y x y") // repeated grams → hash ties
    ).toDF("doc_id", "text")
      .withColumn("t", TextFns.tokens(col("text")))
      .withColumn("t", when(col("doc_id") === 2L,
        lit(null).cast("array<string>")).otherwise(col("t")))
    assertParity(docs, k = 4, w = 5)
    val got = Curation.winnowFingerprints(docs, "doc_id", "t", 4, 5)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(got === Set(1L, 3L, 5L),
      "short/null docs must yield no fingerprints on the one-pass path")
  }

  test("w = 1 degenerates to every gram hash (distinct)") {
    val docs = Seq((7L, "p q r s t u")).toDF("doc_id", "text")
      .withColumn("t", TextFns.tokens(col("text")))
    assertParity(docs, k = 2, w = 1)
  }
}
