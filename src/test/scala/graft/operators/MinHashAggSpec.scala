package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.{MinHashLsh, MinHashSigAggregator, TextFns}

/** The one-pass typed-Aggregator signature must equal the k-min-column
  * formulation exactly, on real corpus shingles.
  */
class MinHashAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val K = 12

  test("signaturesOnePass == signatures, row for row") {
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("t", TextFns.tokens(col("text")))
      .select(col("doc_id"),
        explode(TextFns.wordShinglesFromTokens(col("t"), 3)).as("sh"))
    val viaColumns = MinHashLsh.signatures(sh, "doc_id", "sh", K)
      .orderBy("doc_id").collect()
    val viaAgg = MinHashSigAggregator
      .signaturesOnePass(sh, "doc_id", "sh", K)
      .orderBy("doc_id").collect()
    assert(viaColumns.length == viaAgg.length && viaColumns.nonEmpty)
    viaColumns.zip(viaAgg).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq, s"mismatch at doc ${a.get(0)}")
    }
  }

  test("signaturesFromTokens == signatures, row for row") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("t", TextFns.tokens(col("text")))
    val sh = docs.select(col("doc_id"),
      explode(TextFns.wordShinglesFromTokens(col("t"), 3)).as("sh"))
    val viaColumns = MinHashLsh.signatures(sh, "doc_id", "sh", K)
      .orderBy("doc_id").collect()
    val viaLocal = MinHashLsh.signaturesFromTokens(docs, "doc_id", "t", 3, K)
      .orderBy("doc_id").collect()
    assert(viaColumns.length == viaLocal.length && viaColumns.nonEmpty)
    viaColumns.zip(viaLocal).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq, s"mismatch at doc ${a.get(0)}")
    }
  }
}
