package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Invariant checks for the round-11 batch (q178-q180) beyond the
  * DuckDB hash gate: structural properties that must hold for ANY
  * corpus, not just the one the oracle happened to see.
  */
class Extended20Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q178: every cell keeps at least its lowest-id member and accounting adds up") {
    val rows = Registry.all("q178_semdedup").impl(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val nVecs = r.getAs[Long]("n_vecs")
      val nDropped = r.getAs[Long]("n_dropped")
      // the lowest-id vector in a cell has no earlier in-cell
      // neighbor, so it can never be dominated -> >= 1 survivor
      assert(nDropped < nVecs, s"cell ${r.getAs[Long]("cell")} dropped everything")
      assert(nDropped >= 0 && nVecs > 0)
    }
  }

  test("q178: cells partition the corpus (sum of n_vecs = vector count)") {
    val rows = Registry.all("q178_semdedup").impl(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(total === n)
  }

  test("q179: buckets partition the corpus and waste is consistent") {
    val rows = Registry.all("q179_pad_buckets").impl(spark, dir).collect()
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    for (r <- rows) {
      val b = r.getAs[Long]("bucket")
      val waste = r.getAs[Long]("pad_tokens")
      val cap = r.getAs[Long]("n_docs") * b
      // waste = capacity - carried tokens, and both are non-negative
      assert(waste >= 0 && waste === cap - r.getAs[Long]("sum_tokens"))
      assert((b & (b - 1)) === 0L, s"bucket $b is not a power of two")
    }
  }

  test("q180: per-language terciles are balanced and ordered") {
    val rows = Registry.all("q180_ppl_buckets").impl(spark, dir).collect()
    assert(rows.nonEmpty)
    for ((_, rs) <- rows.groupBy(_.getAs[String]("lang"))) {
      val byBucket = rs.sortBy(_.getAs[Long]("bucket"))
      // ntile: bucket sizes differ by at most one, larger buckets first
      val sizes = byBucket.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1)
      assert(sizes.sorted.reverse.sameElements(sizes))
      // tercile k's score range sits at or below tercile k+1's
      for (Array(a, b) <- byBucket.sliding(2).map(_.toArray)) {
        assert(a.getAs[Long]("max_score") <= b.getAs[Long]("min_score") ||
          a.getAs[Long]("max_score") <= b.getAs[Long]("max_score"))
      }
    }
  }
}
