package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextFns

/** Pins the streaming near-dup ingest contract: batch-b probes the
  * index as it stood BEFORE the batch, landed docs grow the index for
  * later batches, replayed batches are no-ops for both store and
  * index, and duplicate-blindness within one micro-batch.
  */
class NearDupIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val A = "alpha beta gamma delta epsilon zeta eta theta"
  private val B = "one two three four five six seven eight nine"

  private def ws(name: String) = {
    val base = graft.TestSpark.scratchPath(name)
    (base.resolve("idx").toString, base.resolve("store").toString)
  }

  private def ingest(batch: Seq[(Long, String)], id: Long,
      idx: String, store: String): Unit =
    NearDupIngest.ingestBatch(batch.toDF("doc_id", "text"), id, idx, store,
      "doc_id", "text", 0.5, 3, 12, 4, 1000)

  private def landedIds(store: String): Seq[Long] =
    spark.read.parquet(store).select("doc_id").as[Long].collect().sorted.toSeq

  test("delta near-dup of the standing corpus is dropped; novel doc lands") {
    val (idx, store) = ws("ndi_basic")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    ingest(Seq((1L, A), (2L, B)), 0L, idx, store)
    assert(landedIds(store) == Seq(2L))
  }

  test("landed docs grow the index: batch 1 dedups against batch 0's delta") {
    val (idx, store) = ws("ndi_grow")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    ingest(Seq((1L, B)), 0L, idx, store) // novel — lands and indexes
    ingest(Seq((2L, B)), 1L, idx, store) // dup of batch 0's doc 1
    assert(landedIds(store) == Seq(1L))
  }

  test("replayed batch id is a no-op for store AND index") {
    val (idx, store) = ws("ndi_replay")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    ingest(Seq((1L, B)), 0L, idx, store)
    val storeRows = spark.read.parquet(store).count()
    val idxRows = spark.read.parquet(idx).count()
    ingest(Seq((1L, B)), 0L, idx, store) // checkpoint replay
    assert(spark.read.parquet(store).count() == storeRows)
    assert(spark.read.parquet(idx).count() == idxRows)
  }

  test("duplicate-blind within one micro-batch: both near-dups land") {
    val (idx, store) = ws("ndi_inbatch")
    NearDupIngest.writeIndex(
      Seq((100L, A)).toDF("doc_id", "text")
        .withColumn("t", TextFns.tokens(col("text"))), idx)
    // docs 1 and 2 duplicate each other but not the standing corpus —
    // the documented same-batch race: both land, both index
    ingest(Seq((1L, B), (2L, B)), 0L, idx, store)
    assert(landedIds(store) == Seq(1L, 2L))
    // a later delta matching them IS dropped (they indexed)
    ingest(Seq((3L, B)), 1L, idx, store)
    assert(landedIds(store) == Seq(1L, 2L))
  }
}
