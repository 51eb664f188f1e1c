package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter benchmark decontamination — the constant-size scale
  * path for the q96 contamination check.
  *
  * q96 broadcasts the eval source's exact shingle set; that is the
  * right call while the eval set is dimension-sized, but a suite of
  * benchmarks can reach 10^9 shingles, and a broadcast hash set of
  * longs at that size (tens of GB with overhead) stops fitting in
  * executor memory. The Spark-native answer is the built-in
  * `bloom_filter_agg` / `might_contain` pair: build a fixed-size bloom
  * over the eval shingles (one partial+final aggregation, the filter
  * bytes are a few hundred MB at fpp 1e-3 even for 10^9 items),
  * broadcast the *bytes* via a scalar subquery-shaped crossJoin, and
  * probe each corpus shingle with a codegen'd `might_contain`.
  *
  * Semantics contract (pinned by BloomDecontaminateSpec):
  *  - NO false negatives: every truly contaminated shingle probes
  *    true, so the flagged set is a superset of q96's exact answer —
  *    the safe direction for decontamination (never under-flag).
  *  - False-positive rate bounded by the requested fpp, so the
  *    over-flagging is controlled.
  * The exact per-doc overlap fraction stays q96's job; this operator
  * answers the binary "touches the benchmark?" gate, which is how
  * decontamination actually runs at corpus scale.
  */
object BloomDecontaminate {

  /** Flag corpus rows whose shingle might be contaminated.
    *
    * @param corpusShingles (idCol, shingleCol) rows, shingleCol LONG
    * @param evalShingles single-column frame of eval shingle hashes
    * @param expectedItems sizing for the bloom (eval-set cardinality
    *        estimate; over-sizing only costs bytes, never correctness)
    * @param fpp target false-positive probability
    * @return corpusShingles plus a `maybe_contaminated` boolean
    */
  def flag(corpusShingles: DataFrame, shingleCol: String,
      evalShingles: DataFrame, evalCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.001): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(
      corpusShingles.sparkSession)
    // The filter is BUILT distributed (partial+final aggregation over
    // the eval shingles); only the finished bytes come back — one
    // bounded binary row (`might_contain` requires a constant/scalar
    // bloom, and a plan literal ships with the task binary exactly
    // like the scalar subquery Spark's own runtime filtering injects).
    val bloomBytes = evalShingles
      .agg(bloomFilterAgg(col(evalCol), expectedItems, fpp).as("__bloom"))
      .head().getAs[Array[Byte]](0)
    corpusShingles.withColumn("maybe_contaminated",
      call_function("graft_might_contain", lit(bloomBytes), col(shingleCol)))
  }

  /** Per-document contamination gate: true if ANY of the doc's
    * shingles might touch the eval set.
    */
  def flagDocs(corpusShingles: DataFrame, idCol: String, shingleCol: String,
      evalShingles: DataFrame, evalCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.001): DataFrame =
    flag(corpusShingles, shingleCol, evalShingles, evalCol, expectedItems, fpp)
      .groupBy(idCol)
      .agg(max(col("maybe_contaminated")).as("maybe_contaminated"))

  /** The bloom aggregate has no Scala `functions._` wrapper and no
    * public registry entry — call it through the graft-registered name
    * (still Spark's codegen'd native aggregate).
    */
  private def bloomFilterAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    call_function("graft_bloom_agg", c,
      lit(expectedItems), lit(numBits(expectedItems, fpp)))

  /** Standard bloom sizing: m = -n ln(p) / (ln 2)^2. */
  private def numBits(n: Long, p: Double): Long =
    math.ceil(-n * math.log(p) / (math.log(2) * math.log(2))).toLong
}
