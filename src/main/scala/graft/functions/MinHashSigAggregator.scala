package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.functions._

/** Typed `Aggregator` computing the whole k-component MinHash
  * signature in ONE buffer pass: per input hash, a tight k-iteration
  * loop updates an Array[Long] of running minima. Functionally
  * identical to `MinHashLsh.signatures`' k separate `min()` columns —
  * pinned by `MinHashAggSpec` — and the shape to prefer when k is
  * large: one aggregation buffer and one merge instead of k
  * independent typed-agg states, and the per-row work is a primitive
  * array loop instead of k expression-tree evaluations.
  *
  * (At the engine's default k=12 the codegen'd min() columns win —
  * whole-stage codegen fuses them into one pass anyway — so the query
  * path keeps `signatures`; this Aggregator is the documented scale
  * alternative and the engine's typed-UDAF exemplar.)
  */
class MinHashSigAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  private val as: Array[Long] = (0 until k).map(MinHashLsh.aConst).toArray
  private val bs: Array[Long] = (0 until k).map(MinHashLsh.bConst).toArray

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val g = (x * as(i) + bs(i)) % MinHashLsh.P
      if (g < buf(i)) buf(i) = g
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MinHashSigAggregator {

  /** One-pass signatures as s0..s{k-1} columns — same output contract
    * as `MinHashLsh.signatures`.
    */
  def signaturesOnePass(shingles: DataFrame, idCol: String,
      shingleCol: String, k: Int): DataFrame = {
    val sigUdaf: Column =
      udaf(new MinHashSigAggregator(k))
        .apply(MinHashLsh.baseHash(col(shingleCol)))
    val wide = (0 until k).map(i => element_at(col("__sig"), i + 1).as(s"s$i"))
    shingles.groupBy(col(idCol))
      .agg(sigUdaf.as("__sig"))
      .select(col(idCol) +: wide: _*)
  }
}
