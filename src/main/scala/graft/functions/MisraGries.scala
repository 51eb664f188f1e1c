package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra–Gries heavy-hitter summary as a typed, *mergeable*
  * `Aggregator` (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012).
  *
  * Buffer = at most `capacity` (item, weight) entries. Over a stream
  * of N items the summary guarantees, for every item x:
  *
  *   trueCount(x) - N / (capacity + 1)  <=  est(x)  <=  trueCount(x)
  *
  * so every item with frequency above N / (capacity + 1) is present.
  * The guarantee survives arbitrary merge trees, which is exactly
  * Spark's partial-aggregation shape: each partition builds a partial
  * summary map-side, the final merge combines them, and no shuffle
  * ever carries more than `capacity` entries per partition — a
  * constant-size substitute for the full groupBy when only the heavy
  * tail matters.
  *
  * The intended 100 TB pattern is two-pass candidate/verify (q106):
  * this sketch nominates a bounded candidate set, a second exact pass
  * recounts only the candidates (broadcast semi-join), and the final
  * filter applies the exact threshold — giving exact heavy hitters
  * with one full shuffle-free scan plus one scan aggregating a
  * bounded key set, never a full-vocabulary shuffle.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < capacity => buf.updated(x, 1L)
      case None =>
        // decrement-all step: drops one occurrence of `capacity + 1`
        // distinct items (x's single occurrence is absorbed too)
        buf.flatMap { case (k, v) => if (v > 1) Some(k -> (v - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (combined.size <= capacity) combined
    else {
      // subtract the (capacity+1)-th largest weight from everything,
      // drop the non-positive — the mergeable-summaries offset rule
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      combined.flatMap { case (k, v) =>
        if (v > cut) Some(k -> (v - cut)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
