package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("event_type").collect().map(_.toSeq).toSeq

  test("merged per-batch partials equal the direct full aggregate") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val batches = Seq(
      ev.filter(col("user_id") % 3 === 0),
      ev.filter(col("user_id") % 3 === 1),
      ev.filter(col("user_id") % 3 === 2))
    val merged = IncrementalAgg.finalize(IncrementalAgg.merge(
      batches.map(b => IncrementalAgg.init(b, Seq("event_type"), "value")),
      Seq("event_type")))
    val direct = IncrementalAgg.finalize(
      IncrementalAgg.init(ev, Seq("event_type"), "value"))
    assert(rows(merged) === rows(direct))
    assert(rows(direct).nonEmpty)
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val Seq(a, b, c) = Seq(0, 1, 2).map(i =>
      IncrementalAgg.init(ev.filter(col("user_id") % 3 === i),
        Seq("event_type"), "value"))
    val left = IncrementalAgg.merge(
      Seq(IncrementalAgg.merge(Seq(a, b), Seq("event_type")), c), Seq("event_type"))
    val right = IncrementalAgg.merge(
      Seq(a, IncrementalAgg.merge(Seq(b, c), Seq("event_type"))), Seq("event_type"))
    assert(rows(IncrementalAgg.finalize(left)) ===
      rows(IncrementalAgg.finalize(right)))
  }
}
