package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.operators.NativeGroupedTopK

/** The native grouped top-k physical operator: result parity with the
  * window formulation, the partial→exchange→final plan shape, and the
  * shuffle-volume bound the partial side exists for.
  */
class GroupedTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.load(spark, dir, "documents")
    .select("doc_id", "source", "n_chars")

  test("native top-3 per source equals the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val native = NativeGroupedTopK.topK(
      docs, Seq("source"), Seq(("n_chars", false), ("doc_id", true)), 3)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val w = Window.partitionBy("source")
      .orderBy(desc("n_chars"), col("doc_id"))
    val viaWindow = docs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(native === viaWindow && native.nonEmpty)
  }

  test("plans as partial -> one hash exchange -> final, with no sort") {
    val df = NativeGroupedTopK.topK(
      docs, Seq("source"), Seq(("n_chars", false), ("doc_id", true)), 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GroupedTopKFinal") && p.contains("GroupedTopKPartial"),
      "missing partial/final pair:\n" + p.take(800))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, found $exchanges:\n" + p.take(800))
    assert(!p.contains("Sort "), "native top-k planned a sort:\n" + p.take(800))
  }

  test("the partial side prunes each map partition to at most k rows per group") {
    import spark.implicits._
    // 8 input partitions × 1 group × k=2 → the exchange may move at
    // most 16 rows; the final output is exactly 2. Count what crosses
    // the shuffle by running just the partial stage.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // AQE wraps the tree in AdaptiveSparkPlanExec; disable it so the
      // physical operators are directly collectable
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val data = (1L to 10000L).map(i => ("g", i)).toDF("g", "v").repartition(8)
      val out = NativeGroupedTopK.topK(data, Seq("g"), Seq(("v", true)), 2)
      assert(out.collect().map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L))
      val partialRows = out.queryExecution.executedPlan
        .collectFirst {
          case e: GroupedTopKExec if e.partial => e
        }.map(_.execute().count()).getOrElse(-1L)
      assert(partialRows >= 2L && partialRows <= 16L,
        s"partial emitted $partialRows rows; expected <= 8 partitions * k")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
