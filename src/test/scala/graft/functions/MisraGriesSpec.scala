package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the Misra–Gries mergeable-summary guarantee the q106
  * candidate pass relies on: for capacity m over N items, every item
  * with true count > N/(m+1) survives, and no estimate exceeds the
  * true count — under Spark's real partial/final aggregation (merge
  * order arbitrary across partitions).
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish skewed stream: item i repeated ~N/i times, plus a long
    * tail of singletons to force constant decrement pressure.
    */
  private def skewed: Seq[String] =
    (1 to 20).flatMap(i => Seq.fill(2000 / i)(s"hh$i")) ++
      (1 to 3000).map(i => s"tail$i")

  test("sketch keeps every item above N/(m+1) and never overcounts") {
    val data = skewed
    val n = data.size
    val m = 32
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val mg = udaf(new MisraGries(m))
    val est = spark.createDataset(data).toDF("tok")
      .repartition(7) // force multi-partition partials + merges
      .agg(mg(col("tok")).as("s"))
      .head().getMap[String, Long](0)
    val mustSurvive = truth.filter(_._2 > n.toDouble / (m + 1)).keySet
    assert(mustSurvive.nonEmpty, "fixture must contain true heavy hitters")
    val missing = mustSurvive.diff(est.keySet.toSet)
    assert(missing.isEmpty, s"guaranteed heavy hitters lost: $missing")
    est.foreach { case (k, v) =>
      assert(v <= truth.getOrElse(k, 0L),
        s"estimate for $k overcounts: $v > ${truth.getOrElse(k, 0L)}")
      assert(v >= truth(k) - n.toDouble / (m + 1),
        s"estimate for $k undershoots the error bound")
    }
  }

  test("buffer never exceeds capacity") {
    val m = 8
    val agg = new MisraGries(m)
    val buf = skewed.foldLeft(agg.zero)(agg.reduce)
    assert(buf.size <= m)
    // merging two full buffers stays within capacity too
    val half = skewed.grouped(skewed.size / 2 + 1).toSeq
    val merged = agg.merge(
      half(0).foldLeft(agg.zero)(agg.reduce),
      half(1).foldLeft(agg.zero)(agg.reduce))
    assert(merged.size <= m)
  }

  test("q106 shape: candidate set is a superset of the exact answer") {
    val data = skewed
    val df = spark.createDataset(data).toDF("tok").repartition(5)
    val mg = udaf(new MisraGries(64))
    val cands = df.agg(mg(col("tok")).as("s"))
      .select(explode(map_keys(col("s"))).as("tok"))
      .as[String].collect().toSet
    val n = data.size.toLong
    val exact = df.groupBy("tok").count()
      .filter(col("count") * 50 >= n)
      .select("tok").as[String].collect().toSet
    assert(exact.subsetOf(cands))
  }
}
