package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.TestSpark
import graft.operators.NativeGroupedTopK

/** Property pin for the native grouped top-k physical operator:
  * random (group, value, id) tables and random k must always equal
  * the window row_number formulation under the same total order —
  * including groups with fewer than k rows, duplicate order values
  * (id tiebreak), and single-group/all-groups-singleton shapes.
  */
class GroupedTopKPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[T](gen: Gen[T], seed: Long): T =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  test("random tables: native top-k == window row_number for every k") {
    val rowsGen = for {
      n <- Gen.choose(1, 300)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c", "d", "e")
        v <- Gen.choose(0L, 20L) // dense → duplicate order values
      } yield (g, v))
    } yield rows
    for (trial <- 0 until 6) {
      val raw = sample(rowsGen, 9000L + trial)
      val rows = raw.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      val k = 1 + trial % 4
      val df = rows.toDF("g", "v", "id").repartition(7)
      val native = NativeGroupedTopK.topK(
        df, Seq("g"), Seq(("v", false), ("id", true)), k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val w = Window.partitionBy("g").orderBy(desc("v"), col("id"))
      val expected = df.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k).drop("rk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(native === expected,
        s"trial $trial k=$k: native diverged from window formulation")
    }
  }
}
