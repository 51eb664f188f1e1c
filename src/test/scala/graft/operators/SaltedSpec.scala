package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Salted two-phase aggregation must equal the direct aggregation for
  * algebraic functions, regardless of bucket count.
  */
class SaltedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted aggregate equals direct aggregate on a skewed key") {
    // 10k rows of one hot key + scattered cold keys
    val rows = (1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 500).map(i => (s"cold${i % 50}", i.toLong))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val salted = Salted.aggregateSkewed(df, Seq("k"), saltBuckets = 8,
        partialAggs = Seq(count(lit(1)).as("pn"), sum("v").as("ps"),
          min("v").as("pmn"), max("v").as("pmx")),
        finalAggs = Seq(sum("pn").cast("long").as("n"), sum("ps").cast("long").as("s"),
          min("pmn").as("mn"), max("pmx").as("mx")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(salted === direct)
  }
}
