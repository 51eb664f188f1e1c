package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.TestSpark

/** GroupedPrefixSum / GroupedTopK equal their window-function
  * formulations (the semantics) while never executing one task per
  * group (the scale property — asserted in PlanSpec).
  */
class GroupedPrefixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(421L + i)))

  private def sample = Seq(
    // (group, key, value) — includes a group spanning many partitions
    // once range-partitioned, duplicate values, and a null value.
    ("a", 1L, 10L), ("a", 2L, 5L), ("a", 3L, 0L), ("a", 4L, 7L),
    ("b", 1L, 1L), ("b", 2L, 1L), ("b", 3L, 1L),
    ("c", 9L, 100L)
  ).toDF("g", "k", "v")

  test("running sum (inclusive + exclusive) matches the window formulation") {
    for (inclusive <- Seq(true, false)) {
      val frameEnd = if (inclusive) 0L else -1L
      val w = Window.partitionBy("g").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, frameEnd)
      val expected = sample
        .withColumn("cum", coalesce(sum("v").over(w), lit(0L)))
        .orderBy("g", "k")
        .collect().toSeq
      val got = GroupedPrefixSum
        .withRunningSum(sample, "g", Seq(col("k")), "v", "cum",
          inclusive = inclusive, numPartitions = Some(5))
        .orderBy("g", "k")
        .collect().toSeq
      assert(got == expected, s"inclusive=$inclusive")
    }
  }

  test("running sum: null values count as zero; empty input yields empty output") {
    val df = Seq(("a", 1L, Some(3L)), ("a", 2L, None), ("a", 3L, Some(4L)))
      .toDF("g", "k", "v")
    val got = GroupedPrefixSum
      .withRunningSum(df, "g", Seq(col("k")), "v", "cum", inclusive = true)
      .orderBy("k").select("cum").as[Long].collect().toSeq
    assert(got == Seq(3L, 3L, 7L))
    val empty = GroupedPrefixSum.withRunningSum(
      df.filter(lit(false)), "g", Seq(col("k")), "v", "cum")
    assert(empty.count() == 0)
  }

  test("running sum property: random groups/keys equal the window form") {
    val rowsGen = Gen.listOfN(60, for {
      g <- Gen.oneOf("g1", "g2", "g3", "g4")
      k <- Gen.choose(0L, 30L)
      v <- Gen.choose(0L, 100L)
    } yield (g, k, v))
    for (rows <- samples(rowsGen, 8) if rows.nonEmpty) {
      // make (g, k) unique so the order is total
      val distinctRows = rows.groupBy(r => (r._1, r._2))
        .map(_._2.head).toSeq
      val df = distinctRows.toDF("g", "k", "v")
      val w = Window.partitionBy("g").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
      val expected = df.withColumn("cum", sum("v").over(w))
        .orderBy("g", "k").collect().toSeq
      val got = GroupedPrefixSum
        .withRunningSum(df, "g", Seq(col("k")), "v", "cum",
          numPartitions = Some(7))
        .orderBy("g", "k").collect().toSeq
      assert(got == expected)
    }
  }

  test("a giant group spans many range partitions and still sums exactly") {
    // 95% of rows in one group: the window form would push them all
    // through ONE task; the range partitioning on (group, key) must
    // spread them across partitions, with the broadcast carry offsets
    // keeping the running sum exact across the splits.
    val n = 50000
    val df = (0 until n).map { i =>
      (if (i % 20 == 0) s"minor${i % 3}" else "giant", i.toLong, (i % 7).toLong)
    }.toDF("g", "k", "v").repartition(8)
    val ranged = df.repartitionByRange(8, col("g"), col("k"))
    val spread = ranged
      .select(col("g"), spark_partition_id().as("p"))
      .filter(col("g") === "giant")
      .select("p").distinct().count()
    assert(spread > 1, s"giant group landed on $spread partition(s)")
    val w = Window.partitionBy("g").orderBy("k")
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = df.withColumn("cum", sum("v").over(w))
      .groupBy("g").agg(max("cum").as("m"), sum("cum").as("s"))
      .orderBy("g").collect().toSeq
    val got = GroupedPrefixSum
      .withRunningSum(df, "g", Seq(col("k")), "v", "cum",
        numPartitions = Some(8))
      .groupBy("g").agg(max("cum").as("m"), sum("cum").as("s"))
      .orderBy("g").collect().toSeq
    assert(got == expected)
  }

  test("running max (inclusive + exclusive) matches the window formulation") {
    for (inclusive <- Seq(true, false)) {
      val frameEnd = if (inclusive) 0L else -1L
      val w = Window.partitionBy("g").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, frameEnd)
      val expected = sample
        .withColumn("cum", coalesce(max("v").over(w), lit(Long.MinValue)))
        .orderBy("g", "k")
        .collect().toSeq
      val got = GroupedPrefixSum
        .withRunningMax(sample, "g", Seq(col("k")), "v", "cum",
          inclusive = inclusive, numPartitions = Some(5))
        .orderBy("g", "k")
        .collect().toSeq
      assert(got == expected, s"inclusive=$inclusive")
    }
  }

  test("running max property: random groups/keys equal the window form, many partitions") {
    val rowsGen = Gen.listOfN(60, for {
      g <- Gen.oneOf("g1", "g2", "g3")
      k <- Gen.choose(0L, 30L)
      v <- Gen.choose(-50L, 50L)
    } yield (g, k, v))
    for (rows <- samples(rowsGen, 8) if rows.nonEmpty) {
      val distinctRows = rows.groupBy(r => (r._1, r._2))
        .map(_._2.head).toSeq
      val df = distinctRows.toDF("g", "k", "v")
      val w = Window.partitionBy("g").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
      val expected = df.withColumn("cum", max("v").over(w))
        .orderBy("g", "k").collect().toSeq
      val got = GroupedPrefixSum
        .withRunningMax(df, "g", Seq(col("k")), "v", "cum",
          numPartitions = Some(7))
        .orderBy("g", "k").collect().toSeq
      assert(got == expected)
    }
  }

  test("running max supports descending sort keys (the skyline scan shape)") {
    val df = Seq(("s", 10L, 3L), ("s", 8L, 5L), ("s", 6L, 4L), ("s", 4L, 9L))
      .toDF("g", "x", "y")
    // exclusive prefix max over x DESC: first row gets the identity
    val got = GroupedPrefixSum
      .withRunningMax(df, "g", Seq(col("x").desc), "y", "pmax",
        inclusive = false, numPartitions = Some(3))
      .orderBy(col("x").desc).select("pmax").as[Long].collect().toSeq
    assert(got == Seq(Long.MinValue, 3L, 5L, 5L))
  }

  test("preconditions: non-long value column and non-positive k are rejected") {
    val df = Seq(("a", 1L, 1)).toDF("g", "k", "v") // v is Int, not Long
    val e = intercept[IllegalArgumentException] {
      GroupedPrefixSum.withRunningSum(df, "g", Seq(col("k")), "v", "cum")
    }
    assert(e.getMessage.contains("LongType"))
    intercept[IllegalArgumentException] {
      GroupedTopK.withRowNumber(df, "g", Seq(col("k")), k = 0)
    }
  }

  test("cardinality guard trips on a high-cardinality group column") {
    // One group per row: the offset table would be O(rows) — exactly
    // the misuse the decision rule forbids (a plain window is the
    // right plan there). The guard must fail with an actionable
    // message, not OOM the driver silently.
    val df = (0 until 500).map(i => (s"user$i", i.toLong, 1L))
      .toDF("g", "k", "v")
    val e = intercept[Exception] {
      GroupedPrefixSum.withRunningSum(df, "g", Seq(col("k")), "v", "cum",
        numPartitions = Some(4), maxOffsetEntries = 100).count()
    }
    def messageChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messageChain(e).exists(m =>
      m.contains("maxOffsetEntries") && m.contains("window")))
    // and the same input passes with the bound raised
    val ok = GroupedPrefixSum.withRunningSum(df, "g", Seq(col("k")), "v",
      "cum", numPartitions = Some(4), maxOffsetEntries = 1000)
    assert(ok.count() == 500)
  }

  test("grouped top-k matches the row_number window formulation") {
    val df = (1 to 200).map { i =>
      (s"g${i % 3}", s"id$i", i.toLong)
    }.toDF("g", "id", "x").repartition(8)
    val w = Window.partitionBy("g").orderBy(md5(col("id")), col("id"))
    val expected = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .orderBy("g", "rk")
      .select("g", "id", "x", "rk")
      .collect().toSeq
    val got = GroupedTopK
      .withRowNumber(df, "g", Seq(md5(col("id")), col("id")), k = 5)
      .orderBy("g", "rk")
      .select("g", "id", "x", "rk")
      .collect().toSeq
    assert(got == expected)
  }

  test("grouped top-k: k larger than group size returns the whole group, ranked") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("g", "k")
    val got = GroupedTopK.withRowNumber(df, "g", Seq(col("k")), k = 10)
      .orderBy("g", "rk").select("g", "k", "rk")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 5L, 1L)))
  }

  test("grouped top-k survives single-row partitions and duplicate sort keys deterministically") {
    // duplicate primary key, tiebroken by id — mirrors the lineitem
    // dup-key harness gotcha
    val df = Seq(("a", 1L, "x"), ("a", 1L, "y"), ("a", 1L, "z"))
      .toDF("g", "k", "id").repartition(6)
    val got = GroupedTopK
      .withRowNumber(df, "g", Seq(col("k"), col("id")), k = 2)
      .orderBy("rk").select("id").as[String].collect().toSeq
    assert(got == Seq("x", "y"))
  }
}
