package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property-based operator tests (SURVEY.md §5.2.4): closure vs a
  * naive in-memory fixpoint on random DAGs, closure idempotence,
  * symmetrize involution, last-wins = iterated-map upsert semantics,
  * binned interval join ≡ naive interval join. Generators are sampled
  * with fixed seeds for reproducibility.
  */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def naiveClosure(edges: Set[(Int, Int)]): Set[(Int, Int)] = {
    var c = edges
    var grew = true
    while (grew) {
      val next = c ++ (for ((a, b) <- c; (b2, d) <- c if b == b2) yield (a, d))
      grew = next.size > c.size
      c = next
    }
    c
  }

  // Random DAG: edges only from smaller to larger node id (acyclic).
  private val dagGen: Gen[Set[(Int, Int)]] = for {
    n <- Gen.choose(2, 12)
    edges <- Gen.listOf(for {
      a <- Gen.choose(0, n - 2)
      b <- Gen.choose(a + 1, n - 1)
    } yield (a, b))
  } yield edges.toSet

  test("transitive closure matches naive fixpoint on random DAGs") {
    for (edges <- samples(dagGen, 12) if edges.nonEmpty) {
      val df = edges.toSeq.toDF("parent", "child")
      val got = Closure.transitiveClosure(df, "parent", "child")
        .as[(Int, Int)].collect().toSet
      assert(got === naiveClosure(edges), s"edges=$edges")
    }
  }

  test("distributed and metadata-tier closure paths agree") {
    for (edges <- samples(dagGen, 6) if edges.nonEmpty) {
      val df = edges.toSeq.toDF("parent", "child")
      val local = Closure.transitiveClosure(df, "parent", "child")
        .as[(Int, Int)].collect().toSet
      val dist = Closure.transitiveClosure(df, "parent", "child",
          localThreshold = 0) // force the distributed fixpoint
        .as[(Int, Int)].collect().toSet
      assert(local === dist, s"edges=$edges")
      assert(dist === naiveClosure(edges), s"edges=$edges")
    }
  }

  test("minDepths matches naive BFS on random DAGs, both tiers") {
    def naiveDepths(edges: Set[(Int, Int)]): Map[Int, Long] = {
      val children = edges.map(_._2)
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var depth = edges.map(_._1).filterNot(children.contains)
        .map(_ -> 0L).toMap
      var frontier = depth.keySet
      var d = 0L
      while (frontier.nonEmpty) {
        d += 1
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .filterNot(depth.contains)
        depth ++= next.map(_ -> d)
        frontier = next
      }
      depth
    }
    for (edges <- samples(dagGen, 8) if edges.nonEmpty) {
      val df = edges.toSeq.toDF("parent", "child")
      val local = Closure.minDepths(df, "parent", "child")
        .as[(Int, Long)].collect().toMap
      val dist = Closure.minDepths(df, "parent", "child", localThreshold = 0)
        .as[(Int, Long)].collect().toMap
      assert(local === naiveDepths(edges), s"edges=$edges")
      assert(dist === naiveDepths(edges), s"edges=$edges")
    }
  }

  test("closure is idempotent: closure(closure(E)) = closure(E)") {
    val edges = Seq((1, 2), (2, 3), (3, 4), (1, 5), (5, 4)).toDF("parent", "child")
    val once = Closure.transitiveClosure(edges, "parent", "child")
    val twice = Closure.transitiveClosure(
      once.toDF("parent", "child"), "parent", "child")
    assert(twice.as[(Int, Int)].collect().toSet ===
      once.as[(Int, Int)].collect().toSet)
  }

  test("symmetrize is an involution modulo distinct (swap∘swap = id)") {
    val pairsGen = Gen.listOf(Gen.zip(Gen.choose(0, 20), Gen.choose(0, 20)))
    for (pairs <- samples(pairsGen, 8)) {
      val df = pairs.toDF("a", "b")
      val sym = Symmetrize.symmetrize(df, Seq(("a", "b"))).distinct()
      val symTwice = Symmetrize.symmetrize(sym, Seq(("a", "b"))).distinct()
      assert(sym.as[(Int, Int)].collect().toSet ===
        symTwice.as[(Int, Int)].collect().toSet)
      assert(sym.as[(Int, Int)].collect().toSet ===
        pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet)
    }
  }

  test("lastWins equals iterated-map INSERT OR REPLACE semantics") {
    val rowsGen = Gen.listOf(Gen.zip(Gen.choose(0, 5), Gen.choose(0, 100)))
    for (rows <- samples(rowsGen, 8) if rows.nonEmpty) {
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "ord")
      val got = Dedup.lastWins(df, Seq("k"), Seq(col("ord")))
        .select("k", "v").as[(Int, Int)].collect().toSet
      val expected = rows.foldLeft(Map.empty[Int, Int]) {
        case (m, (k, v)) => m + (k -> v)
      }.toSet
      assert(got === expected, s"rows=$rows")
    }
  }

  test("binned interval join ≡ naive interval join on random intervals") {
    val ivGen = Gen.listOfN(30, for {
      key <- Gen.oneOf("a", "b")
      s <- Gen.choose(0L, 500L)
      len <- Gen.choose(0L, 120L)
    } yield (key, s, s + len))
    for (ivs <- samples(ivGen, 4)) {
      val left = ivs.zipWithIndex.map { case ((k, s, e), i) => (k, i, s, e) }
        .toDF("key", "l_id", "l_s", "l_e")
      val right = ivs.zipWithIndex.map { case ((k, s, e), i) => (k, i + 1000, s, e) }
        .toDF("key", "r_id", "r_s", "r_e")
      val naive = IntervalJoin.naive(left, right, Seq("key"),
          "l_s", "l_e", "r_s", "r_e")
        .select("l_id", "r_id").as[(Int, Int)].collect().toSet
      val binned = IntervalJoin.binned(left, right, Seq("key"),
          "l_s", "l_e", "r_s", "r_e", binWidth = 64L)
        .select("l_id", "r_id").as[(Int, Int)].collect().toSet
      assert(binned === naive)
    }
  }

  test("binnedCapped ≡ naive under pathological whole-chromosome intervals") {
    // adversarial mixture: mostly median-length intervals plus rows
    // spanning ~the entire coordinate space — uncapped binning would
    // explode those into thousands of bin rows each
    val ivGen = Gen.listOfN(40, for {
      key <- Gen.oneOf("a", "b")
      whole <- Gen.frequency(4 -> false, 1 -> true)
      s <- Gen.choose(0L, if (whole) 2000L else 90000L)
      len <- if (whole) Gen.choose(80000L, 100000L) else Gen.choose(0L, 40L)
    } yield (key, s, s + len))
    for (ivs <- samples(ivGen, 4)) {
      val left = ivs.zipWithIndex.map { case ((k, s, e), i) => (k, i, s, e) }
        .toDF("key", "l_id", "l_s", "l_e")
      val right = ivs.zipWithIndex.map { case ((k, s, e), i) => (k, i + 1000, s, e) }
        .toDF("key", "r_id", "r_s", "r_e")
      val expected = IntervalJoin.naive(left, right, Seq("key"),
          "l_s", "l_e", "r_s", "r_e")
        .select("l_id", "r_id").as[(Int, Int)].collect().toSet
      // cap forces every whole-range row down the residual path
      // (binWidth 16 → whole-range rows would be ~5000 bins each)
      for (cap <- Seq(1L, 64L, 1000000L)) {
        val got = IntervalJoin.binnedCapped(left, right, Seq("key"),
            "l_s", "l_e", "r_s", "r_e", binWidth = 16L, maxBinsPerRow = cap)
          .select("l_id", "r_id").as[(Int, Int)].collect().toSet
        assert(got === expected, s"cap=$cap")
      }
    }
  }

  test("keepFirst keeps the first row in ordinal order per key") {
    val df = Seq((1, "a", 0L), (1, "b", 1L), (2, "c", 5L), (2, "d", 3L))
      .toDF("k", "v", "ord")
    val got = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(got === Set((1, "a"), (2, "d")))
  }

  // r21: pick() switched from a row_number window (exchange + sort) to
  // min/max of a struct(ord…, row) hash aggregation — pin that the
  // aggregation form still selects the window form's winners, on
  // random data with UNIQUE ordinals (the engine's call sites all
  // order by monotonically_increasing_id-derived ordinals or unique
  // key suffixes) and with null ordering keys, for both directions
  // and a multi-column ordering.
  test("agg-based lastWins/keepFirst ≡ row_number window on unique ordinals") {
    val rowsGen = Gen.listOf(Gen.zip(Gen.choose(0, 5), Gen.choose(0, 100)))
    for (rows <- samples(rowsGen, 8) if rows.nonEmpty) {
      val df = rows.zipWithIndex
        .map { case ((k, v), i) =>
          // null ordinal on a few rows: window asc = NULLS FIRST,
          // desc = NULLS LAST — the struct comparison must agree
          (k, v, if (v % 7 == 0) None else Some(i.toLong), i.toLong)
        }
        .toDF("k", "v", "ord", "tie")
      def windowPick(desc: Boolean) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("k"))
          .orderBy(Seq(col("ord"), col("tie"))
            .map(c => if (desc) c.desc else c.asc): _*)
        df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .select("k", "v").as[(Int, Int)].collect().toSet
      }
      val first = Dedup.keepFirst(df, Seq("k"), Seq(col("ord"), col("tie")))
        .select("k", "v").as[(Int, Int)].collect().toSet
      val last = Dedup.lastWins(df, Seq("k"), Seq(col("ord"), col("tie")))
        .select("k", "v").as[(Int, Int)].collect().toSet
      assert(first === windowPick(desc = false), s"keepFirst rows=$rows")
      assert(last === windowPick(desc = true), s"lastWins rows=$rows")
      // r22: the keep projection (pruned packed struct) picks the same
      // winners as the all-columns form wherever ordinals are unique —
      // and ord columns need NOT be in keep.
      val firstKeep = Dedup.keepFirst(df, Seq("k"), Seq(col("ord"), col("tie")),
          keep = Seq("k", "v"))
        .as[(Int, Int)].collect().toSet
      val lastKeep = Dedup.lastWins(df, Seq("k"), Seq(col("ord"), col("tie")),
          keep = Seq("v", "k")) // keep order ≠ input order, key not first
        .select("k", "v").as[(Int, Int)].collect().toSet
      assert(firstKeep === first, s"keepFirst/keep rows=$rows")
      assert(lastKeep === last, s"lastWins/keep rows=$rows")
    }
  }

  test("Dedup keep ⊆ keys degenerates to distinct keys; MapType is rejected") {
    val df = Seq((1, 10, 1L), (1, 11, 2L), (2, 20, 3L)).toDF("k", "v", "ord")
    val onlyKeys = Dedup.lastWins(df, Seq("k"), Seq(col("ord")), keep = Seq("k"))
      .as[Int].collect().toSet
    assert(onlyKeys === Set(1, 2))
    val withMap = df.withColumn("m", map(col("k"), col("v")))
    val e = intercept[IllegalArgumentException] {
      Dedup.lastWins(withMap, Seq("k"), Seq(col("ord")))
    }
    assert(e.getMessage.contains("MapType"))
    // but excluding the map column via keep works
    val pruned = Dedup.lastWins(withMap, Seq("k"), Seq(col("ord")),
        keep = Seq("k", "v")).as[(Int, Int)].collect().toSet
    assert(pruned === Set((1, 11), (2, 20)))
  }

  test("GlobalRank assigns exact 1..N ranks across many range partitions") {
    val rng = new scala.util.Random(3)
    val vals = rng.shuffle((1L to 5000L).toVector).map(v => (v, s"p$v"))
    val df = vals.toDF("v", "payload").repartition(16)
    val ranked = GlobalRank.withRank(df, Seq(col("v")), "rank",
      numPartitions = Some(8))
    // more than one range partition actually participated
    assert(ranked.rdd.getNumPartitions > 1)
    val got = ranked.select("v", "rank").as[(Long, Long)].collect()
    assert(got.length == 5000)
    // exact global rank = the value itself (values are 1..N)
    assert(got.forall { case (v, r) => v == r })
  }
}
