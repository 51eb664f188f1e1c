package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property tests for the round-2 operators: connected components vs a
  * naive in-memory union-find on random graphs, and forward as-of vs a
  * naive per-row scan.
  */
class ComponentsAsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(7L + i)))

  private def naiveComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonical label = min node id in the component
    val byRoot = nodes.groupBy(find)
    byRoot.values.flatMap(ns => { val m = ns.min; ns.map(_ -> m) }).toMap
  }

  test("connectedComponents matches naive union-find on random graphs") {
    val edgeGen = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (a, b))
    } yield edges
    for (edges <- samples(edgeGen, 5) if edges.nonEmpty) {
      val df = edges.toDF("a", "b")
      // both tiers must agree with the reference: the driver-side
      // union-find fast path (default threshold) and the distributed
      // fixpoint (threshold 0)
      val local = Components.connectedComponents(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      val dist = Components.connectedComponents(df, "a", "b",
          localThreshold = 0)
        .as[(Long, Long)].collect().toMap
      assert(local == naiveComponents(edges))
      assert(dist == naiveComponents(edges))
    }
  }

  test("string node ids compute correct components (changed-rows convergence fallback)") {
    // the decimal-sum convergence check is numeric-only — string ids
    // cast to null and would declare convergence after one round; the
    // fallback must still propagate fully on a 12-hop string path
    val edges = (0 until 12)
      .map(i => (f"doc$i%03d", f"doc${i + 1}%03d")) ++
      Seq(("zzz1", "zzz2"))
    val got = Components.connectedComponents(edges.toDF("a", "b"), "a", "b",
        localThreshold = 0) // pin the DISTRIBUTED fallback convergence check
      .as[(String, String)].collect().toMap
    assert(got.size == 15)
    assert((0 to 12).forall(i => got(f"doc$i%03d") == "doc000"))
    assert(got("zzz1") == "zzz1" && got("zzz2") == "zzz1")
  }

  test("path graph (diameter 199) converges in O(log n) rounds via pointer doubling") {
    // plain propagation would need ~199 rounds; doubling needs ~9 —
    // the 12-round cap proves the shortcut is doing the work
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.connectedComponents(edges, "a", "b", maxIterations = 12,
        localThreshold = 0) // the round-count claim is about the distributed tier
      .as[(Long, Long)].collect().toMap
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("firstAfter picks the earliest right row at-or-after, per key") {
    val left = Seq((1L, 100L, "p1"), (1L, 205L, "p2"), (2L, 50L, "p3"),
      (2L, 400L, "p4")).toDF("k", "t", "pid")
    val right = Seq((1L, 100L, "c1"), (1L, 110L, "c2"), (1L, 300L, "c3"),
      (2L, 10L, "c4")).toDF("k", "rt", "cid")
    val got = AsOfJoin.firstAfter(left, right, Seq("k"),
        lTime = "t", rTime = "rt", payloadCols = Seq("cid"))
      .select(col("pid"), col("asof_match.cid").as("cid"))
      .as[(String, String)].collect().toMap
    // p1@100 → c1@100 (inclusive); p2@205 → c3@300; p3@50 → none
    // (c4@10 is before); p4@400 → none
    assert(got == Map("p1" -> "c1", "p2" -> "c3"))
  }

  test("banded simhash candidate generation is exact for hamming <= 3") {
    // pigeonhole: 16 bits in 4 bands — any pair within hamming 3 must
    // agree on at least one full 4-bit band
    val rng = new scala.util.Random(11)
    val sims = (0L until 200L).map(i => (i, rng.nextInt(1 << 16).toLong))
    val brute = for {
      (a, sa) <- sims; (b, sb) <- sims if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)
    val banded = for {
      (a, sa) <- sims; (b, sb) <- sims if a < b
      if (0 until 4).exists(k => ((sa >> (4 * k)) & 15) == ((sb >> (4 * k)) & 15))
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)
    assert(banded.toSet == brute.toSet && brute.nonEmpty)
  }
}
