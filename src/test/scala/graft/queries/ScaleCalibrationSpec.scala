package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.{MinHashLsh, TextFns}

/** Prediction-vs-measured audit of the LSH self-calibration one and
  * two decades above the harness corpus (VERDICT r13 #6): the q185
  * sweep's `cand_pairs` is an exact *prediction* of the banded join's
  * candidate load (Σ m·(m−1)/2 over buckets counts the join's output
  * pairs with band multiplicity); this spec executes the join at the
  * SELECTED config and asserts the prediction bounds what actually
  * came out, and that both respect the budget the calibration
  * enforced. GRAFT_PERF-gated and data-gated:
  *
  *   sbt "runMain graft.tools.ScaleGen bench/sfgen/sf10 500000 200000"
  *   GRAFT_PERF=1 sbt "testOnly graft.queries.ScaleCalibrationSpec"
  */
class ScaleCalibrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = 12
  private val BandGrid = Seq(2, 3, 4, 6)
  private val Budget = 20L

  private def auditAt(dir: String): Unit = {
    assume(sys.env.contains("GRAFT_PERF"), "set GRAFT_PERF=1 to run")
    assume(new java.io.File(s"$dir/documents.parquet").exists(),
      s"generate the decade first: runMain graft.tools.ScaleGen $dir ...")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("t", TextFns.tokens(col("text")))
    val sigs = MinHashLsh
      .signaturesFromTokens(docs, "doc_id", "t", 3, K).persist()
    // the q185 sweep, from the shared signature pass
    val keyed = BandGrid.map { b =>
      MinHashLsh.bandKeys(sigs, "doc_id", K, b)
        .select(lit(b).as("bands"), col("band"), col("key"))
    }.reduce(_ unionByName _)
    val stats = keyed.groupBy("bands", "band", "key")
      .agg(count(lit(1)).as("m"))
      .groupBy("bands")
      .agg(sum(expr("(m * (m - 1)) div 2")).as("cand_pairs"),
        sum(col("m")).as("tot"))
      .withColumn("n_docs", expr("tot div bands"))
      .collect()
    val nDocs = stats.head.getAs[Long]("n_docs")
    val fitting = stats.filter(r =>
      r.getAs[Long]("cand_pairs") <= r.getAs[Long]("n_docs") * Budget)
      .map(_.getAs[Int]("bands"))
    val selected =
      if (fitting.nonEmpty) fitting.max
      else stats.map(_.getAs[Int]("bands")).min
    val predicted = stats.find(_.getAs[Int]("bands") == selected).get
      .getAs[Long]("cand_pairs")
    // execute the banded join at the selection; measured distinct
    // pairs ≤ predicted multiset count, and within the budget when a
    // fitting config existed
    val measured = MinHashLsh.candidatePairs(sigs, "doc_id", K, selected)
      .count()
    info(s"$dir: n_docs=$nDocs selected=$selected bands, " +
      s"predicted<=$predicted pairs, measured=$measured " +
      s"(budget ${Budget * nDocs})")
    assert(measured <= predicted,
      s"banded join emitted $measured pairs, sweep predicted <=$predicted")
    if (fitting.nonEmpty)
      assert(measured <= Budget * nDocs,
        s"selected config $selected broke its own budget: " +
          s"$measured > ${Budget * nDocs}")
    sigs.unpersist()
    spark.catalog.clearCache()
  }

  test("sf1-docs (50k): selected config's measured load within budget") {
    auditAt("bench/sfgen/sf1")
  }

  test("sf1-docs: 16-bit SimHash family prices itself out of the budget") {
    assume(sys.env.contains("GRAFT_PERF"), "set GRAFT_PERF=1 to run")
    val dir = "bench/sfgen/sf1"
    assume(new java.io.File(s"$dir/documents.parquet").exists(),
      s"generate the decade first: runMain graft.tools.ScaleGen $dir ...")
    // the 16-bit fingerprint has at most 2^w buckets per band, so past
    // ~10k docs every width's candidate load exceeds a 20-pairs/doc
    // budget — the sweep must PRICE that (so the caller can route the
    // corpus to the MinHash family, whose 28-bit-per-component keyspace
    // keeps fitting) rather than execute a quadratic join. Sweep-only,
    // through the SHARED operator q189 executes (one rule, one code
    // path): no config is executed here.
    import graft.functions.SimHash
    val sigs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        explode(TextFns.tokens(col("text"))).as("tok"))
      .distinct()
      .groupBy("doc_id").agg(SimHash.simhashAgg(col("tok")).as("sh"))
    val stats = SimHash.widthSweep(sigs, "sh").collect()
    for (r <- stats)
      info(s"w=${r.getAs[Int]("w")}: cand_pairs=${r.getAs[Long]("cand_pairs")}" +
        s" budget=${Budget * r.getAs[Long]("n_docs")}")
    val fitting = stats.filter(r => r.getAs[Long]("cand_pairs") <=
      r.getAs[Long]("n_docs") * Budget)
    assert(fitting.isEmpty,
      "expected every 16-bit SimHash config to exceed the budget at 50k docs")
    assert(SimHash.calibrateWidth(sigs, "sh",
      pairsPerDocBudget = Budget) === SimHash.DefaultWidthGrid.max,
      "no fitting config must select the widest fallback")
    spark.catalog.clearCache()
  }

  test("sf10-docs (500k): selected config's measured load within budget") {
    auditAt("bench/sfgen/sf10")
  }
}
