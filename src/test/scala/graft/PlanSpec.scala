package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

/** Golden-plan assertions (SURVEY.md §4.2): the physical plans must
  * keep the properties the 100 TB design depends on — predicate
  * pushdown into the parquet scan, column pruning, and broadcast
  * joins for dimension tables.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    Registry.all(name).impl(spark, dir)
      .queryExecution.executedPlan.toString
  }

  test("q01: both predicates reach the parquet scan; columns pruned") {
    val p = plan("q01_filter_project")
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate not pushed")
    assert(p.contains("GreaterThan(l_discount"), "discount not pushed")
    // pruned read schema must not include unused columns like l_tax
    assert(!p.contains("l_tax"), "column pruning failed: l_tax read")
  }

  test("q02: dimension joins are broadcast, not shuffled") {
    val p = plan("q02_join_agg")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to SMJ")
  }

  test("q07: binned interval join is an equi hash join, not a cartesian range join") {
    val p = plan("q07_interval_join_binned")
    assert(!p.contains("CartesianProduct"), "interval join fell back to cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "interval join fell back to nested-loop")
  }

  test("q30: KNN scoring uses the codegen'd custom dot product") {
    val p = plan("q30_embed_knn")
    assert(p.contains("long_array_dot"), "custom expression not in plan")
  }

  test("q34: as-of join plans with no join operator at all") {
    // the union + carry-forward-window formulation: one shuffle on the
    // key, one in-partition sort — never a quadratic per-key range join
    val p = plan("q34_asof_join")
    assert(!p.contains("Join"), "as-of degraded to a join:\n" + p.take(600))
    assert(p.contains("Window"), p.take(400))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 key shuffle, found $exchanges")
  }

  test("q53: near-dup candidates come from an equi-join, never a nested loop over the corpus") {
    val p = plan("q53_embed_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "near-dup degraded to a full-corpus nested loop:\n" + p.take(600))
    assert(!p.contains("CartesianProduct"), "near-dup fell back to cartesian")
  }

  test("q67: Zipf head is a distributed top-k merge, not a vocab-wide window") {
    val p = plan("q67_token_zipf")
    assert(p.contains("TakeOrderedAndProject"),
      "expected per-partition partial top-k + merge:\n" + p.take(600))
  }

  test("q81/q93/q94: no per-group single-task sort (the 100 TB scale-killer)") {
    // A Window partitioned only by the low-cardinality group column
    // executes as ONE task per group. After the GroupedTopK /
    // GroupedPrefixSum rewrites, none of these plans may contain a
    // window at all, nor a sort whose required distribution is a hash
    // partitioning on just the group column.
    // (The final groupBy("source") agg DOES hash-partition on the
    // group — that is fine: map-side partial agg reduces each task to
    // ~|groups| rows before the exchange. The banned node is the
    // window sort, not the agg.)
    for (q <- Seq("q81_stratified_sample", "q93_sequence_packing",
        "q94_token_budget_sample")) {
      val p = plan(q)
      assert(!p.contains("Window"),
        s"$q still plans a per-group window:\n" + p.take(600))
    }
    // positive signature: q81's merge phase is an in-agg array sort
    // over bounded candidates (the grouped TakeOrdered analogue). The
    // physical toString hides the aggregate's result projection, so
    // check the optimized logical plan.
    val opt = Registry.all("q81_stratified_sample").impl(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("array_sort"),
      "q81 merge phase is not the bounded in-agg sort")
  }

  test("q96: eval shingle set is broadcast — the corpus side never shuffles for the probe") {
    val p = plan("q96_contamination_check")
    assert(p.contains("BroadcastHashJoin"),
      "contamination probe degraded to a shuffle join:\n" + p.take(600))
  }

  test("q97: priority dedup is one hash aggregation (partial + final)") {
    val p = plan("q97_priority_dedup")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"expected exactly 1 shuffle (partial+final min_by agg), found $exchanges")
  }

  test("q26: minhash signatures are map-only — zero hash shuffles") {
    // signaturesFromTokens completes each doc's k mins inside the
    // scan; the only exchange left is the final ORDER BY's range
    // partition. A hash exchange appearing here means the explode +
    // corpus-wide aggregation crept back in.
    val p = plan("q26_minhash_sig")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 0,
      s"expected a map-only signature stage, found $exchanges hash shuffles")
  }

  test("q101: mixture sampling is a pure per-row predicate — zero hash shuffles") {
    val p = plan("q101_mixture_sample")
    assert(!p.contains("Exchange hashpartitioning"),
      "mixture sample introduced a shuffle:\n" + p.take(600))
  }

  test("q102: canonical selection is a hash agg, never a per-cluster window sort") {
    val p = plan("q102_cluster_canonical")
    assert(!p.contains("Window"),
      "canonical pick degraded to a window:\n" + p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "LSH candidates degraded to a nested loop:\n" + p.take(600))
  }

  test("q103: unigram vocab and token total are broadcast to the scorer") {
    val p = plan("q103_unigram_logprob")
    assert(p.contains("BroadcastHashJoin"),
      "vocab join degraded to a shuffle join:\n" + p.take(600))
    assert(!p.contains("SortMergeJoin"),
      "vocab join degraded to SMJ:\n" + p.take(600))
  }

  test("q104: boilerplate scrub is per-row codegen — zero hash shuffles") {
    val p = plan("q104_boilerplate_scrub")
    assert(!p.contains("Exchange hashpartitioning"),
      "scrub introduced a shuffle:\n" + p.take(600))
  }

  test("q105: chunk dedup shuffles on the chunk key only — no windows, no nested loops") {
    val p = plan("q105_chunk_dedup")
    assert(!p.contains("Window"),
      "chunk dedup degraded to a window:\n" + p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "ownership join degraded to a nested loop:\n" + p.take(600))
  }

  test("q106: exact recount of sketch candidates plans joinless — a predicate + bounded agg") {
    val p = plan("q106_heavy_hitters")
    assert(!p.contains("Join"),
      "candidate recount introduced a join:\n" + p.take(600))
    assert(!p.contains("Window"),
      "candidate recount introduced a window:\n" + p.take(600))
  }

  test("q110: stratification rank never plans a per-source window sort") {
    val p = plan("q110_quality_strata")
    assert(!p.contains("Window"),
      "grouped rank degraded to a per-source window:\n" + p.take(600))
    assert(p.contains("BroadcastHashJoin"),
      "source-count join degraded to a shuffle join:\n" + p.take(600))
  }

  test("q107: the per-source rate table is broadcast to the corpus side") {
    val p = plan("q107_temperature_mixture")
    assert(p.contains("BroadcastHashJoin"),
      "rate join degraded to a shuffle join:\n" + p.take(600))
    assert(!p.contains("SortMergeJoin"),
      "rate join degraded to SMJ:\n" + p.take(600))
  }

  test("q124: funnel stages are hash aggs on user_id — never a per-user sequence window") {
    val p = plan("q124_funnel")
    assert(!p.contains("Window"),
      "funnel degraded to a per-user event-sequence window:\n" + p.take(600))
  }

  test("q129: session windows partition on the high-cardinality user key") {
    val p = plan("q129_sessionize")
    assert(p.contains("Window"), p.take(400))
    // every window's partition spec must include user_id — a
    // partition-less (global single-task) window is the scale-killer
    for (m <- "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r.findAllMatchIn(p))
      assert(m.group(1).contains("user_id"),
        "window not partitioned by user_id:\n" + m.matched)
  }

  test("q130/q137: pair top-k is a distributed TakeOrdered merge, not a global sort") {
    for (q <- Seq("q130_pair_counts", "q137_pmi_collocations")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q: expected per-partition partial top-k + merge:\n" + p.take(600))
    }
  }

  test("q135: containment candidates come from the shingle equi-join, never a nested loop") {
    val p = plan("q135_containment")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "containment degraded to an all-pairs join:\n" + p.take(600))
  }

  test("q134: the quantized log-ratio table joins the doc-token counts on the token key") {
    val p = plan("q134_dsir_weights")
    assert(!p.contains("Window"),
      "DSIR scoring introduced a window:\n" + p.take(600))
    assert(!p.contains("CartesianProduct"),
      "DSIR scoring fell back to cartesian:\n" + p.take(600))
  }

  test("q136/q138: array-native stats and chunking plan zero pre-sort shuffles") {
    for (q <- Seq("q136_lexical_stats", "q138_token_chunks")) {
      val p = plan(q)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 0,
        s"$q: expected no hash shuffle before the output sort, found $exchanges:\n" + p.take(600))
    }
  }
}
