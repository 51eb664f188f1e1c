package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}
import graft.corpus.Curation

/** Pins the calibration→execution loop: the config q186 executes is
  * the one the q185 calibration selects, and the executed dedup is
  * the fixed-config dedup at that selection.
  */
class Extended23Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q186 executes exactly the band config q185 selects") {
    val sel185 = Registry.all("q185_minhash_calibration").impl(spark, dir)
      .filter(col("selected") === 1L)
      .select("bands").as[Long].collect()
    assert(sel185.length === 1)
    val bands186 = Registry.all("q186_calibrated_neardup").impl(spark, dir)
      .select("bands").distinct().as[Long].collect()
    assert(bands186.toSeq === Seq(sel185.head))
  }

  test("q187 executes exactly the plane config q184 selects") {
    val sel184 = Registry.all("q184_band_calibration").impl(spark, dir)
      .filter(col("selected") === 1L)
      .select("planes_per_band").as[Long].collect()
    assert(sel184.length === 1)
    val planes187 = Registry.all("q187_calibrated_embed_neardup")
      .impl(spark, dir)
      .select("planes").distinct().as[Long].collect()
    assert(planes187.toSeq === Seq(sel184.head))
    spark.catalog.clearCache()
  }

  test("degenerate corpus: calibration fallback + hot-bucket guard compose") {
    // 3000 identical docs: every (band, key) bucket of every config
    // holds the whole corpus, so no config fits the budget → the
    // calibration falls back to the fewest-bands config, and the
    // executed join's LshGuard chain-links the degenerate bucket
    // (est = 1.0 runs) instead of building O(m²) pairs — the dedup
    // must still collapse the corpus to exactly one survivor
    val docs = spark.range(3000)
      .selectExpr("id AS doc_id",
        "'alpha beta gamma delta epsilon zeta' AS text")
      .transform(Curation.withTokens())
    val (bands, kept) =
      Curation.calibratedNearDup(pairsPerDocBudget = 5L)(docs)
    assert(bands === 2, "no config fits — expected the fewest-bands fallback")
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(0L))
    spark.catalog.clearCache()
  }

  test("degenerate corpus: SimHash fallback executes guard-bounded") {
    // 3000 identical docs: one fingerprint, so EVERY band key of every
    // width holds the whole corpus — no width fits, the fallback
    // (widest) is selected, and the executed join must chain-link the
    // degenerate buckets (m−1 pairs per band, deduped across bands)
    // instead of building m(m−1)/2 — the unguarded q189 join filled
    // 80 GB of shuffle scratch on a fingerprint-concentrated 500 k-doc
    // corpus before SimHash.candidatePairs carried the LshGuard cap
    import graft.functions.{SimHash, TextFns}
    val sigs = spark.range(3000)
      .selectExpr("id AS doc_id",
        "'alpha beta gamma delta epsilon zeta' AS text")
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .distinct()
      .groupBy("doc_id").agg(SimHash.simhashAgg(col("tok")).as("sh"))
    val w = SimHash.calibrateWidth(sigs, "sh", pairsPerDocBudget = 5L)
    assert(w === SimHash.DefaultWidthGrid.max,
      "no config fits — expected the widest fallback")
    val pairs = SimHash.candidatePairs(sigs, "doc_id", "sh", w).collect()
    // chain pairs: every band links (i, i+1) in id order, so the
    // distinct union across bands is exactly the 2999 adjacent pairs
    assert(pairs.length === 2999)
    assert(pairs.forall(r => r.getAs[Long]("sa") === r.getAs[Long]("sb")),
      "identical-fingerprint chain links must be hamming-0")
    spark.catalog.clearCache()
  }

  test("SimHash candidatePairs below the cap == the raw band join") {
    import graft.functions.{SimHash, TextFns}
    val sigs = Tables.docsParallel(spark, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .distinct()
      .groupBy("doc_id").agg(SimHash.simhashAgg(col("tok")).as("sh"))
      .persist()
    val w = SimHash.calibrateWidth(sigs, "sh")
    val guarded = SimHash.candidatePairs(sigs, "doc_id", "sh", w)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val banded = SimHash.bandKeys(sigs, "sh", w)
      .select(col("doc_id"), col("sh"), col("band"), col("key"))
    val raw = banded.toDF("a", "sa", "band", "key")
      .join(banded.toDF("b", "sb", "band", "key"), Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(guarded === raw,
      "with no bucket over the cap the guarded plan must equal the raw join")
    spark.catalog.clearCache()
  }

  test("SimHash calibratedPairs == calibrateWidth + candidatePairs, both regimes") {
    import graft.functions.{SimHash, TextFns}
    def sigsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .distinct()
      .groupBy("doc_id").agg(SimHash.simhashAgg(col("tok")).as("sh"))
      .persist()
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").as[(Long, Long)].collect().toSet
    // sub-cap regime (the oracle-equality regime the gate runs in)
    val real = sigsOf(Tables.docsParallel(spark, dir))
    val wProbe = SimHash.calibrateWidth(real, "sh")
    val (wFused, fused) = SimHash.calibratedPairs(real, "doc_id", "sh")
    assert(wFused === wProbe, "fused selection must equal calibrateWidth")
    assert(pairSet(fused) ===
      pairSet(SimHash.candidatePairs(real, "doc_id", "sh", wProbe)))
    // hot regime: identical fingerprints, every bucket over the cap —
    // the known-occupancy split must chain-link exactly like the probe
    val degen = sigsOf(spark.range(3000).selectExpr("id AS doc_id",
      "'alpha beta gamma delta epsilon zeta' AS text"))
    val (wd, fusedHot) = SimHash.calibratedPairs(degen, "doc_id", "sh",
      pairsPerDocBudget = 5L)
    assert(wd === SimHash.DefaultWidthGrid.max)
    val hotPairs = pairSet(fusedHot)
    assert(hotPairs === pairSet(
      SimHash.candidatePairs(degen, "doc_id", "sh", wd)))
    assert(hotPairs.size === 2999)
    spark.catalog.clearCache()
  }

  test("MinHash calibrateBandsFused == calibrateBands + probe, both regimes") {
    import graft.functions.{MinHashLsh, TextFns}
    def sigsOf(df: org.apache.spark.sql.DataFrame) = MinHashLsh
      .signaturesFromTokens(df.withColumn("__t", TextFns.tokens(col("text"))),
        "doc_id", "__t", 3, 12)
      .persist()
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").as[(Long, Long)].collect().toSet
    val grid = Seq(2, 3, 4, 6)
    // sub-cap regime: fused selection == calibrateBands, no hot rows,
    // and the executed pair set matches the probing path exactly
    val real = sigsOf(Tables.docsParallel(spark, dir))
    val sel = MinHashLsh.calibrateBands(real, "doc_id", 12, grid, 20L)
    val (selF, hotOpt) = MinHashLsh.calibrateBandsFused(
      real, "doc_id", 12, grid, 20L)
    assert(selF === sel, "fused selection must equal calibrateBands")
    val hot = hotOpt.getOrElse(fail("hot set should be exactly known"))
    assert(hot._1.isEmpty, "gate-scale corpus has no over-cap bucket")
    assert(pairSet(MinHashLsh.candidatePairsKnown(
        real, "doc_id", 12, selF, hot._1, hot._2)) ===
      pairSet(MinHashLsh.candidatePairs(real, "doc_id", 12, sel)))
    // hot regime: identical docs put the whole corpus behind one key
    // per band — the known-occupancy split must chain-link exactly
    // like the probe path (m−1 pairs, deduped across bands)
    val degen = sigsOf(spark.range(3000).selectExpr("id AS doc_id",
      "'alpha beta gamma delta epsilon zeta' AS text"))
    val (selD, hotD) = MinHashLsh.calibrateBandsFused(
      degen, "doc_id", 12, grid, 5L)
    val hd = hotD.getOrElse(fail("degenerate hot set is tiny and known"))
    assert(hd._1.nonEmpty, "every bucket of the fallback config is hot")
    val fusedPairs = pairSet(MinHashLsh.candidatePairsKnown(
      degen, "doc_id", 12, selD, hd._1, hd._2))
    assert(fusedPairs ===
      pairSet(MinHashLsh.candidatePairs(degen, "doc_id", 12, selD)))
    assert(fusedPairs.size === 2999)
    spark.catalog.clearCache()
  }

  test("hyperplane calibratePlanesFused == calibratePlanes + probe, both regimes") {
    import graft.functions.VecFns
    import graft.operators.EmbedNearDup
    graft.functions.expressions.GraftFunctions.register(spark)
    def pairMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val grid = Seq(2, 4, 6, 8)
    // sub-cap regime: real embeddings — fused selection equals the
    // sweep's, hot set is exactly known and empty, pair sets identical
    // (this also pins lshBandKeyFromSigns == lshBandKey key values:
    // a mismatched key construction would desync hot-cell discovery)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
      .withColumn("nsq", VecFns.dotQFast(col("vq"), col("vq")))
      .persist()
    val sel = EmbedNearDup.calibratePlanes(vecs, 4, grid, 64)
    val (selF, hotOpt) = EmbedNearDup.calibratePlanesFused(vecs, 4, grid, 64)
    assert(selF === sel, "fused selection must equal calibratePlanes")
    val hot = hotOpt.getOrElse(fail("hot set should be exactly known"))
    assert(hot._1.isEmpty, "gate-scale embeddings have no over-cap cell")
    val (known, rel1) = EmbedNearDup.bandedPairsKnown(
      vecs, "vec_id", 4, selF, 64, 0.4, hot._1, hot._2)
    val probed = EmbedNearDup.bandedPairs(vecs, "vec_id", 4, sel, 64, 0.4)
    assert(pairMap(known) === pairMap(probed))
    rel1()
    // hot regime: 3000 identical vectors collapse every cell of every
    // config — the known-occupancy split must chain-link like the probe
    val degen = spark.range(3000).selectExpr("id AS vec_id",
        s"transform(sequence(1, 64), x -> CAST(0.125 AS DOUBLE)) AS embedding")
      .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
      .withColumn("nsq", VecFns.dotQFast(col("vq"), col("vq")))
      .persist()
    val (selD, hotD) = EmbedNearDup.calibratePlanesFused(degen, 4, grid, 64,
      pairsPerVecBudget = 5L)
    val hd = hotD.getOrElse(fail("degenerate hot set is tiny and known"))
    assert(hd._1.nonEmpty, "every cell of the fallback config is hot")
    val (knownD, rel2) = EmbedNearDup.bandedPairsKnown(
      degen, "vec_id", 4, selD, 64, 0.4, hd._1, hd._2)
    val kd = pairMap(knownD)
    assert(kd === pairMap(EmbedNearDup.bandedPairs(
      degen, "vec_id", 4, selD, 64, 0.4)))
    assert(kd.size === 2999, "identical-vector chain links, deduped")
    assert(kd.values.forall(_ == 1.0), "chain links verify at cos = 1")
    rel2()
    spark.catalog.clearCache()
  }

  test("fused calibration: fewer jobs (SimHash), less shuffle (MinHash, hyperplane)") {
    // each family's precise fused-path claim, asserted comparatively
    // (not absolutely, so AQE job-splitting can't flake it):
    //  - SimHash collects the whole bounded-keyspace occupancy, so
    //    ONE collect replaces the sweep collect + the probe collect →
    //    strictly fewer jobs;
    //  - MinHash/hyperplane keep the occupancy distributed (persisted)
    //    and trade the probe's corpus-wide groupBy SHUFFLE for a
    //    cached-scan hot filter + a shuffle-free materializing count →
    //    job counts tie, shuffle-write volume strictly drops.
    import graft.functions.{MinHashLsh, SimHash, TextFns, VecFns}
    import graft.operators.EmbedNearDup
    graft.functions.expressions.GraftFunctions.register(spark)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val shuffleRecs = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleRecs.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // listener delivery is async: settle = poll until the counters are
    // quiet for 300 ms (the public API has no bus-flush hook). Bounded
    // at 100 iterations (~30 s) so concurrent stray job activity (a
    // straggling async cleanup) can't extend the loop indefinitely —
    // a counter still moving after the bound is itself a failure.
    def settle(): (Int, Long) = {
      var last = (-1, -1L); var cur = (jobs.get(), shuffleRecs.get())
      var iters = 0
      while (cur != last) {
        iters += 1
        assert(iters <= 100, "listener counters never settled — " +
          "concurrent job activity is polluting the measured region")
        last = cur; Thread.sleep(300); cur = (jobs.get(), shuffleRecs.get())
      }
      cur
    }
    def measure(body: => Unit): (Int, Long) = {
      val (j0, s0) = settle(); body; val (j1, s1) = settle()
      (j1 - j0, s1 - s0)
    }
    try {
      // SimHash: fewer jobs
      val sigs = Tables.docsParallel(spark, dir)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
        .distinct()
        .groupBy("doc_id").agg(SimHash.simhashAgg(col("tok")).as("sh"))
        .persist()
      sigs.count() // materialize outside both measured regions
      val (shProbeJobs, _) = measure {
        val w = SimHash.calibrateWidth(sigs, "sh")
        SimHash.candidatePairs(sigs, "doc_id", "sh", w).count(): Unit
      }
      val (shFusedJobs, _) = measure {
        SimHash.calibratedPairs(sigs, "doc_id", "sh")._2.count(): Unit
      }
      assert(shFusedJobs < shProbeJobs,
        s"SimHash fused must run fewer jobs ($shFusedJobs vs $shProbeJobs)")
      spark.catalog.clearCache()

      // MinHash: strictly less shuffle-write volume
      val mh = MinHashLsh.signaturesFromTokens(
        Tables.docsParallel(spark, dir)
          .withColumn("__t", TextFns.tokens(col("text"))),
        "doc_id", "__t", 3, 12).persist()
      mh.count()
      val (_, mhProbeShuffle) = measure {
        val b = MinHashLsh.calibrateBands(mh, "doc_id", 12, Seq(2, 3, 4, 6), 20L)
        MinHashLsh.candidatePairs(mh, "doc_id", 12, b).count(): Unit
      }
      val (_, mhFusedShuffle) = measure {
        val (b, hot) = MinHashLsh.calibrateBandsFused(
          mh, "doc_id", 12, Seq(2, 3, 4, 6), 20L)
        val (rows, schema) = hot.get
        MinHashLsh.candidatePairsKnown(mh, "doc_id", 12, b, rows, schema)
          .count(): Unit
      }
      // <= not <: the dropped shuffle is the probe's occupancy groupBy,
      // which could in principle shrink to the fused plan's volume on a
      // degenerate corpus — only the SimHash job-count claim is strict
      // by construction (one collect replaces two)
      assert(mhFusedShuffle <= mhProbeShuffle,
        s"MinHash fused must not shuffle more records" +
          s" ($mhFusedShuffle vs $mhProbeShuffle)")
      spark.catalog.clearCache()

      // hyperplane: strictly less shuffle-write volume
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
        .withColumn("nsq", VecFns.dotQFast(col("vq"), col("vq")))
        .persist()
      vecs.count()
      val grid = Seq(2, 4, 6, 8)
      val (_, hpProbeShuffle) = measure {
        val p = EmbedNearDup.calibratePlanes(vecs, 4, grid, 64)
        EmbedNearDup.bandedPairs(vecs, "vec_id", 4, p, 64, 0.4).count(): Unit
      }
      val (_, hpFusedShuffle) = measure {
        val (p, hot) = EmbedNearDup.calibratePlanesFused(vecs, 4, grid, 64)
        val (rows, schema) = hot.get
        EmbedNearDup.bandedPairsKnown(
          vecs, "vec_id", 4, p, 64, 0.4, rows, schema)._1.count(): Unit
      }
      assert(hpFusedShuffle <= hpProbeShuffle,
        s"hyperplane fused must not shuffle more records" +
          s" ($hpFusedShuffle vs $hpProbeShuffle)")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
    }
  }

  test("calibratedNearDup == nearDupFilter at the selected config") {
    val docs = Tables.docsParallel(spark, dir).transform(Curation.withTokens())
    val (b, kept) = Curation.calibratedNearDup()(docs)
    val fixed = Curation.nearDupFilter(bands = b)(docs)
    assert(kept.select("doc_id").as[Long].collect().toSet ===
      fixed.select("doc_id").as[Long].collect().toSet)
    spark.catalog.clearCache()
  }
}
