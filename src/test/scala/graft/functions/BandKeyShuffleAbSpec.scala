package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Measures the round-18 band-key migration's shuffle-byte cut (the
  * VERDICT r17 #1 done-bar): the q185 grid-occupancy sweep — the
  * banded families' heaviest shuffle, 15 band rows per doc — run
  * twice over the same persisted sf100 signatures, once keyed by the
  * production 60-bit numeric keys and once by the legacy 32-hex md5
  * strings, with per-stage shuffle-write bytes summed from a
  * SparkListener. The string layout is what spilled ~40+ GB and
  * killed the fourth-decade audit twice at round 17; the same byte
  * multiplier is shuffle volume a cluster pays on every banded join.
  *
  * GRAFT_PERF + decade-data gated; committed evidence lives at
  * bench/bandkey_shuffle_ab_sf100.txt.
  */
class BandKeyShuffleAbSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = 12
  private val BandGrid = Seq(2, 3, 4, 6)

  /** Total shuffle-write bytes of every stage completing during
    * `job`, drained from the listener bus until quiescent.
    */
  private def shuffleWriteOf(job: => Unit): Long = {
    val bytes = new AtomicLong
    val l = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
    }
    spark.sparkContext.addSparkListener(l)
    try {
      job
      // the listener bus is async — poll until the counter settles
      var prev = -1L
      while (bytes.get != prev) { prev = bytes.get; Thread.sleep(500) }
      bytes.get
    } finally spark.sparkContext.removeSparkListener(l)
  }

  /** The legacy (pre-round-18) band-key derivation, inlined: full
    * 32-hex md5 string of the '|'-joined components.
    */
  private def legacyKeyed(sigs: org.apache.spark.sql.DataFrame, b: Int) = {
    val r = K / b
    sigs.select(col("doc_id"), explode(array((0 until b).map(bi =>
        struct(lit(bi).as("band"),
          md5(concat_ws("|",
            (bi * r until (bi + 1) * r).map(i => col(s"s$i")): _*))
            .as("key"))): _*)).as("bk"))
      .select(lit(b).as("bands"),
        col("bk.band").as("band"), col("bk.key").as("key"))
  }

  test("sf100: numeric band keys cut the occupancy-sweep shuffle bytes") {
    assume(sys.env.contains("GRAFT_PERF"), "set GRAFT_PERF=1 to run")
    val dir = "bench/sfgen/sf100"
    assume(new java.io.File(s"$dir/documents.parquet").exists(),
      s"generate the decade first: runMain graft.tools.ScaleGen $dir ...")
    val sigs = MinHashLsh.signaturesFromTokens(
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("t", TextFns.tokens(col("text"))),
      "doc_id", "t", 3, K).persist()
    sigs.count(): Unit // materialize outside both measured windows

    def sweepOver(keyed: org.apache.spark.sql.DataFrame): Unit =
      keyed.groupBy("bands", "band", "key")
        .agg(count(lit(1)).as("m"))
        .groupBy("bands")
        .agg(sum(expr("(m * (m - 1)) div 2")).as("cand_pairs"))
        .collect(): Unit

    val numericBytes = shuffleWriteOf(sweepOver(
      BandGrid.map(b => MinHashLsh.bandKeys(sigs, "doc_id", K, b)
        .select(lit(b).as("bands"), col("band"), col("key")))
        .reduce(_ unionByName _)))
    graft.operators.ShuffleHygiene.reclaim(spark)
    val stringBytes = shuffleWriteOf(sweepOver(
      BandGrid.map(b => legacyKeyed(sigs, b)).reduce(_ unionByName _)))
    graft.operators.ShuffleHygiene.reclaim(spark)
    sigs.unpersist()

    val ratio = stringBytes.toDouble / math.max(numericBytes, 1L)
    info(f"occupancy-sweep shuffle write at sf100 (5M docs): " +
      f"numeric=$numericBytes%,d B, legacy-string=$stringBytes%,d B, " +
      f"cut=${ratio}%.2fx")
    assert(numericBytes > 0 && stringBytes > 0, "measurement captured nothing")
    assert(numericBytes * 2 < stringBytes,
      f"expected the numeric key to at least halve the sweep shuffle; " +
        f"got ${ratio}%.2fx")
  }
}
