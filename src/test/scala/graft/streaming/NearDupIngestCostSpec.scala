package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextFns

/** q188 cost decomposition referee (the StreamFixedCostSpec pattern
  * applied to the standing-index ingest): attributes the demoRun
  * wall-clock to build / per-batch probe / store landing / index
  * append, with a warm JVM. GRAFT_PERF-gated; `info()` lines are the
  * measurement — STABILITY.md's q188 paragraph cites them.
  *
  *   GRAFT_PERF=1 sbt "testOnly graft.streaming.NearDupIngestCostSpec"
  */
class NearDupIngestCostSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decompose q188 demoRun phases at sf0.1") {
    assume(sys.env.contains("GRAFT_PERF"), "set GRAFT_PERF=1 to run")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    t("demoRun warmup") { NearDupIngest.demoRun(spark, dir).count() }
    t("demoRun warm") { NearDupIngest.demoRun(spark, dir).count() }
    val docs = graft.Tables.load(spark, dir, "documents")
    val base = java.nio.file.Files.createTempDirectory("graft_dbg").toString
    val (idxDir, storeDir) = (s"$base/idx", s"$base/store")
    t("writeIndex") {
      NearDupIngest.writeIndex(
        docs.filter(col("doc_id") % 10 =!= 0)
          .withColumn("__t", TextFns.tokens(col("text"))),
        idxDir, tokensCol = "__t")
    }
    // per-batch attribution: the probe's one eager key-collect job is
    // timed inside probeDupIds construction; landing and append each
    // time their own write job (the probe's lazy join executes inside
    // the store landing; the append reads the persisted freshNew)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    for (b <- 0 until 3) {
      val batch = docs.filter(col("doc_id") % 10 === 0)
        .filter(expr(s"(doc_id div 10) % 3 = $b"))
      t(s"ingestBatch $b (complete, real path)") {
        NearDupIngest.ingestBatch(batch, b.toLong, idxDir, storeDir,
          "doc_id", "text", 0.5, 3, 12, 4, 1000)
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("attribute one ingestBatch's phases at sf0.1") {
    assume(sys.env.contains("GRAFT_PERF"), "set GRAFT_PERF=1 to run")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = graft.Tables.load(spark, dir, "documents")
    val base = java.nio.file.Files.createTempDirectory("graft_dbg2").toString
    val (idxDir, storeDir) = (s"$base/idx", s"$base/store")
    NearDupIngest.writeIndex(
      docs.filter(col("doc_id") % 10 =!= 0)
        .withColumn("__t", TextFns.tokens(col("text"))),
      idxDir, tokensCol = "__t")
    // warm one full batch so the attribution below measures steady
    // state, then replay ingestBatch's exact body for batch 1
    NearDupIngest.ingestBatch(
      docs.filter(col("doc_id") % 10 === 0).filter(expr("(doc_id div 10) % 3 = 0")),
      0L, idxDir, storeDir, "doc_id", "text", 0.5, 3, 12, 4, 1000)
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .filter(expr("(doc_id div 10) % 3 = 1"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      t("batchLanded x2 (O(1) leaf probes)") {
        CorpusIngest.batchLanded(spark, storeDir, 1L)
        CorpusIngest.batchLanded(spark, idxDir, 1L)
      }
      val deduped = batch.dropDuplicates("doc_id")
      val sigs = t("signatures build+persist (materialize)") {
        val f = graft.functions.MinHashLsh.signaturesFromTokens(
          deduped.withColumn("__t", TextFns.tokens(col("text"))),
          "doc_id", "__t", 3, 12).persist()
        f.count(); f
      }
      val dupIds = t("probeDupIds (pruned read + semi-join, eager key job)") {
        NearDupIngest.probeDupIds(sigs, 1L, idxDir, "doc_id", 12, 4, 0.5, 1000)
      }
      val freshNew = t("freshNew anti-joins (ledger slice, materialize)") {
        val fresh = deduped.join(dupIds, Seq("doc_id"), "left_anti")
        val f = (IdLedger.priorIds(deduped, "doc_id", storeDir, 1L) match {
          case Some(prior) => fresh.join(prior, Seq("doc_id"), "left_anti")
          case None => fresh
        }).persist()
        f.count(); f
      }
      t("store landing write") {
        CorpusIngest.landPrepared(freshNew, 1L, storeDir)
      }
      t("index L0 append write") {
        graft.functions.MinHashLsh.bandKeys(
            sigs.join(freshNew.select("doc_id"), Seq("doc_id"), "left_semi"),
            "doc_id", 12, 4)
          .write.parquet(s"$idxDir/batch_id=1/bkt=${NearDupIngest.UnbucketedRun}")
      }
      freshNew.unpersist(blocking = false)
      sigs.unpersist(blocking = false)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(base))
    }
  }
}
