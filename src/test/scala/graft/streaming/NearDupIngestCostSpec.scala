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
}
