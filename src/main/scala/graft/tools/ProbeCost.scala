package graft.tools

import org.apache.spark.sql.SparkSession

/** Prices Tables.parallelized's df.rdd partition-count probe: plan →
  * RDD conversion per call vs a fingerprint-memoized count.
  */
object ProbeCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warm
    graft.Tables.docsParallel(spark, dir).count()
    for (r <- 1 to 3) {
      var t0 = System.nanoTime()
      var i = 0
      while (i < 100) {
        graft.Tables.load(spark, dir, "documents").rdd.getNumPartitions: Unit
        i += 1
      }
      val probeMs = (System.nanoTime() - t0) / 1e6 / 100
      t0 = System.nanoTime()
      i = 0
      while (i < 100) {
        graft.Tables.pathFingerprint(spark, s"$dir/documents.parquet"): Unit
        i += 1
      }
      val fpMs = (System.nanoTime() - t0) / 1e6 / 100
      println(f"round $r: df.rdd probe ${probeMs}%.2f ms/call, fingerprint ${fpMs}%.3f ms/call")
    }
    spark.stop()
  }
}
