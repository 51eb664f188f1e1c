package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc kernel profiler for the sf10 token-query slowdown
  * investigation (round 15): times isolated plan shapes over the
  * documents table so the 10–20× gap between "explode 27 M tokens and
  * aggregate" in Spark vs DuckDB can be attributed to a specific stage
  * (interpreted higher-order lambdas vs codegen explode, un-persisted
  * subtree re-execution, GC pressure, scan parallelism).
  *
  *   java -cp "target/scala-2.13/classes:SPARK_JARS" \
  *     graft.tools.Profile bench/sfgen/sf10 [kernelSubstring]
  */
object Profile {
  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("bench/sfgen/sf10")
    val only = args.lift(1)
    // PROFILE_BENCH_ENV=1 replicates graft.Bench's session setup
    // exactly (scratch-redirected tmpdir, spark.local.dir, AQE config,
    // warmup read) to bisect Bench-vs-Profile timing deltas.
    val benchEnv = sys.env.get("PROFILE_BENCH_ENV").contains("1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (benchEnv) {
      val scratch = (sys.env.get("SPARK_GRAFT_SCRATCH").toSeq ++
          Seq("/dev/shm", sys.props("java.io.tmpdir")))
        .find(p => { val f = new java.io.File(p); f.mkdirs(); f.canWrite })
        .map(_ + "/graft-bench-scratch")
      scratch.foreach { s =>
        new java.io.File(s).mkdirs()
        sys.props("java.io.tmpdir") = s
      }
      builder
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", scratch.getOrElse(sys.props("java.io.tmpdir")))
    } else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (benchEnv)
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()

    def docs = graft.Tables.docsParallel(spark, sfDir)
    def docsRaw = graft.Tables.load(spark, sfDir, "documents")

    val kernels: Seq[(String, () => Long)] = Seq(
      "scan_count" -> (() => docs.count()),
      // the actual registry impls, inside THIS session — bisects
      // "Bench session config" vs "registry impl differs from copy"
      "registry_q128" -> (() => graft.queries.Registry
        .all("q128_source_entropy").impl(spark, sfDir).count()),
      "registry_q130" -> (() => graft.queries.Registry
        .all("q130_pair_counts").impl(spark, sfDir).count()),
      "explode_tok_groupby" -> (() => docs
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").count().count()),
      "explode_tok_groupby_noRepart" -> (() => docsRaw
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").count().count()),
      // q130's bigram construction: interpreted transform lambda
      "bigram_transform_lambda" -> (() => docs
        .withColumn("t", split(col("text"), " "))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t)-1), i -> struct(t[i-1] AS a, t[i] AS b))"))
          .as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c")).count()),
      // codegen-friendly alternative: zip two slices
      "bigram_arrays_zip" -> (() => docs
        .withColumn("t", split(col("text"), " "))
        .filter(size(col("t")) >= 2)
        .withColumn("x", slice(col("t"), 1, 100000))
        .withColumn("y", slice(col("t"), 2, 100000))
        .select(explode(arrays_zip(col("x"), col("y"))).as("p"))
        .filter(col("p.y").isNotNull)
        .select(col("p.x").as("a"), col("p.y").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c")).count()),
      // posexplode then pair adjacent via self-join-free lead? No —
      // third variant: explode with index, shift via join is a shuffle;
      // instead: concat_ws on slices (single string key)
      "bigram_concat_key" -> (() => docs
        .withColumn("t", split(col("text"), " "))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t)-1), i -> concat(t[i-1], ' ', t[i]))"))
          .as("ab"))
        .groupBy("ab").agg(count(lit(1)).as("c")).count()),
      // q128 shape as written (cnt subtree referenced three times)
      "q128_as_written" -> (() => {
        val tok = docs
          .withColumn("t", split(col("text"), " "))
          .select(col("source"), explode(col("t")).as("tok"))
        val cnt = tok.groupBy("source", "tok").agg(count(lit(1)).as("c"))
        val tot = cnt.groupBy("source")
          .agg(sum("c").as("n"), count(lit(1)).as("n_types"))
        cnt.join(tot, "source")
          .withColumn("term", col("c") *
            expr("CAST(round(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000) AS BIGINT)"))
          .groupBy("source").agg(sum("term").as("ts"))
          .join(tot, "source")
          .select(col("source"), expr("ts div n").as("entropy_unats"),
            col("n_types"), col("n").as("n_tokens"))
          .orderBy("source").count()
      }),
      // q128 with the tiny cnt frame persisted
      "q128_persist_cnt" -> (() => {
        val tok = docs
          .withColumn("t", split(col("text"), " "))
          .select(col("source"), explode(col("t")).as("tok"))
        val cnt = tok.groupBy("source", "tok").agg(count(lit(1)).as("c"))
          .persist()
        val tot = cnt.groupBy("source")
          .agg(sum("c").as("n"), count(lit(1)).as("n_types"))
        val out = cnt.join(tot, "source")
          .withColumn("term", col("c") *
            expr("CAST(round(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000) AS BIGINT)"))
          .groupBy("source").agg(sum("term").as("ts"))
          .join(tot, "source")
          .select(col("source"), expr("ts div n").as("entropy_unats"),
            col("n_types"), col("n").as("n_tokens"))
          .orderBy("source").count()
        cnt.unpersist(blocking = false)
        out
      })
    )

    for ((name, fn) <- kernels if only.forall(name.contains)) {
      // two runs, report both (first pays codegen)
      for (i <- 1 to 2) {
        val g0 = gcMillis
        val t0 = System.nanoTime()
        val n = fn()
        val dt = (System.nanoTime() - t0) / 1e9
        val gdt = gcMillis - g0
        println(f"$name%-32s run$i: $dt%8.2f s  gc=${gdt / 1000.0}%6.2f s  rows=$n")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
