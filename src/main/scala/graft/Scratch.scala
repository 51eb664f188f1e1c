package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Temporary perf-experiment harness (not committed). */
object Scratch {
  def time(label: String, df: => DataFrame): Unit = {
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); df.collect(); (System.nanoTime() - t0) / 1e9
    }
    println(f"[scratch] $label%-28s best=${runs.min}%.3f runs=${runs.map(t => f"$t%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/lineitem.parquet").groupBy("l_returnflag").count().count()

    val cols = Seq("l_returnflag", "l_linestatus", "l_shipdate", "l_quantity", "l_suppkey")

    // variant A: current multi-countDistinct (Expand)
    def vA: DataFrame = {
      val li = Tables.load(spark, d, "lineitem")
      li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)).as("null_rf"),
        countDistinct("l_returnflag").as("dist_rf"),
        sum(when(col("l_linestatus").isNull, 1L).otherwise(0L)).as("null_ls"),
        countDistinct("l_linestatus").as("dist_ls"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_sd"),
        countDistinct("l_shipdate").as("dist_sd"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_qt"),
        countDistinct("l_quantity").as("dist_qt"),
        sum(when(col("l_suppkey").isNull, 1L).otherwise(0L)).as("null_sk"),
        countDistinct("l_suppkey").as("dist_sk"))
    }

    // variant B: size(collect_set) — ObjectHashAggregate, no Expand
    def vB: DataFrame = {
      val li = Tables.load(spark, d, "lineitem")
      li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)).as("null_rf"),
        size(collect_set("l_returnflag")).as("dist_rf"),
        size(collect_set("l_linestatus")).as("dist_ls"),
        size(collect_set("l_shipdate")).as("dist_sd"),
        size(collect_set("l_quantity")).as("dist_qt"),
        size(collect_set("l_suppkey")).as("dist_sk"))
    }

    // variant C: per-column union of (col, value) + two-level agg
    def vC: DataFrame = {
      val li = Tables.load(spark, d, "lineitem")
      val pairs = cols.map { c =>
        li.select(lit(c).as("col_name"), col(c).cast("string").as("v"))
      }.reduce(_ union _)
      pairs.groupBy("col_name", "v").agg(count(lit(1)).as("n"))
        .groupBy("col_name").agg(count(lit(1)).as("n_distinct"))
    }

    time("A multi-countDistinct", vA)
    time("B collect_set", vB)
    time("C union two-level", vC)
    time("A again", vA)
    time("B again", vB)
    val q122 = graft.queries.Registry.all("q122_profile").impl
    time("registry q122 full", q122(spark, d))
    time("registry q122 again", q122(spark, d))
    def vAstack: DataFrame = vA.selectExpr(
      """stack(5,
           'l_returnflag', null_rf, dist_rf,
           'l_linestatus', null_ls, dist_ls,
           'l_shipdate',   null_sd, dist_sd,
           'l_quantity',   null_qt, dist_qt,
           'l_suppkey',    null_sk, dist_sk) AS (col_name, n_null, n_distinct)""",
      "n_rows")
    time("A + stack", vAstack)
    time("A + stack + orderBy", vAstack.orderBy("col_name"))

    // variant D: row-level stack to narrow (col_name, v) pairs, then
    // two-level agg — one scan, narrow keys, scale-safe exact distinct
    def vD: DataFrame = {
      val li = Tables.load(spark, d, "lineitem")
      val pairs = li.selectExpr(
        """stack(5,
             'l_returnflag', cast(l_returnflag as string),
             'l_linestatus', cast(l_linestatus as string),
             'l_shipdate',   cast(l_shipdate as string),
             'l_quantity',   cast(l_quantity as string),
             'l_suppkey',    cast(l_suppkey as string)) AS (col_name, v)""")
      val lvl1 = pairs.groupBy("col_name", "v").agg(count(lit(1)).as("n"))
      lvl1.groupBy("col_name").agg(
        sum(when(col("v").isNull, col("n")).otherwise(0L)).as("n_null"),
        count(col("v")).as("n_distinct"),
        sum("n").as("n_rows"))
    }
    time("D stack narrow 2-level", vD)
    time("D again", vD)

    // variant E: 5 independent per-column agg subtrees unioned at the
    // result level — each scans one parquet column
    def vE: DataFrame = {
      val li = Tables.load(spark, d, "lineitem")
      cols.map { c =>
        li.agg(
          lit(c).as("col_name"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          count(lit(1)).as("n_rows"))
      }.reduce(_ union _)
    }
    time("E union of 5 aggs", vE)
    time("E again", vE)

    // --- q117 decomposition ---
    import graft.functions.{MinHashLsh, TextFns}
    def docs = Tables.docsParallel(spark, d).withColumn("t", TextFns.tokens(col("text")))
    def sigs = MinHashLsh.signaturesFromTokens(docs, "doc_id", "t", 3, 12)
    def pairs = MinHashLsh.candidatePairs(sigs, "doc_id", 12, 4)
      .filter(col("est") >= 0.5).select(col("a"), col("b"))
    // --- q135 variants ---
    val q135 = graft.queries.Registry.all("q135_containment").impl
    time("q135 current", q135(spark, d))
    time("q135 current again", q135(spark, d))

    def v135: DataFrame = {
      val sh = TextFns.distinctShingles(Tables.docsParallel(spark, d), 3)
        .select(col("doc_id"), xxhash64(col("shs")).as("h"))
      val grouped = sh.groupBy("h")
        .agg(collect_list("doc_id").as("ds"))
        .filter(size(col("ds")) <= 64)
        .persist()
      val na = grouped.select(explode(col("ds")).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("na"))
      val pairs = grouped.select(explode(expr(
        "flatten(transform(ds, a -> transform(ds, b -> struct(a, b))))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(col("a") =!= col("b"))
      val inter = pairs.groupBy("a", "b").agg(count(lit(1)).as("c"))
      val out = inter.join(na.toDF("a", "na"), "a")
        .withColumn("cont_ppm", expr("c * 1000000 div na"))
        .filter(col("cont_ppm") >= 600000L)
        .select("a", "b", "cont_ppm")
        .orderBy("a", "b")
      out
    }
    time("q135 grouped-pairs", { val r = v135; r })
    time("q135 grouped-pairs again", v135)

    // --- q162 persist experiment ---
    import graft.queries.Registry
    val q162 = Registry.all("q162_lsh_recall_audit").impl
    time("q162 current", q162(spark, d))
    time("q162 current again", q162(spark, d))
    def v162: DataFrame = {
      val docs = Tables.docsParallel(spark, d).withColumn("t", TextFns.tokens(col("text")))
      val sh = TextFns.distinctShingles(Tables.docsParallel(spark, d), 3)
        .select(col("doc_id"), xxhash64(col("shs")).as("h"))
        .repartition(col("h")).persist()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.toDF("a", "h").join(sh.toDF("b", "h2"),
          col("h") === col("h2") && col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
      val exact = inter
        .join(sizes.toDF("a", "na"), "a")
        .join(sizes.toDF("b", "nb"), "b")
        .withColumn("j", col("c") / (col("na") + col("nb") - col("c")))
        .filter(col("j") >= 0.3)
      val sigs = MinHashLsh.signaturesFromTokens(docs, "doc_id", "t", 3, 12)
      val banded = MinHashLsh.bandKeys(sigs, "doc_id", 12, 4)
      val found = banded.toDF((Seq("a", "band", "key") ++
          (0 until 12).map(i => s"sa$i")): _*)
        .join(banded.toDF((Seq("b", "band", "key") ++
          (0 until 12).map(i => s"sb$i")): _*), Seq("band", "key"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
        .withColumn("found", lit(1L))
      val out = exact.join(found, Seq("a", "b"), "left")
        .withColumn("bucket", floor(col("j") * 10).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("found"), lit(0L))).as("n_found"))
        .orderBy("bucket")
      out
    }
    time("q162 persist", v162)
    time("q162 persist again", v162)

    def shNative = Tables.docsParallel(spark, d)
      .select(col("doc_id"), expr(
        """explode(array_distinct(transform(
             sequence(0, size(split(text, ' ')) - 3),
             i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3))))) AS shs"""))
    def shCurrent = TextFns.distinctShingles(Tables.docsParallel(spark, d), 3)
    time("sh flatMap", shCurrent.agg(count(lit(1))))
    time("sh native", shNative.agg(count(lit(1))))
    time("sh flatMap again", shCurrent.agg(count(lit(1))))
    time("sh native again", shNative.agg(count(lit(1))))
    spark.stop()
  }
}
