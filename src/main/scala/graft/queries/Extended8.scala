package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{MinHashLsh, TextFns}
import graft.operators.GroupedPrefixSum

/** Round-8 batch: sweep-line and order-statistics operators built on
  * the range-partitioned grouped scan (`GroupedPrefixSum` /
  * `withRunningMax`), weighted reservoir-style sampling, graph
  * triangle counting over the LSH near-dup graph, and bigram-LM
  * scoring. Every query has a DuckDB oracle; every windowed oracle's
  * Spark side avoids the one-task-per-group window (the q81-class
  * scale hazard) via the grouped-scan operator instead.
  */
object Extended8 {

  /** q114 sample size. */
  private val WeightedSampleK = 500

  /** Shipment "busy interval" per lineitem: [ship day, ship day +
    * quantity days], integer epoch days — shared by q115/q116. The
    * synthetic end = start + quantity keeps everything integer-exact
    * across engines (l_quantity is an integral-valued double).
    */
  private def shipIntervals(s: org.apache.spark.sql.SparkSession, d: String) = {
    val st = datediff(to_date(col("l_shipdate")), lit("1970-01-01").cast("date"))
      .cast("long")
    Tables.load(s, d, "lineitem").select(
      col("l_suppkey").as("s"),
      st.as("st"),
      (st + col("l_quantity").cast("long")).as("en"),
      col("l_orderkey").as("ok"),
      col("l_linenumber").cast("long").as("ln"))
  }

  /** DuckDB CTE producing the same intervals. */
  private val IvCte =
    """iv AS (SELECT l_suppkey AS s,
                     CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS st,
                     CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                       + CAST(l_quantity AS BIGINT) AS en,
                     l_orderkey AS ok, CAST(l_linenumber AS BIGINT) AS ln
              FROM lineitem)"""

  val queries: Map[String, Q] = Map(
    // ---- weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    // key = ln(u)/w with u a deterministic md5 uniform in (0,1] — the
    // k largest keys ARE a weight-proportional sample, drawn in one
    // pass. orderBy(...).limit(k) executes as TakeOrderedAndProject:
    // per-partition bounded top-k + single merge, never a global sort.
    // The mixture-sampling primitive (q101) generalized from
    // independent Bernoulli draws to an exact-size draw ---------------
    "q114_weighted_sample" -> Q(
      impl = (s, d) => {
        val h = expr(
          "cast(conv(substring(md5(cast(doc_id as string)), 1, 13), 16, 10) as bigint)")
        val u = (h + lit(1L)).cast("double") / lit(4503599627370496.0) // 2^52
        Tables.load(s, d, "documents")
          .select(col("doc_id"), col("source"),
            (log(u) / col("n_chars")).as("es_key"))
          .orderBy(col("es_key").desc, col("doc_id"))
          .limit(WeightedSampleK)
          .select(col("doc_id"), col("source"), round(col("es_key"), 8).as("es_key"))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH w AS (SELECT doc_id, source,
                          ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
                                AS BIGINT) + 1) / 4503599627370496.0)
                            / n_chars AS es_key
                   FROM documents),
        top AS (SELECT * FROM w ORDER BY es_key DESC, doc_id LIMIT $WeightedSampleK)
        SELECT doc_id, source, round(es_key, 8) AS es_key
        FROM top ORDER BY doc_id"""),
      bench = true),

    // ---- interval merge (gaps-and-islands): collapse overlapping
    // shipment intervals per supplier into maximal covered islands.
    // Both scans (prefix-MAX of interval end, then prefix-SUM of the
    // new-island flag) are built-in windows over the SAME (s → sort)
    // partitioning: per-supplier groups are numerous and bounded
    // (lineitem/supplier is a constant ratio at every TPC-H sf), so
    // WindowExec — hash-partitioned by s, per-group in-memory sort —
    // is already fully distributed, and the stacked windows plus the
    // island aggregation all ride ONE exchange. This is the
    // HIGH-cardinality side of the grouped-scan decision rule
    // (operators/GroupedPrefix.scala): the range-partitioned scan is
    // for few giant groups (q93/q110's by-source scans), not this ----
    "q115_interval_merge" -> Q(
      impl = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("s").orderBy(col("st"), col("en"), col("ok"), col("ln"))
        val withPmax = shipIntervals(s, d).withColumn("pmax",
          max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        val flagged = withPmax.withColumn("isnew",
          when(col("pmax").isNull || col("st") > col("pmax"), 1L)
            .otherwise(0L))
        val islands = flagged.withColumn("island",
          sum(col("isnew")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        islands.groupBy(col("s"), col("island"))
          .agg(min("st").as("island_start"), max("en").as("island_end"),
            count(lit(1)).as("n_intervals"))
          .select(col("s").as("l_suppkey"), col("island"),
            col("island_start"), col("island_end"), col("n_intervals"))
          .orderBy("l_suppkey", "island")
      },
      oracle = Some(s"""
        WITH $IvCte,
        m AS (SELECT *, max(en) OVER (PARTITION BY s ORDER BY st, en, ok, ln
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
              FROM iv),
        f AS (SELECT *, CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END AS isnew
              FROM m),
        i AS (SELECT *, sum(isnew) OVER (PARTITION BY s ORDER BY st, en, ok, ln
                ROWS UNBOUNDED PRECEDING) AS island
              FROM f)
        SELECT s AS l_suppkey, CAST(island AS BIGINT) AS island,
               min(st) AS island_start, max(en) AS island_end,
               CAST(count(*) AS BIGINT) AS n_intervals
        FROM i GROUP BY 1, 2 ORDER BY l_suppkey, island"""),
      bench = true),

    // ---- sweep-line coverage depth: max concurrent shipment
    // intervals per supplier. Boundaries become ±1 events, aggregated
    // per position (one hash shuffle), then a per-supplier running sum
    // gives the depth profile — the genomics "coverage depth" /
    // concurrency-peak operator without a quadratic overlap join.
    // The scan here is the BUILT-IN window, not `GroupedPrefixSum`:
    // suppliers are numerous and each group is small, so WindowExec
    // (hash-partitioned by s, per-group in-memory sort) is already
    // fully distributed — the custom range-partitioned scan only pays
    // off when one group spans partitions (see q93/q110's by-source
    // scans) ---------------------------------------------------------
    "q116_coverage_depth" -> Q(
      impl = (s, d) => {
        // one scan: each interval explodes to its two ±1 boundary
        // events (a union of two selects would read lineitem twice)
        val ev = shipIntervals(s, d)
          .select(col("s"), explode(array(
            struct(col("st").as("pos"), lit(1L).as("delta")),
            struct((col("en") + 1L).as("pos"), lit(-1L).as("delta")))).as("e"))
          .select(col("s"), col("e.pos").as("pos"), col("e.delta").as("delta"))
          .groupBy("s", "pos").agg(sum("delta").as("d"))
        val depth = ev.withColumn("depth",
          sum(col("d")).over(org.apache.spark.sql.expressions.Window
            .partitionBy("s").orderBy("pos")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        depth.groupBy("s")
          .agg(max("depth").as("max_depth"), count(lit(1)).as("n_change_points"))
          .select(col("s").as("l_suppkey"), col("max_depth"), col("n_change_points"))
          .orderBy("l_suppkey")
      },
      oracle = Some(s"""
        WITH $IvCte,
        ev AS (SELECT s, st AS pos, 1 AS delta FROM iv
               UNION ALL
               SELECT s, en + 1, -1 FROM iv),
        g AS (SELECT s, pos, CAST(sum(delta) AS BIGINT) AS d FROM ev GROUP BY 1, 2),
        r AS (SELECT s, sum(d) OVER (PARTITION BY s ORDER BY pos
                ROWS UNBOUNDED PRECEDING) AS depth
              FROM g)
        SELECT s AS l_suppkey, CAST(max(depth) AS BIGINT) AS max_depth,
               CAST(count(*) AS BIGINT) AS n_change_points
        FROM r GROUP BY s ORDER BY l_suppkey"""),
      bench = true),

    // ---- triangle count on the LSH near-dup graph: edges are the
    // q27-style banded MinHash candidate pairs (est >= 0.5). Edges are
    // oriented low→high by (degree, id) — the standard bound that
    // keeps every directed 2-path fan-out O(sqrt(|E|)) even on skewed
    // graphs — then one self-join builds 2-paths and one semi-check
    // closes them. Count is orientation-invariant, so the oracle's
    // naive a<b<c three-way join must agree exactly ------------------
    "q117_lsh_triangles" -> Q(
      impl = (s, d) => {
        import s.implicits._
        val docs = Tables.docsParallel(s, d)
          .withColumn("t", TextFns.tokens(col("text")))
        val sigs = MinHashLsh.signaturesFromTokens(
          docs, "doc_id", "t", 3, Extended2.MinhashK)
        val pairs = MinHashLsh
          .candidatePairs(sigs, "doc_id", Extended2.MinhashK, Extended2.Bands)
          .filter(col("est") >= 0.5)
          .select(col("a"), col("b"))
          .persist() // consumed by degree/orientation/closure joins
        // ONE incremental take is both the size gate and the collect
        // (the Components r21 fusion): under the cap, take(n+1)
        // returned the full edge set and its length IS n_edges — the
        // former count()-then-collect() pair executed the cached pair
        // scan twice. Beyond the cap the oriented-join plan takes over
        // (and pays the count the output needs anyway).
        val es = pairs.as[(Long, Long)].take(500001)
        if (es.length <= 500000) {
          val nEdgesL = es.length.toLong
          val adj = es.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
          // oracle shape: (a,b),(b,c) canonical pairs closed by (a,c)
          val nTrisL = es.iterator.map { case (a, b) =>
            val bn = adj.getOrElse(b, Set.empty)
            adj.getOrElse(a, Set.empty).count(bn.contains)
          }.sum.toLong
          val nNodesL = es.iterator.flatMap(p => Iterator(p._1, p._2)).toSet.size.toLong
          pairs.unpersist()
          Seq((nNodesL, nEdgesL, nTrisL))
            .toDF("n_nodes", "n_edges", "n_triangles")
        } else {
          val sym = pairs.select(col("a").as("u"), col("b").as("v"))
            .union(pairs.select(col("b").as("u"), col("a").as("v")))
          // node-keyed frames are |V|-bounded (≪ edges on any dense
          // graph) → broadcast both degree attachments; the closing
          // e3 probe broadcasts the oriented edge list itself (at
          // true scale it shuffles instead)
          val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
          val attr = sym
            .join(broadcast(deg.withColumnRenamed("u", "su").withColumnRenamed("deg", "sdeg")),
              col("u") === col("su"))
            .join(broadcast(deg.withColumnRenamed("u", "du").withColumnRenamed("deg", "ddeg")),
              col("v") === col("du"))
          val oriented = attr
            .filter(col("sdeg") < col("ddeg") ||
              (col("sdeg") === col("ddeg") && col("u") < col("v")))
            .select(col("u"), col("v"))
          val paths = oriented.as("e1")
            .join(broadcast(oriented.as("e2")), col("e1.v") === col("e2.u"))
            .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
          val tris = paths.join(broadcast(oriented.as("e3")),
            col("x") === col("e3.u") && col("z") === col("e3.v"))
          val nNodes = sym.agg(countDistinct("u").as("n_nodes"))
          val nEdges = pairs.agg(count(lit(1)).as("n_edges"))
          val nTris = tris.agg(count(lit(1)).as("n_triangles"))
          nNodes.crossJoin(nEdges).crossJoin(nTris)
        }
      },
      oracle = Some(s"""
        WITH ${Extended2.lshPairCtes(0.5)}
        SELECT (SELECT CAST(count(DISTINCT x) AS BIGINT)
                FROM (SELECT a AS x FROM pairs UNION SELECT b FROM pairs)) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
               (SELECT CAST(count(*) AS BIGINT)
                FROM pairs p1
                JOIN pairs p2 ON p2.a = p1.b
                JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b) AS n_triangles"""),
      bench = true),

    // ---- bigram-LM doc scoring: corpus bigram + unigram counts →
    // per-doc mean conditional NLL -ln c(w1 w2)/c(w1). The q103
    // unigram proxy upgraded one order: catches word-salad documents
    // whose unigrams are individually common. Bigram extraction is a
    // per-row zip_with (codegen'd, no join); both vocab sides are
    // corpus-bounded → broadcast ------------------------------------
    "q118_bigram_logprob" -> Q(
      impl = (s, d) => {
        // Two-pass broadcast-model shape (the q141 contract): pass 1
        // builds the unigram/bigram count tables — the only shuffles,
        // both vocabulary-bounded with map-side combine — and collects
        // them to the driver; pass 2 scores every document against the
        // broadcast maps in one narrow map-only stage. This deletes
        // the corpus-sized bigram explode + two broadcast joins + the
        // per-doc hash agg of the declarative form. ln/round replicate
        // Spark's exprs exactly (StrictMath.log; BigDecimal HALF_UP),
        // so results are bit-identical to the join formulation. At
        // open-web scale a bigram table can outgrow a broadcast — the
        // fallback is the q66-style join on the gram key.
        import s.implicits._
        // Count pass gets the repartitioned scan (CPU-heavy fan-out);
        // the scoring pass reads the scan directly — its per-doc work
        // is one hash lookup per bigram, so the scan's own splits are
        // parallelism enough and no exchange or persist is paid.
        val docs = Tables.docsParallel(s, d)
          .select(col("doc_id"), col("text")).as[(Long, String)]
        // Unigram and bigram counts share ONE pass, shuffle, and map:
        // tokens are space-split so a unigram key can never contain a
        // space while a bigram key always does — no collisions.
        val counts = docs.flatMap { case (_, text) =>
            val t = text.split(" ", -1)
            val m = new scala.collection.mutable.AnyRefMap[String, Long]()
            var i = 0
            while (i < t.length) {
              m.update(t(i), m.getOrElse(t(i), 0L) + 1L)
              if (i + 1 < t.length) {
                val k = t(i) + " " + t(i + 1)
                m.update(k, m.getOrElse(k, 0L) + 1L)
              }
              i += 1
            }
            m.iterator
          }.toDF("k", "c").groupBy("k").agg(sum("c").as("c"))
          .as[(String, Long)].collect()
        val table = new scala.collection.mutable.AnyRefMap[String, Long](counts.length * 2)
        counts.foreach { case (k, c) => table.update(k, c) }
        val bc = s.sparkContext.broadcast(table)
        val scoreDocs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
        scoreDocs.flatMap { case (id, text) =>
          val m = bc.value
          val t = text.split(" ", -1)
          if (t.length < 2) Iterator.empty
          else {
            var sumLn = 0.0
            var i = 0
            while (i + 1 < t.length) {
              sumLn += StrictMath.log(
                m(t(i)).toDouble / m(t(i) + " " + t(i + 1)))
              i += 1
            }
            val n = t.length - 1
            val nll = java.math.BigDecimal.valueOf(sumLn / n)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
            Iterator.single((id, n.toLong, nll))
          }
        }.toDF("doc_id", "n_bigrams", "nll")
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        bi AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
               FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(i)),
        uni AS (SELECT tok, count(*) AS c1
                FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
        big AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(ln(CAST(c1 AS DOUBLE) / c2)), 4) AS nll
        FROM bi JOIN big USING (w1, w2) JOIN uni ON uni.tok = bi.w1
        GROUP BY doc_id ORDER BY doc_id"""),
      bench = true),

    // ---- skyline (Pareto frontier) per source over (n_chars,
    // n_tokens): the classic OLAP maximal-vector query. Reduce to one
    // point per x (max y), then ONE exclusive grouped prefix-MAX over
    // x DESC — a point survives iff its y beats every y at larger x.
    // O(n log n) by sort instead of the quadratic dominance join;
    // the scan is the range-partitioned operator, not a window ------
    "q119_skyline" -> Q(
      impl = (s, d) => {
        val pts = Tables.load(s, d, "documents")
          .select(col("source"), col("n_chars").as("x"),
            TextFns.tokenCount(col("text")).cast("long").as("y"))
          .groupBy("source", "x").agg(max("y").as("y"))
        val scanned = GroupedPrefixSum.withRunningMax(
          pts, "source", Seq(col("x").desc), "y", "pmax", inclusive = false)
        scanned.filter(col("y") > col("pmax")) // first row: pmax = Long.MinValue
          .select(col("source"), col("x"), col("y"))
          .orderBy("source", "x")
      },
      oracle = Some("""
        WITH p AS (SELECT source, n_chars AS x,
                          CAST(max(len(string_split(text, ' '))) AS BIGINT) AS y
                   FROM documents GROUP BY 1, 2),
        m AS (SELECT *, max(y) OVER (PARTITION BY source ORDER BY x DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
              FROM p)
        SELECT source, x, y FROM m
        WHERE pmax IS NULL OR y > pmax
        ORDER BY source, x"""),
      bench = true)
  )
}
