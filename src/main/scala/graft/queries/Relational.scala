package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Closure, Dedup, Symmetrize, TopK}

/** Core relational query surface (SURVEY.md §2.11 items 1-4, 6-14):
  * scans with pushdown, equi/broadcast/semi/anti joins, dedup windows,
  * symmetrize-union, transitive closure, rollup, top-k, string
  * pipeline, explode, set ops, sort/limit.
  *
  * Every query ends in a full-key ORDER BY (determinism contract,
  * SURVEY.md §2.8 A3) and aliases every computed column identically to
  * its DuckDB oracle.
  */
object Relational {

  val queries: Map[String, Q] = Map(
    // ---- 1. filter + project with parquet pushdown (F*, P*) --------
    "q01_filter_project" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp")
            && col("l_discount") > 0.05)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
            "l_extendedprice")
          // the harness lineitem deliberately contains duplicated
          // (orderkey, linenumber) rows with different payloads —
          // order by every projected column so the positional
          // row-compare never depends on engine tie order
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
            "l_extendedprice"),
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00' AND l_discount > 0.05
        ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice"""),
      bench = true),

    // ---- 2. multi-way equi-join + aggregation ----------------------
    "q02_join_agg" -> Q(
      impl = (s, d) => {
        val orders = Tables.load(s, d, "orders")
        val customer = Tables.load(s, d, "customer")
        val nation = broadcast(Tables.load(s, d, "nation"))
        orders
          .join(customer, orders("o_custkey") === customer("c_custkey"))
          .join(nation, customer("c_nationkey") === nation("n_nationkey"))
          .groupBy("n_name")
          .agg(
            count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("sum_price"),
            round(avg("o_totalprice"), 2).as("avg_price"))
          .orderBy("n_name")
      },
      oracle = Some("""
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               round(avg(o_totalprice), 2) AS avg_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name"""),
      bench = true),

    // ---- 3. broadcast dimension join -------------------------------
    "q03_broadcast_join" -> Q(
      impl = (s, d) => {
        val nation = Tables.load(s, d, "nation")
        val region = broadcast(Tables.load(s, d, "region"))
        nation.join(region, nation("n_regionkey") === region("r_regionkey"))
          .select("n_nationkey", "n_name", "r_name")
          .orderBy("n_nationkey")
      },
      oracle = Some("""
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
        ORDER BY n_nationkey""")),

    // ---- 4/5. semi + anti joins (on a filtered right side so both
    // result sets are non-trivial: every customer has *some* order) --
    "q04_semi_join" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "customer")
          .join(Tables.load(s, d, "orders").filter(col("o_totalprice") > 300000),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        ORDER BY c_custkey""")),

    "q05_anti_join" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "customer")
          .join(Tables.load(s, d, "orders").filter(col("o_totalprice") > 300000),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        ORDER BY c_custkey""")),

    // ---- 6. last-wins upsert dedup (D1) ----------------------------
    "q08_lastwins_upsert" -> Q(
      impl = (s, d) =>
        Dedup.lastWins(
            Tables.load(s, d, "orders"),
            keys = Seq("o_custkey"),
            ord = Seq(col("o_orderdate"), col("o_orderkey")),
            keep = Seq("o_custkey", "o_orderkey", "o_totalprice"))
          .orderBy("o_custkey"),
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT *, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1
        ORDER BY o_custkey""")),

    // ---- keep-first dedup (D3) -------------------------------------
    "q09_keepfirst_dedup" -> Q(
      impl = (s, d) =>
        Dedup.keepFirst(
            Tables.load(s, d, "lineitem"),
            keys = Seq("l_partkey"),
            ord = Seq(col("l_orderkey"), col("l_linenumber")),
            keep = Seq("l_partkey", "l_orderkey", "l_linenumber"))
          .orderBy("l_partkey"),
      oracle = Some("""
        SELECT l_partkey, l_orderkey, l_linenumber FROM (
          SELECT *, row_number() OVER (
            PARTITION BY l_partkey ORDER BY l_orderkey, l_linenumber) AS rn
          FROM lineitem) WHERE rn = 1
        ORDER BY l_partkey""")),

    // ---- 7. symmetrize-union + distinct (U1/U2) --------------------
    "q10_symmetrize_pairs" -> Q(
      impl = (s, d) => {
        val base = Tables.load(s, d, "supplier")
          .select(col("s_suppkey").cast("long").as("a"),
            (col("s_nationkey").cast("long") + 1000).as("b"))
        Symmetrize.symmetrize(base, Seq(("a", "b")))
          .distinct()
          .orderBy("a", "b")
      },
      oracle = Some("""
        WITH base AS (
          SELECT CAST(s_suppkey AS BIGINT) AS a,
                 CAST(s_nationkey AS BIGINT) + 1000 AS b
          FROM supplier)
        SELECT a, b FROM (
          SELECT a, b FROM base UNION SELECT b AS a, a AS b FROM base)
        ORDER BY a, b""")),

    // ---- 8. transitive closure to fixpoint (A1) --------------------
    "q11_closure" -> Q(
      impl = (s, d) => {
        Closure.transitiveClosure(edges(s, d), "parent", "child")
          .orderBy("ancestor", "descendant")
      },
      oracle = Some(s"""
        WITH RECURSIVE $edgesSql, clo AS (
          SELECT parent AS ancestor, child AS descendant FROM edges
          UNION
          SELECT c.ancestor, e.child FROM clo c JOIN edges e ON c.descendant = e.parent)
        SELECT ancestor, descendant FROM clo ORDER BY ancestor, descendant"""),
      bench = true),

    // ---- descendant counts over the closure (A2) -------------------
    "q12_closure_counts" -> Q(
      impl = (s, d) =>
        Closure.descendantCounts(Closure.transitiveClosure(edges(s, d), "parent", "child"))
          .orderBy("ancestor"),
      oracle = Some(s"""
        WITH RECURSIVE $edgesSql, clo AS (
          SELECT parent AS ancestor, child AS descendant FROM edges
          UNION
          SELECT c.ancestor, e.child FROM clo c JOIN edges e ON c.descendant = e.parent)
        SELECT ancestor, CAST(count(*) AS BIGINT) AS n_descendants
        FROM clo GROUP BY ancestor ORDER BY ancestor""")),

    // ---- 9. rollup aggregate ---------------------------------------
    "q13_rollup" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n_rows"),
            round(sum("l_quantity"), 2).as("sum_qty"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""),
      bench = true),

    // ---- 10. window ranking / top-k per group ----------------------
    "q14_topk_per_group" -> Q(
      impl = (s, d) =>
        TopK.perGroup(
            Tables.load(s, d, "orders"),
            groupCols = Seq("o_custkey"),
            order = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
            k = 3)
          .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rk"),
      oracle = Some("""
        SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders) WHERE rk <= 3
        ORDER BY o_custkey, rk"""),
      bench = true),

    // ---- 11. string-function pipeline (C*) -------------------------
    "q15_string_pipeline" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "part")
          .select(
            col("p_partkey"),
            regexp_replace(lower(col("p_type")), " +", "_").as("type_norm"),
            substring(col("p_brand"), 7, 10).as("brand_code"),
            array_join(array_sort(split(col("p_name"), " ")), ",").as("name_sorted"))
          .orderBy("p_partkey"),
      oracle = Some("""
        SELECT p_partkey,
               regexp_replace(lower(p_type), ' +', '_', 'g') AS type_norm,
               substr(p_brand, 7, 10) AS brand_code,
               array_to_string(list_sort(string_split(p_name, ' ')), ',') AS name_sorted
        FROM part ORDER BY p_partkey""")),

    // ---- 12. explode of split column (X*) --------------------------
    "q16_explode_tokens" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "part")
          .select(explode(split(col("p_name"), " ")).as("tok"))
          .groupBy("tok")
          .agg(count(lit(1)).as("n"))
          .orderBy("tok"),
      oracle = Some("""
        SELECT tok, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(p_name, ' ')) AS tok FROM part)
        GROUP BY tok ORDER BY tok""")),

    // ---- 13. set ops ----------------------------------------------
    "q17_setops" -> Q(
      impl = (s, d) => {
        val cust = Tables.load(s, d, "customer").select(col("c_nationkey").as("k")).distinct()
        val supp = Tables.load(s, d, "supplier").select(col("s_nationkey").as("k")).distinct()
        val both = cust.intersect(supp).withColumn("tag", lit("both"))
        val custOnly = cust.except(supp).withColumn("tag", lit("cust_only"))
        both.unionByName(custOnly).select("tag", "k").orderBy("tag", "k")
      },
      oracle = Some("""
        WITH cust AS (SELECT DISTINCT c_nationkey AS k FROM customer),
             supp AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
        SELECT 'both' AS tag, k FROM (SELECT k FROM cust INTERSECT SELECT k FROM supp)
        UNION ALL
        SELECT 'cust_only' AS tag, k FROM (SELECT k FROM cust EXCEPT SELECT k FROM supp)
        ORDER BY tag, k""")),

    // ---- 14. sort + limit determinism ------------------------------
    "q18_sort_limit" -> Q(
      impl = (s, d) =>
        Tables.load(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc)
          .limit(100),
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100"""))
  )

  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** Synthetic 3-level hierarchy for the closure queries: customer →
    * nation → region → root (the ontology `is_a` DAG analog; SURVEY.md
    * §2.8 A1). Edge = (parent, child).
    */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val c = Tables.load(s, d, "customer")
      .select(concat(lit("N"), col("c_nationkey").cast("string")).as("parent"),
        concat(lit("C"), col("c_custkey").cast("string")).as("child"))
    val n = Tables.load(s, d, "nation")
      .select(concat(lit("R"), col("n_regionkey").cast("string")).as("parent"),
        concat(lit("N"), col("n_nationkey").cast("string")).as("child"))
    val r = Tables.load(s, d, "region")
      .select(lit("ROOT").as("parent"),
        concat(lit("R"), col("r_regionkey").cast("string")).as("child"))
    c.unionByName(n).unionByName(r)
  }

  private def edgesSql: String = """edges AS (
          SELECT 'N' || CAST(c_nationkey AS VARCHAR) AS parent,
                 'C' || CAST(c_custkey AS VARCHAR) AS child FROM customer
          UNION ALL
          SELECT 'R' || CAST(n_regionkey AS VARCHAR),
                 'N' || CAST(n_nationkey AS VARCHAR) FROM nation
          UNION ALL
          SELECT 'ROOT', 'R' || CAST(r_regionkey AS VARCHAR) FROM region)"""
}
