package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VecFns

/** Round-13: banded-LSH self-calibration (q184) — the "calibration
  * knob" the decade curve documents for the embedding near-dup family
  * (ARCHITECTURE.md: hyperplane-band collision rate is scale-invariant
  * on isotropic vectors, so within-bucket candidate pairs densify as
  * the corpus grows; production holds expected bucket occupancy by
  * raising planes-per-band with log N), turned into an operator.
  *
  * For each candidate config (planes-per-band over a fixed band
  * count), ONE pass over the corpus computes the exact per-bucket
  * occupancy histogram and from it the exact banded-join cost —
  * Σ m·(m−1)/2 candidate pairs — plus the bucket count and the worst
  * bucket. The selected config is the narrowest one whose candidate
  * load fits the per-vector budget (the monotone trade: fewer planes →
  * higher recall → more pairs), falling back to the widest config when
  * none fits. At 100 TB this is a single groupBy over short keys per
  * config — the same shape as the candidate join it calibrates, minus
  * the join — so tuning costs one scan, not a dry-run of the dedup.
  *
  * Oracle: replays the identical md5-derived ±1 hyperplanes per config
  * as literal VALUES (the q53/q31 pattern), so the stats match
  * hash-exactly by construction.
  */
object Extended22 {

  /** Fixed band count (matches the near-dup family's 4 bands). */
  private val Bands = 4

  /** Candidate planes-per-band grid, narrowest first. */
  private val PlaneGrid = Seq(2, 4, 6, 8)

  /** Budget: accepted expected candidate pairs per corpus vector. */
  private val PairsPerVecBudget = 20L

  /** Embedding dimensionality of the harness table. (Must be declared
    * before `queries`: the oracle string is built at object init.)
    */
  private val EmbDim = 64

  val queries: Map[String, Q] = Map(
    "q184_band_calibration" -> Q(
      impl = (s, d) => {
        graft.functions.expressions.GraftFunctions.register(s)
        val vq = Tables.embeddingsParallel(s, d)
          .select(col("vec_id"), VecFns.quantize(col("embedding")).as("vq"))
        // one row per (config, band) per vector, built in a single
        // projection — no per-config corpus re-scan
        val keyed = vq.select(explode(array(
          (for { p <- PlaneGrid; b <- 0 until Bands } yield
            struct(lit(p).as("p"), lit(b).as("band"),
              VecFns.lshBandKey(col("vq"), b, p, EmbDim).as("key"))): _*))
          .as("bk"))
          .select(col("bk.p"), col("bk.band"), col("bk.key"))
        val occ = keyed.groupBy("p", "band", "key")
          .agg(count(lit(1)).as("m"))
        val stats = occ.groupBy("p").agg(
          count(lit(1)).as("n_buckets"),
          max(col("m")).as("max_occ"),
          sum(expr("(m * (m - 1)) div 2")).as("cand_pairs"))
        val n = Tables.embeddingsParallel(s, d)
          .agg(count(lit(1)).as("n_vec"))
        // selection via a window over the stats frame: it has exactly
        // |PlaneGrid| rows (a constant, not data-sized), so the
        // single-partition window is bounded and the corpus
        // aggregation above runs ONCE — a second aggregate + re-join
        // would traverse the whole corpus pass again
        val w = Window
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        stats.crossJoin(broadcast(n))
          .withColumn("p_fit",
            min(when(col("cand_pairs") <= col("n_vec") * PairsPerVecBudget,
              col("p"))).over(w))
          .withColumn("p_max", max(col("p")).over(w))
          .select(col("p").cast("long").as("planes_per_band"),
            col("n_buckets"), col("max_occ"), col("cand_pairs"),
            (col("p") === coalesce(col("p_fit"), col("p_max")))
              .cast("long").as("selected"))
          .orderBy("planes_per_band")
      },
      oracle = Some {
        val maxPlanes = Bands * PlaneGrid.max
        val weightRows = (for {
          j <- 0 until maxPlanes
          i <- 1 to EmbDim
        } yield s"($j,$i,${VecFns.hyperplaneWeight(j, i - 1)})")
          .mkString(",")
        val perConfig = PlaneGrid.map { p =>
          val pw = (0 until p).map(m => s"($m,${1L << m})").mkString(",")
          s"""
        bk$p AS (
          SELECT vec_id, j // $p AS band,
                 CAST(sum(CASE WHEN pr >= 0 THEN pv ELSE 0 END) AS BIGINT) AS key
          FROM proj JOIN (VALUES $pw) pw$p(m, pv) ON pw$p.m = j % $p
          WHERE j < ${Bands * p}
          GROUP BY 1, 2),
        occ$p AS (
          SELECT band, key, count(*) AS m FROM bk$p GROUP BY 1, 2),
        stat$p AS (
          SELECT CAST($p AS BIGINT) AS planes_per_band,
                 CAST(count(*) AS BIGINT) AS n_buckets,
                 CAST(max(m) AS BIGINT) AS max_occ,
                 CAST(sum((m * (m - 1)) // 2) AS BIGINT) AS cand_pairs
          FROM occ$p)"""
        }.mkString(",")
        val unioned = PlaneGrid.map(p => s"SELECT * FROM stat$p")
          .mkString(" UNION ALL ")
        s"""
        WITH f AS (SELECT vec_id, unnest(embedding) AS x,
                          generate_subscripts(embedding, 1) AS i
                   FROM embeddings),
        qv AS (SELECT vec_id, i,
                      CAST(round(CAST(x AS DOUBLE) * ${VecFns.Scale}) AS BIGINT) AS e
               FROM f),
        w(j, i, wt) AS (VALUES $weightRows),
        proj AS (
          SELECT qv.vec_id, w.j, CAST(sum(qv.e * w.wt) AS BIGINT) AS pr
          FROM qv JOIN w ON qv.i = w.i GROUP BY 1, 2),$perConfig,
        allstats AS ($unioned),
        sel AS (
          SELECT min(CASE WHEN cand_pairs <=
                       $PairsPerVecBudget * (SELECT count(*) FROM embeddings)
                     THEN planes_per_band END) AS p_fit,
                 max(planes_per_band) AS p_max
          FROM allstats)
        SELECT planes_per_band, n_buckets, max_occ, cand_pairs,
               CAST(planes_per_band = coalesce(p_fit, p_max) AS BIGINT) AS selected
        FROM allstats CROSS JOIN sel
        ORDER BY planes_per_band"""
      },
      bench = true))
}
