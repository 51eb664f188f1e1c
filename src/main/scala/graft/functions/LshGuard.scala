package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Hot-bucket guard for LSH band self-joins.
  *
  * A banded LSH candidate join is an equi-join on (band, key). AQE's
  * skew-join splitting re-balances *shuffle partitions*, but it cannot
  * bound the O(m²) pair explosion of a single degenerate band key —
  * e.g. millions of empty or boilerplate-identical documents sharing
  * one signature at 100 TB, which would emit ~10¹² candidate pairs
  * from one bucket no matter how the partitions are split.
  *
  * The guard bounds that bucket to O(m) while preserving what dedup
  * needs from it: rows behind a (band, key) bucket with more than
  * `maxBucket` occupants skip the all-pairs self-join and are instead
  * chain-linked — each row paired with its predecessor in
  * (content, id) order, where "content" is the full signature
  * (MinHash path) or quantized vector (embedding path). A chain emits
  * m−1 pairs instead of m(m−1)/2, keeps every member of the bucket in
  * one connected component of the RAW candidate graph, and leaves
  * every bucket at or under the threshold — and therefore every
  * non-degenerate pair — untouched.
  *
  * Ordering by content FIRST is what makes the chain survive the
  * similarity filter nearly every consumer applies AFTER candidate
  * generation (`est >= t` / `cos >= minCos`): content-identical rows
  * form contiguous runs whose links score est = 1.0 / cos = 1, so a
  * degenerate bucket of identical content stays one connected
  * component post-filter too — identical clusters to the unguarded
  * join. In a MIXED hot bucket (rows sharing one band key but
  * differing elsewhere) only the cross-run links can fall below the
  * threshold; those are links between genuinely dissimilar rows,
  * which the unguarded all-pairs join would filter out as well. The
  * one shape the guard does change: rows similar-but-not-identical
  * (est in [t, 1)) inside a hot bucket may connect through the bucket
  * on the unguarded path but not via the surviving chains — the
  * documented precision/recall trade of capping a degenerate bucket.
  *
  * Metrics: each triggered run registers two named Spark accumulators
  * (`graft.lsh.hotBuckets`, `graft.lsh.suppressedPairs`) visible in
  * the UI and via [[lastMetrics]], and the first emitted pair of each
  * hot bucket logs a warning executor-side with the bucket size.
  */
object LshGuard {

  /** Default occupancy threshold. At r rows per band and realistic
    * near-dup cluster sizes, genuine clusters sit orders of magnitude
    * below this; only degenerate content (empty docs, boilerplate)
    * concentrates >1000 documents behind one 28·r-bit band key.
    */
  val DefaultMaxBucket = 1000

  final class Metrics(val hotBuckets: LongAccumulator,
      val suppressedPairs: LongAccumulator)

  @volatile private var last: Metrics = _

  /** Metrics of the most recently *constructed* guarded join in this
    * JVM (populated when the guarded plan is built; accumulator values
    * update as the job runs). Introspection hook for specs and ops —
    * not a per-query API.
    */
  def lastMetrics: Option[Metrics] = Option(last)

  /** Adds a `__cnt` per-(band, key) occupancy column. One
    * hash-partition + sort on (band, key) — the same shuffle the
    * downstream band join needs, so when the result is persisted the
    * join reuses the partitioning instead of re-exchanging.
    */
  def withOccupancy(banded: DataFrame): DataFrame =
    banded.withColumn("__cnt",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("key"))))

  /** Index-side guard for probe joins (delta-vs-index LSH lookup): a
    * degenerate index bucket of m rows multiplies EVERY colliding
    * probe row by m. Buckets over `maxBucket` keep only their first
    * `maxBucket` rows in ascending-id order — for the production
    * decision ("does this delta doc collide with the standing
    * corpus?") any bounded set of representatives is sufficient, and
    * buckets at or under the threshold are untouched. Overflow is
    * metered via the `graft.lsh.indexRowsCapped` accumulator and an
    * executor-side warning (on each capped bucket's first row).
    */
  def capBuckets(banded: DataFrame, idCol: String, maxBucket: Int): DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val withCnt = withOccupancy(banded)
    // cold side untouched — stays inside whole-stage codegen
    val cold = withCnt.filter(col("__cnt") <= maxBucket).drop("__cnt")
    // hot side (normally empty): keep the first maxBucket rows per
    // bucket and meter the overflow through the pass-through stage
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("key")).orderBy(col(idCol))
    val hot = withCnt.filter(col("__cnt") > maxBucket)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxBucket)
    val sc = banded.sparkSession.sparkContext
    val capped = sc.longAccumulator("graft.lsh.indexRowsCapped")
    val schema = hot.schema
    val cntIdx = schema.fieldIndex("__cnt")
    val rnIdx = schema.fieldIndex("__rn")
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val mb = maxBucket.toLong
    val hotMetered = hot.mapPartitions { it =>
      lazy val log = org.slf4j.LoggerFactory.getLogger("graft.lsh.guard")
      it.map { r =>
        if (r.getInt(rnIdx) == 1) {
          val m = r.getLong(cntIdx)
          capped.add(m - mb)
          log.warn(s"hot LSH index bucket: $m rows behind one band key; " +
            s"capped to $mb representatives (dropped ${m - mb})")
        }
        r
      }
    }(enc).drop("__cnt", "__rn")
    cold.unionByName(hotMetered)
  }

  /** Pass-through instrumentation of the chained hot-pair rows: bumps
    * the accumulators and logs once per hot bucket (on the bucket's
    * first emitted pair, `__rn` == 2), then drops the bookkeeping
    * columns. The hot side is empty unless the guard triggered, so
    * this non-codegen stage costs nothing in the common case.
    */
  def instrument(hotPairs: DataFrame): DataFrame = {
    val sc = hotPairs.sparkSession.sparkContext
    val buckets = sc.longAccumulator("graft.lsh.hotBuckets")
    val suppressed = sc.longAccumulator("graft.lsh.suppressedPairs")
    last = new Metrics(buckets, suppressed)
    val schema = hotPairs.schema
    val cntIdx = schema.fieldIndex("__cnt")
    val rnIdx = schema.fieldIndex("__rn")
    val enc = org.apache.spark.sql.Encoders.row(schema)
    hotPairs.mapPartitions { it =>
      lazy val log = org.slf4j.LoggerFactory.getLogger("graft.lsh.guard")
      it.map { r =>
        if (r.getInt(rnIdx) == 2) {
          val m = r.getLong(cntIdx)
          buckets.add(1)
          suppressed.add(m * (m - 1) / 2 - (m - 1))
          log.warn(s"hot LSH bucket: $m rows behind one band key; " +
            s"chain-linked to ${m - 1} pairs " +
            s"(suppressed ${m * (m - 1) / 2 - (m - 1)})")
        }
        r
      }
    }(enc).drop("__cnt", "__rn")
  }
}
